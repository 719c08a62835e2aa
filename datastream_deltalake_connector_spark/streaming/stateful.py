"""Custom stateful streaming operator: cross-batch LWW dedup/stale-filter.

The reference handles late data relationally — within a batch by window
dedup, across batches by the ``target.ts <= source.ts`` merge guard (ST3,
reference: MergeQueries.scala:99-104,124-129). That is correct but means
every stale event still flows into the merge join. This operator filters
staleness *in the stream* with keyed state (`applyInPandasWithState`,
Arrow-batched — the custom-stateful-operator escape hatch the DataFrame API
can't express):

- State per key: the highest ``(source_timestamp, change_seq)`` seen.
- Each micro-batch emits at most one row per key — the batch winner — and
  only if it is not older than the state (``>=``, preserving the engine's
  idempotent-replay semantics: an equal-ordering replay re-emits).
- State persists in the streaming state store, so a restart from checkpoint
  resumes exact filtering (lineage for streams).

Downstream, the merge does strictly less work: its input is already one
fresh row per key. The merge guard stays in place — defense in depth, and
replays remain idempotent end-to-end.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["dedup_stream_lww"]

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def dedup_stream_lww(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "source_timestamp",
    seq_col: str = "change_seq",
) -> DataFrame:
    """Streaming LWW dedup: one winner per key per micro-batch, stale events
    (older than the keyed state) dropped. Works on a streaming DataFrame of
    change-batch shape; output schema == input schema."""
    out_schema = events.schema

    def dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # batch winner: max (ts, seq) — pandas lexicographic idxmax
            ordered = pdf.sort_values([ts_col, seq_col], kind="mergesort")
            cand = ordered.iloc[[-1]]
            if best is None:
                best = cand
            else:
                both = pd.concat([best, cand]).sort_values(
                    [ts_col, seq_col], kind="mergesort"
                )
                best = both.iloc[[-1]]
        if best is None:
            return
        ts_us = int(best.iloc[0][ts_col].value // 1000)  # ns → µs
        seq = int(best.iloc[0][seq_col])
        if state.exists:
            prev_ts, prev_seq = state.get
            # '>=' mirrors the merge guard's '<=': equal ordering re-emits
            # (idempotent replay), strictly older is dropped.
            if (ts_us, seq) < (prev_ts, prev_seq):
                return
        state.update((ts_us, seq))
        yield best

    return events.groupBy(*keys).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
