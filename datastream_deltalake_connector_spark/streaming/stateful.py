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

__all__ = ["dedup_stream_lww", "sessionize_stream"]

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


_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful twin of the batch
    ``events_sessionize`` query (same semantics: a gap > ``gap_seconds``
    starts a new session).

    State per key: the OPEN session (start, last event, count). Each
    micro-batch sorts its events, stitches them onto the open session, and
    emits every session CLOSED by evidence (a later event separated by more
    than the gap); the trailing session stays open in state across batches
    and restarts (checkpointed state store). Gap math is numpy over int64
    microseconds inside ``applyInPandasWithState`` — Arrow in, Arrow out.

    Output: (key, session_start, session_end, n_events) for closed sessions.
    """
    import numpy as np

    key_field = events.schema[key]
    out_schema = T.StructType(
        [
            T.StructField(key, key_field.dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    gap_us = int(gap_seconds) * 1_000_000

    def sessionize(
        k: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts_list = []
        for pdf in pdfs:
            if len(pdf):
                ts_list.append(pdf[ts_col].to_numpy(dtype="datetime64[us]").astype("int64"))
        if not ts_list:
            return
        ts = np.sort(np.concatenate(ts_list))
        closed: list[tuple[int, int, int]] = []
        # stitch onto the open session from state; events at or before the
        # open session's last timestamp (cross-batch stragglers) join it
        if state.exists:
            start_us, last_us, n = state.get
            rest = ts
        else:
            start_us = last_us = int(ts[0])
            n = 1
            rest = ts[1:]
        for t in rest:
            t = int(t)
            if t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    key: [k[0]] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy(key).applyInPandasWithState(
        sessionize,
        outputStructType=out_schema,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
