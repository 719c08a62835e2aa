"""Sequence packing: assign documents to fixed-capacity context windows.

The last step before a training run tokenizes shards: pack documents into
sequences of at most ``max_tokens`` tokens so padding waste is low. Exact
optimal packing is NP-hard and inherently serial; the scalable form is
**partition-local first-fit-decreasing**:

- route each doc to one of ``num_groups`` groups by a deterministic hash
  of its id (one shuffle of (id, n_tokens) pairs — never the text);
- within each group, FFD-pack serially in pandas (``applyInPandas``) —
  groups are independent, so packing is embarrassingly parallel;
- pack ids are group-scoped (``group * 2^32 + local_bin``): no global
  counter, no driver coordination, deterministic end-to-end.

FFD guarantees ≤ (11/9)·OPT + 1 bins per group; hash routing keeps the
doc-length distribution identical across groups, so the global utilization
matches the single-machine answer to within the per-group last-bin slack.
At 100 TB only doc ids and token counts move — the text/token payload is
joined back by id afterwards, partition-pruned by pack id.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]

_PACK_SCHEMA = (
    "doc_id long, n_tokens long, pack_id long, pack_offset long, oversize boolean"
)


def _ffd_pack(pdf: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    """Serial first-fit-decreasing over one group; deterministic order
    (n_tokens DESC, doc_id ASC)."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    group = int(pdf["group"].iloc[0])
    base = group << 32
    bins: list[int] = []  # remaining capacity per local bin
    out_pack, out_off, out_over = [], [], []
    for n in pdf["n_tokens"].to_numpy():
        n = int(n)
        if n > max_tokens:
            # oversize doc: its own pack, flagged for truncate/split upstream
            bins.append(0)
            out_pack.append(base + len(bins) - 1)
            out_off.append(0)
            out_over.append(True)
            continue
        placed = False
        for i, rem in enumerate(bins):
            if rem >= n:
                out_pack.append(base + i)
                out_off.append(max_tokens - rem)
                bins[i] = rem - n
                placed = True
                break
        if not placed:
            bins.append(max_tokens - n)
            out_pack.append(base + len(bins) - 1)
            out_off.append(0)
        out_over.append(False)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_tokens": pdf["n_tokens"].to_numpy(),
            "pack_id": out_pack,
            "pack_offset": out_off,
            "oversize": out_over,
        }
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    max_tokens: int = 2048,
    num_groups: int = 64,
) -> DataFrame:
    """(doc_id, n_tokens, pack_id, pack_offset, oversize): every input doc
    assigned to exactly one pack; per-pack token sums never exceed
    ``max_tokens`` except single-doc ``oversize`` packs. Fully
    deterministic — hash routing + sorted FFD, no RNG, no order
    dependence."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive: {max_tokens}")
    slim = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups))).alias("group"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        return _ffd_pack(pdf, max_tokens)

    return slim.groupBy("group").applyInPandas(pack, _PACK_SCHEMA)
