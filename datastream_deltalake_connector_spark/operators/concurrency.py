"""Operation-level optimistic-concurrency retry.

The table layer resolves multi-writer races at two granularities:

- **Commit rebase** (``IcepackTable.commit(requirements=...)``): an
  unpinned commit re-resolves the head under the commit lock and lands on
  top of concurrent commits when its declared preconditions still hold —
  free, no recompute. Compaction/clustering/row-level DML use this so an
  hours-long rewrite survives the appends that streamed in meanwhile.
- **Operation retry** (this module): when a precondition FAILS — the
  operation's inputs were rewritten, or delete files landed that its
  output would un-shadow — the only correct move is to recompute from the
  fresh snapshot. ``run_with_commit_retries`` is that loop: Iceberg's
  ``commit.retry.num-retries`` semantics, surfaced as a function combinator
  because every operator here is a plain function over a table handle.

Reference parity: the reference connector serializes writers per table
(one Spark streaming query per Delta table, ``DatastreamDeltaJob``), so it
never needs this; a shared lakehouse table with ad-hoc DML beside
streaming CDC and maintenance daemons does.
"""

from __future__ import annotations

import random
import time
from typing import Callable, TypeVar

from ..table.icepack import ConflictError

__all__ = ["run_with_commit_retries"]

R = TypeVar("R")


def run_with_commit_retries(
    op: Callable[[], R],
    attempts: int = 5,
    base_backoff_s: float = 0.1,
    max_backoff_s: float = 5.0,
) -> R:
    """Run ``op`` (a zero-arg closure that reads the table's CURRENT head
    and commits) until it lands or ``attempts`` conflicts accumulate.

    ``op`` must be restartable from scratch: every operator in this package
    qualifies because each resolves its snapshot at entry and stages new
    files under unique names (a lost race leaves only staged bytes, which
    the losing attempt reclaims or expire/orphan cleanup sweeps).

    Backoff is exponential with full jitter — under a thundering herd of
    writers the jitter is what breaks the lockstep, not the exponent."""
    last: ConflictError | None = None
    for attempt in range(attempts):
        try:
            return op()
        except ConflictError as e:
            last = e
            if attempt == attempts - 1:
                break
            cap = min(max_backoff_s, base_backoff_s * (2**attempt))
            time.sleep(random.uniform(0, cap))
    raise ConflictError(
        f"operation still conflicting after {attempts} attempts: {last}"
    ) from last
