"""Predicate row-level operations: DELETE FROM / UPDATE ... WHERE.

Delta ``DELETE FROM t WHERE p`` / ``UPDATE t SET c = e WHERE p`` parity for
icepack tables (the reference rides Delta for these, README.md:9 ACID notes;
its own MERGE clauses in MergeQueries.scala cover only the CDC path — the
ad-hoc predicate forms live here).

Scale shape (the 100-TB plan):

- **Manifest pruning first.** Only files whose min/max/bloom stats say the
  predicate MIGHT match are touched; at 10^12 rows a predicate with any key
  locality rewrites a handful of files, never the table.
- **Metadata-only deletes.** A file whose stats PROVE every row matches
  (``FileEntry.must_match_all``: exact bounds inside the predicate AND an
  exact null count of zero) is dropped from the manifest without being
  read — Iceberg's "delete with metadata" fast path. Partition-aligned
  deletes (drop a day, drop a source) cost one manifest write.
- **CoW rewrite for the rest.** Surviving candidate files are read once
  (merge-on-read deletes resolved, so shadowed rows can never resurrect
  with the rewrite's fresh data-sequence number), filtered/rewritten with
  vectorized expressions, and swapped in one atomic commit. Untouched
  files never enter any plan.
- **No extra count jobs.** Affected-row counts ride the write job via
  ``DataFrame.observe`` (update) or manifest row-count arithmetic (delete).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..table.icepack import FileEntry, IcepackTable

__all__ = ["delete_where", "update_where"]

Filter = tuple  # (col, op, value) with op in = < <= > >= between in


def _reclaim_staged(table: IcepackTable, entries: list[FileEntry]) -> None:
    """Remove the staging dir(s) of never-committed entries entirely —
    including _SUCCESS/.crc markers the entry list doesn't know about.
    Every write_data_files call stages under its own data/<uuid>/ root, so
    the first two path components identify it unambiguously."""
    import shutil

    roots = set()
    for e in entries:
        parts = e.path.split(os.sep)
        if len(parts) >= 2 and parts[0] == "data":
            roots.add(os.path.join(table.root, parts[0], parts[1]))
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)


def _pred_column(filters: list[Filter], residual_sql: str | None) -> Column:
    """Conjunction of structured filters (the prunable part) and an optional
    residual SQL expression (arbitrary, never used for pruning)."""
    conj: Column | None = None
    for c, op, v in filters or []:
        col = F.col(c)
        expr = {
            "=": col == v,
            "<": col < v,
            "<=": col <= v,
            ">": col > v,
            ">=": col >= v,
            "between": col.between(v[0], v[1]) if op == "between" else None,
            "in": col.isin(list(v)) if op == "in" else None,
        }[op]
        conj = expr if conj is None else conj & expr
    if residual_sql:
        r = F.expr(residual_sql)
        conj = r if conj is None else conj & r
    if conj is None:
        raise ValueError(
            "empty predicate: pass filters and/or residual_sql "
            "(a full-table delete is overwrite_all/expire territory, "
            "never an implicit default)"
        )
    return conj


def _read_candidates(
    table: IcepackTable,
    cand: list[FileEntry],
    deletes: list[FileEntry],
    schema,
    eq_cols: list[str],
) -> DataFrame:
    """Read exactly the candidate files, with pending merge-on-read deletes
    resolved: a CoW rewrite stamps a fresh (higher) data-sequence number, so
    an unresolved shadowed row would RESURRECT — same discipline as
    clustering/compaction."""
    if deletes:
        return table._scan_with_deletes(cand, deletes, schema, eq_cols)
    paths = [table.data_path(e.path) for e in cand]
    return table.spark.read.schema(schema).parquet(*paths)


def _describe_pred(filters: list[Filter], residual_sql: str | None) -> str:
    parts = [f"{c} {op} {v!r}" for c, op, v in filters or []]
    if residual_sql:
        parts.append(residual_sql)
    return " AND ".join(parts)


def delete_where(
    table: IcepackTable,
    filters: list[Filter] | None = None,
    residual_sql: str | None = None,
    num_files: int | None = None,
) -> dict:
    """``DELETE FROM table WHERE <pred>``: metadata-drop fully-matching
    files, rewrite partially-matching ones, one atomic commit.

    ``filters``: [(col, op, value)] — the prunable conjunction (same ops as
    ``scan``). ``residual_sql``: extra SQL predicate ANDed in row-level
    (disables metadata-only drops — arbitrary SQL can't be proven from
    stats). SQL null semantics: rows where the predicate is NULL survive.

    Returns a report dict; ``version`` is None when the delete provably
    matched nothing (no commit, staged bytes reclaimed)."""
    snap = table.snapshot()
    entries = table.files(snap.version)
    deletes = [e for e in entries if e.content == "eq_deletes"]
    data = [e for e in entries if e.content == "data"]
    filters = filters or []
    pred = _pred_column(filters, residual_sql)  # validates non-empty early

    cand = [
        e for e in data if all(e.may_match(c, op, v) for (c, op, v) in filters)
    ]
    droppable = (
        []
        if residual_sql
        else [
            e
            for e in cand
            if filters
            and all(e.must_match_all(c, op, v) for (c, op, v) in filters)
        ]
    )
    drop_paths = {e.path for e in droppable}
    rewrite = [e for e in cand if e.path not in drop_paths]

    added: list[FileEntry] = []
    rows_gross = sum(e.rows for e in rewrite)
    rows_kept = 0
    if rewrite:
        df = _read_candidates(
            table,
            rewrite,
            deletes,
            snap.schema,
            snap.summary.get("eq_delete_cols") or [],
        )
        kept_df = df.where(~F.coalesce(pred, F.lit(False)))
        # deletes only re-file rows the table already validated
        added = table.write_data_files(
            kept_df, num_files=num_files, enforce_constraints=False
        )
        rows_kept = sum(e.rows for e in added)

    # Provable no-op: nothing droppable, no pending MoR deletes muddying the
    # gross/kept arithmetic, and the rewrite kept every row — skip the commit
    # and reclaim the staged bytes instead of churning the manifest.
    if not droppable and not deletes and rows_kept == rows_gross:
        _reclaim_staged(table, added)
        return {
            "version": None,
            "rows_deleted": 0,
            "files_scanned": len(rewrite),
            "files_dropped_metadata_only": 0,
            "files_rewritten": 0,
            "files_pruned": len(data) - len(cand),
            "predicate": _describe_pred(filters, residual_sql),
        }

    version = table.commit(
        "delete",
        added=added,
        removed_paths=[e.path for e in droppable] + [e.path for e in rewrite],
        summary={
            "predicate": _describe_pred(filters, residual_sql),
            "files_dropped_metadata_only": len(droppable),
            "files_rewritten": len(rewrite),
        },
    )
    return {
        "version": version,
        # gross arithmetic: with pending MoR deletes resolved at read this
        # also counts previously-shadowed rows (they leave the manifest too)
        "rows_deleted": sum(e.rows for e in droppable) + rows_gross - rows_kept,
        "files_scanned": len(rewrite),
        "files_dropped_metadata_only": len(droppable),
        "files_rewritten": len(rewrite),
        "files_pruned": len(data) - len(cand),
        "predicate": _describe_pred(filters, residual_sql),
    }


def update_where(
    table: IcepackTable,
    assignments: dict[str, Any],
    filters: list[Filter] | None = None,
    residual_sql: str | None = None,
    num_files: int | None = None,
) -> dict:
    """``UPDATE table SET <assignments> WHERE <pred>``: rewrite only the
    files the predicate might touch.

    ``assignments``: {column: SQL expression string | Column}. Expressions
    see the pre-update row (standard UPDATE semantics — all assignments
    evaluate against the old values, so ``{"a": "b", "b": "a"}`` swaps).
    Assigned values are cast back to the column's declared type; CHECK
    constraints are enforced on the rewritten rows (an UPDATE can introduce
    violations, unlike DELETE). Updated-row count rides the write job via
    ``observe`` — no extra scan."""
    snap = table.snapshot()
    schema = snap.schema
    field_types = {f.name: f.dataType for f in schema.fields}
    bad = sorted(set(assignments) - set(field_types))
    if bad:
        raise ValueError(f"unknown column(s) in assignments: {bad}")
    entries = table.files(snap.version)
    deletes = [e for e in entries if e.content == "eq_deletes"]
    data = [e for e in entries if e.content == "data"]
    filters = filters or []
    pred = _pred_column(filters, residual_sql)

    cand = [
        e for e in data if all(e.may_match(c, op, v) for (c, op, v) in filters)
    ]
    report_base = {
        "files_pruned": len(data) - len(cand),
        "files_rewritten": len(cand),
        "predicate": _describe_pred(filters, residual_sql),
    }
    if not cand:
        return {"version": None, "rows_updated": 0, **report_base}

    df = _read_candidates(
        table, cand, deletes, schema, snap.summary.get("eq_delete_cols") or []
    )
    hit = F.coalesce(pred, F.lit(False))
    # all WHEN branches read OLD values: build every assignment against df's
    # columns before any withColumn rebinds them
    new_cols = {
        col: F.when(
            hit, F.expr(expr) if isinstance(expr, str) else expr
        )
        .otherwise(F.col(col))
        .cast(field_types[col])
        for col, expr in assignments.items()
    }
    from pyspark.sql import Observation

    obs = Observation()
    out = df.withColumns(new_cols).observe(
        obs, F.sum(hit.cast("long")).alias("rows_updated")
    )
    added = table.write_data_files(
        out, num_files=num_files, enforce_constraints=True
    )
    rows_updated = int(obs.get["rows_updated"] or 0)

    if rows_updated == 0 and not deletes:
        # provable no-op (the conservative manifest pruning over-selected):
        # reclaim staged bytes, leave the manifest alone
        _reclaim_staged(table, added)
        return {"version": None, "rows_updated": 0, **report_base,
                "files_rewritten": 0, "files_scanned": len(cand)}

    version = table.commit(
        "update",
        added=added,
        removed_paths=[e.path for e in cand],
        summary={
            "predicate": report_base["predicate"],
            "assignments": {k: str(v) for k, v in assignments.items()},
            "rows_updated": rows_updated,
            "files_rewritten": len(cand),
        },
    )
    return {"version": version, "rows_updated": rows_updated, **report_base}
