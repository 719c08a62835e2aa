"""Reachability-based snapshot expiry over the manifest DAG.

Delta's VACUUM analogue, owned by this engine (north_rule: "reachability-
based snapshot expiry over the manifest DAG"). Walk
snapshot → manifest → data files for every *retained* snapshot; every data
file unreachable from any retained snapshot is deleted, along with the
expired snapshots' metadata files.

Retention is the snapshot-isolation guarantee: a reader pinned on any
retained snapshot keeps reading exactly its files (they are immutable and
reachable, hence never deleted). The walk is driver-side set arithmetic over
manifest entries — ~bytes per file; at 10^12-image scale with 512 MB files
this is still only millions of strings. A DataFrame anti-join variant would
drop in if manifests ever outgrow the driver.
"""

from __future__ import annotations

import errno
import json
import os
import time

from ..table.icepack import IcepackTable

__all__ = ["expire_snapshots", "remove_orphans"]


def _delete_files(root: str, rels: list[str]) -> tuple[int, list[str]]:
    """Unlink files under ``root``; opportunistically rmdir emptied parents.
    Returns (deleted_count, failures). A failed unlink is counted and
    reported, never silently swallowed — at fleet scale a permissions or
    stale-NFS error repeated across 10k files is a signal, not noise.
    rmdir is best-effort by design (ENOTEMPTY/ENOENT are the normal case:
    the dir still has live files, or a concurrent sweep got there first);
    any OTHER rmdir error is reported."""
    deleted, failures = 0, []
    for rel in rels:
        p = os.path.join(root, rel)
        try:
            os.unlink(p)
            deleted += 1
        except FileNotFoundError:
            pass  # concurrent expiry/orphan sweep already removed it
        except OSError as exc:
            failures.append(f"unlink {rel}: {exc}")
        try:
            os.rmdir(os.path.dirname(p))
        except OSError as exc:
            if exc.errno not in (errno.ENOTEMPTY, errno.ENOENT, errno.EEXIST):
                failures.append(f"rmdir {os.path.dirname(rel)}: {exc}")
    return deleted, failures


def expire_snapshots(
    table: IcepackTable,
    keep_last: int = 2,
    older_than_ms: int | None = None,
    dry_run: bool = False,
) -> dict:
    """Expire snapshots, keeping at least ``keep_last`` most recent plus any
    newer than ``older_than_ms``. Returns a report of what was removed."""
    snaps = table.snapshots()
    head = table.head_version()
    cutoff = older_than_ms if older_than_ms is not None else int(time.time() * 1000) + 1
    # Named refs pin their snapshots regardless of age: a branch mid-WAP or
    # a tag marking a training-run input must survive any retention policy
    # (Iceberg's retain-refs contract). Drop the ref to release them.
    refs = table.refs()
    pinned = set(refs["branches"].values()) | set(refs["tags"].values())

    retained, expired = [], []
    for s in snaps:
        keep = (
            s.version == head
            or s.version > head - keep_last
            or s.timestamp_ms >= cutoff
            or s.version in pinned
        )
        (retained if keep else expired).append(s)

    reachable: set[str] = set()
    for s in retained:
        for e in table.files(s.version):
            reachable.add(e.path)

    expired_files: set[str] = set()
    external_skipped: set[str] = set()
    for s in expired:
        for e in table.files(s.version):
            if e.path in reachable:
                continue
            # SHALLOW-CLONE safety: absolute paths reference ANOTHER table's
            # files (the clone source). This table's expiry must never
            # delete them — only the owning table's expiry may (the same
            # contract as Delta: VACUUM on a shallow clone leaves source
            # files alone). Dropping them from OUR manifests is enough.
            if os.path.isabs(e.path):
                external_skipped.add(e.path)
            else:
                expired_files.add(e.path)

    report = {
        "expired_snapshots": [s.version for s in expired],
        "retained_snapshots": [s.version for s in retained],
        "deleted_files": sorted(expired_files),
        "n_expired_snapshots": len(expired),
        "n_deleted_files": len(expired_files),
        "n_external_skipped": len(external_skipped),
        "dry_run": dry_run,
    }
    if dry_run:
        return report

    # COPY INTO exactly-once must survive retention: fold the expiring
    # snapshots' ledgers into metadata/copy-retained.json BEFORE their
    # summaries are unlinked (operators/copy_into.py). Only ledgers of
    # copy commits on a LIVE ref's ancestry fold — an orphaned branch's
    # copy (branch dropped, snapshots left behind) must not become a
    # permanent false "already loaded" for main.
    from .copy_into import retain_ledgers

    anc: set[int] = set()
    for root_v in [head, *refs["branches"].values(), *refs["tags"].values()]:
        v: int | None = root_v
        while v is not None and v not in anc:
            anc.add(v)
            try:
                v = table.snapshot(v).parent
            except FileNotFoundError:
                break
    retain_ledgers(
        table,
        [
            s.summary["copy_ledger"]
            for s in expired
            if s.operation == "copy-into"
            and s.version in anc
            and s.summary.get("copy_ledger")
        ],
    )
    n_deleted, failures = _delete_files(table.root, sorted(expired_files))
    for s in expired:
        for name in (f"snap-{s.version}.json", s.manifest):
            p = os.path.join(table.meta_dir, name)
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass
            except OSError as exc:
                failures.append(f"unlink metadata/{name}: {exc}")
    report["n_deleted_files"] = n_deleted
    report["n_delete_failures"] = len(failures)
    report["delete_failures"] = failures[:100]  # bounded for the audit log
    _audit(table, report)
    return report


def remove_orphans(
    table: IcepackTable,
    grace_seconds: float = 3 * 24 * 3600,
    dry_run: bool = False,
) -> dict:
    """Delete data files referenced by NO existing snapshot — the debris a
    crashed job leaves behind (staged-but-never-committed rewrites, killed
    ingest drains). Complements :func:`expire_snapshots`, which only removes
    files reachable from snapshots it expires; a file that never made it
    into a manifest is invisible to expiry and would leak forever.

    The ``grace_seconds`` mtime cutoff protects in-flight writers: a
    concurrent job's staging files are younger than the grace period, so
    they are never swept before their commit. The default is 3 DAYS —
    Iceberg's remove_orphan_files(older_than) default, chosen because a
    large maintenance job (e.g. a multi-bin compaction that commits once
    at the end) can legitimately hold staged-uncommitted files for hours;
    a short grace would sweep them mid-job and the eventual commit would
    reference deleted files. Driver-side set arithmetic over manifest
    entries + one directory walk."""
    walk_t0 = time.time()
    referenced: set[str] = set()
    for s in table.snapshots():
        for e in table.files(s.version):
            referenced.add(e.path)
    cutoff = time.time() - grace_seconds
    orphans: list[str] = []
    n_listed = 0
    data_root = os.path.join(table.root, "data")
    # The walk is a full driver-side listing of data/. Cost is one stat per
    # file: ~10k files/s on local disk, minutes per million objects on an
    # object store — run orphan sweeps at maintenance cadence (daily), not
    # per-commit. The listing never reads file contents, so cost scales
    # with file COUNT, which compaction itself keeps bounded.
    for dirpath, _dirs, names in os.walk(data_root):
        for n in names:
            n_listed += 1
            p = os.path.join(dirpath, n)
            rel = os.path.relpath(p, table.root)
            if rel in referenced:
                continue
            try:  # a concurrent writer/expiry may remove files mid-walk
                mtime = os.path.getmtime(p)
            except OSError:
                continue
            if mtime < cutoff:
                orphans.append(rel)
    report = {
        "orphans": sorted(orphans),
        "n_orphans": len(orphans),
        "n_files_listed": n_listed,
        "walk_seconds": round(time.time() - walk_t0, 3),
        "dry_run": dry_run,
    }
    if dry_run:
        return report
    n_deleted, failures = _delete_files(table.root, sorted(orphans))
    report["n_deleted_files"] = n_deleted
    report["n_delete_failures"] = len(failures)
    report["delete_failures"] = failures[:100]
    _audit(table, report)
    return report

def _audit(table: IcepackTable, report: dict) -> None:
    """Append a BOUNDED audit line (counts + first 100 paths) to
    metadata/expiry-log.jsonl — a 10k-orphan sweep must not write a
    megabyte JSON line. Not a table commit: HEAD is unchanged."""
    entry = {"ts_ms": int(time.time() * 1000)}
    for k, v in report.items():
        entry[k] = v[:100] if isinstance(v, list) else v
    with open(os.path.join(table.meta_dir, "expiry-log.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")
