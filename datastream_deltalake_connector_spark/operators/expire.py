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

import json
import os
import time

from ..table.icepack import IcepackTable

__all__ = ["expire_snapshots", "remove_orphans"]


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

    retained, expired = [], []
    for s in snaps:
        keep = (
            s.version == head
            or s.version > head - keep_last
            or s.timestamp_ms >= cutoff
        )
        (retained if keep else expired).append(s)

    reachable: set[str] = set()
    for s in retained:
        for e in table.files(s.version):
            reachable.add(e.path)

    expired_files: set[str] = set()
    for s in expired:
        for e in table.files(s.version):
            if e.path not in reachable:
                expired_files.add(e.path)

    report = {
        "expired_snapshots": [s.version for s in expired],
        "retained_snapshots": [s.version for s in retained],
        "deleted_files": sorted(expired_files),
        "dry_run": dry_run,
    }
    if dry_run:
        return report

    for rel in expired_files:
        p = os.path.join(table.root, rel)
        if os.path.exists(p):
            os.unlink(p)
        parent = os.path.dirname(p)
        try:  # opportunistic cleanup of emptied staging dirs
            os.rmdir(parent)
        except OSError:
            pass
    for s in expired:
        for name in (f"snap-{s.version}.json", s.manifest):
            p = os.path.join(table.meta_dir, name)
            if os.path.exists(p):
                os.unlink(p)
    # Journal the expiry itself for audit (not a table commit: HEAD unchanged).
    audit = os.path.join(table.meta_dir, "expiry-log.jsonl")
    with open(audit, "a") as f:
        f.write(json.dumps({"ts_ms": int(time.time() * 1000), **report}) + "\n")
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
    referenced: set[str] = set()
    for s in table.snapshots():
        for e in table.files(s.version):
            referenced.add(e.path)
    cutoff = time.time() - grace_seconds
    orphans: list[str] = []
    data_root = os.path.join(table.root, "data")
    for dirpath, _dirs, names in os.walk(data_root):
        for n in names:
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
    report = {"orphans": sorted(orphans), "dry_run": dry_run}
    if dry_run:
        return report
    for rel in orphans:
        p = os.path.join(table.root, rel)
        if os.path.exists(p):
            os.unlink(p)
        try:  # opportunistic cleanup of emptied staging dirs
            os.rmdir(os.path.dirname(p))
        except OSError:
            pass
    audit = os.path.join(table.meta_dir, "expiry-log.jsonl")
    with open(audit, "a") as f:
        f.write(json.dumps({"ts_ms": int(time.time() * 1000), **report}) + "\n")
    return report
