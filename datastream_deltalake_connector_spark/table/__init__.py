from .icepack import ConflictError, FileEntry, IcepackTable, Snapshot

__all__ = ["IcepackTable", "FileEntry", "Snapshot", "ConflictError"]
