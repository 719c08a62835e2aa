from .icepack import ConflictError, FileEntry, IcepackTable, SchemaEvolutionError, Snapshot

__all__ = ["IcepackTable", "FileEntry", "Snapshot", "ConflictError", "SchemaEvolutionError"]
