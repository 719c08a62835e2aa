from .icepack import (
    ConflictError,
    ConstraintViolation,
    FileEntry,
    IcepackTable,
    SchemaEvolutionError,
    Snapshot,
)

__all__ = [
    "IcepackTable",
    "FileEntry",
    "Snapshot",
    "ConflictError",
    "ConstraintViolation",
    "SchemaEvolutionError",
]
