"""Device serving layer: frozen snapshots, the batched QueryEngine, the
mesh engine's single-chip counterpart, and snapshot checkpointing."""

from .checkpoint import load_checkpoint, save_checkpoint, save_tables
from .query_engine import (
    HostTables,
    IndexSnapshot,
    QueryEngine,
    build_host_tables,
    build_snapshot_arrays,
    snapshot_index,
    snapshot_tables,
    upload_tables,
)

__all__ = [
    "HostTables",
    "IndexSnapshot",
    "QueryEngine",
    "build_host_tables",
    "build_snapshot_arrays",
    "snapshot_index",
    "snapshot_tables",
    "upload_tables",
    "save_checkpoint",
    "save_tables",
    "load_checkpoint",
]
