from .bucketing import bucketed_join, write_bucketed
from .storage import (
    compact_state_dir,
    compact_table,
    repair_state_dir,
    retention_vacuum,
    upsert_snapshot,
    write_clustered,
    write_partitioned,
)

__all__ = [
    "bucketed_join",
    "write_bucketed",
    "compact_state_dir",
    "compact_table",
    "repair_state_dir",
    "retention_vacuum",
    "upsert_snapshot",
    "write_clustered",
    "write_partitioned",
]
