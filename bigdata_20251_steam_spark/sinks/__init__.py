from .storage import compact_table, retention_vacuum, write_partitioned

__all__ = ["compact_table", "retention_vacuum", "write_partitioned"]
