from .writers import (
    insert_overwrite_parquet,
    write_bucketed_table,
    write_partitioned_parquet,
)

__all__ = [
    "insert_overwrite_parquet",
    "write_bucketed_table",
    "write_partitioned_parquet",
]
