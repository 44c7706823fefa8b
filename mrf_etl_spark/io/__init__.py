from mrf_etl_spark.io.readers import (
    conform,
    read_code_list,
    read_excel_sheets,
    read_parquet_tolerant,
    read_sqlite,
)
from mrf_etl_spark.io.writers import (
    TableLockTimeout,
    atomic_overwrite,
    append_unique,
    upsert_by_key,
    latest_merge,
    scd2_history,
    table_lock,
    write_partitioned,
    write_bucketed_table,
    zorder_key,
    zorder_layout_write,
)

__all__ = [
    "conform",
    "read_parquet_tolerant",
    "read_code_list",
    "read_excel_sheets",
    "read_sqlite",
    "atomic_overwrite",
    "table_lock",
    "TableLockTimeout",
    "append_unique",
    "upsert_by_key",
    "latest_merge",
    "scd2_history",
    "write_partitioned",
    "write_bucketed_table",
    "zorder_key",
    "zorder_layout_write",
]
