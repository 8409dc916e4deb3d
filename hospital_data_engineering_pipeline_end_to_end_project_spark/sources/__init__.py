from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import (
    TPCH_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_ndjson,
)
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.writers import (
    write_partitioned,
    write_table,
)

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_ndjson",
    "write_partitioned",
    "write_table",
]
