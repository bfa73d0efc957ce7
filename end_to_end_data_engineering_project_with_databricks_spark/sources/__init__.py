from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_multiline_json,
    register_views,
    table_path,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_multiline_json",
    "register_views",
    "table_path",
]
