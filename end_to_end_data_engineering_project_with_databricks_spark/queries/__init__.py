from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    REGISTRY,
    QuerySpec,
    all_specs,
    oracle_sql_map,
    queries_map,
    query,
)

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "all_specs",
    "oracle_sql_map",
    "queries_map",
    "query",
]
