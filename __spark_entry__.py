"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in the package's registry
(``end_to_end_data_engineering_project_with_databricks_spark.queries``);
each maps to an operator in SURVEY.md §2 (see the per-query docstrings for
reference file:line citations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from end_to_end_data_engineering_project_with_databricks_spark.queries import (
    oracle_sql_map,
    queries_map,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue-by-nation 6-table join+agg) on sf0.001."""
    return all_specs()["q5_revenue_by_nation"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted for genuinely
    non-SQL-expressible ops (LSH, streaming state) -> rows-only check."""
    return oracle_sql_map()
