"""Named-query registry backing the driver contract (``__spark_entry__.py``).

Every operator claimed in SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
Queries without oracle SQL get the driver's weaker rows-only check —
reserved for genuinely approximate / stateful operators (LSH, streaming).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Modules that define queries; imported lazily by :func:`all_specs`.
_QUERY_MODULES = (
    "end_to_end_data_engineering_project_with_databricks_spark.queries.tpch",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.tpch_extended",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.relational",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.relational_extra",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.scalar_functions",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.reference_parity",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.dedup",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.similarity",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.text_analysis",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.multimodal",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.events_analytics",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.streaming_queries",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.pandas_queries",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.sources_sinks",
    "end_to_end_data_engineering_project_with_databricks_spark.queries.modern_sql",
)

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: queries heavy enough to be bench headliners
    bench: bool = False


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query with its (optional) DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags, bench=bench
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
