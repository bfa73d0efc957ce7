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
    "end_to_end_data_engineering_project_with_databricks_spark.queries.llm_curation",
)

REGISTRY: dict[str, "QuerySpec"] = {}

#: The driver's CORRECTNESS gate oracle-checks only the FIRST 50 entries of
#: ``queries()`` (registration order == dict order).  These 50 slots are
#: therefore curated to sample EVERY SURVEY.md §2 family — reference-parity
#: (§2.1), each §2.2 capability category, and every LLM-data-pipeline
#: operator family — rather than letting module import order spend all 50
#: slots on TPC-H + relational queries (round-1 failure mode; VERDICT.md §
#: "Next round" item 1).  Everything NOT in this window still registers and
#: is still oracle-checked locally by tests/test_queries_vs_oracle.py.
_DRIVER_WINDOW: tuple[str, ...] = (
    # ======== round-8 rotation (VERDICT r7 item 1) ========
    # Consolidation round: the registry's §2 surface is complete and
    # 277/277 latest-green, so this window is almost entirely the
    # STANDING oldest-green-first re-attestation policy.  61 queries'
    # latest driver row dates from r1/r2 while ~10k LoC churned since;
    # this window re-attests the 30 r1 rows (all of them) plus 15 of
    # the 31 r2 rows, prioritizing families whose implementation files
    # churned most (dedup/sim/mm/text/source/sink/stream).  The 16
    # remaining r2 rows roll to the r9 window.  New r8 queries take
    # slots immediately per the standing rule, displacing the least-
    # churned r2 rows at the tail.  Families with no slot this round
    # are 100% driver-attested r1-r7 (family test enforces exactly
    # that).
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- LLM curation capstone (pinned) --
    "pipeline_corpus_curation",
    # -- oldest-first re-attestation: latest driver row = r1 --
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_linestatus",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "agg_having",
    "distinct_status_priority",
    "join_cross_region_segments",
    "join_left_semi_active_customers",
    "join_range_price_bands",
    "join_right_outer_part_lines",
    "scalar_subquery_above_avg",
    "set_except_nations",
    "set_intersect_nations",
    "window_lag_lead",
    "window_ntile_distribution",
    "window_rank_customers",
    "window_running_total",
    # -- oldest-first re-attestation: latest driver row = r2,
    #    highest-churn families first --
    "join_salted_skew",
    "dedup_exact_documents",
    "dedup_fingerprint_md5",
    "sim_threshold_pairs",
    "mm_decode_features",
    "mm_resize",
    "text_pii_redaction",
    "text_quality_gopher",
    "text_tfidf_distinctive_terms",
    "source_python_datasource",
    "sink_versioned_time_travel",
    "stream_dedup_keys",
    # -- r2 displacement buffer: swapped out one-for-one as new r8
    #    queries register (a new query takes a slot immediately) --
    # -- new in r8 (a new query takes a slot immediately) --
    "text_bpe_iterative",
    "text_quality_classifier",
    "sim_hnsw_search",
)


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
    """All registered queries, driver-window names first.

    Dict order is the driver's sampling order: the curated
    :data:`_DRIVER_WINDOW` occupies slots 1-50 so the correctness gate
    spans every §2 family; the remaining queries follow in module
    registration order (still locally oracle-checked)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
