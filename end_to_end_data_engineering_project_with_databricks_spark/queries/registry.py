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
    # ======== round-14 rotation (standing program; VERDICT r13
    # item 8) ========
    # Freshness program: after r13 the stale tail is the named 24-row
    # r7 backlog + 45 r8 rows.  This window re-attests the FULL 24-row
    # r7 backlog (named by the r13 registry comment and VERDICT r13
    # item 8) plus 21 of the 45 r8 rows, chosen round-robin across
    # families (alphabetically-first per family — registration-order
    # first for the numbered TPC-H family — then a second row from
    # each of the 7 largest families); with the 5 pinned anchors that
    # is the full 50.
    # Exact r15 rotation backlog (24 rows, latest driver row = r8):
    # q7_volume_shipping, q8_market_share, q9_product_profit,
    # q11_important_parts, q12_priority_linestatus,
    # q13_customer_distribution, q14_promo_revenue, q15_top_supplier,
    # q16_supplier_count, q17_small_quantity_revenue,
    # q18_large_volume_customers, q19_disjunctive_revenue,
    # q20_excess_suppliers, q21_waiting_suppliers,
    # q22_dormant_customers, join_range_price_bands,
    # join_right_outer_part_lines, join_salted_skew,
    # window_rank_customers, window_running_total, sim_threshold_pairs,
    # text_quality_gopher, text_tfidf_distinctive_terms,
    # text_quality_classifier — fill r15's free slots with these first,
    # then the oldest r9 rows.
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- LLM curation capstone (pinned) --
    "pipeline_corpus_curation",
    # -- oldest-first re-attestation: latest driver row = r7 (all 24,
    #    the full named backlog) --
    "agg_gini_concentration",
    "agg_mode_exact",
    "agg_rollup_year_status",
    "agg_segment_stats",
    "agg_trimmed_winsorized",
    "agg_weighted_median",
    "dedup_semdedup_clustered",
    "dedup_span_ngram",
    "events_cusum_alarms",
    "events_ema_exact",
    "events_ohlc_resample",
    "join_left_anti_customers_without_orders",
    "join_left_outer_nation_suppliers",
    "mm_jpeg_decode",
    "mm_video_frames",
    "mm_video_keyframe_ann",
    "pipeline_span_dedup_rewrite",
    "profile_source_overlap",
    "sample_train_val_test",
    "sim_ivfpq_topk",
    "sim_knn_graph",
    "sim_pq_adc_topk",
    "stream_cusum_alarms",
    "text_ngram_diversity",
    # -- latest driver row = r8: 21 of 45, round-robin one per family
    #    (alphabetically-first of agg/dedup/distinct/join/mm/tpch/
    #    scalar/set/sim/sink/source/stream/text/window = 14, then a
    #    second row from each of the 7 largest families); the 24
    #    deferred rows are the named r15 backlog above --
    "agg_having",
    "dedup_exact_documents",
    "dedup_fingerprint_md5",
    "distinct_status_priority",
    "join_cross_region_segments",
    "join_left_semi_active_customers",
    "mm_decode_features",
    "mm_resize",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "scalar_subquery_above_avg",
    "set_except_nations",
    "set_intersect_nations",
    "sim_hnsw_search",
    "sink_versioned_time_travel",
    "source_python_datasource",
    "stream_dedup_keys",
    "text_bpe_iterative",
    "text_pii_redaction",
    "window_lag_lead",
    "window_ntile_distribution",
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
