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
    # ======== round-10 rotation (VERDICT r9 item 2) ========
    # Freshness program: after r9 no driver row is older than r3
    # (17 r3 rows + 39 r4 rows remain stale).  This window re-attests
    # ALL 17 r3 rows plus the 21 highest-churn r4 rows (dedup/agg/text/
    # emb/events/graph/stream families — the modules r9-r10 touched
    # most); with the 5 pinned anchors and the 7 new r10
    # queries that is the full 50 (new queries take slots immediately
    # per the standing rule, displacing the r4 tail one-for-one).
    # Exact r11 rotation backlog (18 rows, latest driver row = r4):
    # higher_order_functions, ids_sequential_assignment, map_functions,
    # mm_bmp_decode, pandas_apply_minmax_norm, pandas_rolling_minmax,
    # pipeline_declarative_tables, pipeline_pack_sequences,
    # sample_per_group_cap, sample_stratified_sources,
    # sample_systematic, sink_dynamic_partition_overwrite,
    # sink_versioned_schema_evolution, source_jsonlines_roundtrip,
    # source_python_datasource_stream, sql_identifier_clause,
    # sql_scalar_udf, udtf_table_arg_user_stats — fill r11's free slots
    # with these first, then the oldest r5 rows.
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- LLM curation capstone (pinned) --
    "pipeline_corpus_curation",
    # -- oldest-first re-attestation: latest driver row = r3 (all 17) --
    "agg_exact_corr_regression",
    "emb_label_centroids",
    "events_asof_purchase_click",
    "events_forward_fill",
    "events_hierarchical_rollup",
    "events_sessionize",
    "events_sliding_windows",
    "events_tumbling_counts",
    "json_functions",
    "sink_versioned_vacuum_travel",
    "sink_versioned_zorder_skipping",
    "source_orc_roundtrip",
    "source_text_wordcount",
    "sql_lateral_topk_per_group",
    "sql_listagg_nations",
    "sql_variant_extraction",
    "udtf_parse_delimited_dynamic",
    # -- latest driver row = r4, highest-churn families first --
    "dedup_cluster_canonical",
    "dedup_containment",
    "dedup_cross_source_leakage",
    "agg_bitmap_exact_distinct",
    "agg_heavy_hitter_tokens",
    "agg_histogram_width_bucket",
    "agg_percentile_disc",
    "text_bm25_search",
    "text_bpe_pair_merges",
    "text_chunk_dedup_rewrite",
    "text_pmi_collocations",
    "text_repetition_filter",
    "text_zipf_token_share",
    "emb_int8_quantization",
    "emb_minmax_scaling",
    "events_funnel",
    "events_gap_detection",
    "graph_pagerank_fixed_point",
    "graph_triangle_count",
    "stream_matview_pipeline",
    "stream_multibatch_tumbling",
    # -- new in r10 (a new query takes a slot immediately, displacing
    #    the r4 tail one-for-one; displaced rows join the r11 backlog:
    #    source_jsonlines_roundtrip, source_python_datasource_stream
    #    moved there when the CMS pair landed,
    #    sink_versioned_schema_evolution when stream_cms_merge did,
    #    sink_dynamic_partition_overwrite when agg_topk_sketch did) --
    "agg_quantile_sketch",
    "dedup_minhash_ml",
    "agg_theta_sketch_setops",
    "agg_cms_frequency",
    "agg_cms_join_size",
    "stream_cms_merge",
    "agg_topk_sketch",
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
