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
    # ======== round-11 rotation (VERDICT r10 item 1) ========
    # Freshness program: after r10 the stale tail is 18 r4 rows + 45 r5
    # rows.  This window re-attests the FULL 18-row r4 backlog (named by
    # the r10 registry comment and VERDICT r10 item 1) plus 25 of the 45
    # r5 rows, chosen round-robin across families so every query family
    # keeps a fresh external attestation; with the 5 pinned anchors and
    # the 2 new r11 queries that is the full 50 (a new query takes a
    # slot immediately per the standing rule — the second r11 query
    # displaced the 26th r5 row into the backlog below).
    # Exact r12 rotation backlog (20 rows, latest driver row = r5):
    # dedup_ngram_jaccard, dedup_oph_accuracy, dedup_simhash_accuracy,
    # emb_pca_quality, events_transition_matrix, join_point_in_time_scd2,
    # mm_wav_decode, pandas_grouped_agg_range, sim_ivf_recall,
    # sim_rp_lsh_recall, sink_versioned_history, source_xml_roundtrip,
    # sql_parameterized, stream_static_join, stream_stream_join,
    # stream_stream_left_join, text_bpe_apply, text_quality_scores,
    # text_rolling_fingerprint, window_percent_rank_cume_dist (displaced
    # when agg_cms_skew_routing landed) — fill r12's free slots with
    # these first, then the oldest r6 rows.
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- LLM curation capstone (pinned) --
    "pipeline_corpus_curation",
    # -- oldest-first re-attestation: latest driver row = r4 (all 18) --
    "higher_order_functions",
    "ids_sequential_assignment",
    "map_functions",
    "mm_bmp_decode",
    "pandas_apply_minmax_norm",
    "pandas_rolling_minmax",
    "pipeline_declarative_tables",
    "pipeline_pack_sequences",
    "sample_per_group_cap",
    "sample_stratified_sources",
    "sample_systematic",
    "sink_dynamic_partition_overwrite",
    "sink_versioned_schema_evolution",
    "source_jsonlines_roundtrip",
    "source_python_datasource_stream",
    "sql_identifier_clause",
    "sql_scalar_udf",
    "udtf_table_arg_user_stats",
    # -- latest driver row = r5: 25 of 45, round-robin one per family
    #    (second dedup row fills the last slot) so no family goes
    #    unattested this round; the 20 deferred rows are the named r12
    #    backlog above --
    "agg_modern_pack",
    "array_functions",
    "conditional_functions",
    "dedup_incremental_equivalence",
    "dedup_minhash_accuracy",
    "emb_pca_project",
    "events_linear_interpolation",
    "in_subquery_building_orders",
    "join_interval_overlap",
    "json_agg_stats",
    "math_functions",
    "mm_png_decode",
    "pandas_cogroup_asof",
    "pipeline_text_pretrain_shards",
    "pivot_nation_segments",
    "sim_ivf_kmeans_fullprobe",
    "sink_versioned_delete_compact",
    "source_file_metadata",
    "sql_lateral_column_alias",
    "stream_sliding_counts",
    "text_blocklist_filter",
    "try_functions",
    "udtf_char_ngrams",
    "union_by_name",
    "unpivot_lineitem_measures",
    # -- new in r11 (each takes a slot immediately per the standing
    #    rule; the slots came out of the r5 tier, whose deferred rows
    #    are the named r12 backlog — window_percent_rank_cume_dist was
    #    displaced when agg_cms_skew_routing landed) --
    "join_cms_adaptive_strategy",
    "agg_cms_skew_routing",
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
