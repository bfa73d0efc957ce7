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
    # ======== round-9 rotation (VERDICT r8 item 1) ========
    # Freshness-completion round: re-attest the 19 remaining r2-stale
    # rows (the full list VERDICT r8 item 1 names), then fill the
    # remaining slots oldest-r3-row-first, churn-prioritized (dedup/
    # sim/text/mm/stream modules churned most in r8-r9).  After this
    # round no registered query's latest driver row is older than r3.
    # New r9 queries take slots immediately per the standing rule,
    # displacing the least-churned r3 rows at the tail.  Families with
    # no slot (audit_/profile_, sample_) are 100% driver-attested
    # r4-r7 (family test enforces exactly that).
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- LLM curation capstone (pinned) --
    "pipeline_corpus_curation",
    # -- oldest-first re-attestation: latest driver row = r2 (all 19) --
    "agg_grouping_sets",
    "date_functions",
    "emb_norm_stats",
    "explode_tokens",
    "filter_predicates",
    "pandas_scalar_token_count",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q10_returned_items",
    "set_union_all_parties",
    "sink_partitioned_pruning",
    "sink_versioned_changes",
    "source_corrupt_records",
    "source_csv_roundtrip",
    "sql_recursive_date_spine",
    "string_functions",
    "topk_per_group",
    "window_range_frame",
    # -- oldest-first re-attestation: latest driver row = r3,
    #    highest-churn families first --
    "dedup_connected_components",
    "dedup_embedding_cosine",
    "dedup_entity_resolution_blocked",
    "text_decontaminate_ngram",
    "text_language_id",
    "text_token_stats",
    "sim_topk_bruteforce",
    "mm_ahash_neardup",
    "mm_binary_metadata",
    "mm_frame_sample",
    "pipeline_image_dedup",
    "stream_image_ingest",
    "stream_session_windows",
    "stream_stateful_user_counts",
    "stream_tumbling_counts",
    "source_versioned_stream",
    "matview_incremental_refresh",
    "sink_bucketed_join",
    "sink_merge_upsert",
    "emb_gram_matrix",
    # -- r3 displacement buffer: swapped out one-for-one as new r9
    #    queries register (a new query takes a slot immediately) --
    # -- new in r9 (a new query takes a slot immediately) --
    "sim_hnsw_recall_audit",
    "text_bpe_iterative_deep",
    "text_quality_classifier2",
    "stream_ann_refresh",
    "dedup_containment_lsh",
    "dedup_containment_ensemble",
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
