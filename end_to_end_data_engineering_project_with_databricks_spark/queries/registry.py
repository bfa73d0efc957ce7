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
    # ======== round-7 rotation (VERDICT r6 items 1-3) ========
    # The r6 window closed the attestation backlog to zero and ended the
    # registry freeze.  This round: (a) the 8 queries staged under the
    # freeze register and take immediate slots (VERDICT r6 item 1 —
    # span dedup, PPJoin, PQ/ADC, IVF-PQ, JPEG, permissive decode,
    # video frames, bigram LM); (b) sim_ivf_kmeans_topk re-windows with
    # its NEW full replay oracle (fixed-point Lloyd codebook — VERDICT
    # r6 item 2 retires the last rows-only row); (c) the seven queries
    # ADDED in r7 (OHLC resample, key-skew diagnostic, SQL scripting,
    # audio energy windows, the audio-curation capstone, SemDeDup,
    # as-of-with-tolerance, the span-dedup-rewrite + video-ANN
    # capstones, rerank, source-overlap, streaming ANN, DSIR
    # importance selection, trimmed/winsorized agg, n-gram diversity,
    # embedding drift, CUSUM alarms batch + streaming, weighted median,
    # the k-NN graph)
    # take slots immediately per the standing
    # rule; (d) the remaining slots
    # begin the STANDING
    # oldest-green-first re-attestation policy (VERDICT r6 item 3):
    # every slot below the staged tier is a query whose latest driver
    # row is r1 — the oldest record in the registry — so no query's
    # attestation ages past a handful of rounds.  Families with no
    # slot this round are 100% driver-attested r1-r6 (family test
    # enforces exactly that).
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- LLM curation capstone (pinned) --
    "pipeline_corpus_curation",
    # -- r6-staged tier: first driver attestation (VERDICT r6 item 1) --
    "dedup_span_ngram",
    "dedup_jaccard_prefix",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "text_bigram_lm_score",
    "mm_jpeg_decode",
    "mm_decode_permissive",
    "mm_video_frames",
    # -- new in r7 (a new query takes a slot immediately) --
    "events_ohlc_resample",
    "profile_key_skew",
    "sql_scripting",
    "mm_audio_energy_windows",
    "pipeline_audio_curation",
    "dedup_semdedup_clustered",
    "events_asof_tolerance",
    "pipeline_span_dedup_rewrite",
    "mm_video_keyframe_ann",
    "sim_ivfpq_rerank",
    "profile_source_overlap",
    "stream_ann_lookup",
    "sample_dsir_importance",
    "agg_trimmed_winsorized",
    "text_ngram_diversity",
    "profile_embedding_drift",
    "events_cusum_alarms",
    "agg_weighted_median",
    "sim_knn_graph",
    "stream_cusum_alarms",
    "pipeline_dsir_mix",
    "sample_train_val_test",
    "agg_mode_exact",
    "events_asof_nearest",
    "agg_gini_concentration",
    "events_ema_exact",
    "dedup_lsh_recall_audit",
    # -- last rows-only row retired: full fixed-point-Lloyd replay
    #    oracle (VERDICT r6 item 2) --
    "sim_ivf_kmeans_topk",
    # -- oldest-first re-attestation (latest driver row = r1) --
    "agg_count_distinct",
    "agg_cube_flags",
    "agg_rollup_year_status",
    "agg_segment_stats",
    "global_topk_orders",
    "join_full_outer_nation_presence",
    "join_inner_brand_volume",
    "join_left_anti_customers_without_orders",
    "join_left_outer_nation_suppliers",
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
