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
    # ======== round-5 rotation (VERDICT r4 items 1+2+5+6) ========
    # Every r4 slot earned a green driver row, so all 43 non-pinned r4
    # slots rotate out; 39 of the 50 slots below have NEVER had a driver
    # row (including the 5 queries ADDED this round, all windowed
    # immediately per VERDICT r4 item 5).  The 11 pinned greens are the
    # 5 policy anchors (3 §2.1 refs + q1 + pipeline_corpus_curation)
    # plus 6 family-minimum slots whose families have no never-checked
    # members left (dedup 5th, sim 3rd, mm 2nd, the 3 pandas/udtf).
    # Backlog math: 75 never-checked (70 backlog + 5 new) - 39 fresh
    # = 36 after r5; r6's ~39 fresh slots absorb all of them.
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational flagship (pinned) --
    "q1_pricing_summary",
    # -- everyday relational surface (VERDICT r4 item 1b, all fresh) --
    "math_functions",
    "array_functions",
    "conditional_functions",
    "try_functions",
    "json_agg_stats",
    "pivot_nation_segments",
    "union_by_name",
    "unpivot_lineitem_measures",
    "in_subquery_building_orders",
    "window_percent_rank_cume_dist",
    "agg_modern_pack",
    # -- joins (fresh) --
    "join_interval_overlap",
    "join_point_in_time_scd2",
    # -- dedup ladder (4 fresh incl. the 2 new equivalence/accuracy
    #    twins; dedup_ngram_jaccard pinned for the family minimum) --
    "dedup_ngram_jaccard",
    "dedup_minhash_accuracy",
    "dedup_simhash_accuracy",
    "dedup_oph_accuracy",  # new r5: OPH bounded-check twin
    "dedup_incremental_equivalence",  # new r5: incremental==batch oracle
    # -- similarity search (2 new oracled faces; sim_ivf_recall pinned) --
    "sim_ivf_recall",
    "sim_rp_lsh_recall",  # new r5: full DuckDB LSH replay
    "sim_ivf_kmeans_fullprobe",  # new r5: trained-codebook equivalence
    # -- LLM curation capstone + text tier (fresh) --
    "pipeline_corpus_curation",
    "pipeline_text_pretrain_shards",
    "text_bpe_apply",
    "text_blocklist_filter",
    "text_quality_scores",
    "text_rolling_fingerprint",
    # -- embedding hygiene (fresh: PCA invariant pair) --
    "emb_pca_quality",
    "emb_pca_project",
    # -- multimodal decode (png fresh; wav pinned for family minimum) --
    "mm_wav_decode",
    "mm_png_decode",
    # -- events (fresh) --
    "events_linear_interpolation",
    "events_transition_matrix",
    # -- structured streaming joins (VERDICT r4 item 1c, all fresh) --
    "stream_sliding_counts",
    "stream_stream_join",
    "stream_static_join",
    "stream_stream_left_join",
    # -- UDF / pandas / UDTF surface (all driver-seen; family minimum) --
    "pandas_cogroup_asof",
    "pandas_grouped_agg_range",
    "udtf_char_ngrams",
    # -- sources (fresh) --
    "source_xml_roundtrip",
    "source_file_metadata",
    # -- sinks / versioned-table tier (fresh) --
    "sink_versioned_delete_compact",
    "sink_versioned_history",  # new r5: DESCRIBE HISTORY twin
    # -- modern SQL surface (fresh) --
    "sql_lateral_column_alias",
    "sql_parameterized",
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
