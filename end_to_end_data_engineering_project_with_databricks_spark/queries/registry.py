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
    # ======== round-4 rotation (VERDICT r3 items 2+4) ========
    # r3 checked its entire 50-slot window, so every r3 slot that earned
    # a green row rotates out; 39 of the 50 slots below have NEVER had a
    # driver row.  The 11 non-fresh slots are pinned by policy: the 3
    # §2.1 anchors + q1 + pipeline_corpus_curation (asserted by
    # tests/test_driver_window.py), the two r3 REDS re-checked to prove
    # their oracle fixes green (VERDICT r3 item 1), and the remaining 4
    # family-minimum slots hold queries ADDED this round (themselves
    # never-checked), so 43/50 slots are fresh.
    # -- §2.1 reference parity anchors (never rotate out) --
    "ref_antijoin_incremental",
    "ref_nested_struct_flatten",
    "ref_multiline_json_pipeline",
    # -- TPC-H / relational / agg tier --
    "q1_pricing_summary",
    "agg_bitmap_exact_distinct",
    "agg_heavy_hitter_tokens",
    "agg_percentile_disc",
    "agg_histogram_width_bucket",
    # -- graph tier (zero driver rows ever before r4) --
    "graph_triangle_count",
    "graph_pagerank_fixed_point",
    # -- dedup ladder --
    "dedup_cross_source_leakage",  # new r4: cross-source leakage audit
    "dedup_cluster_canonical",
    "dedup_containment",
    "dedup_minhash_oph",
    "dedup_minhash_incremental",
    # -- similarity search --
    "sim_ivf_recall",  # new r4: hash-checkable ANN recall (VERDICT r3 stretch 7)
    "sim_rp_lsh_topk",
    "sim_ivf_kmeans_topk",
    # -- text analysis + quality + curation tier --
    "pipeline_corpus_curation",
    "text_repetition_filter",  # r3 RED (oracle HUGEINT) — re-prove green
    "text_bpe_pair_merges",
    "text_zipf_token_share",
    "text_bm25_search",
    "text_pmi_collocations",
    "text_chunk_dedup_rewrite",
    # -- sampling / packing / declarative-pipeline tier --
    "sample_per_group_cap",
    "sample_systematic",
    "sample_stratified_sources",
    "pipeline_pack_sequences",
    "pipeline_declarative_tables",
    "ids_sequential_assignment",
    # -- embedding hygiene --
    "emb_int8_quantization",
    "emb_minmax_scaling",
    # -- multimodal decode --
    "mm_wav_decode",
    "mm_bmp_decode",
    # -- events --
    "events_gap_detection",
    "events_funnel",
    # -- structured streaming (batch-oracle-checked) --
    "stream_matview_pipeline",
    "stream_multibatch_tumbling",
    # -- UDF / pandas / UDTF surface --
    "pandas_apply_minmax_norm",
    "pandas_rolling_minmax",  # new r4: ordered per-group rolling envelope
    "udtf_table_arg_user_stats",  # new r4: TABLE-argument UDTF surface
    # -- sources --
    "source_jsonlines_roundtrip",
    "source_python_datasource_stream",
    # -- sinks / versioned-table tier --
    "sink_dynamic_partition_overwrite",
    "sink_versioned_schema_evolution",
    # -- modern SQL surface --
    "sql_scalar_udf",
    "sql_identifier_clause",
    # -- scalar function packs --
    "map_functions",  # r3 RED (list-typed column) — re-prove green
    "higher_order_functions",
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
