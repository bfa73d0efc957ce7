"""Physical-plan regression tests: the plans we reviewed and want KEPT.

Correctness tests can't catch a silently degraded plan (a lost pushdown
or broadcast still returns right answers, 100x slower at scale).  These
assert the load-bearing plan properties of the headline queries so a
refactor that regresses them fails fast.  Plan access goes through
plans/inspect.py.
"""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
    formatted_plan,
    has_cartesian,
    join_kinds,
    scans,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)


def _df(spark, sf_dir, name: str):
    return all_specs()[name].fn(spark, sf_dir)


def test_q6_filters_reach_parquet_scan(spark, sf_dir):
    [scan] = scans(_df(spark, sf_dir, "q6_forecast_revenue"))
    pushed = " ".join(scan.pushed_filters)
    # the shipdate range must be pushed, not evaluated post-scan only
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_shipdate" in pushed


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    df = _df(spark, sf_dir, "q5_revenue_by_nation")
    kinds = join_kinds(df)
    # supplier/nation/region are explicitly broadcast; AQE may also
    # broadcast orders/customer at fixture scale
    assert kinds.count("BroadcastHashJoin") >= 3
    assert not has_cartesian(df)


def test_q3_plans_top_k_not_global_sort(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "q3_shipping_priority"))
    assert "TakeOrderedAndProject" in plan, plan


def test_q1_aggregates_partially_map_side(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "q1_pricing_summary"))
    assert "partial_sum" in plan  # map-side combine before the exchange
    # the scaled-long path must survive: no decimal accumulator in the agg
    assert "as decimal(27,6)" not in plan


def test_q1_reads_only_needed_columns(spark, sf_dir):
    [scan] = scans(_df(spark, sf_dir, "q1_pricing_summary"))
    # 7 of lineitem's 11 columns are needed; the scan must not read more
    assert "l_quantity" in scan.read_columns
    assert "l_orderkey" not in scan.read_columns
    assert "l_partkey" not in scan.read_columns


def test_partitioned_sink_scan_prunes_partitions(spark, sf_dir):
    df = _df(spark, sf_dir, "sink_partitioned_pruning")
    pruned = [s for s in scans(df) if s.partition_filters]
    assert pruned, "status filter did not become a partition filter"
    assert any("o_orderstatus" in f for s in pruned for f in s.partition_filters)


#: dedup/similarity queries that are EXPLICITLY exact baselines — their
#: honest plan is a nested-loop/broadcast-NL join over a bounded input,
#: and they double as the recall oracles for the bucketed paths.
_EXACT_BASELINES = {"sim_threshold_pairs", "sim_topk_bruteforce"}


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_exact_documents",
        "dedup_fingerprint_md5",
        "dedup_embedding_cosine",
        "dedup_connected_components",
        "sim_rp_lsh_topk",
        "sim_threshold_pairs_lsh",
    ],
)
def test_candidate_joins_are_equi_not_cross(spark, sf_dir, name):
    """Every dedup/similarity query EXCEPT the explicit exact baselines
    must candidate-generate via equi-joins — a cartesian or nested-loop
    node means the operator silently degraded to all-pairs."""
    assert name not in _EXACT_BASELINES
    assert not has_cartesian(_df(spark, sf_dir, name)), (
        f"{name} degraded to a cross/NL join"
    )


def test_ivf_candidate_join_is_equi_centroid_scoring_is_bounded(spark, sf_dir):
    """IVF's corpus-meets-queries join must be a hash equi-join on
    cell_id.  The plan's nested-loop joins are the centroid-scoring
    passes — bounded O(n x n_cells) against a 16-row broadcast table,
    which IS the IVF assignment algorithm, not a degraded candidate
    join."""
    kinds = join_kinds(_df(spark, sf_dir, "sim_ivf_topk"))
    assert kinds.count("BroadcastHashJoin") + kinds.count("SortMergeJoin") + kinds.count(
        "ShuffledHashJoin"
    ) >= 1, kinds
    assert "CartesianProduct" not in kinds


@pytest.mark.parametrize(
    "name",
    ["sim_ivf_topk", "sim_rp_lsh_topk", "sim_topk_bruteforce", "dedup_embedding_cosine"],
)
def test_similarity_windows_are_all_partitioned(spark, sf_dir, name):
    """Every Window in the similarity plans must carry a partition spec
    (per-query / per-vector): an unpartitioned window (the old IVF
    centroid seeding) funnels the whole corpus through one reducer."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        window_partition_spec_sizes,
    )

    sizes = window_partition_spec_sizes(_df(spark, sf_dir, name))
    assert all(s >= 1 for s in sizes), (name, sizes)


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_revenue_by_nation", "q10_returned_items"],
)
def test_tpch_dimension_joins_stay_broadcast(spark, sf_dir, name):
    """TPC-H headliners must broadcast their dimension sides — a lost
    broadcast silently becomes a full shuffle join of the fact table."""
    df = _df(spark, sf_dir, name)
    kinds = join_kinds(df)
    assert kinds.count("BroadcastHashJoin") >= 1, (name, kinds)
    assert not has_cartesian(df)


def test_q9_broadcasts_dims_and_shuffles_only_the_fact_join(spark, sf_dir):
    df = _df(spark, sf_dir, "q9_product_profit")
    kinds = join_kinds(df)
    # part/supplier/nation broadcast; lineitem-orders is the one
    # permitted non-broadcast (big-big) join
    assert kinds.count("BroadcastHashJoin") >= 3
    assert not has_cartesian(df)


def test_q2_decorrelates_min_subquery_into_one_fact_shuffle(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "q2_min_cost_supplier"))
    # the correlated MIN must be a window over the derived relation,
    # not a re-executed subquery join against lineitem
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan  # LIMIT 100 not a global sort


def test_q16_not_in_compiles_to_anti_join(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "q16_supplier_count"))
    assert "LeftAnti" in plan, plan


def test_lateral_topk_decorrelates_no_cartesian(spark, sf_dir):
    df = _df(spark, sf_dir, "sql_lateral_topk_per_group")
    # Catalyst must decorrelate the LATERAL into joins, not per-row
    # re-execution or a cartesian domain join
    assert not has_cartesian(df)


def test_minhash_verify_reads_only_candidate_docs(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "dedup_minhash_lsh"))
    # the semi-filter before Jaccard verification must survive: without
    # it the whole corpus is re-shingled twice
    assert "LeftSemi" in plan, plan


def test_hll_sketch_estimates_within_error_bound(spark, sf_dir):
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    rows = {
        r.o_orderpriority: (r.exact_customers, r.approx_ok)
        for r in _df(spark, sf_dir, "agg_hll_sketch_union").collect()
    }
    o = load_table(spark, sf_dir, "orders")
    import pyspark.sql.functions as F

    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert {k: v[0] for k, v in rows.items()} == exact
    # the bounded check now travels IN the query output (hash-checked by
    # the oracle); assert it holds here too
    assert all(ok for _, ok in rows.values()), rows


def test_approx_percentile_close_to_exact(spark, sf_dir):
    rows = {
        r.o_orderstatus: r
        for r in _df(spark, sf_dir, "agg_approx_percentile").collect()
    }
    exact = {
        r.o_orderstatus: (r.p25, r.p50, r.p90)
        for r in _df(spark, sf_dir, "agg_percentile_disc").collect()
    }
    assert set(rows) == set(exact)
    for status, r in rows.items():
        # the exact discrete values must agree with agg_percentile_disc
        assert (r.p25_disc, r.p50_disc, r.p90_disc) == exact[status]
        # and the in-query sketch bounds checks must hold
        assert r.p25_ok and r.p50_ok and r.p90_ok, r


def test_containment_candidates_are_equi_not_cross(spark, sf_dir):
    df = _df(spark, sf_dir, "dedup_containment")
    assert not has_cartesian(df)
    # the shingle join is the candidate generator: an equi SMJ/SHJ on the
    # shingle key, plus a (broadcastable) denominator join
    kinds = join_kinds(df)
    assert any(k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin") for k in kinds)


def test_pack_sequences_single_exchange_on_shard(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "pipeline_pack_sequences"))
    # the per-shard window and the final per-(shard, seq) agg must share
    # the shard-hash partitioning: one shuffle total, not one per step
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_zipf_window_runs_on_vocabulary_not_corpus(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "text_zipf_token_share"))
    # the token aggregate must be partial (map-side combine on the corpus)
    # BEFORE the global-order window sees only the vocabulary
    assert "partial_count" in plan
    assert "Window" in plan


def test_cluster_canonical_no_cartesian(spark, sf_dir):
    df = _df(spark, sf_dir, "dedup_cluster_canonical")
    assert not has_cartesian(df)


def test_bm25_topk_is_take_ordered_and_broadcasts_stats(spark, sf_dir):
    df = _df(spark, sf_dir, "text_bm25_search")
    plan = formatted_plan(df)
    # global top-20 must be a per-partition heap, not a full sort
    assert "TakeOrderedAndProject" in plan
    # df (3 rows) and corpus stats (1 row) joins stay broadcast
    assert join_kinds(df).count("BroadcastHashJoin") >= 2


def test_pmi_support_filter_precedes_unigram_joins(spark, sf_dir):
    df = _df(spark, sf_dir, "text_pmi_collocations")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    # the c_xy >= 5 cut must run inside the bigram aggregate's stage,
    # before the unigram-count joins (support filter on the agg output)
    assert "(c_xy#" in plan or "c_xy >= 5" in plan.replace("L", "")


def test_profile_scans_lineitem_once(spark, sf_dir):
    df = _df(spark, sf_dir, "profile_numeric_columns")
    # one unpivot pass == exactly one lineitem scan feeding an Expand
    assert len(scans(df)) == 1
    assert "Expand" in formatted_plan(df)


def test_entity_resolution_is_equi_not_cross(spark, sf_dir):
    df = _df(spark, sf_dir, "dedup_entity_resolution_blocked")
    assert not has_cartesian(df)


def test_triangle_and_pagerank_joins_are_equi(spark, sf_dir):
    for name in ("graph_triangle_count", "graph_pagerank_fixed_point"):
        df = _df(spark, sf_dir, name)
        kinds = join_kinds(df)
        # the 1-row stats crossJoin is the only allowed non-equi join
        assert kinds.count("CartesianProduct") == 0, (name, kinds)


def test_bpe_pair_merges_plans_topk_with_partial_agg(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "text_bpe_pair_merges"))
    assert "TakeOrderedAndProject" in plan  # top-20, never a full sort
    assert "partial_count" in plan  # map-side combine before the exchange


def test_gram_matrix_aggregates_partially_map_side(spark, sf_dir):
    # the n*d^2/2 generated rows must partial-aggregate before shuffling:
    # the exchange carries at most d*(d+1)/2 rows per task
    plan = formatted_plan(_df(spark, sf_dir, "emb_gram_matrix"))
    assert "partial_sum" in plan
    assert "Generate" in plan


def test_ahash_neardup_is_banded_equi_join(spark, sf_dir):
    df = _df(spark, sf_dir, "mm_ahash_neardup")
    assert not has_cartesian(df)  # banding, never an all-pairs image join
    assert "SortMergeJoin" in join_kinds(df) or "BroadcastHashJoin" in join_kinds(df)


def test_chunk_dedup_rewrite_joins_on_keys(spark, sf_dir):
    df = _df(spark, sf_dir, "text_chunk_dedup_rewrite")
    assert not has_cartesian(df)


def test_sql_scalar_udf_inlines_into_codegen(spark, sf_dir):
    # the SQL UDF must dissolve into the plan: no python runner, no
    # black-box eval node
    plan = formatted_plan(_df(spark, sf_dir, "sql_scalar_udf"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan


def test_bloom_prefilter_broadcasts_and_never_misses(spark, sf_dir):
    df = _df(spark, sf_dir, "join_bloom_prefilter")
    kinds = join_kinds(df)
    # the k position sets and the member set must broadcast (bounded
    # <= 4096 rows each no matter how large the build side)
    assert kinds.count("BroadcastHashJoin") >= 4
    assert not has_cartesian(df)
    for r in df.collect():
        # one-sided error: the bloom pass can only over-approximate
        assert r["n_pass_bloom"] >= r["n_actual"]
        assert r["n_orders"] >= r["n_pass_bloom"]


def test_interval_overlap_is_equi_not_theta(spark, sf_dir):
    """The interval-overlap join must plan as a binned equi-join — a
    theta/nested-loop node would be the 100 TB scale-killer."""
    df = _df(spark, sf_dir, "join_interval_overlap")
    assert not has_cartesian(df)
    kinds = join_kinds(df)
    assert any(
        k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        for k in kinds
    ), kinds


def test_weighted_systematic_has_no_global_window(spark, sf_dir):
    """The PPS sample's global cumsum must come from the two-pass
    prefix-sum operator — a Window with an empty partition spec would be
    the single-reducer scale cliff the operator exists to avoid."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        window_partition_spec_sizes,
    )

    df = _df(spark, sf_dir, "sample_weighted_systematic")
    assert all(s >= 1 for s in window_partition_spec_sizes(df))
    assert df.count() == 100  # exactly k boundaries crossed


def test_referential_audit_uses_anti_joins(spark, sf_dir):
    plan = formatted_plan(_df(spark, sf_dir, "audit_referential_integrity"))
    assert "LeftAnti" in plan, plan


def test_null_safe_join_is_hash_not_nested_loop(spark, sf_dir):
    df = _df(spark, sf_dir, "join_null_safe_dim")
    kinds = join_kinds(df)
    assert "BroadcastHashJoin" in kinds, kinds
    assert not has_cartesian(df)


def test_ohlc_resample_single_exchange(spark, sf_dir):
    """events_ohlc_resample: the two rank windows and the final
    aggregate all key on (bar_start_sec, event_type), so the WHOLE bar
    pipeline must ride ONE shuffle — a second Exchange between the
    windows and the aggregate would mean the partitioning reuse
    regressed (the load-bearing claim in the query docstring and
    docs/SCALE.md)."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "events_ohlc_resample")
    assert shuffle_count(df) == 1, formatted_plan(df)
    plan = formatted_plan(df)
    assert "partial" in plan  # map-side combine before the final agg


def test_key_skew_profile_two_level_aggregate(spark, sf_dir):
    """profile_key_skew: first aggregate must combine map-side on the
    join key (that shuffle IS the diagnostic's cost model) and the band
    rollup must run over key-cardinality-sized input — two exchanges
    total, no joins, no windows."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "profile_key_skew")
    assert shuffle_count(df) == 2, formatted_plan(df)
    assert join_kinds(df) == []
    assert "partial_count" in formatted_plan(df)


def test_audio_energy_is_single_arrow_pass(spark, sf_dir):
    """mm_audio_energy_windows: synthesis and windowed-energy decode
    must FUSE into narrow Arrow stages with zero shuffles — a shuffle
    between synthesis and decode would ship raw payload bytes across
    the cluster for no reason."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "mm_audio_energy_windows")
    assert shuffle_count(df) == 0, formatted_plan(df)
    assert not has_cartesian(df)


def test_source_overlap_single_corpus_shuffle(spark, sf_dir):
    """profile_source_overlap's only CORPUS-sized shuffle is the
    (source, bucket) sketch aggregation; the remaining two exchanges
    (the bucket self-join + the pair rollup) operate on the
    n_sources x 64 sketch table.  Pin the total so a rewrite cannot
    silently add a corpus-wide shuffle."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        formatted_plan,
        shuffle_count,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.queries.dedup import (
        profile_source_overlap,
    )

    df = profile_source_overlap(spark, sf_dir)
    assert shuffle_count(df) == 3, formatted_plan(df)


def test_trimmed_winsorized_single_exchange(spark, sf_dir):
    """agg_trimmed_winsorized: the rank window, the count window, and
    the finishing aggregate all key on o_orderpriority — the whole
    robust-stats pipeline must ride ONE shuffle (the docstring's
    load-bearing claim; a second Exchange means the shared partition
    spec regressed)."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "agg_trimmed_winsorized")
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_weighted_median_single_exchange(spark, sf_dir):
    """agg_weighted_median: same contract — cumulative-weight window,
    total-weight window, and final aggregate share the l_returnflag
    partitioning; exactly one Exchange."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "agg_weighted_median")
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_cusum_single_exchange_no_float_to_python(spark, sf_dir):
    """events_cusum_alarms: one shuffle (the user_id group exchange —
    identical to what a SQL window would need) and the cents
    quantization must happen JVM-side: the Arrow boundary ships v_fp
    longs, never the raw double."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "events_cusum_alarms")
    assert shuffle_count(df) == 1, formatted_plan(df)
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "v_fp" in plan  # the long column crosses into Python, not value


def test_knn_graph_is_single_cell_collect_plus_arrow_scorer(spark, sf_dir):
    """sim_knn_graph (r14 shape): two Exchanges total — ivf_assign's
    per-vector argmax aggregate and the groupBy(cell_id) member collect
    — feeding ONE MapInPandas scorer.  The old cell_id self-join, the
    per-pair interpreted cosine folds, and the K²-row rank window are
    gone: no Window/WindowGroupLimit node and no join between
    corpus-sized relations may reappear (the centroid crossJoin is the
    allow-listed 16-row broadcast)."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "sim_knn_graph")
    plan = formatted_plan(df)
    assert shuffle_count(df) == 2, plan
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_dsir_scoring_is_single_visible_shuffle_with_topk(spark, sf_dir):
    """sample_dsir_importance: after the two materialization barriers
    (doc-bucket counts; the 256-row weight table) the LIVE plan is the
    scoring join + per-doc aggregate — one Exchange — finished by
    TakeOrderedAndProject (per-partition heads), never a global sort."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "sample_dsir_importance")
    assert shuffle_count(df) == 1, formatted_plan(df)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_ngram_diversity_aggregates_partially_map_side(spark, sf_dir):
    """text_ngram_diversity: both gram pipelines must combine map-side
    on (source, gram) — the shuffle carries vocabulary partials, not
    token streams — and the source-level join must broadcast."""
    df = _df(spark, sf_dir, "text_ngram_diversity")
    plan = formatted_plan(df)
    assert "partial_count" in plan or "partial" in plan
    assert "BroadcastHashJoin" in plan, plan


def test_embedding_drift_is_two_tiny_aggregates(spark, sf_dir):
    """profile_embedding_drift: one corpus map + 16-group aggregate,
    one 1-row totals aggregate — two Exchanges, nothing else; the
    projection fold must stay a JVM higher-order function (no Python
    boundary in the plan)."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "profile_embedding_drift")
    assert shuffle_count(df) == 2, formatted_plan(df)
    plan = formatted_plan(df)
    assert "Pandas" not in plan and "PythonUDF" not in plan


def test_gini_single_exchange(spark, sf_dir):
    """agg_gini_concentration: the rank window and the finishing
    aggregate share the group partition spec — one Exchange, same
    contract as the other robust aggregates."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        shuffle_count,
    )

    df = _df(spark, sf_dir, "agg_gini_concentration")
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_aqe_skew_join_split_fires(spark):
    """AQE skew-join activation proof (VERDICT r7 item 4): on a
    deliberately hot-keyed shuffle join, the POST-EXECUTION plan must
    show the runtime split — ``SortMergeJoin(skew=true)`` over an
    ``AQEShuffleRead ... skewed`` — and the split join's results must be
    IDENTICAL to the salted-join rewrite of the same join (the two skew
    defenses the repo ships: AQE splits the hot partition after the
    fact, operators/scaling.salted_join prevents it from forming).

    Thresholds are lowered to make fixture-scale partitions legible to
    the skew detector; the session defaults (session.py) keep the same
    switches on at production sizes."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.operators.scaling import (
        salted_join,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        final_adaptive_plan,
    )

    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        n = 200_000
        # 90% of the fact rows land on key 0 — one melting reducer
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.rpad(F.col("id").cast("string"), 64, "x").alias("payload"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k").select("k", "w", "payload")
        rows = joined.collect()
        plan = final_adaptive_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # the AQEShuffleRead split marker

        # semantic parity: the salted rewrite returns the exact same rows
        salted = salted_join(
            fact, dim.withColumnRenamed("k", "dk"), "k", "dk", salt_buckets=8
        ).select("k", "w", "payload")
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, rows))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
