"""Registry-WIDE structural plan scan: no query may silently degrade to
a cartesian / nested-loop join — the 100 TB scale cliff — unless it is
on the explicit allow-list of documented bounded cases.  Plan-only
(no execution) for most queries; the fit/apply queries run their
bounded fit actions at sf0.001 during construction.
"""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
    has_cartesian,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)

#: Documented bounded theta/cross nodes (each query's docstring carries
#: the justification):
#: - exact O(n^2) similarity baselines on predicate-bounded slices;
#: - broadcast crossJoin against a tiny literal spine/dim/centroid side
#:   (days spine, IVF/k-means centroid scoring, probe tables);
#: - scalar-subquery plans where Catalyst plans a 1-row BNLJ.
_ALLOWED_THETA = {
    # exact O(n^2) similarity baselines on predicate-bounded slices
    "sim_threshold_pairs",
    "sim_topk_bruteforce",
    "dedup_embedding_cosine",
    # IVF/RP centroid- or probe-scoring against a tiny broadcast table
    "sim_ivf_topk",
    # the self-sizing default path of the same operator: identical plan
    # class, centroid table bounded at clamp(isqrt(N)//4, 16, 65536)
    # rows (~sqrt of the corpus, broadcast by construction)
    "sim_ivf_auto_cells",
    # envelope-route attestation: the only theta node is the 1-row x
    # 1-row crossJoin of the routing-stats scalar with the ensemble
    # output summary scalar (the agg_cms_join_size class); the ensemble
    # pipeline underneath is all equi-joins
    "dedup_ensemble_envelope_route",
    # auto-strata attestation: same pattern — 1-row split-point bounds
    # crossJoined with the 1-row ensemble output summary
    "dedup_ensemble_auto_strata",
    "sim_ivf_kmeans_topk",
    "sim_ivf_recall",
    "sim_rp_lsh_topk",
    # recall/equivalence harnesses that compose brute_force_topk — the
    # broadcast-8-query bounded exact baseline (same class as
    # sim_topk_bruteforce; each docstring names the bounded side)
    "sim_rp_lsh_recall",
    "sim_ivf_kmeans_fullprobe",
    # PQ/ADC scorer: broadcast-8-query bounded cartesian over compressed
    # codes (same class as sim_topk_bruteforce; docstring names the
    # bounded side)
    "sim_pq_adc_topk",
    # k-NN graph: ivf_assign's broadcast crossJoin against the 16-row
    # centroid table (sim_ivf_topk class); the graph join itself is an
    # equi-join on cell_id
    "sim_knn_graph",
    # SemDeDup: the only theta node is ivf_assign's broadcast crossJoin
    # against the 16-row centroid table (sim_ivf_topk class); the pair
    # join is an equi-join on cell_id
    "dedup_semdedup_clustered",
    # IVF-PQ: candidate SCORING is an equi-join on cell_id (the
    # companion plan test pins that), but the amortized assignment pass
    # and the |Q| x n_cells probe are broadcast crossJoins against the
    # 16-row centroid table — the same bounded class as sim_ivf_topk
    "sim_ivfpq_topk",
    # retrieve-then-rerank: stage 1 IS ivfpq_topk (same adjudication);
    # stage 2 is broadcast equi-joins of the |Q| x k_cand candidate list
    "sim_ivfpq_rerank",
    # video keyframe ANN: the same ivfpq_topk composition over the FVC
    # frame-descriptor corpus — identical adjudication (assignment +
    # probe vs the 16-row centroid/codebook tables; scoring stays an
    # equi-join on cell_id)
    "mm_video_keyframe_ann",
    # HNSW-style greedy search: theta nodes are ivf_assign's 16-row
    # centroid crossJoin (sim_ivf_topk class), the 1-row entry-point
    # broadcast, and the per-hop <=16-row hub broadcast; edges and cell
    # members join by equi-key
    "sim_hnsw_search",
    # recall audit composing the HNSW pipeline above with the bounded
    # broadcast-8-query exact baseline (sim_topk_bruteforce class)
    "sim_hnsw_recall_audit",
    # broadcast crossJoin against a tiny literal spine/dim side
    "events_forward_fill",
    "events_linear_interpolation",
    "events_gap_detection",
    "events_cohort_retention",
    "audit_referential_integrity",
    # theta set-algebra: the only theta node is the 1-row x 1-row join
    # of the two per-status sketch scalars (plus 1-row scalar subqueries
    # for the union/intersection estimates); every data-sized relation
    # is a hash-agg, never a join side
    "agg_theta_sketch_setops",
    # KLL rollup: the only theta node is the 1-row x 1-row join of the
    # grouping-sets ALL anchor row with the merged-sketch scalar (the
    # constant equi-key folds away); every data-sized relation is the
    # single grouping-sets hash-agg, never a join side
    "agg_quantile_sketch",
    # CMS join-size estimate: the only theta node is the 1-row x 1-row
    # combine of the exact-join-count scalar with the min-inner-product
    # scalar (constant equi-key folds away); the data-sized relations
    # are two bounded d*w-counter hash-aggs equi-joined on (i, bkt)
    "agg_cms_join_size",
    # 1-row scalar broadcast (global totals / thresholds / dangling mass)
    "emb_minmax_scaling",
    "emb_int8_quantization",
    "sql_scalar_udf",
    "scalar_subquery_above_avg",
    "q11_important_parts",
    "q15_top_supplier",
    "q22_dormant_customers",
    "sample_language_temperature",
    "sample_stratified_sources",
    # 1-row scalar broadcast: DSIR's corpus-total crossJoin (the weight
    # table itself is 256 rows broadcast through an equi-join on b)
    "sample_dsir_importance",
    # 1-row scalar broadcast: drift totals over the 16-bucket histogram
    "profile_embedding_drift",
    "text_zipf_token_share",
    "text_bm25_search",
    "text_pmi_collocations",
    "profile_corpus_datasheet",
    "agg_heavy_hitter_tokens",
    "graph_pagerank_fixed_point",
    "graph_triangle_count",
    # the join matrix's explicit CROSS JOIN demonstration (bounded dims)
    "join_cross_region_segments",
    # documented broadcast-NL non-equi baseline (binned twin is the
    # scale path: join_range_binned)
    "join_range_price_bands",
}

_SPECS = all_specs()

#: queries whose construction runs streaming fixtures or heavy fit
#: actions — covered by their own tests; plan-scanning them here would
#: re-run minutes of setup for no additional signal
_SKIP_PREFIXES = ("stream_", "sink_", "source_", "matview_", "pipeline_", "ref_")


@pytest.mark.parametrize(
    "name",
    [n for n in sorted(_SPECS) if not n.startswith(_SKIP_PREFIXES)],
)
def test_no_silent_theta_join(name, spark, sf_dir):
    df = _SPECS[name].fn(spark, sf_dir)
    if name in _ALLOWED_THETA:
        return  # documented bounded case
    assert not has_cartesian(df), (
        f"{name} plans a CartesianProduct/BroadcastNestedLoopJoin — "
        "either fix the join shape or add it to _ALLOWED_THETA with a "
        "docstring justification"
    )


#: Unpartitioned (global ORDER BY) windows are the single-reducer scale
#: cliff; the two allowed cases run over BOUNDED inputs and say so in
#: their docstrings: text_zipf_token_share windows over the aggregated
#: vocabulary (not the corpus), window_ntile_distribution is the
#: documented report-sized-relation caveat demo.
#: dedup_ensemble_auto_strata windows over the per-doc SIZE HISTOGRAM
#: (one row per distinct shingle count — bounded by the max document
#: token count, metadata-sized at any corpus scale), never the corpus;
#: the running-sum-over-histogram is the equi-depth split-point
#: derivation itself (operators/dedup.strata_split_points).
_ALLOWED_GLOBAL_WINDOW = {
    "text_zipf_token_share",
    "window_ntile_distribution",
    "dedup_ensemble_auto_strata",
}


@pytest.mark.parametrize(
    "name",
    [n for n in sorted(_SPECS) if not n.startswith(_SKIP_PREFIXES)],
)
def test_no_silent_global_window(name, spark, sf_dir):
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        window_partition_spec_sizes,
    )

    if name in _ALLOWED_GLOBAL_WINDOW:
        return
    sizes = window_partition_spec_sizes(_SPECS[name].fn(spark, sf_dir))
    assert all(s >= 1 for s in sizes), (
        f"{name} plans an unpartitioned Window (single-reducer sort) — "
        "bound its input or add it to _ALLOWED_GLOBAL_WINDOW with a "
        "docstring justification"
    )
