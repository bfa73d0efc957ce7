"""Empirical sub-quadratic-growth guards (VERDICT r7 item 2).

Through round 7 the 100 TB argument for the candidate-bounded operators
was plan-shape only (no cartesian nodes, equi-join candidate keys).
These tests MEASURE the growth order: replicate the fixture corpus
k-fold with linearly-growing duplicate structure
(operators/scale_audit.py — replicas share only hub-token grams /
decorrelated shifted vectors, so truth pairs grow exactly k-fold) and
assert the candidate volume each operator would verify grows
~linearly, not quadratically, in corpus size.

The fixed-knob contrast test pins the OTHER side: with n_cells frozen
while the corpus grows, IVF within-cell pairs MUST grow ~quadratically
— proving the replication scheme is capable of exposing quadratic
blowup, i.e. the linear curves above are the algorithms' doing (the
scaled knob), not an artifact of the synthetic corpus."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.operators.scale_audit import (
    growth_exponent,
    ivf_growth_stats,
    lsh_growth_stats,
    ppjoin_growth_stats,
    replicate_documents,
    replicate_embeddings,
)

KS = (1, 4, 16)
#: the trained-Lloyd (SemDeDup) and assignment-heavy k-NN paths cap at
#: 8x — the O(sample x cells) fit cost grows with k^2 and k=16 alone
#: cost ~100 s of suite time for no extra signal (8x already separates
#: linear from quadratic by 8x)
KS_EMB = (1, 4, 8)

#: measured exponents at sf0.001 and sf0.01 land at 0.99-1.01 for every
#: scaled-knob operator; 1.35 leaves noise margin while still rejecting
#: anything approaching O(N^1.5)
SUBQUADRATIC_BOUND = 1.35


@pytest.fixture(scope="module")
def doc_replicas(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return {
        k: replicate_documents(docs, k).localCheckpoint(eager=True) for k in KS
    }


@pytest.fixture(scope="module")
def emb_replicas(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return {
        k: replicate_embeddings(emb, k).localCheckpoint(eager=True)
        for k in sorted(set(KS) | set(KS_EMB))
    }


def test_replication_is_linear_in_k(doc_replicas, emb_replicas) -> None:
    base_d = doc_replicas[KS[0]].count()
    base_e = emb_replicas[KS[0]].count()
    for k in KS:
        assert doc_replicas[k].count() == base_d * k
        assert emb_replicas[k].count() == base_e * k
        # ids stay collision-free under interleaving
        assert doc_replicas[k].select("doc_id").distinct().count() == base_d * k


def test_lsh_candidates_grow_linearly(doc_replicas) -> None:
    stats = {k: lsh_growth_stats(doc_replicas[k]) for k in KS}
    pts = [(s["n_docs"], s["distinct_candidate_pairs"]) for s in stats.values()]
    exp = growth_exponent(pts)
    assert exp <= SUBQUADRATIC_BOUND, (pts, exp)
    # join volume (what the band shuffle pays) is sub-quadratic too
    jexp = growth_exponent(
        [(s["n_docs"], s["candidate_join_rows"]) for s in stats.values()]
    )
    assert jexp <= SUBQUADRATIC_BOUND, jexp
    # the skew hazard: band buckets never coalesce across replicas, so
    # max occupancy stays at the original corpus' largest dup cluster
    assert stats[KS[-1]]["max_bucket"] <= 4 * stats[KS[0]]["max_bucket"]


def test_ppjoin_candidates_grow_linearly(doc_replicas) -> None:
    pts = [
        (s["n_docs"], s["candidate_pairs"])
        for s in (ppjoin_growth_stats(doc_replicas[k]) for k in KS)
    ]
    exp = growth_exponent(pts)
    assert exp <= SUBQUADRATIC_BOUND, (pts, exp)


def test_semdedup_scaled_cells_grow_linearly(emb_replicas) -> None:
    stats = {
        k: ivf_growth_stats(
            emb_replicas[k], n_cells=16 * k, trained=True, sample_factor=8
        )
        for k in KS_EMB
    }
    pts = [(s["n_vecs"], s["within_cell_pairs"]) for s in stats.values()]
    exp = growth_exponent(pts)
    assert exp <= SUBQUADRATIC_BOUND, (pts, exp)
    # occupancy (the per-cell quadratic's base) stays bounded, it does
    # not absorb the growth
    assert stats[KS_EMB[-1]]["max_cell"] <= 4 * max(stats[KS_EMB[0]]["max_cell"], 1)


def test_knn_graph_scaled_cells_grow_linearly(emb_replicas) -> None:
    pts = [
        (s["n_vecs"], s["within_cell_pairs"])
        for s in (
            ivf_growth_stats(emb_replicas[k], n_cells=16 * k, trained=False)
            for k in KS_EMB
        )
    ]
    exp = growth_exponent(pts)
    assert exp <= SUBQUADRATIC_BOUND, (pts, exp)


def test_fixed_knob_contrast_is_quadratic(emb_replicas) -> None:
    """Negative control: freeze n_cells while the corpus grows 16x and
    the within-cell pair count must grow ~quadratically — the audit can
    see quadratic blowup when it exists."""
    pts = [
        (s["n_vecs"], s["within_cell_pairs"])
        for s in (
            ivf_growth_stats(emb_replicas[k], n_cells=16, trained=False)
            for k in KS
        )
    ]
    exp = growth_exponent(pts)
    assert exp >= 1.6, (pts, exp)


def test_span_gated_gram_join_grows_linearly(doc_replicas) -> None:
    from end_to_end_data_engineering_project_with_databricks_spark.operators.scale_audit import (
        span_growth_stats,
    )

    stats = {k: span_growth_stats(doc_replicas[k]) for k in KS}
    jexp = growth_exponent(
        [(s["n_docs"], s["candidate_join_rows"]) for s in stats.values()]
    )
    assert jexp <= SUBQUADRATIC_BOUND, jexp
    vexp = growth_exponent(
        [(s["n_docs"], s["verified_spans"]) for s in stats.values()]
    )
    assert vexp <= SUBQUADRATIC_BOUND, vexp
    # the max_df gate caps per-gram positions regardless of corpus size
    assert stats[KS[-1]]["max_gram_positions"] <= 4 * max(
        stats[KS[0]]["max_gram_positions"], 1
    )


def test_simhash_fixed_band_width_knee_is_measured(doc_replicas) -> None:
    """SimHash's 4x15-bit banding is the second fixed-knob control: a
    15-bit band value space holds 32,768 buckets, so birthday
    collisions push the CANDIDATE stream superlinear as n approaches
    2^15 (measured exponent ~1.3 on this corpus; docs/SCALE.md states
    the deployment rule — widen bits_per_band with the corpus).  The
    VERIFIED output stays sub-quadratic: random 60-bit fingerprints sit
    ~30 bits apart, so the exact Hamming check kills birthday pairs —
    the knee costs shuffle volume, never correctness."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.scale_audit import (
        simhash_growth_stats,
    )

    stats = {k: simhash_growth_stats(doc_replicas[k]) for k in KS}
    cexp = growth_exponent(
        [(s["n_docs"], s["candidate_join_rows"]) for s in stats.values()]
    )
    # the knee is visible (superlinear) but bounded away from the naive
    # all-pairs join; both bounds are deterministic on the fixtures
    assert 1.1 <= cexp <= 1.9, cexp
    vexp = growth_exponent(
        [(s["n_docs"], s["verified_pairs"]) for s in stats.values()]
    )
    assert vexp <= SUBQUADRATIC_BOUND, vexp
