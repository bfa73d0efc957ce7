"""Property tests for similarity search: brute force must agree with a
NumPy reference; IVF must be internally consistent (its result equals
brute force restricted to the probed cells) and exact when probing every
cell.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
    brute_force_topk,
    deterministic_centroids,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(100)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def test_brute_force_matches_numpy(spark, emb):
    df, vecs = emb
    queries = df.filter(F.col("vec_id") < 3)
    got = brute_force_topk(df, queries, k=4).collect()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf
        expected = list(np.argsort(-s, kind="stable")[:4])
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: (r.query_id, r.rank)) if r.query_id == q]
        assert mine == expected, f"query {q}: {mine} != {expected}"


def test_ivf_full_probe_equals_brute_force(spark, emb):
    df, _ = emb
    queries = df.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(df, queries, k=4)
    approx = ivf_topk(df, queries, n_cells=8, nprobe=8, k=4)  # probe ALL cells
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    a = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
    assert e == a


def test_ivf_partial_probe_is_consistent(spark, emb):
    """nprobe < n_cells: every returned neighbor must belong to a probed
    cell, ranks must be contiguous from 1, scores non-increasing."""
    df, _ = emb
    queries = df.filter(F.col("vec_id") < 3)
    out = ivf_topk(df, queries, n_cells=8, nprobe=2, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_deterministic_centroids_are_stable(spark, emb):
    """Seeds are the n_cells lowest-id vectors, labeled by their own id
    (cells need distinct join keys, not dense 0..n-1), and stable across
    invocations.  Fixture ids are 0..99, so the seed ids are 0..7."""
    df, _ = emb
    c1 = deterministic_centroids(df, 8).collect()
    c2 = deterministic_centroids(df, 8).collect()
    assert sorted(r.cell_id for r in c1) == sorted(r.cell_id for r in c2) == list(range(8))


def test_centroid_seeding_has_no_global_window(spark, emb):
    """The seeding plan must be TakeOrderedAndProject (distributed partial
    top-k), never a row_number over an unpartitioned window (which funnels
    the whole corpus through one reducer)."""
    df, _ = emb
    plan = deterministic_centroids(df, 8)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_bucketed_threshold_pairs_match_exact_on_near_dups(spark, emb):
    """Planted near-dups (tiny perturbations, cos >= ~0.99): the banded
    sign-LSH candidate path must return EXACTLY the pairs the O(n²)
    baseline returns — false positives are impossible by construction
    (exact verify), and the planted pairs' miss probability (~4e-8 at
    cos 0.95 with 16x4 banding, deterministic seeded planes) makes
    parity a stable assertion, not a flaky one."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        cosine_threshold_pairs,
        cosine_threshold_pairs_bucketed,
    )

    df, vecs = emb
    rng = np.random.default_rng(7)
    planted = vecs[:20] + 0.02 * rng.standard_normal((20, 16))
    rows = [(100 + i, [float(x) for x in planted[i]]) for i in range(20)]
    full = df.unionByName(
        df.sparkSession.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_threshold_pairs(full, threshold=0.9).collect()
    }
    bucketed = {
        (r.id_a, r.id_b)
        for r in cosine_threshold_pairs_bucketed(full, threshold=0.9).collect()
    }
    assert len(exact) >= 20  # every planted copy pairs with its original
    assert bucketed == exact


def test_bucketed_threshold_pairs_plan_has_no_cartesian(spark, emb):
    """The scale path's candidate join must be an equi-join on the band
    key — never a cartesian/nested-loop node (that is the whole point
    vs the exact baseline)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        cosine_threshold_pairs_bucketed,
    )

    df, _ = emb
    plan = (
        cosine_threshold_pairs_bucketed(df, threshold=0.6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rp_lsh_equals_bruteforce_on_probed_buckets(spark, sf_dir):
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        _rp_planes,
        brute_force_topk,
        rp_code,
        rp_lsh_topk,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )
    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 4)
    approx = rp_lsh_topk(e, queries, n_planes=8, dim=64, k=3)
    got = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}

    # mechanism: per query, result == exact ranking restricted to vectors
    # whose code is within Hamming distance 1 of the query's code
    planes = _rp_planes(8, 64)
    coded = {r.vec_id: r.code for r in e.select("vec_id", rp_code("embedding", planes).alias("code")).collect()}
    exact = brute_force_topk(e, queries, k=10_000)
    by_q = {}
    for r in exact.collect():
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        eligible = [
            r for r in sorted(rows, key=lambda r: r.rank)
            if bin(coded[r.neighbor_id] ^ coded[qid]).count("1") <= 1
        ]
        for i, r in enumerate(eligible[:3], start=1):
            assert got.get((qid, i)) == r.neighbor_id, (qid, i)


def test_kmeans_ivf_mechanism_and_codebook_shape(spark, emb):
    """Trained-codebook IVF: centroids are reproducible (seeded fit on a
    deterministic sample), every cell id is a codebook id, and a full
    probe over the trained cells equals brute force (mechanism is
    seeding-independent)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        kmeans_centroids,
    )

    df, _ = emb
    cents = kmeans_centroids(df, n_cells=8)
    rows = cents.collect()
    assert sorted(r.cell_id for r in rows) == list(range(8))
    assert all(len(r.centroid) == len(rows[0].centroid) for r in rows)
    again = {r.cell_id: r.centroid for r in kmeans_centroids(df, n_cells=8).collect()}
    assert {r.cell_id: r.centroid for r in rows} == again  # seeded -> stable

    queries = df.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(df, queries, k=4)
    approx = ivf_topk(df, queries, n_cells=8, nprobe=8, k=4, centroids=cents)
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    a = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
    assert e == a


def test_threshold_pairs_lsh_query_yields_rows_at_fixture_scale(spark, sf_dir):
    """Rows tripwire for the driver's rows-only gate: the registered
    LSH threshold query must find pairs on the real fixture (7 true
    pairs >= 0.45 at sf0.001; per-pair recall ~0.956, so zero rows
    indicates a broken pipeline, not sampling luck)."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    n = all_specs()["sim_threshold_pairs_lsh"].fn(spark, sf_dir).count()
    assert n > 0


def test_pq_encode_and_adc_match_numpy(spark, emb):
    """PQ codes = per-subspace argmax inner product vs the 16 lowest-id
    sub-codebooks (first-max tie-break), ADC score = sum of the chosen
    sub-dots — verified against an independent numpy implementation on
    the 100x16 fixture (m=4 subspaces of 4 dims)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        _pq_codebook_sql,
        pq_adc_topk,
        pq_encode,
    )

    df, vecs = emb
    m, sub, n_codes, k = 4, 4, 16, 5
    cb = vecs[:16]  # lowest-id vectors, position = code

    cb_sql = _pq_codebook_sql(df, n_codes, "vec_id", "embedding")
    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df, cb_sql, m, sub, "vec_id", "embedding").collect()
    }
    assert set(codes) == set(range(100))
    exp_codes = {}
    for i in range(100):
        exp_codes[i] = [
            int(np.argmax([vecs[i, s * sub:(s + 1) * sub] @ cb[c, s * sub:(s + 1) * sub]
                           for c in range(n_codes)]))
            for s in range(m)
        ]
    assert codes == exp_codes
    # every codebook vector's own sub-dot is maximal for SOME subspace
    # only by luck — but codes must always be dense indices in range
    assert all(0 <= c < n_codes for cs in codes.values() for c in cs)

    queries = df.filter(F.col("vec_id") < 4)
    out = pq_adc_topk(df, queries, n_codes=n_codes, m=m, k=k).collect()
    got = {(r.query_id, r.rank): (r.neighbor_id, r.adc_score) for r in out}
    assert len(out) == 4 * k
    for q in range(4):
        scores = {}
        for i in range(100):
            if i == q:
                continue
            scores[i] = sum(
                float(vecs[q, s * sub:(s + 1) * sub] @ cb[exp_codes[i][s], s * sub:(s + 1) * sub])
                for s in range(m)
            )
        order = sorted(scores, key=lambda i: (-scores[i], i))[:k]
        for rank, nid in enumerate(order, start=1):
            gnid, gscore = got[(q, rank)]
            assert gnid == nid
            assert abs(gscore - scores[nid]) < 1e-9
    # self never appears
    assert all(r.query_id != r.neighbor_id for r in out)


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_staged_sim_pq_adc_topk_vs_oracle(spark, scale_dir: str) -> None:
    """The STAGED r7 PQ/ADC query hash-matches its full index-replay
    DuckDB oracle at every fixture scale (driver t2-gate replica run
    early, same pattern as the staged JPEG/permissive queries)."""
    from tests.oracle import duckdb_connection, compare
    from end_to_end_data_engineering_project_with_databricks_spark.queries.similarity import (
        SIM_PQ_ADC_TOPK_ORACLE,
        sim_pq_adc_topk,
    )

    con = duckdb_connection(scale_dir)
    try:
        problems = compare(
            sim_pq_adc_topk(spark, scale_dir), con, SIM_PQ_ADC_TOPK_ORACLE
        )
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_ivfpq_fullprobe_equals_pq_bruteforce(spark, emb):
    """nprobe == n_cells makes IVF-PQ score every vector, so it must
    equal the flat PQ/ADC scorer EXACTLY — pins the composition glue
    (assignment, cell join, LUT routing) with zero approximation slack."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
    )

    df, _ = emb
    queries = df.filter(F.col("vec_id") < 4)
    full = ivfpq_topk(
        df, queries, n_cells=16, nprobe=16, n_codes=16, m=4, k=5
    )
    flat = pq_adc_topk(df, queries, n_codes=16, m=4, k=5)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.adc_score) for r in full.collect()}
    exp = {(r.query_id, r.rank): (r.neighbor_id, r.adc_score) for r in flat.collect()}
    assert got == exp and len(got) == 4 * 5


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_staged_sim_ivfpq_topk_vs_oracle(spark, scale_dir: str) -> None:
    """The STAGED r7 IVF-PQ query hash-matches its full index-replay
    DuckDB oracle at every fixture scale."""
    from tests.oracle import duckdb_connection, compare
    from end_to_end_data_engineering_project_with_databricks_spark.queries.similarity import (
        SIM_IVFPQ_TOPK_ORACLE,
        sim_ivfpq_topk,
    )

    con = duckdb_connection(scale_dir)
    try:
        problems = compare(
            sim_ivfpq_topk(spark, scale_dir), con, SIM_IVFPQ_TOPK_ORACLE
        )
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_pq_plan_shapes(spark, sf_dir):
    """Plan guards for the staged PQ family, mirroring the registry-wide
    hygiene the queries will enroll in at r7 registration:
    - pq_encode is a single NARROW projection — no shuffle (Exchange), no
      join, no Python in the encode path;
    - ivfpq_topk plans NO CartesianProduct, and its candidate scoring is
      a hash/sort-merge EQUI-join on cell_id (the broadcast probe/assign
      passes are BroadcastNestedLoopJoin over the bounded |Q| x n_cells /
      |corpus| x n_cells sides — the documented bounded class);
    - the flat pq_adc_topk scorer's only non-equi node is the bounded
      broadcast query-batch cartesian it shares with brute_force_topk."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        _pq_codebook_sql,
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        formatted_plan,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cb_sql = _pq_codebook_sql(e, 16, "vec_id", "embedding")
    enc_plan = formatted_plan(pq_encode(e, cb_sql, 8, 8))
    assert "Exchange" not in enc_plan, enc_plan
    assert not any(
        j in enc_plan for j in ("Join", "CartesianProduct")
    ), enc_plan
    assert "Python" not in enc_plan, enc_plan  # no UDF in the encode path

    q = e.filter(F.col("vec_id") < 8)
    ivfpq_plan = formatted_plan(ivfpq_topk(e, q))
    assert "CartesianProduct" not in ivfpq_plan
    assert any(
        j in ivfpq_plan
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), ivfpq_plan  # the cell_id candidate join is an equi-join

    flat_plan = formatted_plan(pq_adc_topk(e, q))
    assert "CartesianProduct" not in flat_plan  # broadcast BNLJ only


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_lloyd_kmeans_ivf_vs_oracle(spark, scale_dir: str) -> None:
    """The trained-codebook IVF query hash-matches its full Lloyd-replay
    DuckDB oracle at every fixture scale (VERDICT r6 item 2: the last
    rows-only registry row became a full-replay oracle — the oracle
    re-derives the TRAINING loop, not just the probe)."""
    from tests.oracle import duckdb_connection, compare
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    spec = all_specs()["sim_ivf_kmeans_topk"]
    assert spec.oracle is not None
    con = duckdb_connection(scale_dir)
    try:
        problems = compare(spec.fn(spark, scale_dir), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_lloyd_kmeans_fixed_deterministic_and_trains(spark, emb):
    """Fixed-point Lloyd: (a) run-to-run identical centroids (the whole
    point — float k-means is partition-order-dependent, this is not);
    (b) the update actually moves centroids off their seed vectors (it
    TRAINS, it is not deterministic_centroids in disguise); (c) full
    probe over the trained cells equals brute force (mechanism is
    codebook-independent)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        deterministic_centroids,
        lloyd_kmeans_fixed,
    )

    df, _ = emb
    a = {r.cell_id: r.centroid for r in lloyd_kmeans_fixed(df, n_cells=8, iters=2, sample_bound=64).collect()}
    b = {r.cell_id: r.centroid for r in
         lloyd_kmeans_fixed(df.repartition(7), n_cells=8, iters=2, sample_bound=64).collect()}
    assert a == b  # partitioning-independent, bit-exact
    import math

    # quantized seed = what the trainer starts from; training must move
    # centroids beyond mere quantization
    seed = {
        r.cell_id: [math.floor(float(x) * 10000.0) / 10000.0 for x in r.centroid]
        for r in deterministic_centroids(df, 8).collect()
    }
    moved = sum(1 for cid in a if list(a[cid]) != seed[cid])
    assert moved >= 6, f"only {moved}/8 centroids moved — update not training"

    queries = df.filter(F.col("vec_id") < 3)
    cents = lloyd_kmeans_fixed(df, n_cells=8, iters=2, sample_bound=64)
    exact = brute_force_topk(df, queries, k=4)
    approx = ivf_topk(df, queries, n_cells=8, nprobe=8, k=4, centroids=cents)
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    g = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
    assert e == g


def test_video_keyframe_ann_plan_shape(spark, sf_dir):
    """The video keyframe ANN capstone inherits ivfpq_topk's plan
    guarantees over the frame-descriptor corpus: no CartesianProduct
    anywhere, and candidate scoring stays an equi-join on cell_id."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        formatted_plan,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.queries.multimodal import (
        mm_video_keyframe_ann,
    )

    plan = formatted_plan(mm_video_keyframe_ann(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert any(
        j in plan for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), plan


def test_rerank_recall_dominates_adc(spark, sf_dir):
    """Exact re-ranking of the ADC top-20 can only help: every true
    top-5 neighbor that survives candidate generation is kept by the
    exact cosine re-rank, while plain IVF-PQ may misorder it out on ADC
    error — so recall@5(rerank) >= recall@5(plain IVF-PQ), query by
    query (plain's picks are a subset of rerank's candidate set)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_rerank_topk,
        ivfpq_topk,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    truth = sets(brute_force_topk(e, queries, k=5))
    adc = sets(ivfpq_topk(e, queries, k=5))
    rer = sets(ivfpq_rerank_topk(e, queries, k_cand=20, k=5))
    assert set(rer) == set(truth)
    for qid, true_nb in truth.items():
        r_adc = len(adc.get(qid, set()) & true_nb)
        r_rer = len(rer.get(qid, set()) & true_nb)
        assert r_rer >= r_adc, (qid, r_rer, r_adc)
