"""Round-10 operator tests.

Covers the r10 additions plus regression pins for the round's ADVICE
items (delta_shim fixed-offset SHORT_IDS live in test_delta_shim.py;
the scale-audit integer-div change is covered by test_scale_growth's
existing decontamination run).
"""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
    containment_lsh_ensemble_pairs,
    containment_lsh_pairs,
    lsh_band_buckets,
    minhash_signatures,
)


def test_shingleless_docs_never_reach_banding(spark) -> None:
    """ADVICE r9 claimed sub-``shingle_k``-token documents get all-NULL
    signatures and collide in every band bucket.  They do not:
    ``_hashed_shingle_docs`` filters ``size(tokens) >= shingle_k``
    BEFORE signing, so such documents produce no signature row, no band
    bucket, and no candidate — on the Spark side exactly as in the
    DuckDB oracle.  This pins that invariant (the quadratic
    empty-signature bucket the ADVICE worried about can never form)."""
    df = spark.createDataFrame(
        [
            (1, "one two"),  # 2 tokens < k=3 -> no shingles
            (2, "solo"),
            (3, ""),
            (4, None),
            (5, "alpha beta gamma delta"),
            (6, "alpha beta gamma delta epsilon"),
        ],
        "id long, text string",
    )
    sigs = minhash_signatures(df, "id", "text", num_hashes=8, shingle_k=3)
    sig_rows = sigs.collect()
    assert sorted(r["id"] for r in sig_rows) == [5, 6]
    assert all(v is not None for r in sig_rows for v in r["sig"])
    buckets = lsh_band_buckets(sigs, "id", bands=4, rows_per_band=2)
    assert sorted(set(r["_id"] for r in buckets.collect())) == [5, 6]

    # end-to-end: both containment paths emit only the real pair, in
    # both directions where containment clears the threshold
    pairs = containment_lsh_pairs(
        df, "id", "text", num_hashes=8, bands=4, shingle_k=3, threshold=0.5
    ).collect()
    assert {(r["id_small"], r["id_big"]) for r in pairs} == {(5, 6), (6, 5)}
    # ensemble strata slice up to 64 signature elements -> default hashes
    ens = containment_lsh_ensemble_pairs(
        df, "id", "text", shingle_k=3, threshold=0.99
    ).collect()
    assert {(r["id_small"], r["id_big"]) for r in ens} == {(5, 6)}


def test_theta_setops_deterministic_and_tight(spark, sf_dir) -> None:
    """agg_theta_sketch_setops' docstring claims theta hash-threshold
    sampling is deterministic for given data (contrast the randomized
    KLL): two runs must return IDENTICAL rows, and every bounds boolean
    must hold."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    fn = all_specs()["agg_theta_sketch_setops"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert a == b
    (row,) = a
    assert row["union_ok"] and row["inter_ok"] and row["diff_ok"]
    # |F ∪ O| = |F∩O| + |F\O| + |O\F| >= the two emitted components
    assert row["n_union"] >= row["n_inter"] + row["n_f_only"]
    assert row["n_union"] >= row["n_inter"] >= 0


def test_kll_quantile_sketch_booleans_stable(spark, sf_dir) -> None:
    """KLL compaction is randomized, so agg_quantile_sketch's VALUES
    must come only from exact anchors while the booleans stay TRUE
    across repeated runs (3 probes; the bounded-check contract the
    oracle states as constant TRUE)."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    fn = all_specs()["agg_quantile_sketch"].fn
    anchors = None
    for _ in range(3):
        rows = {r["o_orderstatus"]: r for r in fn(spark, sf_dir).collect()}
        assert all(
            r["p50_ok"] and r["p90_ok"] and r["n_ok"] for r in rows.values()
        ), rows
        fixed = {k: (r["n_orders"], r["p50_disc"], r["p90_disc"]) for k, r in rows.items()}
        assert anchors is None or fixed == anchors
        anchors = fixed
    assert "ALL" in rows


def test_kll_quantile_sketch_single_scan(spark, sf_dir) -> None:
    """agg_quantile_sketch pays exactly ONE scan of orders: the
    grouping-sets aggregate computes per-status AND global anchors in
    one pass and is localCheckpointed before its three consumers (CTE
    inlining pushes different is_all filters into each copy, so
    exchange reuse cannot dedupe — 6 runtime scans without the
    checkpoint).  The returned plan must contain no parquet scan at all
    (it reads the checkpointed 4-row aggregate)."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    df = all_specs()["agg_quantile_sketch"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan


def test_cms_frequency_guarantee_and_merge(spark, sf_dir) -> None:
    """agg_cms_frequency's structural guarantees, independent of the
    DuckDB replay: (a) every estimate dominates its exact count (the
    one-sided CMS bound), (b) the 'ALL' sketch is a true MERGE — its
    counters are per-source sums, so for any probed bigram the merged
    estimate dominates every per-source estimate, and the ALL exact
    count is the sum of the per-source exacts."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    rows = all_specs()["agg_cms_frequency"].fn(spark, sf_dir).collect()
    assert rows, "probe set must be non-empty"
    assert all(r["overcount_ok"] for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] >= 1 for r in rows)
    by_bigram: dict[str, dict[str, tuple[int, int]]] = {}
    for r in rows:
        by_bigram.setdefault(r["bigram"], {})[r["scope"]] = (
            r["exact_cnt"], r["cms_est"],
        )
    assert any("ALL" in scopes for scopes in by_bigram.values())
    for bigram, scopes in by_bigram.items():
        assert "ALL" in scopes, f"{bigram} has per-source rows but no ALL row"
        all_exact, all_est = scopes["ALL"]
        src = {k: v for k, v in scopes.items() if k != "ALL"}
        assert all_exact == sum(e for e, _ in src.values()), bigram
        assert all(all_est >= est for _, est in src.values()), bigram


def test_cms_join_size_dominates_and_is_tight(spark, sf_dir) -> None:
    """agg_cms_join_size emits one row with est >= exact (structural)
    and, at fixture scale, an estimate within 3x of exact — the
    documented |L|*|O|/w expected-overcount puts the fixture well
    inside that bar, so a violation means the sketch width or hash
    family broke, not noise (everything is deterministic integers)."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    rows = all_specs()["agg_cms_join_size"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["overcount_ok"]
    assert r["cms_join_rows"] >= r["exact_join_rows"] > 0
    assert r["cms_join_rows"] <= 3 * r["exact_join_rows"]


def test_stream_cms_merge_partials_and_batch_equivalence(spark, sf_dir) -> None:
    """stream_cms_merge's two structural claims: (a) each persisted
    per-batch partial is a bounded sketch (<= d*w counter rows — the
    fixed-size state shipped per ingest window), and (b) the merged
    estimates equal a ONE-PASS batch build over the whole table
    (counter merge is addition), verified by recomputing the batch
    sketch inline and re-answering every probe from it."""
    import os

    from end_to_end_data_engineering_project_with_databricks_spark.operators.sketches import (
        CMS_D,
        CMS_W_FREQ,
        cms_stack_spark,
        cms_u_spark,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.queries.sources_sinks import (
        _tmp,
    )
    from pyspark.sql import functions as F

    rows = all_specs()["stream_cms_merge"].fn(spark, sf_dir).collect()
    assert rows and all(r["overcount_ok"] for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] >= 1 for r in rows)

    outdir = _tmp("cms_merge_sketches")
    parts = [d for d in os.listdir(outdir) if d.startswith("b")]
    assert len(parts) == 4, parts  # one partial per time-sliced batch
    for d in parts:
        assert (
            spark.read.parquet(os.path.join(outdir, d)).count()
            <= CMS_D * CMS_W_FREQ
        )

    batch_sk = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(f"{cms_u_spark('CAST(user_id AS STRING)')} AS u")
        .selectExpr(f"{cms_stack_spark('u', CMS_W_FREQ)} AS (i, bkt)")
        .groupBy("i", "bkt")
        .agg(F.count("*").alias("c"))
    )
    probes = spark.createDataFrame(
        [(r["user_id"],) for r in rows], "user_id long"
    ).selectExpr("user_id", f"{cms_u_spark('CAST(user_id AS STRING)')} AS u")
    pb = probes.selectExpr(
        "user_id", f"{cms_stack_spark('u', CMS_W_FREQ)} AS (i, bkt)"
    )
    batch_est = {
        r["user_id"]: r["est"]
        for r in pb.join(batch_sk, ["i", "bkt"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est"))
        .collect()
    }
    assert {r["user_id"]: r["cms_est"] for r in rows} == batch_est


def test_bench_query_lists_resolve_in_registry() -> None:
    """bench.py's headline set (the ``bench=True`` specs) and its
    TRACKING_QUERIES tier must all resolve in the registry — a rename
    that breaks either would otherwise only surface as a KeyError in
    the driver's per-round bench run, after the round's code is
    frozen."""
    import importlib.util
    import os

    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = all_specs()
    missing = [n for n in mod.TRACKING_QUERIES if n not in registry]
    assert not missing, missing
    assert any(s.bench for s in registry.values()), "headline set is empty"


def test_topk_sketch_exact_regime_and_merge(spark, sf_dir) -> None:
    """agg_topk_sketch's documented regime: below sketch capacity the
    frequent-items estimates are exact, so (a) per-scope counts match a
    plain groupBy recount, and (b) the combined 'ALL' sketch's counts
    equal the sum of the per-source counts — the merge is lossless
    here, not merely bounded."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )
    from pyspark.sql import functions as F

    rows = all_specs()["agg_topk_sketch"].fn(spark, sf_dir).collect()
    assert rows
    got_all = {r["token"]: r["est_cnt"] for r in rows if r["scope"] == "ALL"}
    per_src: dict[str, int] = {}
    for r in rows:
        if r["scope"] != "ALL":
            per_src[r["token"]] = per_src.get(r["token"], 0) + r["est_cnt"]
    assert got_all == per_src
    truth = {
        r["t"]: r["c"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got_all == truth


def test_topk_sketch_single_runtime_scan(spark, sf_dir) -> None:
    """agg_topk_sketch's one-corpus-scan claim holds via AQE runtime
    exchange reuse (the per-source sketch exchange feeds both UNION
    branches), NOT in the initial plan — so pin the FINAL adaptive
    plan: exactly one FileScan of documents plus a ReusedExchange.  Any
    edit that perturbs one branch before its exchange (a filter, a
    changed maxItemsTracked) breaks canonical equality and doubles the
    scan; this test is the tripwire (the agg_quantile_sketch
    single-scan precedent)."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    df = all_specs()["agg_topk_sketch"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    delim = "== Initial Plan =="
    final = plan.split(delim)[0]
    assert final.count("Scan parquet") == 1, final
    # the ReusedExchange node name is pinned only while the AQE plan
    # rendering is the known format (delimiter present); if a Spark
    # minor version drops the delimiter, fail soft on the node name —
    # the single-scan count above already proves the reuse happened
    # (ADVICE r10)
    if delim in plan:
        assert "ReusedExchange" in final, final


def test_all_scope_sentinel_invariant(spark, sf_dir) -> None:
    """The merged-rollup scope label 'ALL' used by agg_cms_frequency /
    agg_topk_sketch (and the 6 older sentinel-scoped rows) is a
    SENTINEL: a real source literally named 'ALL' would silently merge
    with the rollup row.  Pin the fixture-level invariant the sentinel
    rests on (ADVICE r10)."""
    srcs = {
        r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    assert srcs and "ALL" not in srcs, srcs


def test_ivf_versioned_guard_covers_internal_names(spark) -> None:
    """The versioned-serving guard must reject version columns that
    collide with ANY internal name ivf_topk creates mid-pipeline —
    including the cell-scoring/ranking columns (cscore, rn, score,
    rank), which would otherwise surface as a confusing ambiguous-
    column analysis error deep in the plan (ADVICE r10)."""
    import pytest as _pytest

    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        ivf_topk,
    )

    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    for bad in ("cscore", "rn", "score", "rank", "cell_id", "q_vec"):
        with _pytest.raises(ValueError, match="internal names"):
            ivf_topk(df, df, query_version_col=bad, index_version_col="_iv")
        with _pytest.raises(ValueError, match="internal names"):
            ivf_topk(df, df, query_version_col="_qv", index_version_col=bad)
    with _pytest.raises(ValueError, match="distinct"):
        ivf_topk(df, df, query_version_col="_v", index_version_col="_v")
