"""Round-12 operator tests: the join half of the CMS skew routing
(VERDICT r11 item 6) — the persisted heavy-key estimate choosing plain
vs salted join, both branches pinned in the plan — plus the self-sizing
ANN cell-count derivation (VERDICT r11 item 3).
"""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.queries.relational_extra import (
    cms_salt_routed_join,
)


def test_cms_salt_routing_both_branches_pinned(spark, sf_dir) -> None:
    """The reducer-share knob forces each routing decision; the chosen
    JOIN plan must match it — the salted branch's plan replicates the
    dim per salt (a Generate/explode of the salt array and a `_salt`
    join key), the plain branch has neither — and the ANSWER must be
    decision-invariant: identical rows from both plans (salting never
    changes join semantics)."""
    sj = cms_salt_routed_join(spark, sf_dir)  # default: rule trips
    pj = cms_salt_routed_join(spark, sf_dir, reducer_share_parts=0)
    assert sj.select("join_strategy").first()[0] == "salted"
    assert pj.select("join_strategy").first()[0] == "plain"
    sp = sj._jdf.queryExecution().sparkPlan().toString()
    pp = pj._jdf.queryExecution().sparkPlan().toString()
    assert "_salt" in sp and "explode" in sp.lower(), sp
    assert "_salt" not in pp, pp
    a = {tuple(r) for r in sj.drop("join_strategy").collect()}
    b = {tuple(r) for r in pj.drop("join_strategy").collect()}
    assert a == b


def test_auto_n_cells_algebra_pinned() -> None:
    """The self-sizing cell knob (VERDICT r11 item 3) is deterministic
    integer algebra: clamp(isqrt(N) // 4, 16, 65536) — the //4 constant
    is the r12 MEASURED optimum at both timed scales (docs/SCALE.md
    round-12: 2k vectors want <=22 cells, 60k want 48-96; the bare
    isqrt overshoots both).  Pin the fixture-scale values the oracles
    replay, the clamp edges, and the isqrt == FLOOR(SQRT(double))
    equivalence DuckDB relies on — including at perfect squares, where
    a non-correctly-rounded sqrt would flip the floor."""
    import duckdb

    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        auto_cells_duck,
        auto_n_cells,
    )

    assert auto_n_cells(500) == 16      # sf0.001 / sf0.01 embeddings
    assert auto_n_cells(2000) == 16     # sf0.1 embeddings (22//4 -> floor)
    assert auto_n_cells(60_000) == 61   # the 30x probe corpus
    assert auto_n_cells(0) == 16 and auto_n_cells(255) == 16  # floor
    assert auto_n_cells(10**11) == 65_536  # cap
    con = duckdb.connect()
    # the full COUNT(*)-based replay fragment on real (small) relations
    for n in (0, 255, 256, 500, 2000, 60_000):
        sql = auto_cells_duck(f"range({n})")
        got = con.execute(f"SELECT {sql}").fetchone()[0]
        assert got == auto_n_cells(n), (n, got)
    # the isqrt == FLOOR(SQRT(double)) equivalence at adversarial n
    # (perfect squares and their neighbors), via literal counts so the
    # test doesn't enumerate trillion-row generators
    for n in (65_535, 65_536, 10**6, 10**6 + 1, (2**20) ** 2,
              (2**20) ** 2 - 1, 10**10, 2**52 - 1):
        got = con.execute(
            "SELECT LEAST(65536, GREATEST(16, "
            f"CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) // 4))"
        ).fetchone()[0]
        assert got == auto_n_cells(n), (n, got)


def test_ivf_default_path_is_corpus_derived(spark, sf_dir) -> None:
    """ivf_topk with no n_cells must equal ivf_topk with the explicitly
    derived count — the default path IS the scaled knob, and the
    override stays available (a LARGER explicit knob changes the
    codebook, proving the knob is real).  With the r12 //4 constant the
    fixture corpus sits on the clamp floor (500 -> 16), so the
    derivation's movement is pinned arithmetically at the corpus sizes
    the probes actually run (the runtime growth leg lives in
    tests/test_scale_growth.py::test_hnsw_auto_knob_is_default_path)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        auto_n_cells,
        ivf_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 8)
    nc = auto_n_cells(e.count())
    assert nc == 16  # 500 vectors -> isqrt//4 = 5 -> clamp floor
    # the derivation moves once the corpus outgrows the floor
    assert auto_n_cells(8_000) == 22
    assert auto_n_cells(32_000) == 44
    auto = {tuple(r) for r in ivf_topk(e, queries, nprobe=4, k=5).collect()}
    explicit = {
        tuple(r) for r in ivf_topk(e, queries, n_cells=nc, nprobe=4, k=5).collect()
    }
    assert auto == explicit
    fixed44 = {
        tuple(r) for r in ivf_topk(e, queries, n_cells=44, nprobe=4, k=5).collect()
    }
    assert auto != fixed44


def test_cms_salt_routing_estimates_pinned(spark, sf_dir) -> None:
    """At sf0.001 the sketch estimates are pinned constants — the SAME
    (events, event_type) catalog statistic cms_skew_routed_distinct
    consults (210 exact heaviest-type mass, 1000 exact total), so the
    default reducer-share rule (x32) trips to the salted branch, and
    every event row survives the dim join (the dim is the distinct key
    set)."""
    rows = cms_salt_routed_join(spark, sf_dir).collect()
    assert len(rows) == 5
    (emax,) = {r["est_max_key_rows"] for r in rows}
    (etot,) = {r["est_total_rows"] for r in rows}
    assert (emax, etot) == (210, 1000)
    assert sum(r["n_events"] for r in rows) == 1000
    (strategy,) = {r["join_strategy"] for r in rows}
    assert strategy == "salted"


def test_ensemble_envelope_routing_decision_invariance(spark, sf_dir) -> None:
    """The ensemble's memory-envelope routing (VERDICT r11 item 4) must
    be decision-invariant: forcing the oversized branch (DISK_ONLY
    checkpoints + merge band join + stage-broken dedup + shuffle-hash
    verify) via a 1-byte broadcast budget yields exactly the rows of the
    fixture-scale default branch — and each branch's verify joins pin
    the strategy the route chose (shuffle-hash vs broadcast)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        containment_lsh_ensemble_pairs,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents")
    base = containment_lsh_ensemble_pairs(d, "doc_id", "text", threshold=0.8)
    forced = containment_lsh_ensemble_pairs(
        d, "doc_id", "text", threshold=0.8, broadcast_budget_bytes=1
    )
    rb = sorted(map(tuple, base.collect()))
    rf = sorted(map(tuple, forced.collect()))
    assert rb, "fixture must produce containment pairs"
    assert rb == rf
    fplan = forced._jdf.queryExecution().executedPlan().toString()
    bplan = base._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in fplan, fplan
    assert "BroadcastHashJoin" in bplan, bplan
