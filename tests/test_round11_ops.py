"""Round-11 operator tests: the sketch-to-decision loop (VERDICT r10
item 5) — a Count-Min join-size estimate actually choosing the physical
join strategy, with both branches pinned in the plan.
"""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.queries.relational_extra import (
    cms_adaptive_join,
)


def test_cms_adaptive_join_both_branches_pinned(spark, sf_dir) -> None:
    """The threshold knobs force each decision; the CHOSEN physical plan
    must match it — broadcast decision plans a BroadcastHashJoin of the
    dim side, shuffle decision plans a SortMergeJoin (pinned on the
    pre-AQE physical plan, where the hint/decision is deterministic;
    at fixture scale AQE may later demote the tiny shuffle join, which
    is AQE doing its job, not the decision loop failing) — and the
    ANSWER must be decision-invariant: identical rows from both plans."""
    bc = cms_adaptive_join(spark, sf_dir, output_threshold_rows=10**12)
    sh = cms_adaptive_join(spark, sf_dir, output_threshold_rows=1)
    bp = bc._jdf.queryExecution().sparkPlan().toString()
    sp = sh._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in bp and "SortMergeJoin" not in bp, bp
    assert "SortMergeJoin" in sp and "BroadcastHashJoin" not in sp, sp
    assert bc.select("join_strategy").first()[0] == "broadcast"
    assert sh.select("join_strategy").first()[0] == "shuffle_merge"
    a = {tuple(r) for r in bc.drop("join_strategy").collect()}
    b = {tuple(r) for r in sh.drop("join_strategy").collect()}
    assert a == b


def test_cms_adaptive_join_default_decision_at_fixture_scale(spark, sf_dir) -> None:
    """At sf0.001 the deterministic estimates are pinned constants —
    est_join_rows = 2,118 (min-of-4 inner product; true join = 1,995)
    and est_build_rows = 493 (exact: sum of counters / d) — so the
    default 1M thresholds land on the broadcast branch.  A change in the
    hash family, sketch width, or stack expansion shows up here as a
    value shift before it can silently flip a decision."""
    rows = cms_adaptive_join(spark, sf_dir).collect()
    assert rows
    (strategy,) = {r["join_strategy"] for r in rows}
    assert strategy == "broadcast"
    (ej,) = {r["est_join_rows"] for r in rows}
    (eb,) = {r["est_build_rows"] for r in rows}
    assert (ej, eb) == (2118, 493)
    exact = sum(r["n_rows"] for r in rows)
    assert exact == 1995
    assert ej >= exact  # the one-sided CMS inner-product guarantee


def test_cms_skew_routing_both_branches_pinned(spark, sf_dir) -> None:
    """The reducer-share knob forces each routing decision; the chosen
    AGGREGATION plan must match it — the two-stage branch's plan
    carries the explicit exact-sum partial columns (_hi/_lo) and an
    inner aggregate keyed on (event_type, user_id), the one-stage
    branch does not — and the ANSWER must be decision-invariant:
    identical rows (including the sketch-estimate columns) from both
    plans."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.relational_extra import (
        cms_skew_routed_distinct,
    )

    ts = cms_skew_routed_distinct(spark, sf_dir)  # default: rule trips
    os_ = cms_skew_routed_distinct(spark, sf_dir, reducer_share_parts=2)
    assert ts.select("agg_strategy").first()[0] == "two_stage"
    assert os_.select("agg_strategy").first()[0] == "one_stage"
    tp = ts._jdf.queryExecution().sparkPlan().toString()
    op = os_._jdf.queryExecution().sparkPlan().toString()
    assert "_hi" in tp and "_lo" in tp, tp
    assert "_hi" not in op and "_lo" not in op, op
    a = {tuple(r) for r in ts.drop("agg_strategy").collect()}
    b = {tuple(r) for r in os_.drop("agg_strategy").collect()}
    assert a == b


def test_cms_skew_routing_estimates_pinned(spark, sf_dir) -> None:
    """At sf0.001 the sketch estimates are pinned constants — with only
    5 event types in 512 buckets the CMS row-max recovers the EXACT
    heaviest-type count (210) and the counter sum recovers the exact
    total (1000) — so the default reducer-share rule (x32) trips.  The
    one-sided guarantee est_max >= true max is structural."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.queries.relational_extra import (
        cms_skew_routed_distinct,
    )

    rows = cms_skew_routed_distinct(spark, sf_dir).collect()
    assert len(rows) == 5
    (emax,) = {r["est_max_key_rows"] for r in rows}
    (etot,) = {r["est_total_rows"] for r in rows}
    assert (emax, etot) == (210, 1000)
    truth = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c"), F.sum("c"))
        .first()
    )
    assert emax >= truth[0] and etot == truth[1]


def test_skew_resistant_agg_null_distinct_matches_one_stage(spark) -> None:
    """r11 review finding, regression-pinned: a NULL distinct value
    forms a stage-1 group, so stage 2 must COUNT the distinct COLUMN
    (NULL-excluding, matching COUNT(DISTINCT x) and the DuckDB oracle),
    while the NULL rows' values still fold into total_value exactly as
    the one-stage SUM does."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
        dsum,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.operators.scaling import (
        skew_resistant_agg,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0), ("a", 1, 2.5), ("a", 2, 1.0),
            ("a", None, 7.25), ("a", None, 0.5),
            ("b", None, 3.0),
            ("c", 9, 4.0),
        ],
        "k string, u int, v double",
    )
    two = {
        r["k"]: (r["n_distinct"], r["total_value"])
        for r in skew_resistant_agg(df, ["k"], "u", "v").collect()
    }
    one = {
        r["k"]: (r["n_distinct"], r["total_value"])
        for r in df.groupBy("k")
        .agg(F.countDistinct("u").alias("n_distinct"), dsum("v").alias("total_value"))
        .collect()
    }
    assert two == one
    assert two["a"] == (2, 21.25)  # NULLs excluded from count, included in sum
    assert two["b"] == (0, 3.0)
    assert two["c"] == (1, 4.0)
