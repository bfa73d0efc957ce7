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


@pytest.mark.parametrize(
    "name",
    # sim_threshold_pairs is deliberately absent: it's the documented
    # O(n^2) exact baseline whose honest plan IS a nested-loop join
    ["dedup_minhash_lsh", "dedup_simhash"],
)
def test_candidate_joins_are_equi_not_cross(spark, sf_dir, name):
    assert not has_cartesian(_df(spark, sf_dir, name)), (
        f"{name} degraded to a cross/NL join"
    )


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

    est = {
        r.o_orderpriority: r.approx_customers
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
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    approx = {
        r.o_orderstatus: (r.p25, r.p50, r.p90)
        for r in _df(spark, sf_dir, "agg_approx_percentile").collect()
    }
    exact = {
        r.o_orderstatus: (r.p25, r.p50, r.p90)
        for r in _df(spark, sf_dir, "agg_percentile_disc").collect()
    }
    assert set(approx) == set(exact)
    for status, (a25, a50, a90) in approx.items():
        e25, e50, e90 = exact[status]
        for a, e in ((a25, e25), (a50, e50), (a90, e90)):
            # 1e4 accuracy on fixture group sizes -> near-exact; 1% slack
            assert abs(a - e) <= 0.01 * max(1.0, abs(e)), (status, a, e)
