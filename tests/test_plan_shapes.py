"""Physical-plan regression tests: the plans we reviewed and want KEPT.

Correctness tests can't catch a silently degraded plan (a lost pushdown
or broadcast still returns right answers, 100x slower at scale).  These
assert the load-bearing plan properties of the headline queries so a
refactor that regresses them fails fast.
"""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)


def _plan(spark, sf_dir, name: str) -> str:
    df = all_specs()[name].fn(spark, sf_dir)
    # formatted mode keeps full scan metadata (PushedFilters/ReadSchema),
    # which plain toString() truncates
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q6_filters_reach_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the shipdate range must be pushed, not evaluated post-scan only
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_revenue_by_nation")
    # supplier/nation/region are explicitly broadcast; AQE may also
    # broadcast orders/customer at fixture scale
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q3_plans_top_k_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan


def test_q1_aggregates_partially_map_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine before the exchange
    # the scaled-long path must survive: no decimal accumulator in the agg
    assert "as decimal(27,6)" not in plan


def test_q1_reads_only_needed_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    start = plan.find("ReadSchema")
    schema = plan[start : plan.find("\n", start)]
    # 7 of lineitem's 11 columns are needed; the scan must not read more
    assert "l_quantity" in schema
    assert "l_orderkey" not in schema
    assert "l_partkey" not in schema


@pytest.mark.parametrize(
    "name",
    # sim_threshold_pairs is deliberately absent: it's the documented
    # O(n^2) exact baseline whose honest plan IS a nested-loop join
    ["dedup_minhash_lsh", "dedup_simhash"],
)
def test_candidate_joins_are_equi_not_cross(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name} degraded to a cross join"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} degraded to NL join"
