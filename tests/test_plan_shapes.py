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
