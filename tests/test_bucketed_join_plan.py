"""The bucketed-table join must plan with NO shuffle below the join.

sink_bucketed_join's entire point is that ``bucketBy(8, key)`` on both
sides lets the SortMergeJoin read bucket-aligned splits — if an Exchange
appears under the join, bucketing isn't being exploited and the 100 TB
claim in the query's docstring is false.
"""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)


def test_bucketed_join_has_no_exchange_below_join(spark, sf_dir):
    df = all_specs()["sink_bucketed_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # at fixture scale AQE may pick a broadcast join (shuffle-free by
    # definition); at scale the bucket-aligned SortMergeJoin kicks in —
    # either way no hash-partition shuffle may feed the join
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
    assert join_pos != -1, f"expected a join in plan:\n{plan}"
    below = plan[join_pos:]
    assert "Exchange hashpartitioning" not in below, (
        "bucketed join still shuffles:\n" + plan
    )
    assert "Bucketed: true" in below, "scans are not bucket-aware:\n" + plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir):
    from tests.oracle import compare, duckdb_connection

    spec = all_specs()["sink_bucketed_join"]
    con = duckdb_connection(sf_dir)
    assert not compare(spec.fn(spark, sf_dir), con, spec.oracle)
