"""Property tests for the binned-join and prefix-sum scale operators:
the optimized shapes must agree with the obvious brute-force semantics
on arbitrary inputs, not just the fixture geometry."""

from __future__ import annotations

import numpy as np
import pytest

from end_to_end_data_engineering_project_with_databricks_spark.operators.ids import (
    assign_prefix_sums,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.scaling import (
    binned_interval_overlap_join,
)


@pytest.mark.parametrize("seed,bin_width", [(0, 7.0), (1, 16.0), (2, 3.0)])
def test_interval_overlap_matches_brute_force(spark, seed, bin_width):
    rng = np.random.default_rng(seed)
    left = [
        (int(i), int(lo), int(lo + rng.integers(0, 20)))
        for i, lo in enumerate(rng.integers(0, 200, 40))
    ]
    right = [
        (int(100 + i), int(lo), int(lo + rng.integers(0, 30)))
        for i, lo in enumerate(rng.integers(0, 200, 25))
    ]
    ldf = spark.createDataFrame(left, "lid int, l_lo long, l_hi long")
    rdf = spark.createDataFrame(right, "rid int, r_lo long, r_hi long")
    got = {
        (r["lid"], r["rid"])
        for r in binned_interval_overlap_join(
            ldf, rdf, "l_lo", "l_hi", "r_lo", "r_hi", bin_width
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, llo, lhi in left
        for rid, rlo, rhi in right
        if llo <= rhi and lhi >= rlo
    }
    assert got == want
    assert want, "fixture should produce at least one overlap"


def test_prefix_sums_match_pandas_cumsum(spark):
    rng = np.random.default_rng(7)
    rows = [(int(k), int(w)) for k, w in enumerate(rng.integers(0, 50, 500))]
    df = spark.createDataFrame(rows, "k long, w long")
    out, total = assign_prefix_sums(df, "k", "w", out_col="cum", num_partitions=7)
    got = {r["k"]: r["cum"] for r in out.collect()}
    acc, want = 0, {}
    for k, w in rows:
        acc += w
        want[k] = acc
    assert got == want
    assert total == acc
