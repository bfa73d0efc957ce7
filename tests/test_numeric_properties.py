"""Property-based checks (hypothesis) for the exact-aggregation layer.

The engine's oracle parity rests on functions/numeric.py: dsum/davg must
be (1) independent of row order and partitioning — Spark aggregates in
nondeterministic order — and (2) bit-equal with the DuckDB SQL text the
oracle runs.  Hypothesis hunts the corners a fixture can't: negatives,
zeros, mixed magnitudes, many-decimal values, single-row and empty-ish
groups.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

# values at 6-decimal granularity across sign and magnitude, the contract
# dsum quantizes at; magnitudes up to 1e9 exercise the hi/lo split
_value = st.integers(min_value=-(10**15), max_value=10**15).map(lambda n: n / 1e6)


@st.composite
def _value_lists(draw):
    return draw(st.lists(_value, min_size=1, max_size=200))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=_value_lists(), parts=st.integers(min_value=1, max_value=9))
def test_dsum_bit_equal_with_duckdb_any_partitioning(spark, values, parts):
    sdf = (
        spark.createDataFrame([(v,) for v in values], "x double")
        .repartition(parts)
        .agg(dsum("x").alias("s"), davg("x").alias("a"))
    )
    srow = sdf.collect()[0]

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": values}))
    orow = con.execute(
        f"SELECT {sql_dsum('x')} AS s, {sql_davg('x')} AS a FROM t"
    ).fetchone()

    assert srow.s == orow[0], f"sum drift: spark={srow.s!r} duckdb={orow[0]!r}"
    assert srow.a == orow[1], f"avg drift: spark={srow.a!r} duckdb={orow[1]!r}"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=_value_lists())
def test_dsum_is_order_independent(spark, values):
    def total(vs, parts):
        return (
            spark.createDataFrame([(v,) for v in vs], "x double")
            .repartition(parts)
            .agg(dsum("x").alias("s"))
            .collect()[0]
            .s
        )

    assert total(values, 1) == total(list(reversed(values)), 7)


def test_dsum_null_and_empty_group_semantics(spark):
    df = spark.createDataFrame([("a", 1.5), ("a", None), ("b", None)], "k string, x double")
    rows = {
        r.k: (r.s, r.a)
        for r in df.groupBy("k").agg(dsum("x").alias("s"), davg("x").alias("a")).collect()
    }
    assert rows["a"] == (1.5, 1.5)  # NULLs skipped, count excludes them
    assert rows["b"][0] is None  # all-NULL group sums to NULL like SQL SUM


# fixture-realistic magnitudes (quantities/prices): 2-decimal values in
# [1, 1000].  The corr guarantee is about THIS regime — with tiny values
# the 1e-6 product quantization legitimately dominates a near-zero
# variance denominator, which is not a regression worth guarding.
_pos_value = st.integers(min_value=100, max_value=100_000).map(lambda n: n / 100)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=st.lists(st.tuples(_pos_value, _pos_value), min_size=5, max_size=80))
def test_exact_moment_correlation_is_bounded_and_close_to_numpy(spark, pairs):
    """The derived corr (agg_exact_corr_regression's formula over exact
    moment sums) stays within [-1, 1] modulo quantization headroom and
    agrees with numpy's direct computation on realistic-magnitude data —
    the closed formula over 1e-6-quantized moments does not distort the
    statistic in the regime the fixtures exercise."""
    import math

    import numpy as np

    xs = np.array([p[0] for p in pairs])
    ys = np.array([p[1] for p in pairs])
    if np.std(xs) == 0 or np.std(ys) == 0:
        return  # degenerate: correlation undefined
    sdf = spark.createDataFrame(pairs, "x double, y double")
    s = sdf.agg(
        F.count("*").cast("double").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    denom = math.sqrt(s.n * s.sxx - s.sx * s.sx) * math.sqrt(s.n * s.syy - s.sy * s.sy)
    if denom < 1.0:
        return  # near-constant columns: quantization dominates, corr unstable
    corr = (s.n * s.sxy - s.sx * s.sy) / denom
    assert -1.0 - 1e-6 <= corr <= 1.0 + 1e-6
    expected = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(corr - expected) < 1e-4


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=_value_lists(), parts=st.integers(min_value=1, max_value=9))
def test_dsum_wide_matches_dsum_and_duckdb(spark, values, parts):
    """dsum_wide must equal dsum wherever dsum's headroom holds, and both
    must stay bit-equal with the (always-HUGEINT-exact) DuckDB mirror."""
    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
        dsum_wide,
    )

    sdf = (
        spark.createDataFrame([(v,) for v in values], "x double")
        .repartition(parts)
        .agg(dsum("x").alias("s"), dsum_wide("x").alias("w"))
    )
    srow = sdf.collect()[0]
    assert srow.w == srow.s

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": values}))
    orow = con.execute(f"SELECT {sql_dsum('x')} AS s FROM t").fetchone()
    con.close()
    assert srow.w == orow[0]


def test_dsum_wide_exact_on_squared_magnitudes(spark):
    """Squared-money magnitudes (~1e10 per value): dsum_wide recombines
    exactly; the closed-form expected sum is computed in Python ints."""
    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
        dsum_wide,
    )

    # money-scale inputs (~1e5) whose squares (~1e10) stay inside the
    # per-row long-quantize cap (|value| <= ~9.2e12, module docstring)
    vals = [98_765.43, 87_654.32, 76_543.21, 65_432.1] * 50
    sq = [round(v * v, 4) for v in vals]
    sdf = spark.createDataFrame([(v,) for v in sq], "x double").agg(
        dsum_wide("x").alias("w")
    )
    got = sdf.collect()[0].w
    expected = float(sum(int(round(v * 1e6)) for v in sq)) / 1e6
    assert got == expected


def test_scaled_quantize_pins_divergence_class_and_2pow52_boundary(spark):
    """Pin the _scaled (guarded FP floor) contract against round()
    (r13 ADVICE item 3) so a future contract change — more decimal
    places, wider magnitudes — fails loudly instead of silently
    shifting per-row quantizes:

    - KNOWN divergence class: a scaled value y with |y| < 1 whose
      fractional part lies within one ulp below .5 rounds AWAY under
      floor(|y| + 0.5) (the + 0.5 add rounds up to 1.0) but to 0 under
      BigDecimal HALF_UP.  The module's <= 6-significant-decimals
      contract keeps real measures five orders of magnitude away from
      this class; this test documents it rather than hiding it.
    - 2^52 boundary: at |y| >= 2^52 doubles are integral and the guard
      passes y through unrounded — identical to ROUND — while just
      BELOW 2^52 the + 0.5 path still matches ROUND exactly.
    """
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
        SCALE,
        _scaled,
    )

    def both(raw_value: float):
        df = spark.createDataFrame([(raw_value,)], "v double")
        row = df.select(
            _scaled("v").alias("flo"),
            F.round(F.col("v") * F.lit(SCALE)).cast("long").alias("rnd"),
        ).collect()[0]
        return row.flo, row.rnd

    # The divergence class in the ABSTRACT: y = 0.49999999999999994
    # (the largest double below 0.5, = 0.5 - 2^-54) floors to 1 under
    # floor(|y| + 0.5) (the add is inexact and lands on 1.0) but rounds
    # to 0 under HALF_UP.  Pin that the class is UNREACHABLE through
    # _scaled at SCALE=1e6: products v*1e6 near 0.5 land on roughly
    # every other double of the finer [0.25, 0.5) binade, and the edge
    # value is one of the skipped ones — no double input v maps onto
    # it (verified over +/-50k neighboring doubles of 0.5/SCALE), so
    # _scaled and round() agree on EVERY reachable input, not merely on
    # the contract's >= 1e-6 magnitudes.
    import math
    import struct

    y_edge = 0.49999999999999994
    assert math.nextafter(y_edge, 1.0) == 0.5  # it IS the edge double
    bits = struct.unpack("<q", struct.pack("<d", y_edge / SCALE))[0]
    reachable = [
        struct.unpack("<d", struct.pack("<q", bits + off))[0]
        for off in range(-50_000, 50_000)
    ]
    assert not any(v * SCALE == y_edge for v in reachable)
    # and on every double that DOES land just below 0.5, both spellings
    # agree (floor 0 == HALF_UP 0)
    near = sorted({v * SCALE for v in reachable if 0.49999999 < v * SCALE < 0.5})
    assert near, "no products just below 0.5?"
    for v in reachable:
        y = v * SCALE
        if 0.49999999 < y < 0.5:
            flo, rnd = both(v)
            assert flo == rnd == 0, (y, flo, rnd)
            break

    # everywhere the module contract allows (|y| >= 1, <= 6 decimals),
    # the two spellings agree — sampled across magnitudes and signs,
    # including exact .5 ties (away from zero in both)
    for y in (0.0, 1.0, -1.0, 2.5, -2.5, 3.49999, 1234567.5, -1234567.5,
              987654321.123456 * SCALE / SCALE, 2.0**52 - 2.5):
        flo, rnd = both(y / SCALE)
        assert flo == rnd, (y, flo, rnd)

    # 2^52 boundary: integral doubles pass through unrounded on both
    # sides of the guard; the odd integer just below 2^52 is the case
    # the guard exists for (the + 0.5 tie would round-to-even it UP)
    for y in (2.0**52, 2.0**52 + 2, -(2.0**52), 4503599627370495.0):
        flo, rnd = both(y / SCALE)
        assert flo == rnd == int(y), (y, flo, rnd)
