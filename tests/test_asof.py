"""As-of join edge cases (operators/asof.py): tie at equal timestamps,
no preceding right row, tolerance cutoff, inner vs left."""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c"), (3, 10, "d")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 11.0), (2, 60, 20.0)],
        "k long, ts long, rv double",
    )
    return left, right


def test_asof_left_basic(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, keys=["k"], ts_col="ts", right_payload=["rv"])
    rows = {(r.k, r.ts): (r.matched_ts, r.rv) for r in out.collect()}
    assert rows == {
        (1, 100): (100, 10.0),  # tie: right at equal ts matches (<=)
        (1, 200): (150, 11.0),  # latest prior
        (2, 50): (None, None),  # right exists but only later
        (3, 10): (None, None),  # key has no right rows at all
    }
    assert out.count() == 4  # left join keeps everything


def test_asof_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_payload=["rv"], how="inner"
    )
    assert sorted((r.k, r.ts) for r in out.collect()) == [(1, 100), (1, 200)]


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_payload=["rv"], tolerance=20
    )
    rows = {(r.k, r.ts): r.rv for r in out.collect()}
    # (1,200): latest right is at 150, gap 50 > 20 -> nulled out
    assert rows == {(1, 100): 10.0, (1, 200): None, (2, 50): None, (3, 10): None}


def test_asof_preserves_left_payload(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, keys=["k"], ts_col="ts", right_payload=["rv"])
    assert {r.lv for r in out.collect()} == {"a", "b", "c", "d"}


def test_asof_forward_basic(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_payload=["rv"],
        direction="forward",
    )
    rows = {(r.k, r.ts): (r.matched_ts, r.rv) for r in out.collect()}
    assert rows == {
        (1, 100): (100, 10.0),  # tie: right at equal ts matches (>=)
        (1, 200): (None, None),  # nothing later
        (2, 50): (60, 20.0),  # earliest following
        (3, 10): (None, None),
    }


def test_asof_forward_multiple_lefts_share_timestamp(spark):
    # regression: with several left rows at the same ts, the equal-ts
    # right must match EVERY one of them, not just the first in order
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 100, "b"), (1, 100, "c")], "k long, ts long, lv string"
    )
    right = spark.createDataFrame([(1, 100, 7.0)], "k long, ts long, rv double")
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_payload=["rv"],
        direction="forward",
    )
    assert [r.rv for r in out.collect()] == [7.0, 7.0, 7.0]


def test_asof_nearest_prefers_closer_and_breaks_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 149), (1, 210), (1, 205), (1, 400)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, 150, 2.0), (1, 200, 3.0), (1, 220, 4.0)],
        "k long, ts long, rv double",
    )
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_payload=["rv"],
        direction="nearest",
    )
    rows = {r.ts: (r.matched_ts, r.rv) for r in out.collect()}
    assert rows[100] == (90, 1.0)    # 10 back beats 50 forward
    assert rows[149] == (150, 2.0)   # 1 forward beats 59 back
    assert rows[210] == (200, 3.0)   # exact tie (10 vs 10) -> backward wins
    assert rows[205] == (200, 3.0)   # 5 back beats 15 forward
    assert rows[400] == (220, 4.0)   # only backward exists


def test_asof_nearest_tolerance_applies_both_directions(spark):
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 250, 2.0)], "k long, ts long, rv double"
    )
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_payload=["rv"],
        direction="nearest", tolerance=50,
    )
    assert [r.rv for r in out.collect()] == [None]  # 90 back, 150 fwd: both out
