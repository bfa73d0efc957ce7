"""Incremental materialized-view maintenance: incremental refresh must be
bit-identical to a from-scratch rebuild, across appends, merges, and
deletes, including group birth and group death."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.operators import matview as MV
from end_to_end_data_engineering_project_with_databricks_spark.sources import versioned as V


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "view")


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, price double")


def _as_sorted_rows(df):
    return [tuple(r) for r in df.orderBy(df.columns).collect()]


def _rebuild(spark, src_root, tmp_path, name):
    fresh = str(tmp_path / name)
    MV.create(spark, src_root, fresh, group_cols=["grp"], sum_cols=["price"])
    return MV.read_view(spark, fresh)


def test_refresh_equals_full_recompute(spark, roots, tmp_path):
    src, view = roots
    V.append(
        _orders(spark, [(1, "a", 10.5), (2, "a", 2.25), (3, "b", 7.0)]), src
    )
    MV.create(spark, src, view, group_cols=["grp"], sum_cols=["price"])

    # append (new group c is born), merge-update (k=1 repriced),
    # delete (kills one row of a)
    V.append(_orders(spark, [(4, "c", 100.0), (5, "b", 1.0)]), src)
    V.merge_upsert(_orders(spark, [(1, "a", 99.5)]), src, key="k")
    V.delete_where(spark, src, "k = 2")
    MV.refresh(spark, view)

    got = _as_sorted_rows(MV.read_view(spark, view))
    want = _as_sorted_rows(_rebuild(spark, src, tmp_path, "rebuild1"))
    assert got == want
    assert got == [("a", 1, 99.5), ("b", 2, 8.0), ("c", 1, 100.0)]


def test_group_death_deletes_view_row(spark, roots, tmp_path):
    src, view = roots
    V.append(_orders(spark, [(1, "a", 1.0), (2, "b", 2.0)]), src)
    MV.create(spark, src, view, group_cols=["grp"], sum_cols=["price"])
    V.delete_where(spark, src, "grp = 'b'")
    MV.refresh(spark, view)
    got = _as_sorted_rows(MV.read_view(spark, view))
    assert got == [("a", 1, 1.0)]  # no ghost zero-count row for b


def test_refresh_is_noop_when_source_unchanged(spark, roots):
    src, view = roots
    V.append(_orders(spark, [(1, "a", 1.0)]), src)
    MV.create(spark, src, view, group_cols=["grp"], sum_cols=["price"])
    v_before = V.list_versions(view)[-1]
    assert MV.refresh(spark, view) == v_before  # no new view commit


def test_multi_refresh_accumulates_exactly(spark, roots, tmp_path):
    src, view = roots
    V.append(_orders(spark, [(1, "a", 0.1), (2, "a", 0.2)]), src)
    MV.create(spark, src, view, group_cols=["grp"], sum_cols=["price"])
    # two refresh cycles; float 0.1+0.2 famously drifts under reordering,
    # the fixed-point state must not
    V.append(_orders(spark, [(3, "a", 0.3)]), src)
    MV.refresh(spark, view)
    V.delete_where(spark, src, "k = 1")
    MV.refresh(spark, view)
    got = _as_sorted_rows(MV.read_view(spark, view))
    want = _as_sorted_rows(_rebuild(spark, src, tmp_path, "rebuild2"))
    assert got == want
    assert got == [("a", 2, 0.5)]


def test_null_group_keys_survive_roundtrip(spark, roots, tmp_path):
    src, view = roots
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, "x", 1.0), (3, None, 2.0)],
        "k long, grp string, price double",
    )
    V.append(df, src)
    MV.create(spark, src, view, group_cols=["grp"], sum_cols=["price"])
    V.delete_where(spark, src, "k = 3")
    MV.refresh(spark, view)
    rows = {r.grp: (r.n_rows, r.sum_price) for r in MV.read_view(spark, view).collect()}
    assert rows == {None: (1, 5.0), "x": (1, 1.0)}


def test_streaming_pipeline_maintains_view(spark, roots, tmp_path):
    """End-to-end incremental pipeline: files stream in via foreachBatch
    MERGE commits on the versioned table; one CDF-driven refresh then
    brings the materialized view to the exact full-recompute state."""
    src, view = roots
    V.append(_orders(spark, [(1, "a", 1.0), (2, "b", 2.0)]), src)
    MV.create(spark, src, view, group_cols=["grp"], sum_cols=["price"])

    indir = str(tmp_path / "incoming")
    _orders(spark, [(2, "b", 20.0), (3, "c", 3.0)]).coalesce(1).write.parquet(
        os.path.join(indir, "batch1")
    )
    _orders(spark, [(4, "a", 4.0)]).coalesce(1).write.parquet(
        os.path.join(indir, "batch2")
    )
    stream = (
        spark.readStream.schema("k long, grp string, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(indir, "*"))
    )

    def sink(batch_df, batch_id):
        V.merge_upsert(batch_df, src, key="k")

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    MV.refresh(spark, view)
    got = _as_sorted_rows(MV.read_view(spark, view))
    want = _as_sorted_rows(_rebuild(spark, src, tmp_path, "rebuild_stream"))
    assert got == want
    assert got == [("a", 2, 5.0), ("b", 1, 20.0), ("c", 1, 3.0)]
