"""Versioned-table streaming source (sources/versioned_stream.py):
offset tracking across restarts, append-only guard, startingVersion."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.sources import versioned as V
from end_to_end_data_engineering_project_with_databricks_spark.sources.versioned_stream import (
    VersionedStreamDataSource,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, n int")


def _drain(spark, root, qname, ckpt=None, **opts):
    reader = spark.readStream.format("versioned_stream").option("root", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    w = (
        reader.load()
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    q = w.start()
    q.awaitTermination()
    return {(r.k, r.n, r._commit_version) for r in spark.table(qname).collect()}


def test_stream_rows_carry_commit_version(spark, root):
    V.append(_df(spark, [("a", 1), ("b", 2)]), root)
    V.append(_df(spark, [("c", 3)]), root)
    spark.dataSource.register(VersionedStreamDataSource)
    out = _drain(spark, root, "vs_all")
    assert out == {("a", 1, 1), ("b", 2, 1), ("c", 3, 2)}


def test_stream_resumes_from_checkpoint(spark, root, tmp_path):
    # memory sinks don't support recovery; a file sink does — each drain
    # appends only the micro-batches the checkpoint says are unseen
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain_to_files():
        q = (
            spark.readStream.format("versioned_stream")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.k, r.n, r._commit_version) for r in spark.read.parquet(out).collect()}

    V.append(_df(spark, [("a", 1)]), root)
    spark.dataSource.register(VersionedStreamDataSource)
    assert drain_to_files() == {("a", 1, 1)}
    V.append(_df(spark, [("b", 2)]), root)
    # restart with the same checkpoint: ONLY version 2 is re-read; 'a'
    # appearing once proves the offset survived the restart
    assert drain_to_files() == {("a", 1, 1), ("b", 2, 2)}


def test_stream_starting_version_skips_history(spark, root):
    V.append(_df(spark, [("a", 1)]), root)
    V.append(_df(spark, [("b", 2)]), root)
    spark.dataSource.register(VersionedStreamDataSource)
    out = _drain(spark, root, "vs_sv", startingVersion="2")
    assert out == {("b", 2, 2)}


def test_stream_rejects_file_removing_commits_unless_opted_in(spark, root):
    V.append(_df(spark, [("a", 1), ("b", 2)]).coalesce(1), root)
    V.merge_upsert(_df(spark, [("a", 10)]), root, key="k")  # CoW rewrite
    spark.dataSource.register(VersionedStreamDataSource)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append-only"):
        _drain(spark, root, "vs_guard")
    # Delta's ignoreChanges analog: rewritten files stream through
    out = _drain(spark, root, "vs_ic", ignoreChanges="true")
    assert ("a", 10, 2) in out and ("b", 2, 2) in out  # rewritten file rows


def test_stdlib_manifest_helpers_in_lockstep_with_versioned(spark, root):
    """versioned_stream re-implements the manifest read path with stdlib
    only (its methods run in Python workers without the package on
    sys.path); this pins the two implementations to the same layout."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned_stream as VS,
    )

    V.append(_df(spark, [("a", 1)]), root)
    V.append(_df(spark, [("b", 2)]), root)
    import os

    aroot = os.path.abspath(root)
    assert VS._list_versions(aroot) == V.list_versions(aroot) == [1, 2]
    assert VS._read_manifest(aroot, 2) == V._read_manifest(aroot, 2)
