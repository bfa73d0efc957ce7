"""Parity between the versioned-table twin and real Delta Lake
(docs/DELTA_MAPPING.md).

Runs only where ``delta-spark`` is importable (Databricks or a cluster
with the Delta jars); this container has no Delta, so the whole module
skips.  The scenario mirrors the twin's own test coverage: append →
time travel → copy-on-write MERGE → change feed, asserting the twin and
Delta produce the same snapshots at every step.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

delta_available = importlib.util.find_spec("delta") is not None

pytestmark = pytest.mark.skipif(
    not delta_available, reason="delta-spark not installed (docs/DELTA_MAPPING.md)"
)


@pytest.fixture(scope="module")
def delta_spark():
    """A session with the Delta extensions wired in (the shared ``spark``
    fixture has no Delta catalog)."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-parity")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v").collect())


def test_append_time_travel_merge_cdf_parity(delta_spark, tmp_path):
    from delta.tables import DeltaTable

    from end_to_end_data_engineering_project_with_databricks_spark.sources import versioned

    spark = delta_spark
    twin_root = str(tmp_path / "twin")
    delta_root = str(tmp_path / "delta")

    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")

    # v0: append
    versioned.append(b0, twin_root)
    (
        b0.write.format("delta")
        .option("delta.enableChangeDataFeed", "true")
        .mode("append")
        .save(delta_root)
    )

    # v1: MERGE upsert on k
    versioned.merge_upsert(b1, twin_root, key="k")
    (
        DeltaTable.forPath(spark, delta_root)
        .alias("t")
        .merge(b1.alias("s"), "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )

    # latest snapshots agree
    assert _rows(versioned.read(spark, twin_root)) == _rows(
        spark.read.format("delta").load(delta_root)
    )
    # time travel to v0 agrees
    assert _rows(versioned.read(spark, twin_root, version=0)) == _rows(
        spark.read.format("delta").option("versionAsOf", 0).load(delta_root)
    )

    # change feed v0 -> v1: same net row-level delta (twin collapses
    # update_pre/postimage to delete+insert; normalize both to that)
    twin_changes = versioned.table_changes(spark, twin_root, 0, 1)
    delta_changes = (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .option("endingVersion", 1)
        .load(delta_root)
        .withColumn(
            "_change_type",
            # update_preimage == deleted pre-row, update_postimage == inserted post-row
            F.expr(
                "CASE _change_type WHEN 'update_preimage' THEN 'delete' "
                "WHEN 'update_postimage' THEN 'insert' ELSE _change_type END"
            ),
        )
    )
    to_set = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select("k", "v", "_change_type").collect()
    )
    assert to_set(twin_changes) == to_set(delta_changes)
