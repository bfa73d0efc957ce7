"""Oracle-checked queries mapping 1:1 to the reference's own operator
inventory (SURVEY.md §2.1), so the driver's correctness gate covers parity
ops directly — the full pipeline composition is exercised end-to-end in
tests/test_pipeline_parity.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.pipeline.video_etl import (
    SyntheticVideoSource,
    load_raw,
    transform,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


@query(
    "ref_antijoin_incremental",
    oracle="""
    SELECT o.o_custkey, COUNT(*) AS n_new_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
      AND NOT EXISTS (
        SELECT 1 FROM orders p
        WHERE p.o_custkey = o.o_custkey
          AND p.o_orderdate < TIMESTAMP '1999-01-01'
      )
    GROUP BY o.o_custkey
    """,
    tags=("join", "dedup", "reference"),
)
def ref_antijoin_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core operator — LEFT ANTI join as incremental dedup
    (``result_df.join(existing_table, "videoId", "left_anti")``,
    ETL_pipeline_countries.py:137) — on fixture data: treat pre-1999
    orders as the sink, 1999+ orders as the new batch, keyed by customer.

    Scale note: the reference anti-joins the FULL sink each run; the
    partition-pruned variant (dedup_scope in pipeline/video_etl.py) keeps
    this O(recent) instead of O(history)."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")
    new_batch = o.filter(F.col("o_orderdate") >= cut)
    sink = o.filter(F.col("o_orderdate") < cut).select("o_custkey")
    return (
        new_batch.join(sink, "o_custkey", "left_anti")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_new_orders"))
    )


@query(
    "ref_nested_struct_flatten",
    oracle="""
    SELECT event_id AS eid, event_type AS etype, value AS val
    FROM events
    WHERE event_id < 50
    """,
    tags=("projection", "reference"),
)
def ref_nested_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct build + dotted-path extraction — the reference's
    ``item.id.videoId`` / ``item.snippet.*`` pattern
    (ETL_pipeline_countries.py:101-110).  Constructs the nested shape then
    flattens it back; Catalyst collapses the round-trip to a plain
    projection (constant-time, no row cost)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    nested = e.select(
        F.struct(
            F.struct(F.col("event_id").alias("eid")).alias("id"),
            F.struct(
                F.col("event_type").alias("etype"), F.col("value").alias("val")
            ).alias("snippet"),
        ).alias("item")
    )
    return nested.select(
        F.col("item.id.eid").alias("eid"),
        F.col("item.snippet.etype").alias("etype"),
        F.col("item.snippet.val").alias("val"),
    )


_EXPECTED_ROWS_SQL = """
    SELECT * FROM (VALUES
      ('Fixture', 'etag-Fixture-7', 'CAUQAA', 'vid-Fixture-7-0000',
       'Fixture video 0', 'About Fixture #0', 'channel-0', TIMESTAMP '2024-05-01 12:34:56'),
      ('Fixture', 'etag-Fixture-7', 'CAUQAA', 'vid-Fixture-7-0001',
       'Fixture video 1', 'About Fixture #1', 'channel-1', TIMESTAMP '2024-05-02 12:34:56'),
      ('Fixture', 'etag-Fixture-7', 'CAUQAA', 'vid-Fixture-7-0002',
       'Fixture video 2', 'About Fixture #2', 'channel-2', TIMESTAMP '2024-05-03 12:34:56'),
      ('Fixture', 'etag-Fixture-7', 'CAUQAA', 'vid-Fixture-7-0003',
       'Fixture video 3', 'About Fixture #3', 'channel-3', TIMESTAMP '2024-05-04 12:34:56'),
      ('Fixture', 'etag-Fixture-7', 'CAUQAA', 'vid-Fixture-7-0004',
       'Fixture video 4', 'About Fixture #4', 'channel-4', TIMESTAMP '2024-05-05 12:34:56')
    ) AS t(keyword, etag, nextPageToken, videoId, title, description,
           channelTitle, publishedAt)
"""


@query(
    "ref_multiline_json_pipeline",
    oracle=_EXPECTED_ROWS_SQL,
    tags=("source", "generator", "reference"),
)
def ref_multiline_json_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end bronze->silver slice: synthetic extract -> pretty-JSON
    landing -> ``multiLine=true`` scan with schema inference -> lit/explode/
    flatten/cast (ETL_pipeline_countries.py:52-113 compressed into one
    checkable query).  The oracle is the statically known payload as a
    VALUES relation."""
    import tempfile

    payload = SyntheticVideoSource(seed=7).fetch("Fixture", 5)
    raw_dir = tempfile.mkdtemp(prefix=f"ref_pipeline_{uuid.uuid4().hex[:8]}_")
    path = load_raw(payload, "search_Fixture_video_results", raw_dir)
    return transform(spark, "Fixture", path).withColumn(
        "publishedAt", F.col("publishedAt").cast("timestamp_ntz")
    )
