"""Structured Streaming operators: watermarked windows, streaming dedup,
and the foreachBatch idempotent sink.

The reference has no streams — its "streaming" is a scheduled batch
re-run of the notebook (README.md:261-270) made safe by the anti-join
(ETL_pipeline_countries.py:137).  The idiomatic Spark generalizations
(SURVEY.md §2.2 streaming row):

- ``readStream`` file source over the same Parquet the batch engine reads;
- ``withWatermark`` + ``window()/session_window()`` for event-time aggs
  with bounded state;
- ``dropDuplicatesWithinWatermark`` for streaming key-dedup with state
  eviction (the unbounded-state-safe version of the reference's dedup);
- ``foreachBatch`` reusing the batch anti-join sink — exactly-once-per-key
  appends from a stream.

Scale notes: state stores shard by the grouping key (same shuffle
partitioning rules as batch); the watermark bounds state size — without
it, windowed state grows forever, the streaming equivalent of the
reference's O(full-sink) anti-join problem.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import dsum
from end_to_end_data_engineering_project_with_databricks_spark.session import pin_session_conf

#: int64-nanos events layout (``timestamp[ns]`` under ``nanosAsLong``).
#: NOT assumed for the fixture — :func:`events_stream` introspects the real
#: footer; tests use this to synthesize nanos-layout files deliberately.
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events Parquet with event-time normalized
    to TIMESTAMP_NTZ — the streaming twin of
    sources/readers.load_table("events").

    Streaming file sources cannot infer schemas, so the stream schema is
    derived from the *batch* footer of the same file (a driver-side
    metadata read).  This keeps the stream layout-adaptive: a
    ``timestamp[ns]`` fixture surfaces ``ts`` as int64 nanos under
    ``nanosAsLong``, a ``timestamp[us]`` fixture as TIMESTAMP_NTZ — a
    hard-coded ``ts long`` schema silently reinterprets raw micros as
    nanos (the round-2 stream_tumbling_counts 25-vs-8016-row corruption).
    """
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        _normalize_event_time,
        table_path,
    )

    pin_session_conf(spark)
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # the fixture is a single file, but the file stream source needs a
    # directory: stream the sf_dir with a glob pinned to the events file
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks reject TIMESTAMP_NTZ; with the session pinned to UTC the
    # cast to TIMESTAMP preserves wall time (naive-UTC fixture semantics).
    return raw.withColumn(
        "ts", _normalize_event_time(raw_schema["ts"].dataType).cast("timestamp")
    )


def tumbling_counts(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked 10-minute tumbling window aggregate — the streaming
    form of queries/events_analytics.events_tumbling_counts; identical
    results once all data is processed."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start_sec"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked sliding windows (10-minute length, 5-minute hop):
    every event updates two overlapping windows' state — the streaming
    twin of events_sliding_windows."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start_sec"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """``session_window`` stateful aggregation: sessions close after
    ``gap`` of event-time inactivity per user (merged dynamically by the
    state store) — the streaming twin of events_sessionize."""
    return (
        stream.withWatermark("ts", gap)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_sec"),
            "n_events",
            "total_value",
        )
    )


def click_purchase_stream_join(
    stream: DataFrame, horizon: str = "1 hour", how: str = "inner"
) -> DataFrame:
    """Stream-stream join: each click matched to the same user's
    purchases within ``horizon`` after it.

    Both sides carry watermarks and the join condition bounds event time
    in both directions, so the state store can evict: a buffered click
    older than (watermark - horizon) can never match a future purchase
    and is dropped — without the time bound, stream-stream join state
    grows forever.  Inner-join matches emit as soon as both sides arrive
    (no watermark wait), so the completed availableNow run equals the
    batch join.

    With ``how="left_outer"`` unmatched clicks additionally emit with a
    null purchase — but only once the watermark proves no match can
    still arrive (click_ts + horizon < final watermark).  Clicks inside
    the final watermark horizon stay buffered when the stream ends:
    batch-equivalence holds for the watermark-closed region only, which
    is exactly what the stream_stream_left_join oracle mirrors."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", horizon)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", horizon)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")).alias(
            "gap_sec"
        ),
    )


def dedup_within_watermark(stream: DataFrame, keys: list[str], watermark: str) -> DataFrame:
    """Streaming key-dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` evicts seen-keys older than the
    watermark — the state-safe generalization of the reference's
    anti-join dedup for true streams."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    result: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion against the available
    data (``trigger(availableNow)``) into an in-memory sink and return the
    materialized result as a batch DataFrame.

    availableNow processes everything currently in the source then stops —
    the Structured-Streaming equivalent of the reference's scheduled
    one-shot notebook run."""
    spark = result.sparkSession
    qname = name or f"memsink_{uuid.uuid4().hex[:12]}"
    query = (
        result.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(qname)


def foreach_batch_idempotent(
    stream: DataFrame,
    table: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """Stream -> idempotent sink: every micro-batch goes through the batch
    engine's anti-join append (pipeline/video_etl.load_into_table), giving
    exactly-once-per-key semantics end-to-end even under retries.  The
    streaming generalization of the reference's scheduled job."""
    from end_to_end_data_engineering_project_with_databricks_spark.pipeline.video_etl import (
        load_into_table,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        load_into_table(batch_df.sparkSession, batch_df, table=table)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def run_foreach_batch_versioned(
    stream: DataFrame, root: str, key: str, checkpoint_dir: str
) -> DataFrame:
    """Stream -> versioned-table sink via copy-on-write MERGE per
    micro-batch: insert-or-replace on ``key``, safe under BOTH retries
    (a re-delivered batch merges to the same state) and concurrent
    writers (merge's optimistic commit recomputes its touched-file set
    against the new head on every lost race — unlike the parquet
    ``insertInto`` path, whose check-then-act dedup assumes a single
    writer; see pipeline/video_etl.load_into_table).  Returns the table
    head after the stream drains."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        V.merge_upsert(batch_df, root, key=key)

    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return V.read(stream.sparkSession, root)


def run_foreach_batch_idempotent(
    stream: DataFrame, table: str, checkpoint_dir: str
) -> DataFrame:
    """Run :func:`foreach_batch_idempotent` to completion and return the
    sink table as a batch DataFrame.

    foreachBatch executes the sink in a *cloned* session; the caller's
    session keeps its own cached file listing for the table and would
    read a stale snapshot after the stream finishes.  This helper
    refreshes the caller's catalog entry after ``awaitTermination`` so
    the returned DataFrame sees every appended file."""
    query = foreach_batch_idempotent(stream, table, checkpoint_dir).start()
    query.awaitTermination()
    spark = stream.sparkSession
    spark.catalog.refreshTable(table)
    return spark.table(table)
