"""Structured Streaming tests: incremental file-source micro-batches,
watermarked dedup with state eviction, session windows, and the
foreachBatch idempotent sink (streaming twin of the reference's scheduled
batch job)."""

from __future__ import annotations

import itertools
import os
import time

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.streaming.windows import (
    EVENTS_STREAM_SCHEMA,
    dedup_within_watermark,
    events_stream,
    run_foreach_batch_idempotent,
    run_to_memory,
    session_windows,
    tumbling_counts,
)

_counter = itertools.count()


def _write_events(spark, path, rows):
    """rows: (event_id, ts_sec, user_id, event_type, value, props)"""
    df = spark.createDataFrame(
        [(e, t * 1_000_000_000, u, et, v, p) for e, t, u, et, v, p in rows],
        EVENTS_STREAM_SCHEMA,
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    result = run_to_memory(tumbling_counts(stream), output_mode="complete")
    got = result.agg(F.sum("n_events")).collect()[0][0]
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got == expected


def test_session_window_stream(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    base = 1_700_000_000
    _write_events(
        spark,
        src,
        [
            (1, base, 1, "click", 1.0, "{}"),
            (2, base + 60, 1, "click", 1.0, "{}"),       # same session
            (3, base + 60 + 3600, 1, "click", 1.0, "{}"),  # new session (>30min gap)
            (4, base, 2, "view", 1.0, "{}"),
        ],
    )
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    stream = raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    )
    out = run_to_memory(session_windows(stream, "30 minutes"), output_mode="complete")
    sessions = {(r.user_id, r.session_start_sec): r.n_events for r in out.collect()}
    assert sessions == {
        (1, base): 2,
        (1, base + 60 + 3600): 1,
        (2, base): 1,
    }


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    base = 1_700_000_000
    _write_events(
        spark,
        src,
        [
            (100, base, 1, "click", 1.0, "{}"),
            (100, base + 10, 1, "click", 1.0, "{}"),  # duplicate event_id
            (101, base + 20, 1, "click", 1.0, "{}"),
        ],
    )
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    stream = raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    )
    out = run_to_memory(
        dedup_within_watermark(stream, ["event_id"], "1 hour"), output_mode="append"
    )
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [100, 101]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state between micro-batches:
    the second run (same checkpoint) must emit totals that include the
    first run's events."""
    from end_to_end_data_engineering_project_with_databricks_spark.streaming.stateful import (
        USER_TOTALS_SCHEMA,
        running_user_totals,
    )

    src = str(tmp_path / "state_src")
    base = 1_700_000_000
    # two files written sequentially -> with maxFilesPerTrigger=1,
    # availableNow runs them as two micro-batches in mtime order
    _write_events(spark, src, [(1, base, 1, "click", 1.0, "{}"),
                               (2, base + 1, 1, "view", 1.0, "{}"),
                               (3, base + 2, 2, "click", 1.0, "{}")])
    time.sleep(1.1)  # distinct mtimes for deterministic batch order
    _write_events(spark, src, [(4, base + 10, 1, "click", 1.0, "{}"),
                               (5, base + 11, 3, "click", 1.0, "{}")])

    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    )
    out = run_to_memory(running_user_totals(stream), output_mode="update")
    emissions = sorted((r.user_id, r.n_events) for r in out.collect())
    # batch 1 emits (1:2, 2:1); batch 2 re-emits user 1 with carried-over
    # state (1:3) plus the new user (3:1)
    assert emissions == [(1, 2), (1, 3), (2, 1), (3, 1)]


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """Stream micro-batches with overlapping keys through the anti-join
    sink: re-delivered keys must not duplicate (exactly-once-per-key)."""
    table = f"delta_tables.stream_sink_t{next(_counter)}"
    src = str(tmp_path / "fb_src")
    ckpt = str(tmp_path / "fb_ckpt")

    def video_rows(ids):
        return spark.createDataFrame(
            [
                ("kw", "e", "npt", f"vid-{i}", f"t{i}", f"d{i}", f"c{i}", None)
                for i in ids
            ],
            "keyword string, etag string, nextPageToken string, videoId string,"
            " title string, description string, channelTitle string,"
            " publishedAt timestamp",
        )

    schema = video_rows([]).schema
    video_rows(range(0, 10)).coalesce(1).write.mode("append").parquet(src)

    try:
        stream = spark.readStream.schema(schema).parquet(src)
        sink = run_foreach_batch_idempotent(stream, table, ckpt)
        assert sink.count() == 10

        # second delivery: 5 repeated keys + 5 new ones
        video_rows(range(5, 20)).coalesce(1).write.mode("append").parquet(src)
        sink = run_foreach_batch_idempotent(
            spark.readStream.schema(schema).parquet(src), table, ckpt
        )
        assert sink.count() == 20  # 0..19, no duplicates
        assert sink.select("videoId").distinct().count() == 20
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_file_stream_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Offset tracking across restarts: a second availableNow run with the
    SAME checkpoint processes only files that arrived after the first run
    — re-running never duplicates already-committed input (exactly-once
    per input file), the property that makes scheduled incremental
    ingest safe to re-run.  File sink + checkpoint is the recoverable
    pair (memory sinks cannot recover)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.range(0, 10).write.parquet(src)

    def drain():
        stream = spark.readStream.schema("id long").parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.id for r in spark.read.parquet(out).collect())

    assert drain() == list(range(10))
    # re-run with nothing new: nothing is reprocessed
    assert drain() == list(range(10))
    # new files land; restart from the same checkpoint picks up ONLY them
    spark.range(10, 25).write.mode("append").parquet(src)
    assert drain() == list(range(25))  # no duplicates of 0-9


def test_foreach_batch_versioned_merge_sink(spark, tmp_path):
    """Streaming micro-batches with overlapping keys through the
    versioned-table MERGE sink: re-delivered keys replace (not
    duplicate), and the sink stays consistent batch over batch —
    the concurrent-writer-safe alternative to the insertInto path."""
    from end_to_end_data_engineering_project_with_databricks_spark.streaming.windows import (
        run_foreach_batch_versioned,
    )

    src = str(tmp_path / "vm_src")
    ckpt = str(tmp_path / "vm_ckpt")
    root = str(tmp_path / "vm_table")
    schema = "k long, v string"

    spark.createDataFrame([(i, f"a{i}") for i in range(10)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    out = run_foreach_batch_versioned(
        spark.readStream.schema(schema).parquet(src), root, key="k",
        checkpoint_dir=ckpt,
    )
    assert out.count() == 10

    # second delivery: 5 overlapping keys (new values) + 5 new keys
    spark.createDataFrame([(i, f"b{i}") for i in range(5, 20)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    out = run_foreach_batch_versioned(
        spark.readStream.schema(schema).parquet(src), root, key="k",
        checkpoint_dir=ckpt,
    )
    rows = {r.k: r.v for r in out.collect()}
    assert len(rows) == 20                       # no duplicate keys
    assert rows[3] == "a3" and rows[7] == "b7"   # overlap replaced, old kept


def test_transform_with_state_gated_or_correct(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) either
    runs and matches the batch aggregate, or raises the documented
    ImportError in protobuf-less environments — never a silent wrong
    answer or an opaque crash."""
    import pytest as _pytest

    from end_to_end_data_engineering_project_with_databricks_spark.streaming.stateful import (
        transform_with_state_available,
        user_stats_transform_with_state,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )

    stream = events_stream(spark, sf_dir)
    if not transform_with_state_available():
        with _pytest.raises(ImportError, match="protobuf"):
            user_stats_transform_with_state(stream)
        return
    out = run_to_memory(
        user_stats_transform_with_state(stream), output_mode="update"
    )
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
        _scaled,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_scaled("value")).alias("value_micros"),
            F.count_distinct("event_type").alias("n_types"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_multibatch_stream_state_merges_across_triggers(spark, sf_dir, tmp_path):
    """Real multi-batch state evolution: the events table split into 4
    time-ranged files, streamed one file per trigger — the windowed
    aggregate's state store must merge partial counts across FOUR
    micro-batches and still equal the single-pass batch aggregate.
    (The fixture is one file, so the driver-facing stream queries run a
    single batch; this is the cross-trigger merge coverage.)"""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    src = str(tmp_path / "events_parts")
    e = load_table(spark, sf_dir, "events")
    e.repartitionByRange(4, "ts").write.parquet(src)

    raw_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = run_to_memory(tumbling_counts(stream), output_mode="complete")

    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    want = all_specs()["events_tumbling_counts"].fn(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
