"""Fixture-drift tripwire (VERDICT r2 item #2).

The round-2 regression: the driver regenerated ``events.parquet`` with a
different physical timestamp layout (``timestamp[ns]`` -> ``timestamp[us]``)
and the hard-coded nanos normalization errored in batch and *silently*
compressed the whole dataset into epoch-1970 in streaming.  These tests fail
loudly at the reader if the physical layout drifts again: any layout that
``load_table`` / ``events_stream`` normalizes incorrectly lands event time
outside the fixture's known year (2024) or changes the dtype.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    load_table,
)
from end_to_end_data_engineering_project_with_databricks_spark.streaming.windows import (
    events_stream,
    run_to_memory,
)

FIXTURE_YEAR = 2024


def _assert_ts_in_fixture_year(df):
    lo, hi = df.agg(
        F.min(F.year("ts")).alias("lo"), F.max(F.year("ts")).alias("hi")
    ).collect()[0]
    assert lo == FIXTURE_YEAR and hi == FIXTURE_YEAR, (
        f"events.ts normalized outside the fixture year: years [{lo}, {hi}] — "
        "the fixture's physical timestamp layout likely drifted; "
        "check sources/readers._normalize_event_time"
    )


def test_batch_events_ts_lands_in_fixture_year(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    _assert_ts_in_fixture_year(df)


def test_batch_events_ts_bare_session(spark, sf_dir):
    """Same check through a session that did NOT pre-pin confs (the driver
    owns its own session; load_table must self-pin and still normalize)."""
    bare = spark.newSession()  # fresh conf view, no fixtures applied
    df = load_table(bare, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    _assert_ts_in_fixture_year(df)


def test_stream_events_ts_lands_in_fixture_year(spark, sf_dir):
    """The silent half of the r2 regression: a wrong stream schema reads
    raw micros as nanos and collapses 30 days of data into ~25 windows.
    Materialize the stream and assert real event-time survived."""
    out = run_to_memory(
        events_stream(spark, sf_dir).select("ts"), output_mode="append"
    )
    _assert_ts_in_fixture_year(out)


def test_stream_and_batch_agree_on_row_count_and_range(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = run_to_memory(events_stream(spark, sf_dir), output_mode="append")
    b = batch.agg(
        F.count("*").alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    s = stream.agg(
        F.count("*").alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    assert (b.n, b.lo, b.hi) == (s.n, s.lo, s.hi)
