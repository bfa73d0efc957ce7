"""Streaming query surface: a real Structured Streaming execution whose
final result is batch-checkable.

``stream_tumbling_counts`` runs readStream -> watermark -> window agg ->
memory sink to completion (availableNow) and returns the materialized
table; in complete output mode the result equals the batch aggregation,
so it gets the full DuckDB oracle — the strongest correctness gate a
streaming op can have.  Update/append-mode semantics (late-data drops,
state eviction) are covered in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    sql_dsum,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    tumbling_counts,
)


@query(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start_sec,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window-agg"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming run: file-source stream ->
    watermarked 10-min tumbling windows -> complete-mode memory sink,
    executed to completion with availableNow.  Equals the batch query
    events_tumbling_counts once all source data is consumed."""
    stream = events_stream(spark, sf_dir)
    return run_to_memory(tumbling_counts(stream), output_mode="complete")
