"""Pipeline-parity tests (SURVEY.md §5 strategy #3): the exact semantics of
the reference's load stage (ETL_pipeline_countries.py:129-138):

(a) first load appends all rows (no dedup on the empty-table branch);
(b) identical re-run appends zero;
(c) overlapping batch appends only unseen videoIds;
(d) intra-batch duplicates survive (reference has no dropDuplicates);
(e) a re-seen videoId under a different keyword is dropped, not updated
    (latest-keyword-loses).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql.types import TimestampType

from end_to_end_data_engineering_project_with_databricks_spark.pipeline.video_etl import (
    RESULT_COLUMNS,
    SyntheticVideoSource,
    load_into_table,
    load_raw,
    run_pipeline,
    transform,
)

_counter = itertools.count()


@pytest.fixture()
def sink_table(spark):
    name = f"delta_tables.video_results_t{next(_counter)}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_first_load_appends_all_then_rerun_appends_zero(spark, tmp_path, sink_table):
    src = SyntheticVideoSource(seed=1)
    n1 = run_pipeline(spark, src, str(tmp_path), keyword="Alpha", max_results=20, table=sink_table)
    assert n1 == 20
    assert spark.table(sink_table).count() == 20

    n2 = run_pipeline(spark, src, str(tmp_path), keyword="Alpha", max_results=20, table=sink_table)
    assert n2 == 0
    assert spark.table(sink_table).count() == 20


def test_overlapping_batch_appends_only_new(spark, tmp_path, sink_table):
    src = SyntheticVideoSource(seed=2, overlap=5)
    n1 = run_pipeline(spark, src, str(tmp_path), keyword="Alpha", max_results=20, table=sink_table)
    assert n1 == 20
    n2 = run_pipeline(spark, src, str(tmp_path), keyword="Beta", max_results=20, table=sink_table)
    assert n2 == 15  # the 5 shared videoIds are anti-joined away

    # latest-keyword-loses: shared ids keep the FIRST keyword (no upsert)
    shared = (
        spark.table(sink_table)
        .filter("videoId LIKE 'vid-shared-%'")
        .select("keyword")
        .distinct()
        .collect()
    )
    assert [r.keyword for r in shared] == ["Alpha"]


def test_intra_batch_duplicates_survive(spark, tmp_path, sink_table):
    payload = SyntheticVideoSource(seed=3).fetch("Gamma", 4)
    payload["items"].append(payload["items"][0])  # duplicate videoId in-batch
    path = load_raw(payload, "dup_batch", str(tmp_path))
    df = transform(spark, "Gamma", path)
    n = load_into_table(spark, df, table=sink_table)
    assert n == 5  # reference semantics: intra-batch dup kept on first load
    assert spark.table(sink_table).count() == 5


def test_dedup_within_batch_extension(spark, tmp_path, sink_table):
    payload = SyntheticVideoSource(seed=4).fetch("Delta", 4)
    payload["items"].append(payload["items"][0])
    path = load_raw(payload, "dup_batch2", str(tmp_path))
    df = transform(spark, "Delta", path)
    n = load_into_table(spark, df, table=sink_table, dedup_within_batch=True)
    assert n == 4  # extension removes the intra-batch duplicate


def test_transform_schema_and_values(spark, tmp_path):
    payload = SyntheticVideoSource(seed=5).fetch("Echo", 3)
    path = load_raw(payload, "schema_check", str(tmp_path))
    df = transform(spark, "Echo", path)
    assert tuple(df.columns) == RESULT_COLUMNS
    assert isinstance(df.schema["publishedAt"].dataType, TimestampType)
    rows = df.orderBy("videoId").collect()
    assert len(rows) == 3
    assert rows[0].keyword == "Echo"
    assert rows[0].videoId == "vid-Echo-5-0000"
    assert rows[0].publishedAt.isoformat() == "2024-05-01T12:34:56"
