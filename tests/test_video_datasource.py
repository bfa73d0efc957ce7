"""Python Data Source connector: partition-per-keyword parallelism,
option handling, and cross-keyword overlap semantics."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.sources.video_datasource import (
    VideoSearchDataSource,
)


@pytest.fixture()
def source_df(spark):
    spark.dataSource.register(VideoSearchDataSource)

    def make(keywords: str, **opts):
        r = spark.read.format("video_search").option("keywords", keywords)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    return make


def test_partition_per_keyword(spark, source_df):
    df = source_df("a,b,c,d", maxResults=3)
    # the parallelism unit is the keyword: 4 partitions, 3 rows each
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 12


def test_overlap_ids_shared_across_keywords(spark, source_df):
    df = source_df("x,y", maxResults=10, overlap=4)
    total = df.select("videoId").distinct().count()
    assert total == 2 * 10 - 4  # 4 ids appear under both keywords
    per_kw = {r.keyword: r.n for r in df.groupBy("keyword").count().withColumnRenamed("count", "n").collect()}
    assert per_kw == {"x": 10, "y": 10}


def test_schema_and_timestamp_conversion(spark, source_df):
    df = source_df("z", maxResults=2)
    assert df.schema.simpleString() == (
        "struct<keyword:string,etag:string,nextPageToken:string,videoId:string,"
        "title:string,description:string,channelTitle:string,publishedAt:timestamp>"
    )
    rows = df.orderBy("videoId").collect()
    assert rows[0].publishedAt.month == 5
    assert rows[0].videoId == "vid-z-42-0000"


def test_missing_keywords_option_fails(spark, source_df):
    with pytest.raises(Exception, match="keywords"):
        source_df("").count()


def test_stream_reader_one_page_per_microbatch(spark):
    import time
    import uuid

    spark.dataSource.register(VideoSearchDataSource)
    stream = (
        spark.readStream.format("video_search")
        .option("keywords", "p,q")
        .option("pageSize", 5)
        .option("pages", 3)
        .load()
    )
    name = f"vds_test_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 2 * 3 * 5:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert spark.table(name).count() == 30
    # rate limiting: each data-carrying micro-batch consumed exactly one
    # page per keyword (2 keywords x 5 rows)
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(data_batches) == 3
    assert all(p["numInputRows"] == 10 for p in data_batches)
    # videoIds across pages are a contiguous, non-overlapping sequence
    ids = sorted(r.videoId for r in spark.table(name).filter("keyword = 'p'").collect())
    assert ids == [f"vid-p-42-{i:04d}" for i in range(15)]
