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
