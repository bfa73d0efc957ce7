"""Source/sink round-trip queries: CSV and text scans, partitioned
Parquet sink with partition pruning.

The reference's source surface is a REST payload landed as multiline
JSON (covered by queries/reference_parity.py); SURVEY.md §2.2 lists
csv/text among the standard sources our engine supplies.  Each query
round-trips a fixture table through the format under test into a
session-scoped temp dir, then computes an aggregate the DuckDB oracle
runs against the *original* table — so the check covers the writer, the
reader, and type fidelity end-to-end.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    dsum,
    sql_dsum,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    load_table,
    read_csv,
    read_text,
)

_TMP_ROOT: str | None = None


def _tmp(name: str) -> str:
    """Session-scoped scratch dir (never under the read-only testdata)."""
    global _TMP_ROOT
    if _TMP_ROOT is None:
        _TMP_ROOT = tempfile.mkdtemp(prefix="e2e_spark_roundtrip_")
    return os.path.join(_TMP_ROOT, name)


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations,
           CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("source", "csv", "join"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> CSV (header) -> read back with an explicit schema ->
    broadcast-join region -> aggregate.  Explicit schema skips the
    inference pass; the tiny dimension side is broadcast."""
    path = _tmp("nation_csv")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    region = load_table(spark, sf_dir, "region")
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )


@query(
    "source_xml_roundtrip",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations,
           CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("source", "xml", "join"),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> XML (Spark 4 built-in xml source, rowTag elements) ->
    read back with schema inference -> broadcast-join region ->
    aggregate.  The XML twin of the CSV/ORC/JSONL roundtrips: inference
    widens integers to bigint, which the downstream SUM cast absorbs.
    XML remains the interchange format of legacy enterprise feeds, so
    the source matrix covers it alongside the columnar formats."""
    path = _tmp("nation_xml")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).format("xml").save(path)
    back = spark.read.option("rowTag", "nation").format("xml").load(path)
    region = load_table(spark, sf_dir, "region")
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
        )
    )


@query(
    "source_file_metadata",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    tags=("source", "metadata", "lineage"),
)
def source_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden ``_metadata`` file-lineage column: write documents
    partitioned by lang, read back, and recover each row's partition
    from ``_metadata.file_path`` alone (regexp over the physical path —
    NOT the lang data column, which is deliberately dropped before the
    re-read).  This is the provenance primitive of corpus audits
    ("which input file produced this training row"); file NAMES are
    nondeterministic, so the query aggregates by the deterministic
    partition-directory component.  Metadata columns are populated by
    the scan itself — no join, no shuffle beyond the final count."""
    path = _tmp("docs_by_lang")
    d = load_table(spark, sf_dir, "documents")
    d.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).select(
        F.col("doc_id"),
        F.regexp_extract(F.col("_metadata.file_path"), "lang=([^/]+)", 1).alias(
            "lang"
        ),
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "source_text_wordcount",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, COUNT(*) AS n
    FROM toks GROUP BY word
    ORDER BY n DESC, word
    LIMIT 25
    """,
    tags=("source", "text", "agg"),
)
def source_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text -> line-oriented text files -> read_text ->
    split/explode -> top-25 word count.  The classic text-source plan:
    narrow tokenize, one hash-agg shuffle, TakeOrdered for the top-k."""
    path = _tmp("docs_text")
    docs = load_table(spark, sf_dir, "documents")
    docs.select("text").write.mode("overwrite").text(path)
    lines = read_text(spark, path)
    return (
        lines.select(F.explode(F.split(F.col("value"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(25)
    )


@query(
    "source_orc_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("source", "orc", "agg"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC -> read back -> aggregate.  ORC is the other
    columnar container Spark ships a vectorized reader for; the check
    covers writer/reader round-trip fidelity for int64, double, string
    and timestamp columns."""
    path = _tmp("orders_orc")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "source_jsonlines_roundtrip",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("source", "json", "agg"),
)
def source_jsonlines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON Lines -> read back with an explicit schema ->
    aggregate.  One JSON document per line (the splittable layout — a
    100 TB corpus of line JSON parallelizes by byte range, unlike the
    reference's whole-document ``multiLine`` files, SURVEY.md §4);
    the explicit schema skips the inference pass."""
    path = _tmp("events_jsonl")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema("event_id long, event_type string, value double").json(
        path
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@query(
    "sink_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_lines,
           {sql_dsum('l.l_extendedprice')} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    tags=("sink", "bucketing", "join"),
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed managed tables joined WITHOUT a shuffle: both sides are
    written ``bucketBy(8, orderkey)`` so rows co-locate by join key at
    write time and the SortMergeJoin reads bucket-aligned splits — zero
    Exchange in the join stage.

    This is THE 100 TB pattern for repeated fact-to-fact joins: pay the
    shuffle once at ingest, then every downstream join on the bucket key
    is narrow.  (Verified by tests/test_bucketed_join_plan asserting no
    Exchange below the join.)"""
    db = "e2e_bucketed"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", _tmp("orders_b"))  # external: no cwd warehouse dependency
        .saveAsTable(f"{db}.orders_b")
    )
    (
        li.select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", _tmp("lineitem_b"))
        .saveAsTable(f"{db}.lineitem_b")
    )
    ob = spark.table(f"{db}.orders_b")
    lb = spark.table(f"{db}.lineitem_b")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice").alias("revenue"))
    )


@query(
    "sink_versioned_time_travel",
    oracle=f"""
    WITH v1 AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
         v2 AS (SELECT * FROM orders WHERE o_orderstatus IN ('F', 'O'))
    SELECT 1 AS version, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total_price FROM v1
    UNION ALL
    SELECT 2 AS version, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total_price FROM v2
    """,
    tags=("sink", "versioned", "time-travel"),
)
def sink_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-capability parity on plain Parquet: two commits to a
    versioned table (sources/versioned.py — manifest log, atomic commit,
    snapshot isolation), then one aggregate per *time-travel* snapshot.
    Version 1 sees only the first commit; version 2 sees both — the
    capability the reference's Delta gold layer claims
    (README.md:243-245) but never exercises."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_versioned")
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders.filter(F.col("o_orderstatus") == "F"), root)
    V.append(orders.filter(F.col("o_orderstatus") == "O"), root)
    snapshots = [
        V.read(spark, root, version=v)
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select(F.lit(v).alias("version"), "n_orders", "total_price")
        for v in (1, 2)
    ]
    return snapshots[0].unionByName(snapshots[1])


@query(
    "sink_merge_upsert",
    oracle=f"""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)),
         src AS (
           SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                  2 * o_totalprice AS o_totalprice, o_orderdate,
                  o_orderpriority
           FROM orders WHERE o_orderkey % 4 IN (2, 3)
         ),
         merged AS (
           SELECT b.* FROM base b
           WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM src)
           UNION ALL
           SELECT * FROM src
         )
    SELECT CASE WHEN o_orderkey % 4 = 2 THEN 'updated'
                WHEN o_orderkey % 4 = 3 THEN 'inserted'
                ELSE 'kept' END AS row_class,
           COUNT(*) AS n_rows, {sql_dsum('o_totalprice')} AS total_price
    FROM merged GROUP BY 1
    """,
    tags=("sink", "versioned", "merge"),
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE on the versioned table
    (sources/versioned.merge_upsert): commit a base snapshot of orders,
    merge a batch that updates the overlapping quarter of keys (status
    'U', doubled price) and inserts a new quarter, then aggregate the
    merged snapshot by row class.  Only files containing a matched key
    are rewritten — the Delta-MERGE-style fix for the reference's
    whole-table anti-join (SURVEY.md §7 hard parts); the file-granularity
    CoW behavior itself is asserted in tests/test_versioned_sink.py."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_merge")
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders.filter(F.col("o_orderkey") % 4 < 3), root)
    src = orders.filter(F.col("o_orderkey") % 4 >= 2).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (2 * F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    V.merge_upsert(src, root, key="o_orderkey")
    return (
        V.read(spark, root)
        .groupBy(
            F.when(F.col("o_orderkey") % 4 == 2, "updated")
            .when(F.col("o_orderkey") % 4 == 3, "inserted")
            .otherwise("kept")
            .alias("row_class")
        )
        .agg(F.count("*").alias("n_rows"), dsum("o_totalprice").alias("total_price"))
    )


@query(
    "source_python_datasource",
    oracle="""
    SELECT * FROM (VALUES
      ('Brazil',  40, 40, 7, TIMESTAMP '2024-05-01 12:34:56', TIMESTAMP '2024-05-28 12:34:56'),
      ('Germany', 40, 40, 7, TIMESTAMP '2024-05-01 12:34:56', TIMESTAMP '2024-05-28 12:34:56'),
      ('Japan',   40, 40, 7, TIMESTAMP '2024-05-01 12:34:56', TIMESTAMP '2024-05-28 12:34:56')
    ) AS t(keyword, n_videos, n_distinct_ids, n_channels,
           first_published, last_published)
    """,
    tags=("source", "datasource", "python"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python Data Source as the extract stage
    (sources/video_datasource.py): ``format("video_search")`` with one
    input partition per keyword, so the fetch runs on executors — the
    distributed form of the reference's driver-side REST call
    (ETL_pipeline_countries.py:42-49).  The synthetic payload is
    deterministic, so the per-keyword aggregate is known in closed form
    and the oracle is a literal VALUES table — an exact end-to-end check
    of the connector's schema, option handling, partitioning, and
    timestamp conversion."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.video_datasource import (
        VideoSearchDataSource,
    )

    spark.dataSource.register(VideoSearchDataSource)
    df = (
        spark.read.format("video_search")
        .option("keywords", "Germany,Japan,Brazil")
        .option("maxResults", 40)
        .option("overlap", 5)
        .load()
    )
    return df.groupBy("keyword").agg(
        F.count("*").alias("n_videos"),
        F.count_distinct("videoId").alias("n_distinct_ids"),
        F.count_distinct("channelTitle").alias("n_channels"),
        F.min("publishedAt").alias("first_published"),
        F.max("publishedAt").alias("last_published"),
    )


@query(
    "source_python_datasource_stream",
    oracle="""
    SELECT * FROM (VALUES
      ('France', 32, 32, 7, TIMESTAMP '2024-05-01 12:34:56', TIMESTAMP '2024-05-28 12:34:56'),
      ('India',  32, 32, 7, TIMESTAMP '2024-05-01 12:34:56', TIMESTAMP '2024-05-28 12:34:56')
    ) AS t(keyword, n_videos, n_distinct_ids, n_channels,
           first_published, last_published)
    """,
    tags=("source", "datasource", "python", "streaming"),
)
def source_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Python Data Source with pagination: the nextPageToken
    chain the reference stores but never follows
    (ETL_pipeline_countries.py:104) becomes a rate-limited streaming
    source — one page per keyword per micro-batch, fetched on executors.
    The stream runs under a processingTime trigger until all 4 pages x 2
    keywords are drained (4 genuine incremental micro-batches with
    offset tracking), then the materialized sink is aggregated against a
    closed-form VALUES oracle."""
    import time
    import uuid as _uuid

    from end_to_end_data_engineering_project_with_databricks_spark.sources.video_datasource import (
        VideoSearchDataSource,
    )

    spark.dataSource.register(VideoSearchDataSource)
    stream = (
        spark.readStream.format("video_search")
        .option("keywords", "France,India")
        .option("pageSize", 8)
        .option("pages", 4)
        .option("overlap", 3)
        .load()
    )
    name = f"vds_stream_{_uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    expected = 2 * 4 * 8
    deadline = time.time() + 120
    while time.time() < deadline and spark.table(name).count() < expected:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("keyword")
        .agg(
            F.count("*").alias("n_videos"),
            F.count_distinct("videoId").alias("n_distinct_ids"),
            F.count_distinct("channelTitle").alias("n_channels"),
            F.min("publishedAt").alias("first_published"),
            F.max("publishedAt").alias("last_published"),
        )
    )


@query(
    "sink_versioned_delete_compact",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    """,
    tags=("sink", "versioned", "delete", "compact"),
)
def sink_versioned_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-maintenance ops on the versioned table: three incremental
    commits of orders (one per status), a copy-on-write DELETE of the 'F'
    rows (drops that commit's files from the manifest — no rewrite since
    the predicate aligns with commit boundaries), then OPTIMIZE-style
    compaction of the remaining small files.  The final aggregate proves
    both ops preserve exactly the non-deleted data."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_delete_compact")
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    for status in ("F", "O", "P"):
        V.append(orders.filter(F.col("o_orderstatus") == status), root)
    V.delete_where(spark, root, "o_orderstatus = 'F'")
    V.compact(spark, root)
    return (
        V.read(spark, root)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


@query(
    "sink_versioned_vacuum_travel",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderstatus
    """,
    tags=("sink", "versioned", "vacuum", "time-travel"),
)
def sink_versioned_vacuum_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM + timestampAsOf on the versioned table: three commits
    (append 'F', append 'O', CoW-delete 'F'), a wall-clock time-travel
    read of the head, then ``vacuum(retain_last=1)`` which drops the two
    old manifests and the now-unreferenced 'F' data files.  The result
    is the DISTINCT union of the timestamp-travel aggregate and the
    post-vacuum aggregate — identical rows iff timestamp resolution hit
    the right snapshot AND vacuum deleted nothing live, so either
    failure breaks the row-count/hash against the oracle."""
    import shutil
    import time

    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_vacuum_travel")
    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders.filter(F.col("o_orderstatus") == "F"), root)
    V.append(orders.filter(F.col("o_orderstatus") == "O"), root)
    V.delete_where(spark, root, "o_orderstatus = 'F'")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price")
        )

    ts_head = agg(V.read(spark, root, timestamp=time.time()))
    V.vacuum(root, retain_last=1, min_age_seconds=0)
    return ts_head.unionByName(agg(V.read(spark, root))).distinct()


@query(
    "sink_partitioned_pruning",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sink", "parquet", "partitioning"),
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> Parquet partitioned by o_orderstatus -> filtered read.
    The status predicate becomes directory-level partition pruning (the
    'F' partition is the only one scanned — PartitionFilters in the
    plan), the 100 TB pattern for low-cardinality hot filters."""
    path = _tmp("orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "source_corrupt_records",
    oracle="""
    SELECT * FROM (VALUES
      ('valid',   CAST(3 AS BIGINT), CAST(60 AS BIGINT)),
      ('corrupt', CAST(2 AS BIGINT), CAST(NULL AS BIGINT))
    ) AS t(record_class, n_records, value_sum)
    """,
    tags=("source", "json", "data-quality"),
)
def source_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling (PERMISSIVE mode): a JSON-lines file with
    3 valid and 2 broken rows is read with a ``_corrupt_record`` column —
    bad rows surface as data instead of failing the job or being
    silently dropped, the contract that matters when 100 TB of scraped
    input is never fully clean.  The aggregate splits records by
    validity; counts and the valid-side sum are closed-form, so the full
    quarantine path is value-hash-checked."""
    path = _tmp("corrupt_jsonl")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "data.json"), "w") as fh:
        fh.write(
            '{"id": 1, "value": 10}\n'
            '{"id": 2 "value": 20}\n'          # missing comma -> corrupt
            '{"id": 3, "value": 20}\n'
            'not json at all\n'                 # corrupt
            '{"id": 4, "value": 30}\n'
        )
    df = (
        spark.read.schema("id long, value long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # cache the PARSED relation: Spark rejects any plan that prunes
        # down to _corrupt_record alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN
        # — e.g. a bare count() on this aggregate); caching is the
        # documented escape hatch, and the quarantine batch is small by
        # construction (it exists to be inspected)
        .cache()
    )
    return (
        df.groupBy(
            F.when(F.col("_corrupt_record").isNull(), "valid")
            .otherwise("corrupt")
            .alias("record_class")
        )
        .agg(
            F.count("*").alias("n_records"),
            F.sum("value").alias("value_sum"),
        )
    )


@query(
    "sink_versioned_changes",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey, 2 * o_totalprice AS o_totalprice
      FROM orders WHERE o_orderkey % 4 IN (2, 3)
    ),
    pre AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 2)
    SELECT 'insert' AS change_type, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price
    FROM src
    UNION ALL
    SELECT 'delete' AS change_type, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price
    FROM pre
    """,
    tags=("sink", "versioned", "cdc"),
)
def sink_versioned_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed on the versioned table
    (sources/versioned.table_changes — the Delta CDF twin): commit a base
    snapshot of orders, MERGE a batch that updates a quarter of keys
    (doubled price, status 'U') and inserts a new quarter, then read the
    row-level changes between the two versions and aggregate per change
    type.  Updates surface as delete(pre-image) + insert(post-image).

    The oracle pins the full CDF contract: inserts = the whole merge
    source, deletes = exactly the pre-images of matched keys — which
    holds ONLY if the copy-on-write rewrite rows (unmatched keys
    co-located in touched files) cancel out of the manifest-diff
    EXCEPT ALL, i.e. the feed is computed from churned files without
    phantom changes, at a cost independent of table size."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_cdc")
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders.filter(F.col("o_orderkey") % 4 < 3), root)
    src = orders.filter(F.col("o_orderkey") % 4 >= 2).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (2 * F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    V.merge_upsert(src, root, key="o_orderkey")
    return (
        V.table_changes(spark, root, from_version=1, to_version=2)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(F.count("*").alias("n_rows"), dsum("o_totalprice").alias("total_price"))
    )


@query(
    "source_versioned_stream",
    oracle=f"""
    SELECT 1 AS commit_version, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT 2 AS commit_version, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 4 = 1
    UNION ALL
    SELECT 3 AS commit_version, COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 4 = 2
    """,
    tags=("source", "streaming", "versioned", "datasource"),
)
def source_versioned_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion FROM the versioned table — the Delta streaming
    source twin (sources/versioned_stream.py, Spark 4 Python Data
    Source): three commits of disjoint orders slices, then one
    availableNow run that consumes every commit as offset-tracked
    micro-batch input, one partition per (version, file).  Per-version
    aggregates pin both the row routing and the offset bookkeeping:
    every row must surface exactly once under its own commit version."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.versioned_stream import (
        VersionedStreamDataSource,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.streaming.windows import (
        run_to_memory,
    )

    root = _tmp("orders_stream_src")
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    for m in (0, 1, 2):
        V.append(orders.filter(F.col("o_orderkey") % 4 == m), root)

    spark.dataSource.register(VersionedStreamDataSource)
    stream = spark.readStream.format("versioned_stream").option("root", root).load()
    agg = stream.groupBy(
        F.col("_commit_version").cast("int").alias("commit_version")
    ).agg(F.count("*").alias("n_rows"), dsum("o_totalprice").alias("total_price"))
    return run_to_memory(agg, output_mode="complete")


@query(
    "sink_versioned_zorder_skipping",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 500
      AND o_totalprice BETWEEN 50000 AND 200000
    GROUP BY o_orderstatus
    """,
    tags=("sink", "versioned", "zorder", "data-skipping"),
)
def sink_versioned_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering + stats-based data skipping on the versioned
    table (sources/versioned.cluster — the OPTIMIZE ZORDER twin): commit
    orders, re-cluster the layout by (o_custkey, o_totalprice) into
    small files, then answer a two-column range query through
    ``read(where=...)`` — the custkey range prunes files from the
    manifest stats (never opened), the totalprice range rides the
    ordinary parquet row-group min/max that clustering made selective.
    Correct values regardless of layout; the layout decides how few
    bytes the scan touches (tests/test_versioned_sink.py asserts the
    file-count drop)."""
    import shutil

    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_zorder")
    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders, root)
    V.cluster(spark, root, ["o_custkey", "o_totalprice"], target_file_bytes=16 * 1024)
    return (
        V.read(spark, root, where=("o_custkey", 100, 500))
        .filter(F.col("o_totalprice").between(50000, 200000))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


@query(
    "matview_incremental_refresh",
    oracle=f"""
    WITH final AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 8 = 1 THEN 2 * o_totalprice
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderkey % 16 <> 2
    )
    SELECT o_orderpriority, n_rows, sum_o_totalprice FROM (
      SELECT o_orderpriority, COUNT(*) AS n_rows,
             {sql_dsum('o_totalprice')} AS sum_o_totalprice
      FROM final GROUP BY o_orderpriority
    )
    """,
    tags=("matview", "cdc", "versioned", "incremental"),
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate view
    (operators/matview — the Databricks materialized-view twin): create
    a per-priority COUNT/SUM view over a versioned orders table, then
    push three kinds of source commits — an append (new quarter of
    keys), a MERGE update (doubled price on o_orderkey % 8 = 1), and a
    CoW DELETE (o_orderkey % 16 = 2) — and advance the view with ONE
    incremental refresh driven by the change feed.  The oracle is the
    from-scratch aggregate over the final source state: they hash-match
    only because the view's state is exact fixed-point partials
    (integer-associative), so incremental == full recompute bit-for-bit
    while the refresh touches O(churn) rows, not the table."""
    import shutil

    from end_to_end_data_engineering_project_with_databricks_spark.operators import (
        matview as MV,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    src_root = _tmp("mv_orders_src")
    view_root = _tmp("mv_orders_view")
    shutil.rmtree(src_root, ignore_errors=True)  # fresh tables per run
    shutil.rmtree(view_root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders.filter(F.col("o_orderkey") % 4 != 3), src_root)
    MV.create(
        spark,
        src_root,
        view_root,
        group_cols=["o_orderpriority"],
        sum_cols=["o_totalprice"],
    )
    V.append(orders.filter(F.col("o_orderkey") % 4 == 3), src_root)
    updates = orders.filter(F.col("o_orderkey") % 8 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (2 * F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    V.merge_upsert(updates, src_root, key="o_orderkey")
    V.delete_where(spark, src_root, "o_orderkey % 16 = 2")
    MV.refresh(spark, view_root)
    return MV.read_view(spark, view_root)


@query(
    "sink_versioned_schema_evolution",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           CAST(COUNT(o_flag) AS BIGINT) AS n_flagged
    FROM (
      SELECT o_orderstatus, o_totalprice, NULL AS o_flag
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderstatus, o_totalprice, 1 AS o_flag
      FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY o_orderstatus
    """,
    tags=("sink", "versioned", "schema-evolution"),
)
def sink_versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the versioned table (Delta mergeSchema twin):
    commit a base snapshot, then append a batch carrying a NEW column
    with ``evolve_schema=True`` — the table schema widens, and readers
    see NULL for the new column on pre-evolution files (the explicit
    read schema projects missing parquet columns as null).  The
    aggregate counts the evolved column per status, so both the widened
    write path and the null-backfill read path are value-hash-checked."""
    import shutil

    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_schema_evo")
    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    V.append(orders.filter(F.col("o_orderstatus") == "F"), root)
    evolved = orders.filter(F.col("o_orderstatus") == "O").withColumn(
        "o_flag", F.lit(1).cast("int")
    )
    V.append(evolved, root, evolve_schema=True)
    return (
        V.read(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.count("o_flag").cast("long").alias("n_flagged"),
        )
    )


@query(
    "stream_matview_pipeline",
    oracle=f"""
    SELECT o_orderstatus, n_rows, sum_o_totalprice FROM (
      SELECT o_orderstatus, COUNT(*) AS n_rows,
             {sql_dsum('o_totalprice')} AS sum_o_totalprice
      FROM orders WHERE o_orderkey % 4 < 3
      GROUP BY o_orderstatus
    )
    """,
    tags=("streaming", "matview", "versioned", "cdc", "pipeline"),
)
def stream_matview_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full incremental-analytics pipeline in one query: a versioned
    source table streams commit-by-commit (versioned_stream — the Delta
    streaming-source twin) through a foreachBatch MERGE into a silver
    versioned table, whose change feed then advances a materialized
    aggregate view — ingest, upsert, CDC, and view maintenance chained
    end-to-end, each step O(churn).

    The view is created after the first micro-batch lands and refreshed
    once after the stream drains, so the refresh walks a multi-commit
    CDF window.  The oracle is the from-scratch aggregate over
    everything streamed; it hash-matches only if every stage —
    streaming offsets, merge CoW, manifest-diff change feed, fixed-point
    view state — is exact."""
    import shutil

    from end_to_end_data_engineering_project_with_databricks_spark.operators import (
        matview as MV,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.versioned_stream import (
        VersionedStreamDataSource,
    )

    bronze = _tmp("smv_bronze")
    silver = _tmp("smv_silver")
    view = _tmp("smv_view")
    ckpt = _tmp("smv_ckpt")
    for p in (bronze, silver, view, ckpt):
        shutil.rmtree(p, ignore_errors=True)  # fresh pipeline per run

    orders = load_table(spark, sf_dir, "orders")
    for m in (0, 1, 2):
        V.append(orders.filter(F.col("o_orderkey") % 4 == m), bronze)

    spark.dataSource.register(VersionedStreamDataSource)
    stream = (
        spark.readStream.format("versioned_stream")
        .option("root", bronze)
        .load()
        .drop("_commit_version")
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        V.merge_upsert(batch_df, silver, key="o_orderkey")

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    MV.create(
        spark, silver, view, group_cols=["o_orderstatus"], sum_cols=["o_totalprice"]
    )
    # a late commit after view creation: the refresh must pick it up
    # through the change feed, not a rebuild
    V.merge_upsert(
        orders.filter(F.col("o_orderkey") % 4 == 2), silver, key="o_orderkey"
    )
    MV.refresh(spark, view)
    return MV.read_view(spark, view)


@query(
    "sink_versioned_restore",
    oracle=f"""
    SELECT CAST(3 AS BIGINT) AS head_version,
           CAST(1 AS BIGINT) AS restored_from,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("sink", "versioned", "restore", "time-travel"),
)
def sink_versioned_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE twin: commit v1 (status F), commit a bad batch as
    v2 (status O), then ``restore`` the head to v1's snapshot — a
    METADATA-ONLY commit (v3 re-references v1's files; no data
    rewrite, so restoring a 100 TB table costs one manifest write).
    The head aggregate must equal the v1 content exactly, while v2
    stays reachable via time travel for forensics.  Completes the
    versioned table's Delta surface: append / time travel / MERGE /
    DELETE / OPTIMIZE / ZORDER / VACUUM / CDF / RESTORE."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_restore")
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    V.append(orders.filter(F.col("o_orderstatus") == "F"), root)
    V.append(orders.filter(F.col("o_orderstatus") == "O"), root)  # bad batch
    head = V.restore(spark, root, version=1)
    return V.read(spark, root).agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price")
    ).select(
        F.lit(head).cast("long").alias("head_version"),
        F.lit(1).cast("long").alias("restored_from"),
        "n_orders",
        "total_price",
    )


@query(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN source = 'refreshed' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_refreshed
    FROM (
      SELECT lang, source FROM documents WHERE lang <> 'en'
      UNION ALL
      SELECT lang, 'refreshed' AS source FROM documents WHERE lang = 'en'
    ) t
    GROUP BY lang
    """,
    tags=("sink", "parquet", "partitioning", "overwrite"),
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: INSERT OVERWRITE replaces ONLY the
    partitions present in the incoming batch (here: the re-processed
    'en' slice, its source stamped 'refreshed'), leaving every other
    partition's files untouched — the idempotent backfill primitive for
    partitioned 100 TB tables, where static overwrite mode would wipe
    the whole table.  Conf is set per-write via the writer option, not
    session-wide.  The oracle reconstructs the expected final state:
    all non-en rows original, all en rows refreshed."""
    path = _tmp("docs_dyn_overwrite")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    d.write.mode("overwrite").partitionBy("lang").parquet(path)
    refreshed = d.filter(F.col("lang") == "en").withColumn(
        "source", F.lit("refreshed")
    )
    (
        refreshed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("source") == "refreshed", 1).otherwise(0)).alias(
            "n_refreshed"
        ),
    )


@query(
    "sink_versioned_history",
    oracle="""
    WITH c AS (
      SELECT CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS nf,
             CAST(COUNT(CASE WHEN o_orderstatus IN ('F', 'O') THEN 1 END)
                  AS BIGINT) AS nfo
      FROM orders
    )
    SELECT CAST(1 AS BIGINT) AS version, 'APPEND' AS operation, nf AS n_rows FROM c
    UNION ALL SELECT CAST(2 AS BIGINT), 'APPEND', nfo FROM c
    UNION ALL SELECT CAST(3 AS BIGINT), 'DELETE', nf FROM c
    UNION ALL SELECT CAST(4 AS BIGINT), 'RESTORE', nfo FROM c
    """,
    tags=("sink", "versioned", "history", "time-travel"),
)
def sink_versioned_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ``DESCRIBE HISTORY`` twin under the driver gate (VERDICT r4
    item 6): run a deterministic operation sequence — APPEND (status F),
    APPEND (status O), DELETE (status O rows), RESTORE to the pre-delete
    snapshot — then join ``history()``'s (version, operation) log with
    the time-travel row count AT each version.  The oracle reconstructs
    the expected ledger from the orders table alone: v1 = F rows,
    v2 = F+O, v3 = F again (copy-on-write delete), v4 = F+O (restore is
    a metadata-only commit re-referencing v2's files).  Commit
    timestamps and physical file counts are execution-dependent and
    deliberately excluded; versions/operations/logical contents are
    exact.  History itself is driver-side manifest metadata — no data
    files are opened to print a 100 TB table's ledger."""
    import shutil

    from end_to_end_data_engineering_project_with_databricks_spark.sources import (
        versioned as V,
    )

    root = _tmp("orders_history")
    shutil.rmtree(root, ignore_errors=True)  # fresh table per run
    orders = load_table(spark, sf_dir, "orders")
    v1 = V.append(orders.filter(F.col("o_orderstatus") == "F"), root)
    v2 = V.append(orders.filter(F.col("o_orderstatus") == "O"), root)
    v3 = V.delete_where(spark, root, "o_orderstatus = 'O'")
    v4 = V.restore(spark, root, version=v2)
    hist = V.history(spark, root).select(
        F.col("version").cast("long").alias("version"), "operation"
    )
    counts = None
    for v in (v1, v2, v3, v4):
        c = (
            V.read(spark, root, version=v)
            .agg(F.count("*").alias("n_rows"))
            .select(F.lit(v).cast("long").alias("version"), "n_rows")
        )
        counts = c if counts is None else counts.unionByName(c)
    return hist.join(counts, "version")
