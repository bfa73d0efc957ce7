"""Scalar function packs (SURVEY.md §2.2 [extension]): string, date/time,
math, conditional, JSON, array, and generator (explode) functions.

The reference's only scalar work is ``lit``/``cast``
(ETL_pipeline_countries.py:95,109) and whole-document JSON parsing at scan
time (:92); a usable engine needs the full pack.  Everything here is a
JVM-side built-in from ``pyspark.sql.functions`` — whole-stage-codegen'd,
no Python in the row path — with a DuckDB-equivalent oracle expression.

Cross-engine fine print encoded below:
- ``datediff``/``year`` return BIGINT in DuckDB, INT in Spark -> oracle
  casts align the schema.
- libm functions (ln/exp) agree to the last ulp in practice but are
  rounded to 9 decimals on both sides as an explicit guard.
- DuckDB list indexing is 1-based like Spark's ``element_at``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    davg,
    sql_davg,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           CAST(length(c_name) AS INT) AS name_len,
           substring(c_name, 1, 8) AS prefix,
           c_name || '-' || c_mktsegment AS labeled,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           split_part(c_name, '#', 2) AS after_hash,
           CAST(strpos(c_name, '#') AS INT) AS hash_pos
    FROM customer
    WHERE c_custkey < 60
    """,
    tags=("functions",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: case, length, substring, concat, pad, replace, regexp
    extraction, split, position — all codegen'd JVM expressions."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 60)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("labeled"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.instr("c_name", "#").alias("hash_pos"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    WHERE o_orderkey < 100
    """,
    tags=("functions",),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time pack: component extraction, truncation, day arithmetic,
    interval add, epoch seconds, formatting.

    Parity with the reference's string->timestamp cast surface
    (ETL_pipeline_countries.py:109) plus everything around it."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_sec"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price2,
           abs(-l_quantity) AS qty_abs,
           CAST(ceil(l_extendedprice) AS DOUBLE) AS price_ceil,
           CAST(floor(l_extendedprice) AS DOUBLE) AS price_floor,
           sqrt(l_quantity) AS qty_sqrt,
           power(l_quantity, 2) AS qty_sq,
           round(ln(l_extendedprice), 9) AS log_price,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_tax, l_discount) AS l
    FROM lineitem
    WHERE l_orderkey < 60
    """,
    tags=("functions",),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack.  ceil/floor return BIGINT-ish types in both engines but
    DOUBLE is forced for schema alignment; ln is rounded as a libm guard."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 60)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price2"),
        F.abs(-F.col("l_quantity")).alias("qty_abs"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 9).alias("log_price"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("l"),
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 150000 THEN 'big'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'NOT-P') AS status_folded,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("functions", "agg"),
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF — null-handling surface."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 150000, "big")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("small")
        .alias("bucket")
    )
    folded = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("NOT-P")
    ).alias("status_folded")
    return o.groupBy(bucket, folded).agg(F.count("*").alias("n"))


@query(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
    FROM events
    WHERE event_id < 200
    """,
    tags=("functions", "json"),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface over the ``events.props`` JSON-string column:
    path extraction (``get_json_object``) and full parse into a typed
    struct (``from_json`` — the silver-zone move for the reference's raw
    JSON landing, ETL_pipeline_countries.py:92)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.from_json("props", "k INT")["k"].alias("k_struct"),
    )


@query(
    "json_agg_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_davg("CAST(json_extract_string(props, '$.k') AS INT)")} AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tags=("functions", "json", "agg"),
)
def json_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON-extracted field — parse-then-aggregate stays
    one pass; no intermediate materialization."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        davg(k).alias("avg_k"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
           string_split(text, ' ')[1] AS first_tok,
           list_contains(string_split(text, ' '), 'query') AS has_query,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS top5_sorted
    FROM documents
    WHERE doc_id < 50
    """,
    tags=("functions", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pack over tokenized text: size, distinct, indexing, contains,
    sort/slice/join.  Native ArrayType ops — the same shapes used by the
    dedup shingling operators (operators/dedup.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_contains(toks, "query").alias("has_query"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ",").alias(
            "top5_sorted"
        ),
    )


@query(
    "explode_tokens",
    oracle="""
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, token
    FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS token,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
      WHERE doc_id < 30
    )
    """,
    tags=("generator",),
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — the reference's one row-multiplying operator
    (``explode(col("items"))``, ETL_pipeline_countries.py:98) with position
    tracking.  Generate produces rows lazily per input row: no buffering,
    scales linearly."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


@query(
    "explode_outer_empty",
    oracle="""
    SELECT o_orderkey, u.tok
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN [] ELSE string_split(o_orderpriority, '-') END AS l
      FROM orders WHERE o_orderkey < 80
    ) t
    LEFT JOIN LATERAL unnest(t.l) AS u(tok) ON TRUE
    """,
    tags=("generator",),
)
def explode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with a null element
    (plain explode would drop them) — the generator's outer-join variant."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 80)
    arr = F.when(F.col("o_orderstatus") == "P", F.array().cast("array<string>")).otherwise(
        F.split(F.col("o_orderpriority"), "-")
    )
    return o.select("o_orderkey", F.explode_outer(arr).alias("tok"))


@query(
    "try_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("functions", "ansi"),
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: with ANSI mode on (Spark 4 default),
    division by zero and bad casts RAISE — ``try_divide``/``try_cast``
    are the per-expression opt-outs that return NULL instead, the right
    tool when a pipeline must survive dirty rows without disabling ANSI
    globally.  DuckDB divides-to-NULL via NULLIF and shares TRY_CAST."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_div"),
        F.try_to_number("o_orderpriority", F.lit("9")).cast("int").alias("bad_cast"),
        F.col("o_orderpriority").substr(1, 1).try_cast("int").alias("prio_digit"),
    )


@query(
    "higher_order_functions",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT)
             AS n_long_tokens,
           CAST(len(list_filter(toks, (x, i) -> i > 1 AND x = toks[i - 1]))
             AS INT) AS n_adjacent_repeats,
           len(list_filter(toks, x -> length(x) > 8)) > 0 AS has_very_long
    FROM t
    """,
    tags=("functions", "array", "lambda", "higher-order"),
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order array functions: transform -> aggregate
    (token-length sum), filter (long-token count), indexed-lambda
    filter (adjacent-repeat count — the (x, i) two-argument lambda
    form), exists (any very long token).

    All four run as JVM lambda expressions inside the row — no
    explode, no shuffle, no Python; this is the row-local alternative
    to posexplode+groupBy when the aggregation never crosses rows
    (compare explode_tokens, which pays row fan-out for the same
    data).  Index bases differ across engines (Spark lambdas and
    subscripts are 0-based, DuckDB's are 1-based) — the oracle
    mirrors the shifted predicate rather than the literal index.
    Integer-only arithmetic keeps every column exact.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.expr(
            "aggregate(transform(split(text, ' '), x -> length(x)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("total_chars"),
        F.expr("size(filter(split(text, ' '), x -> length(x) > 4))").alias(
            "n_long_tokens"
        ),
        F.expr(
            "size(filter(split(text, ' '), "
            "(x, i) -> i > 0 AND x = split(text, ' ')[i - 1]))"
        ).alias("n_adjacent_repeats"),
        F.expr("exists(split(text, ' '), x -> length(x) > 8)").alias(
            "has_very_long"
        ),
    )
