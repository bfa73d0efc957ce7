"""Relational operator breadth (SURVEY.md §2.2): filters, the full join
matrix, aggregations (incl. rollup/cube/grouping-sets), window functions,
top-k, set operations, subquery patterns, pivot, dedup.

The reference exercises only a sliver of this (anti-join at
ETL_pipeline_countries.py:137, implicit filters); everything else is the
[extension] surface that a user of a Spark-backed warehouse expects
(README.md:250-258 — "write SQL queries directly").  Each query is a thin,
oracle-verified declarative plan — Catalyst owns the physical strategy.

Scale notes are on each query; the recurring ones:
- dimension joins carry explicit ``broadcast()`` hints (nation/region/
  supplier/part stay << 8 GB at any sf);
- aggregates use map-side-combinable shapes (no collect-driven loops);
- every top-k is ``orderBy().limit()`` (TakeOrderedAndProject: per-partition
  heaps, no global sort) or a windowed ``row_number() <= k`` (one shuffle
  on the partition key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    DEC,
    davg,
    dsum,
    dsum_wide,
    spark_sql_dsum,
    sql_davg,
    sql_dsum,
    SQL_DEC,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    load_table,
    register_views,
)

# ---------------------------------------------------------------------------
# filters / predicates
# ---------------------------------------------------------------------------


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
      AND o_orderkey % 2 = 0
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite predicate: IN + BETWEEN + LIKE + arithmetic, all pushed
    toward the Parquet scan (IN/BETWEEN land in PushedFilters; LIKE '%..%'
    and the modulo evaluate in the scan stage post-filter)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(10000, 200000)
        & F.col("o_orderpriority").like("%URGENT%")
        & (F.col("o_orderkey") % 2 == 0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# ---------------------------------------------------------------------------
# join matrix
# ---------------------------------------------------------------------------


@query(
    "join_inner_brand_volume",
    oracle=f"""
    SELECT p.p_brand, COUNT(*) AS n_lines,
           {sql_dsum('l.l_extendedprice')} AS volume
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 10 AND s.s_acctbal >= 0
    GROUP BY p.p_brand
    """,
    tags=("join", "agg"),
)
def join_inner_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact->dims with broadcast hints; at 100 TB part and
    supplier broadcast while lineitem never shuffles for the join at all."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice").alias("volume"))
    )


@query(
    "join_left_outer_nation_suppliers",
    oracle="""
    SELECT n.n_nationkey, n.n_name, s.s_name, s.s_acctbal
    FROM nation n
    LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
    tags=("join",),
)
def join_left_outer_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving nations without suppliers (null columns
    survive the hash compare — null semantics parity)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "left").select(
        "n_nationkey", "n_name", "s_name", "s_acctbal"
    )


@query(
    "join_right_outer_part_lines",
    oracle="""
    SELECT p.p_partkey, p.p_name, COUNT(l.l_orderkey) AS n_lines
    FROM lineitem l
    RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    """,
    tags=("join", "agg"),
)
def join_right_outer_part_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: parts with zero lineitems get n_lines = 0
    (COUNT of a null-extended column)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    SELECT COALESCE(s.nk, c.nk) AS n_nationkey, s.s_cnt, c.c_cnt
    FROM (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY s_nationkey) s
    FULL JOIN (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY c_nationkey) c
      ON s.nk = c.nk
    """,
    tags=("join", "agg"),
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides — aggregate-before-join
    shrinks both shuffle inputs to |distinct keys| (the 100 TB-safe order)."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("s_cnt"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("c_cnt"))
    )
    return s.join(c, s.nk == c.nk, "full").select(
        F.coalesce(s.nk, c.nk).alias("n_nationkey"), "s_cnt", "c_cnt"
    )


@query(
    "join_left_semi_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    )
    """,
    tags=("join",),
)
def join_left_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS: emits each matching left row once,
    never widens the row — half the shuffle of inner-join-then-distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_left_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "dedup"),
)
def join_left_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the reference's core dedup operator
    (``result_df.join(existing, "videoId", "left_anti")``,
    ETL_pipeline_countries.py:137) generalized: rows with no match on the
    right.  Catalyst plans broadcast-anti while the right side is small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_region_segments",
    oracle="""
    SELECT r.r_name, seg.c_mktsegment,
           r.r_name || '/' || seg.c_mktsegment AS cell
    FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
    tags=("join",),
)
def join_cross_region_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two tiny inputs (5 x 5).  Only valid when one
    side is provably small; Spark requires the explicit ``crossJoin`` call."""
    r = load_table(spark, sf_dir, "region")
    seg = load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return r.crossJoin(F.broadcast(seg)).select(
        "r_name",
        "c_mktsegment",
        F.concat_ws("/", "r_name", "c_mktsegment").alias("cell"),
    )


@query(
    "join_range_price_bands",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_parts, {sql_davg('p.p_retailprice')} AS avg_price
    FROM part p
    JOIN (VALUES ('budget', 0.0, 500.0),
                 ('mid', 500.0, 1200.0),
                 ('premium', 1200.0, 100000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    tags=("join",),
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/banded) join against a literal band table.  Planned
    as BroadcastNestedLoopJoin — correct only because the band side is a
    handful of rows; the scalable variant for two big sides is bucketing
    both on a coarse bin key first (see operators/similarity.py)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), davg("p_retailprice").alias("avg_price"))
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_segment_stats",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
           {sql_davg('c_acctbal')} AS avg_bal,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with count/min/max/avg/sum.  min/max on doubles are
    exact picks (order-independent); sums go through exact decimals."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        davg("c_acctbal").alias("avg_bal"),
        dsum("c_acctbal").alias("total_bal"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT): Spark expands to a two-phase partial-distinct
    aggregate, so the shuffle carries distinct (status, custkey) pairs, not
    raw rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "join_null_safe_dim",
    oracle="""
    WITH dim AS (SELECT * FROM (VALUES ('click'), ('purchase'), (NULL)) t(k)),
    e AS (SELECT event_id, NULLIF(event_type, 'view') AS k FROM events)
    SELECT d.k AS dim_key, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
    FROM dim d LEFT JOIN e ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.k
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the dim
    carries an explicit NULL key that must MATCH null fact keys (here
    'view' events nulled via NULLIF) — plain ``=`` would silently drop
    them, the classic unknown-bucket bug in dimensional rollups.  Scale
    note: a null-safe key makes NULL one join group; if nulls dominate,
    that group is the skew cell (route it through the salted-join path
    or pre-aggregate, cf. operators/scaling.salted_join).  Here the dim
    is 3 rows and broadcast, so the fact side never shuffles."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.nullif(F.col("event_type"), F.lit("view")).alias("k")
    )
    dim = spark.createDataFrame(
        [("click",), ("purchase",), (None,)], "k string"
    )
    return (
        F.broadcast(dim)
        .join(ev, dim["k"].eqNullSafe(ev["k"]), "left")
        .groupBy(dim["k"].alias("dim_key"))
        .agg(F.count("event_id").alias("n_events"))
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB answer to
    COUNT(DISTINCT) — fixed-size sketch per group, no distinct expansion.

    HASH-CHECKABLE despite the sketch being engine-specific: HLL
    register maxima commute, so the estimate is deterministic for given
    data; the query emits the exact count plus the boolean "estimate
    within 3 sigma (6% at rsd=0.02)" — stable TRUE unless the sketch
    breaks (same bounded-check pattern as agg_approx_percentile)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("est"),
    )
    rel_err = (
        F.abs(F.col("est").cast("double") - F.col("exact_customers"))
        / F.col("exact_customers")
    )
    return agg.select(
        "o_orderstatus", "exact_customers", (rel_err <= 0.06).alias("approx_ok")
    )


@query(
    "agg_hll_sketch_union",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT), TRUE FROM orders
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (hll_sketch_agg / hll_union_agg): distinct
    customers per order priority, plus an 'ALL' row computed by MERGING
    the per-group sketches — not by re-scanning the data.  Mergeability
    is the property that matters at 100 TB: partial sketches roll up
    across partitions, time windows, or rollup levels (cf.
    events_hierarchical_rollup) with fixed-size state, where exact
    COUNT(DISTINCT) would need the full key set at every level.

    HASH-CHECKABLE via the bounded-check pattern: sketch estimates are
    deterministic (register maxima commute across merge order), so each
    row carries the exact count and the boolean "estimate within 15%"
    (DataSketches lgK=12 gives ~1.6% error) — the merged-ALL row proves
    union correctness, not just per-group sketching."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH per_prio AS (
          SELECT o_orderpriority, hll_sketch_agg(o_custkey) AS sk,
                 COUNT(DISTINCT o_custkey) AS exact_customers
          FROM orders GROUP BY o_orderpriority
        ),
        rows_out AS (
          SELECT o_orderpriority, exact_customers,
                 hll_sketch_estimate(sk) AS est
          FROM per_prio
          UNION ALL
          SELECT 'ALL',
                 (SELECT COUNT(DISTINCT o_custkey) FROM orders),
                 hll_sketch_estimate(hll_union_agg(sk))
          FROM per_prio
        )
        SELECT o_orderpriority, exact_customers,
               abs(CAST(est AS DOUBLE) - exact_customers)
                 <= 0.15 * exact_customers AS approx_ok
        FROM rows_out
        """
    )


@query(
    "agg_theta_sketch_setops",
    oracle="""
    WITH sets AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS in_f,
             MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS in_o
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_union, TRUE AS union_ok,
           CAST(SUM(in_f * in_o) AS BIGINT) AS n_inter, TRUE AS inter_ok,
           CAST(SUM(in_f * (1 - in_o)) AS BIGINT) AS n_f_only, TRUE AS diff_ok
    FROM sets
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (Spark 4's DataSketches theta family):
    distinct-customer UNION, INTERSECTION, and DIFFERENCE across the
    'F' and 'O' order-status audiences, estimated from two fixed-size
    mergeable sketches — never from the key sets.  This is the
    capability HLL (agg_hll_sketch_union) cannot express: HLL unions
    only; theta sketches carry enough sample structure for A∩B and A\\B
    — at 100 TB exactly the train/eval CONTAMINATION-OVERLAP question
    ("how many document ids does shard A share with shard B") answered
    per shard pair with kilobytes of state instead of a distinct join.

    HASH-CHECKABLE via the bounded-check pattern: theta aggregation is
    hash-threshold sampling — fully DETERMINISTIC for given data
    (verified: repeated runs return identical estimates; contrast the
    randomized KLL in agg_quantile_sketch) — but DuckDB cannot replay
    the DataSketches hash, so each row emits the exact count (a
    conditional aggregation over one customer-grain hash-agg, fully
    replayed) plus an estimate-within-8%-of-the-union boolean (default
    lgK=12 gives ~1.6% 1-sigma relative error on the union, and the
    intersection/difference errors are bounded relative to the UNION
    size, not their own — the documented theta property, hence one
    shared denominator; below 4096 distincts the sketch is in exact
    mode and the estimates are exact)."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH per AS (
          SELECT o_orderstatus, theta_sketch_agg(o_custkey) AS sk
          FROM orders WHERE o_orderstatus IN ('F', 'O')
          GROUP BY o_orderstatus
        ),
        est AS (
          SELECT
            (SELECT theta_sketch_estimate(theta_union_agg(sk)) FROM per)
              AS est_union,
            (SELECT theta_sketch_estimate(theta_intersection_agg(sk)) FROM per)
              AS est_inter,
            theta_sketch_estimate(theta_difference(f.sk, o.sk)) AS est_diff
          FROM (SELECT sk FROM per WHERE o_orderstatus = 'F') f,
               (SELECT sk FROM per WHERE o_orderstatus = 'O') o
        ),
        sets AS (
          SELECT o_custkey,
                 MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS in_f,
                 MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS in_o
          FROM orders WHERE o_orderstatus IN ('F', 'O')
          GROUP BY o_custkey
        ),
        exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
                 CAST(SUM(in_f * in_o) AS BIGINT) AS n_inter,
                 CAST(SUM(in_f * (1 - in_o)) AS BIGINT) AS n_f_only
          FROM sets
        )
        SELECT n_union,
               abs(est_union - n_union) <= 0.08 * n_union AS union_ok,
               n_inter,
               abs(est_inter - n_inter) <= 0.08 * n_union AS inter_ok,
               n_f_only,
               abs(est_diff - n_f_only) <= 0.08 * n_union AS diff_ok
        FROM exact, est
        """
    )


@query(
    "agg_topk_sketch",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    )
    SELECT source AS scope, t AS token, CAST(COUNT(*) AS BIGINT) AS est_cnt
    FROM tok GROUP BY source, t
    UNION ALL
    SELECT 'ALL', t, CAST(COUNT(*) AS BIGINT) FROM tok GROUP BY t
    """,
    tags=("agg", "approx", "sketch", "topk"),
)
def agg_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's DataSketches frequent-items trio (approx_top_k_
    accumulate / _combine / _estimate) — the STOCK-ENGINE twin of the
    hand-rolled Misra-Gries heavy hitters (agg_heavy_hitter_tokens),
    the same interop role dedup_minhash_ml plays for the LSH ladder:
    per-source token sketches are accumulated in one pass, MERGED with
    approx_top_k_combine into the 'ALL' sketch (never re-scanning the
    corpus — the HLL/KLL/theta/CMS rollup shape), and estimates are
    read out of the binary sketch state with inline().

    HASH-EXACT oracle by a documented regime choice: a frequent-items
    sketch is EXACT until capacity eviction (lower = upper = true count
    while distinct items <= maxItemsTracked), and the fixture vocabulary
    (31 tokens) sits far under the 1024 capacity, so every emitted
    count equals the GROUP BY truth DuckDB computes — membership is
    deterministic too (k = 256 exceeds the vocabulary, so no tie at a
    truncation boundary can vary).  At 100 TB the same query degrades
    gracefully instead of failing: capacity bounds the per-group state
    (the knob), counts become [lower, upper] intervals, and the
    accumulate/combine split is exactly how per-shard sketches roll up
    across a cluster or time windows.

    Plan shape: one corpus scan -> per-source hash aggregate (map-side
    partial accumulate) -> a <= |sources|-row combine; the UNION ALL
    branch reuses the per-source sketch relation, never the corpus.

    Fixture invariant (shared with agg_cms_frequency and the 6 older
    sentinel-scoped rows): the merged-sketch scope label 'ALL' is a
    SENTINEL — no documents.source is literally named 'ALL' (asserted
    by tests/test_round10_ops.py::test_all_scope_sentinel_invariant)."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH tok AS (
          SELECT source, explode(split(text, ' ')) AS t FROM documents
        ),
        per AS (
          SELECT source, approx_top_k_accumulate(t, 1024) AS sk
          FROM tok GROUP BY source
        ),
        rows_out AS (
          SELECT source AS scope, approx_top_k_estimate(sk, 256) AS est
          FROM per
          UNION ALL
          SELECT 'ALL',
                 approx_top_k_estimate(approx_top_k_combine(sk, 1024), 256)
          FROM per
        )
        SELECT scope, e.item AS token, CAST(e.count AS BIGINT) AS est_cnt
        FROM rows_out
        LATERAL VIEW inline(est) e
        """
    )


@query(
    "agg_rollup_year_status",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
           COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderstatus)
    """,
    tags=("agg",),
)
def agg_rollup_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, status): hierarchical subtotals + grand total in one
    pass (Spark Expand operator — one shuffle for all grouping levels)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "agg_cube_flags",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem flags: all 2^2 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_lines"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the engine's SQL entry point (parity with
    the reference's SQL-warehouse surface, README.md:250-258)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               {spark_sql_dsum('o_totalprice')} AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
    tags=("agg", "filter"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING == post-aggregation filter on the aggregated relation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank_customers",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per nation.  One shuffle on the partition key; the sort
    is per-partition.  Deterministic via the c_custkey tie-break."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD across each customer's order history (nulls at the edges)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "window_running_total",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame.  The sum runs in exact
    decimal, so every prefix is order-independent and oracle-bit-equal."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_ntile_distribution",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS price_quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def window_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpartitioned distribution window (ntile/percent_rank/cume_dist).

    Scale caveat: an ORDER BY window with no PARTITION BY funnels all rows
    through one task — fine for a report-sized relation, wrong for a fact
    table.  (percent_rank's (rank-1)/(n-1) is a single IEEE division on
    identical operands in both engines, so doubles stay bit-equal.)"""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical row_number()<=k pattern —
    one shuffle on the group key, per-group sort, early filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "global_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    tags=("topk", "sort"),
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject keeps a 15-row heap per
    partition and merges on the driver — no global sort ever happens."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# set operations & distinct
# ---------------------------------------------------------------------------


@query(
    "set_union_all_parties",
    oracle="""
    SELECT nationkey, side, COUNT(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    )
    GROUP BY nationkey, side
    """,
    tags=("setop", "agg"),
)
def set_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle) then aggregate."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s).groupBy("nationkey", "side").agg(F.count("*").alias("n"))


@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — the set-level cousin of the reference's
    anti-join (SURVEY.md §2.2: ``except`` == anti-join over all columns)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "distinct_status_priority",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("dedup",),
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates == SELECT DISTINCT (hash-partial dedup both sides of
    the shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()


# ---------------------------------------------------------------------------
# subquery patterns
# ---------------------------------------------------------------------------


@query(
    "scalar_subquery_above_avg",
    oracle=f"""
    SELECT COUNT(*) AS n_above, MIN(o_totalprice) AS min_above
    FROM orders
    WHERE o_totalprice > (SELECT {sql_davg('o_totalprice')} FROM orders)
    """,
    tags=("subquery", "agg"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price.  Expressed
    as agg -> broadcast cross-join of the 1-row threshold (exactly what
    Catalyst rewrites a scalar subquery into)."""
    o = load_table(spark, sf_dir, "orders")
    thr = o.agg(davg("o_totalprice").alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .agg(F.count("*").alias("n_above"), F.min("o_totalprice").alias("min_above"))
    )


@query(
    "in_subquery_building_orders",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderstatus
    """,
    tags=("subquery", "join", "agg"),
)
def in_subquery_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) == left-semi join against the subquery relation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "pivot_nation_segments",
    oracle="""
    SELECT c_nationkey,
           COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS AUTOMOBILE,
           COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS BUILDING,
           COUNT(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS FURNITURE,
           COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS HOUSEHOLD,
           COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS MACHINERY
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("pivot", "agg"),
)
def pivot_nation_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): customers per nation x market segment.  The
    explicit value list keeps the plan a single pass (no extra distinct
    job to discover pivot columns — the 100 TB-relevant detail)."""
    c = load_table(spark, sf_dir, "customer")
    piv = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.count(F.lit(1)))
    )
    # pivot yields null for empty cells; COUNT(CASE...) yields 0 — align.
    return piv.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in _SEGMENTS],
    )


@query(
    "agg_exact_corr_regression",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {sql_dsum('l_quantity')} AS sx,
             {sql_dsum('l_extendedprice')} AS sy,
             {sql_dsum('l_quantity * l_extendedprice')} AS sxy,
             {sql_dsum('l_quantity * l_quantity')} AS sxx,
             {sql_dsum('l_extendedprice * l_extendedprice')} AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_lines,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_exact_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation and simple linear regression WITHOUT the built-in
    corr()/regr_*() aggregates: both engines' native implementations use
    different streaming-moment formulas whose float rounding diverges in
    the last ulps, so instead the five moment sums are accumulated
    exactly (fixed-point dsum — order-independent, bit-equal
    cross-engine) and the statistics are derived with the SAME closed
    formula and operation order on both sides.  Identical double inputs
    + identical IEEE op sequence (mul/div/sqrt are correctly rounded)
    = bit-identical corr/slope/intercept — a value-hash-checkable form
    of an otherwise approximation-fuzzy aggregate family.

    Scale: one map-side-combinable shuffle of six accumulators per
    group — the same cost as any grouped sum.  The product/squared
    moments use ``dsum_wide`` (decimal hi-accumulator): with
    |price²| ~ 1e10 the plain-long ``dsum`` hi-sum would overflow past
    ~1e9 rows/group, well inside a 100 TB group (functions/numeric.py
    headroom table); DuckDB's mirrored SQL already sums into HUGEINT so
    the oracle text is unchanged and results stay bit-equal."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(qty).alias("sx"),
        dsum(price).alias("sy"),
        dsum_wide(qty * price).alias("sxy"),
        dsum_wide(qty * qty).alias("sxx"),
        dsum_wide(price * price).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_lines"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )
