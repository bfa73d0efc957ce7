"""Modern Spark 4 SQL surface: recursive CTEs, the VARIANT type for
semi-structured data, and parameterized SQL.

The reference's analyst entry point is raw SQL over the gold table
(README.md:250-258); these queries extend that surface with the Spark 4
SQL features a current warehouse user expects.  All three run through
``spark.sql`` — the same entry point the reference's SQL warehouse uses —
and all are DuckDB-oracle-checked (DuckDB shares WITH RECURSIVE and JSON
extraction semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    load_table,
)


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "sql_recursive_date_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-12-01'
    )
    SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
    FROM months
    LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    """,
    tags=("sql", "recursive-cte", "join"),
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4) building a month spine, left-joined to
    order counts — the gap-filling time-series pattern: months with no
    orders appear with a zero count instead of vanishing, which a plain
    GROUP BY over the fact table cannot produce.  The spine is 84 rows
    (driver-trivial recursion) and broadcasts into the fact-side join;
    the month-truncated join key prunes to one aggregate-sized shuffle."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-12-01'
        )
        SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
        FROM months
        LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        """
    )


@query(
    "sql_variant_extraction",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_min,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY event_type
    """,
    tags=("sql", "variant", "json", "agg"),
)
def sql_variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4's semi-structured type): ``parse_json`` the
    events.props payload once into a variant column, then typed
    ``variant_get`` extraction feeding a grouped aggregate.  Unlike
    ``get_json_object`` (string re-parse per access), variant parses
    once into a binary-encoded form and every extraction is a cheap
    typed path read — the right shape when many fields are pulled from
    the same payload at 100 TB."""
    _register(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH v AS (
          SELECT event_type, parse_json(props) AS pv FROM events
        )
        SELECT event_type,
               SUM(variant_get(pv, '$.k', 'long')) AS k_sum,
               MIN(variant_get(pv, '$.k', 'long')) AS k_min,
               MAX(variant_get(pv, '$.k', 'long')) AS k_max
        FROM v
        GROUP BY event_type
        """
    )


@query(
    "sql_listagg_nations",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("sql", "agg", "listagg"),
)
def sql_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (Spark 4) with WITHIN GROUP ordering: nations of each
    region as one ordered comma-joined string.  The deterministic ORDER
    BY inside the aggregate is what makes the result (and its oracle
    hash) stable — an unordered listagg would be partitioning-dependent."""
    _register(spark, sf_dir, "region", "nation")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@query(
    "sql_lateral_topk_per_group",
    oracle="""
    SELECT r.r_name, x.n_name, x.n_customers
    FROM region r,
    LATERAL (
      SELECT n.n_name, COUNT(*) AS n_customers
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY n_customers DESC, n.n_name
      LIMIT 2
    ) x
    """,
    tags=("sql", "lateral", "topk", "subquery"),
)
def sql_lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: the two most-represented nations per
    region — top-k-per-group written as a per-row subquery instead of a
    window.  Catalyst decorrelates the lateral into a join + per-group
    ranking (no per-region re-execution), so the declarative form costs
    one shuffle like the ``row_number() <= k`` rewrite; the ORDER BY
    tiebreak on n_name keeps the result deterministic."""
    _register(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(
        """
        SELECT r.r_name, x.n_name, x.n_customers
        FROM region r,
        LATERAL (
          SELECT n.n_name, COUNT(*) AS n_customers
          FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_customers DESC, n.n_name
          LIMIT 2
        ) x
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_acctbal >= 5000.0 AND c_mktsegment <> 'MACHINERY'
    GROUP BY c_mktsegment
    """,
    tags=("sql", "parameterized"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers): the injection-safe
    form of the reference's ad-hoc analyst SQL.  Parameters are bound as
    literals by the parser — they reach Catalyst as foldable constants,
    so pushdown/pruning behave exactly as with inline literals."""
    _register(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE c_acctbal >= :min_bal AND c_mktsegment <> :excluded
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 5000.0, "excluded": "MACHINERY"},
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT)) AS BIGINT)
             AS price_micros
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY c.c_mktsegment
    HAVING COUNT(*) > 10
    """,
    tags=("sql", "modern", "pipe-syntax"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0's ``|>`` operator chaining — the
    linear-dataflow spelling of SELECT): scan -> join -> filter ->
    aggregate -> having, each stage reading top-to-bottom like the
    DataFrame API.  Catalyst compiles it to the identical plan as the
    nested form, so every optimization (pushdown, broadcast, partial
    agg) applies unchanged; the DuckDB oracle is the classic spelling
    of the same query.  Exact integer micros keep the hash bit-stable."""
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql("""
        FROM orders AS o
        |> JOIN customer AS c ON o.o_custkey = c.c_custkey
        |> WHERE o.o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
                       AS price_micros
           GROUP BY c.c_mktsegment
        |> WHERE n_orders > 10
        |> SELECT c_mktsegment, n_orders, price_micros
    """)


@query(
    "sql_group_order_by_all",
    oracle="""
    SELECT n.n_name, o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT)) AS BIGINT)
             AS price_micros
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "modern", "group-by-all"),
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (Spark 4 + DuckDB shared
    modern-SQL sugar): every non-aggregate select item becomes a
    grouping key, and the result orders by all columns left-to-right —
    so adding a dimension to the SELECT list can never silently change
    grouping semantics.  Resolves at analysis time to the explicit
    form; the physical plan (partial agg -> shuffle -> final agg ->
    sort) is identical.  The global sort is for presentation
    determinism on a small grouped result — at scale ORDER BY ALL on a
    raw fact table would be a full range-partitioned sort, the usual
    caveat."""
    _register(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql("""
        SELECT n.n_name, o.o_orderstatus,
               COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
                 AS price_micros
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY ALL
        ORDER BY ALL
    """)


@query(
    "sql_scalar_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("sql", "ddl", "udf"),
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scalar UDF (CREATE TEMPORARY FUNCTION ... RETURN
    <expr>): the function body is pure SQL, so Catalyst INLINES it into
    the caller's plan — unlike a Python UDF there is no serialization
    boundary, no black box, and predicate pushdown/codegen see through
    the call.  The oracle is the hand-inlined expression, proving the
    inlining is semantics-preserving."""
    _register(spark, sf_dir, "orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION is_big_order(price DOUBLE)
        RETURNS INT RETURN CASE WHEN price > 150000 THEN 1 ELSE 0 END
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(is_big_order(o_totalprice)) AS BIGINT) AS n_big
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("sql", "parameterized"),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause: table and column names supplied as bound
    PARAMETERS, not string-spliced SQL — names stay injection-safe while
    remaining catalog-resolvable (the templating primitive for
    multi-tenant / per-dataset pipelines, Spark 4's answer to f-string
    DDL).  The oracle is the resolved plain query."""
    _register(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT IDENTIFIER(:keycol) AS n_regionkey,
               COUNT(*) AS n_nations
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:keycol)
        """,
        args={"tbl": "nation", "keycol": "n_regionkey"},
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name
    """,
    tags=("sql", "parameterized"),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE: SQL-composed SQL with ? placeholders bound
    via USING — the stored-procedure-style dynamic dispatch of Spark 4,
    with values kept out of the statement text (no injection, plan
    cache friendly).  The oracle is the resolved static query."""
    _register(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT r_name, COUNT(*) AS n_nations
           FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE n.n_nationkey >= ? GROUP BY r_name'
          USING 0
        """
    )


@query(
    "sql_lateral_column_alias",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 0.9 AS discounted,
           (o_totalprice * 0.9) * 0.07 AS tax,
           (o_totalprice * 0.9) + ((o_totalprice * 0.9) * 0.07) AS final_price
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    tags=("sql", "modern"),
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): later SELECT items reference
    earlier aliases in the same list — the ergonomic form of chained
    derivations that otherwise need nested subqueries.  Catalyst
    rewrites each reference to the aliased expression, so the oracle
    states the expanded arithmetic; every step is the same IEEE op
    chain in the same order, keeping doubles bit-equal."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               o_totalprice * 0.9 AS discounted,
               discounted * 0.07 AS tax,
               discounted + tax AS final_price
        FROM orders WHERE o_orderkey % 100 = 0
        """
    )


@query(
    "sql_collation_lcase",
    oracle="""
    SELECT lower(o_orderpriority) AS priority_ci,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY lower(o_orderpriority)
    """,
    tags=("sql", "collation"),
)
def sql_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: grouping under UTF8_LCASE compares keys
    case-insensitively INSIDE the hash aggregate — no lower() rewrite
    of the data, and range/equality predicates on the collated column
    stay sargable.  The output key is lowercased only for a stable
    cross-engine display form; the oracle mirrors with lower()
    grouping (fixture keys are single-case, so the semantics align
    exactly)."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT lower(pr) AS priority_ci, COUNT(*) AS n_orders
        FROM (SELECT COLLATE(o_orderpriority, 'UTF8_LCASE') AS pr FROM orders)
        GROUP BY pr
        """
    )


@query(
    "sql_scripting",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS c FROM orders),
    cand AS (
      SELECT CAST(1 AS BIGINT) << k AS t
      FROM generate_series(0, 40) AS g(k)
    ),
    scored AS (
      SELECT c.t,
             (SELECT COUNT(*) FROM orders o WHERE o.o_totalprice <= c.t) AS hit
      FROM cand c
    ),
    chosen AS (
      SELECT MIN(t) AS t FROM scored, n WHERE hit * 10 >= n.c * 9
    )
    SELECT o_orderstatus,
           (SELECT t FROM chosen) AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_totalprice <= (SELECT t FROM chosen)
    GROUP BY o_orderstatus
    """,
    tags=("sql", "modern", "scripting", "control-flow"),
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4.0 ANSI SQL/PSM blocks — ``BEGIN``,
    ``DECLARE``, ``WHILE``): an iterative-search control flow expressed
    ENTIRELY in SQL — find the smallest power-of-two price threshold
    covering >= 90% of orders by doubling a local variable, each probe a
    distributed COUNT, then report order counts under the converged
    threshold.  This is the scripting twin of a driver-side Python loop
    around spark.sql(): state lives in script-local variables, the data
    never leaves the cluster, and each iteration is a full Catalyst-
    optimized query.  The DuckDB oracle replays the search declaratively
    (min over the power-of-two candidate spine — same fixpoint, no
    procedural features needed)."""
    _register(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE t BIGINT DEFAULT 1;
          DECLARE n BIGINT;
          DECLARE hit BIGINT;
          SET n = (SELECT COUNT(*) FROM orders);
          SET hit = (SELECT COUNT(*) FROM orders WHERE o_totalprice <= t);
          WHILE hit * 10 < n * 9 DO
            SET t = t * 2;
            SET hit = (SELECT COUNT(*) FROM orders WHERE o_totalprice <= t);
          END WHILE;
          SELECT o_orderstatus, t AS threshold, COUNT(*) AS n_orders
          FROM orders WHERE o_totalprice <= t GROUP BY o_orderstatus;
        END
        """
    )
