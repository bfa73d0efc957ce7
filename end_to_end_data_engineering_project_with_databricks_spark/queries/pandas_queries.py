"""Query surface for the Arrow-vectorized UDF pack (functions/pandas_fns).

Demonstrates all three grouped-Python shapes on fixture tables —
scalar ``pandas_udf``, grouped-aggregate ``pandas_udf``, and
``applyInPandas`` — each with a full DuckDB oracle (the UDFs are written
exactness-safe; see functions/pandas_fns.py).  ``mapInPandas`` is
exercised by the multimodal pack (queries/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.udtfs import (
    register_udtfs,
)
from end_to_end_data_engineering_project_with_databricks_spark.functions.pandas_fns import (
    acctbal_range,
    arrow_audit_batches,
    minmax_normalize,
    token_count,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


@query(
    "pandas_scalar_token_count",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    tags=("pandas-udf", "text"),
)
def pandas_scalar_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: per-document token count.  One Arrow batch per
    ~10k rows crosses the Python boundary; the plan around the UDF
    (scan, projection) stays JVM-side and column-pruned."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", token_count("text").alias("n_tokens"))


@query(
    "pandas_grouped_agg_range",
    oracle="""
    SELECT c_mktsegment, MAX(c_acctbal) - MIN(c_acctbal) AS bal_range
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("pandas-udf", "agg"),
)
def pandas_grouped_agg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf inside a regular groupBy().agg().
    Spark shuffles by the key and hands each group to Python as one
    Arrow batch — a UDAF without writing JVM code."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        acctbal_range("c_acctbal").alias("bal_range")
    )


@query(
    "pandas_apply_minmax_norm",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CASE WHEN MAX(c_acctbal) OVER w <> MIN(c_acctbal) OVER w
                THEN (c_acctbal - MIN(c_acctbal) OVER w)
                     / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w)
           END AS bal_norm
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    """,
    tags=("pandas-udf", "window"),
)
def pandas_apply_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-nation min-max normalization.  Each nation's
    rows arrive as one pandas DataFrame (shuffle on the group key —
    same physical shape as a window aggregate, plus the Arrow hop);
    use only when the per-group logic genuinely needs pandas, else a
    Window (the oracle's form) stays JVM-side and is strictly faster."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    out_schema = "c_custkey long, c_nationkey int, c_acctbal double, bal_norm double"
    return c.groupBy("c_nationkey").applyInPandas(
        lambda pdf: minmax_normalize(pdf, "c_acctbal", "bal_norm"), out_schema
    )


@query(
    "udtf_char_ngrams",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(1, len(text) - 2)) AS pos,
           unnest(list_transform(generate_series(1, len(text) - 2),
                                 i -> substr(text, i, 3))) AS ngram
    FROM documents
    WHERE doc_id < 5
    """,
    tags=("udtf",),
)
def udtf_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) via SQL LATERAL join:
    character trigrams with 1-based positions over a bounded document
    slice.  Completes the UDF/UDAF/UDTF API triad; the docstring in
    functions/udtfs.py states the keep-off-the-hot-path rule."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ("documents",))
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM documents d, LATERAL char_ngrams(d.text, 3) g
        WHERE d.doc_id < 5
        """
    )


@query(
    "pandas_cogroup_asof",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
             MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY 1, 2
    )
    SELECT p.user_id, p.es AS purchase_sec, p.purchase_id,
           c.es AS click_sec, c.click_id,
           p.es - c.es AS gap_sec
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.es <= p.es
    """,
    tags=("pandas-udf", "cogroup", "asof"),
)
def pandas_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped applyInPandas (``groupBy().cogroup()``): purchases and
    clicks are shuffled by user_id ONCE each and handed to Python as
    aligned per-user Arrow batch pairs; ``pandas.merge_asof`` does the
    backward as-of match inside each pair.  The cogroup primitive is the
    idiomatic escape hatch for per-key algorithms over TWO relations
    (the single-relation forms are applyInPandas/mapInPandas); semantics
    and oracle are identical to events_asof_purchase_click, which solves
    the same problem JVM-side with a union + running last() — the pair
    documents the trade: cogroup costs Arrow transfer but opens the full
    pandas toolbox per key."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    es = F.col("ts").cast("timestamp").cast("long")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", es.alias("es"), F.col("event_id").alias("purchase_id")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", es.alias("es"))
        .agg(F.max("event_id").alias("click_id"))
    )

    def merge(purchases_pdf: pd.DataFrame, clicks_pdf: pd.DataFrame) -> pd.DataFrame:
        if purchases_pdf.empty:
            return pd.DataFrame(
                columns=[
                    "user_id", "purchase_sec", "purchase_id",
                    "click_sec", "click_id", "gap_sec",
                ]
            )
        right = clicks_pdf.rename(columns={"es": "click_sec", "click_id": "click_id"})
        right = right.assign(es=right["click_sec"]).sort_values("es")
        out = pd.merge_asof(
            purchases_pdf.sort_values("es"),
            right[["es", "click_sec", "click_id"]],
            on="es",
            direction="backward",
        )
        out = out.rename(columns={"es": "purchase_sec"})
        out["click_sec"] = out["click_sec"].astype("Int64")
        out["click_id"] = out["click_id"].astype("Int64")
        out["gap_sec"] = (out["purchase_sec"] - out["click_sec"]).astype("Int64")
        return out[
            ["user_id", "purchase_sec", "purchase_id", "click_sec", "click_id", "gap_sec"]
        ]

    return purchases.groupBy("user_id").cogroup(clicks.groupBy("user_id")).applyInPandas(
        merge,
        schema=(
            "user_id long, purchase_sec long, purchase_id long, "
            "click_sec long, click_id long, gap_sec long"
        ),
    )


@query(
    "udtf_parse_delimited_dynamic",
    oracle="""
    SELECT n_name AS c1,
           CAST(n_nationkey AS VARCHAR) AS c2,
           CAST(n_regionkey AS VARCHAR) || ',extra' AS c3
    FROM nation
    """,
    tags=("udtf", "polymorphic", "analyze"),
)
def udtf_parse_delimited_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (the Spark 4 ``analyze`` static method):
    the output schema — three string columns c1..c3 — is computed at
    PLAN time from the constant ``n_cols`` argument, something a static
    ``returnType`` cannot express.  Nation rows are serialized to
    4-field delimited lines and re-parsed with n_cols=3, so the
    overflow field spills into the last column (fixed-width landing
    semantics) and the oracle reproduces the spill with plain string
    concatenation."""
    from end_to_end_data_engineering_project_with_databricks_spark.functions.udtfs import (
        register_udtfs,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    register_udtfs(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_udtf_src")
    return spark.sql("""
        SELECT t.c1, t.c2, t.c3
        FROM (
          SELECT concat(n_name, ',', CAST(n_nationkey AS STRING), ',',
                        CAST(n_regionkey AS STRING), ',extra') AS line
          FROM nation_udtf_src
        ) v, LATERAL parse_delimited(v.line, 3) t
    """)


@query(
    "pandas_rolling_minmax",
    oracle="""
    SELECT user_id, event_id, value,
           MIN(value) OVER w AS roll_min,
           MAX(value) OVER w AS roll_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    tags=("pandas-udf", "window", "events"),
)
def pandas_rolling_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas with ORDERED per-group state: each user's events
    arrive as one pandas frame, get time-sorted (ts, event_id for tie
    stability), and a 5-event rolling min/max envelope — the clipping
    preamble of outlier-robust feature pipelines — is computed with
    pandas ``rolling``.  Only order-insensitive extrema (no float
    summation), so the result is bit-exact against the oracle's window
    frame.  Same shuffle shape as a SQL window; the pandas hop buys the
    full rolling toolbox when the per-group logic outgrows SQL frames."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        r = pdf["value"].rolling(5, min_periods=1)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "roll_min": r.min(),
                "roll_max": r.max(),
            }
        )

    return e.groupBy("user_id").applyInPandas(
        roll,
        "user_id long, event_id long, value double, roll_min double, roll_max double",
    )


@query(
    "udtf_table_arg_user_stats",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    tags=("udtf", "table-argument", "agg"),
)
def udtf_table_arg_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with a TABLE argument (Spark 4 ``TABLE(...) PARTITION BY``
    calling convention — the third UDTF surface next to lateral scalar
    args and polymorphic ``analyze``): the engine shuffles the events
    relation by user_id and streams each partition through one stateful
    UDTF instance; ``terminate`` emits the per-user summary.  The fold
    uses only counts and extrema, so values are bit-exact vs the
    GROUP BY oracle."""
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ("events",))
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT user_id, n_events, n_purchases, max_value
        FROM user_event_summary(TABLE(events) PARTITION BY user_id)
        """
    )


@query(
    "arrow_batch_audit",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS utf8_len,
           length(text) = n_chars AS len_matches
    FROM documents
    """,
    tags=("arrow", "mapinarrow", "data-quality"),
)
def arrow_batch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead Python boundary — raw Arrow
    RecordBatches in and out, no pandas materialization (mapInPandas
    pays an extra Arrow<->pandas conversion both ways; per-row Python
    UDFs pay ~100x).  Used here as a metadata-audit pass recomputing
    each document's character count with Arrow's C++ ``utf8_length``
    kernel and checking it against the stored ``n_chars`` column.

    The right tool when the per-batch work is itself expressible in
    columnar kernels (pyarrow.compute, numpy over zero-copy buffers) —
    the same boundary the multimodal decode stubs use, minus pandas.
    Schema declared up front; the scan prunes to the three referenced
    columns."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return d.mapInArrow(
        arrow_audit_batches, "doc_id long, utf8_len long, len_matches boolean"
    )


# ---------------------------------------------------------------------------
# CUSUM drift alarms (round 7) — a genuinely non-window per-group
# recurrence: S_i = max(0, S_{i-1} + x_i - k), alarm and RESET when S
# crosses h.  SQL window frames cannot express the reset (the state at
# row i depends on every alarm before it), so this is the canonical
# applyInPandas stateful operator; the oracle replays it with a
# recursive CTE.
# ---------------------------------------------------------------------------

#: CUSUM reference drift (fixed-point cents) and alarm threshold.
_CUSUM_K_FP = 6_000
_CUSUM_H_FP = 20_000

EVENTS_CUSUM_ORACLE = f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS v_fp,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    c AS (
      SELECT user_id, rn, event_id,
             GREATEST(0, v_fp - {_CUSUM_K_FP}) AS s_raw,
             CASE WHEN GREATEST(0, v_fp - {_CUSUM_K_FP}) > {_CUSUM_H_FP}
                  THEN 0 ELSE GREATEST(0, v_fp - {_CUSUM_K_FP}) END AS s_carry
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, s.event_id,
             GREATEST(0, c.s_carry + s.v_fp - {_CUSUM_K_FP}),
             CASE WHEN GREATEST(0, c.s_carry + s.v_fp - {_CUSUM_K_FP})
                       > {_CUSUM_H_FP}
                  THEN 0
                  ELSE GREATEST(0, c.s_carry + s.v_fp - {_CUSUM_K_FP}) END
      FROM seq s JOIN c ON s.user_id = c.user_id AND s.rn = c.rn + 1
    )
    SELECT user_id,
           CAST(rn AS BIGINT) AS seq,
           event_id,
           CAST(s_raw AS BIGINT) AS cusum_fp
    FROM c WHERE s_raw > {_CUSUM_H_FP}
"""


@query(
    "events_cusum_alarms",
    oracle=EVENTS_CUSUM_ORACLE,
    tags=("pandas-udf", "events", "stateful"),
)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user (Page 1954): the
    sequential change-point statistic ``S_i = max(0, S_{{i-1}} + x_i - k)``
    with an alarm (and state reset) whenever S crosses ``h`` — the
    classic monitoring operator for "this stream's mean has shifted up".
    Emits one row per alarm with the 1-based event position and the
    statistic value that crossed.

    The reset makes the recurrence NON-window-expressible (row i's state
    depends on the alarm history, not a fixed frame), so the per-user
    fold runs in applyInPandas — ordered ``(ts, event_id)`` groups, a
    pure int64 loop (the cents conversion ``round(value*100)`` happens
    JVM-side BEFORE the Python hop, so Python never touches a float) —
    while the oracle replays the identical recurrence with a recursive
    CTE.  Bit-exact by construction: integer compares and adds only.

    100 TB shape: one shuffle on user_id (the same Exchange a SQL window
    would need), then each group folds serially in Arrow batches —
    per-user cost is O(events-per-user), groups parallelize across
    executors, and only alarm rows (answer-sized) come back.  A key
    whose single user holds billions of events would serialize; that is
    inherent to sequential change-point semantics, and the mitigation
    (per-epoch sub-keys with carried state) is a deliberate non-goal
    here."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v_fp"),
    )
    k_fp, h_fp = _CUSUM_K_FP, _CUSUM_H_FP

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["v_fp"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        uid = int(pdf["user_id"].iloc[0])
        out_seq, out_eid, out_s = [], [], []
        s = 0
        for i in range(len(v)):
            s = max(0, s + int(v[i]) - k_fp)
            if s > h_fp:
                out_seq.append(i + 1)
                out_eid.append(int(eid[i]))
                out_s.append(s)
                s = 0
        return pd.DataFrame(
            {
                "user_id": pd.Series([uid] * len(out_seq), dtype="int64"),
                "seq": pd.Series(out_seq, dtype="int64"),
                "event_id": pd.Series(out_eid, dtype="int64"),
                "cusum_fp": pd.Series(out_s, dtype="int64"),
            }
        )

    return e.groupBy("user_id").applyInPandas(
        cusum, "user_id long, seq long, event_id long, cusum_fp long"
    )


EVENTS_EMA_EXACT_ORACLE = """
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS v_fp,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    c AS (
      SELECT user_id, rn, v_fp AS ema_fp FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, (s.v_fp + c.ema_fp) // 2
      FROM seq s JOIN c ON s.user_id = c.user_id AND s.rn = c.rn + 1
    ),
    last AS (
      SELECT user_id, MAX(rn) AS n_events FROM seq GROUP BY user_id
    )
    SELECT l.user_id,
           CAST(l.n_events AS BIGINT) AS n_events,
           CAST(c.ema_fp AS BIGINT) AS ema_fp
    FROM last l JOIN c ON c.user_id = l.user_id AND c.rn = l.n_events
"""


@query(
    "events_ema_exact",
    oracle=EVENTS_EMA_EXACT_ORACLE,
    tags=("pandas-udf", "events", "stateful", "timeseries", "smoothing"),
)
def events_ema_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT unbounded recursive EMA per user (alpha = 1/2):
    ``e_i = (v_i + e_{i-1}) div 2`` over integer cents, emitting each
    user's final smoothed level and event count.  events_ewma_bounded's
    docstring calls the recursive EMA "impossible to reproduce
    bit-exactly across engines" — true for FLOAT recursion; this query
    is the counterexample for the fixed-point form: integer halving is
    order-deterministic, the applyInPandas fold and the oracle's
    recursive CTE replay the identical recurrence, and the result
    hash-matches.  The two queries are a matched pair: bounded 4-tap
    when a window-only plan is wanted, exact recursion when the full
    history must count (a property test pins that the 4-tap
    approximates this one within its truncated-tail bound).

    Same shape as events_cusum_alarms: one user_id shuffle, pure-int64
    per-group fold over JVM-quantized cents, answer-sized output (one
    row per user)."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v_fp"),
    )

    def ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["v_fp"].to_numpy()
        s = int(v[0])
        for i in range(1, len(v)):
            s = (int(v[i]) + s) // 2
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(pdf["user_id"].iloc[0])], dtype="int64"),
                "n_events": pd.Series([len(v)], dtype="int64"),
                "ema_fp": pd.Series([s], dtype="int64"),
            }
        )

    return e.groupBy("user_id").applyInPandas(
        ema, "user_id long, n_events long, ema_fp long"
    )
