"""Event-stream analytics in batch form over ``events``: tumbling and
sliding windows, gap-based sessionization.

These are the batch-semantics twins of the streaming module (streaming/
windows.py runs the same tumbling aggregation as a Structured Streaming
query); window starts are exposed as epoch seconds (BIGINT) to keep the
cross-engine schema exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    dsum,
    sql_davg,
    sql_dsum,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.asof import asof_join
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


def _epoch(col: str = "ts") -> F.Column:
    return F.col(col).cast("timestamp").cast("long")


@query(
    "events_tumbling_counts",
    oracle=f"""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start_sec,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg"),
    bench=True,
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event type.  Uses Spark's
    ``window()`` generator (the same expression Structured Streaming
    uses — see streaming/windows.py for the streaming twin), with the
    start exposed as epoch seconds."""
    e = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "10 minutes")
    return (
        e.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start_sec"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sliding_windows",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type, value FROM events
    ),
    expanded AS (
      SELECT (es // 300) * 300 AS window_start_sec, event_type, value FROM ev
      UNION ALL
      SELECT (es // 300) * 300 - 300 AS window_start_sec, event_type, value FROM ev
    )
    SELECT window_start_sec, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes: each event lands in
    exactly two windows (Spark's window() generator emits both; the
    oracle expands them via UNION ALL)."""
    e = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "10 minutes", "5 minutes")
    return (
        e.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start_sec"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, value, es,
             CASE WHEN es - LAG(es) OVER w > 1800 OR LAG(es) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, value, es,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(es) AS session_start_sec,
           MAX(es) - MIN(es) AS duration_sec,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
    tags=("events", "window", "session"),
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag -> new-session
    flag -> running sum as session id -> per-session aggregate.  The batch
    equivalent of ``session_window`` in Structured Streaming; one shuffle
    on user_id serves both window passes and the final aggregate."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", _epoch().alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            (F.col("es") - F.lag("es").over(w) > 1800) | F.lag("es").over(w).isNull(), 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.min("es").alias("session_start_sec"),
        (F.max("es") - F.min("es")).alias("duration_sec"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@query(
    "events_asof_purchase_click",
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
    tags=("events", "join", "asof"),
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase matched to the user's latest click at
    or before it (attribution).  Union + running ``last(ignorenulls)``
    over one (user_id, time) window — a single shuffle, no range-join
    row explosion (operators/asof.py); DuckDB's native ASOF JOIN is the
    oracle.  Clicks are pre-deduped to one per (user, second) so the
    match is deterministic."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", _epoch().alias("es"), F.col("event_id").alias("purchase_id")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", _epoch().alias("es"))
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join(
        purchases, clicks, keys=["user_id"], ts_col="es", right_payload=["click_id"]
    )
    return joined.select(
        "user_id",
        F.col("es").alias("purchase_sec"),
        "purchase_id",
        F.col("matched_es").alias("click_sec"),
        "click_id",
        (F.col("es") - F.col("matched_es")).alias("gap_sec"),
    )


@query(
    "events_hierarchical_rollup",
    oracle="""
    WITH ev AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CAST(round(value * 1000000) AS BIGINT) AS micros
      FROM events
    ),
    ten_min AS (
      SELECT (es // 600) * 600 AS bucket, COUNT(*) AS n_events,
             SUM(micros) AS value_micros
      FROM ev GROUP BY 1
    ),
    hourly AS (
      SELECT (bucket // 3600) * 3600 AS bucket,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             CAST(SUM(value_micros) AS BIGINT) AS value_micros
      FROM ten_min GROUP BY 1
    ),
    daily AS (
      SELECT (bucket // 86400) * 86400 AS bucket,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             CAST(SUM(value_micros) AS BIGINT) AS value_micros
      FROM hourly GROUP BY 1
    )
    SELECT '10min' AS level, bucket, n_events, CAST(value_micros AS BIGINT) AS value_micros FROM ten_min
    UNION ALL SELECT 'hour', bucket, n_events, value_micros FROM hourly
    UNION ALL SELECT 'day', bucket, n_events, value_micros FROM daily
    """,
    tags=("events", "rollup", "agg"),
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the hypertable continuous-aggregate
    pattern): 10-minute buckets from raw events, hourly from the
    10-minute level, daily from hourly — each coarser level reads the
    FINER AGGREGATE, not the fact table, so refreshing a day touches
    144 rows instead of the raw events.  Sums are carried as scaled
    BIGINT micros at every level: long addition is associative and
    exact, so re-aggregating aggregates is lossless — the property that
    makes the cascade valid (double sums would drift when re-summed).

    Scale: one fact-table shuffle (the 10-minute agg); the two
    re-rollups shuffle bucket-count-sized inputs.  At 100 TB this is
    the difference between a daily dashboard query scanning the corpus
    and scanning ~100k pre-aggregated rows."""
    e = load_table(spark, sf_dir, "events").select(
        _epoch().alias("es"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("micros"),
    )
    ten_min = (
        e.groupBy(((F.col("es") / 600).cast("long") * 600).alias("bucket"))
        .agg(F.count("*").alias("n_events"), F.sum("micros").alias("value_micros"))
    )
    hourly = (
        ten_min.groupBy(((F.col("bucket") / 3600).cast("long") * 3600).alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("value_micros").alias("value_micros"))
    )
    daily = (
        hourly.groupBy(((F.col("bucket") / 86400).cast("long") * 86400).alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("value_micros").alias("value_micros"))
    )
    lvl = lambda df, name: df.select(  # noqa: E731
        F.lit(name).alias("level"), "bucket", "n_events", "value_micros"
    )
    return lvl(ten_min, "10min").unionByName(lvl(hourly, "hour")).unionByName(
        lvl(daily, "day")
    )


@query(
    "events_forward_fill",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value
      FROM events WHERE user_id < 20
    ),
    daily AS (
      SELECT user_id, (es // 86400) * 86400 AS day_sec,
             {sql_dsum('value')} AS day_value
      FROM e GROUP BY 1, 2
    ),
    days AS (
      SELECT 1704067200 + 86400 * unnest(generate_series(0, 29)) AS day_sec
    ),
    users AS (SELECT DISTINCT user_id FROM e),
    spine AS (SELECT u.user_id, d.day_sec FROM users u CROSS JOIN days d),
    j AS (
      SELECT s.user_id, s.day_sec, daily.day_value
      FROM spine s LEFT JOIN daily USING (user_id, day_sec)
    )
    SELECT user_id, day_sec, day_value,
           last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day_sec
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM j
    """,
    tags=("events", "window", "gap-fill"),
)
def events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling + forward fill (last observation carried forward):
    per-user daily totals joined onto a dense day spine, missing days
    filled with ``last(..., ignorenulls=True)`` over an ordered window —
    the time-series normalization step before any model that assumes
    regular sampling.  The spine is a tiny literal sequence crossed with
    the (bounded) user dim; one shuffle on user_id serves both the
    left join and the fill window."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = (
        e.select("user_id", _epoch().alias("es"), "value")
        .groupBy(
            "user_id",
            ((F.col("es") / 86400).cast("long") * 86400).alias("day_sec"),
        )
        .agg(dsum("value").alias("day_value"))
    )
    days = spark.range(30).select(
        (F.lit(1704067200) + 86400 * F.col("id")).alias("day_sec")
    )
    users = e.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(days))
    j = spine.join(daily, ["user_id", "day_sec"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day_sec",
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "join_point_in_time_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WHERE user_id < 60
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    dim AS (
      SELECT user_id, event_type AS state_type,
             ts AS valid_from, LEAD(ts) OVER w AS valid_to
      FROM changes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 60
    )
    SELECT d.state_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
    FROM purchases p
    JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    GROUP BY d.state_type
    """,
    tags=("events", "join", "scd2", "temporal", "warehouse"),
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal validity) lookup — the companion of
    events_scd2_user_state: every purchase joined to the SCD2 state row
    valid AT its timestamp (``valid_from <= ts < valid_to``), rolled up
    to purchases per state.  This is THE warehouse pattern for
    reproducible feature lookups ("what did we believe about the user
    when the event happened"), which a plain latest-state join silently
    gets wrong.  Plan: equi-join on user_id with the validity range as
    a join filter — a hash join, not a theta join; the half-open
    periods partition each user's timeline, so exactly one row matches
    per event deterministically."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state_type"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = purchases.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return joined.groupBy("state_type").agg(
        F.count("*").alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    )
    SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, next
    """,
    tags=("events", "window", "agg", "markov"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix (first-order Markov counts): per
    user, consecutive event pairs ordered by (ts, event_id for tie
    stability), aggregated to (prev -> next) transition counts — the
    input to funnel modeling and next-action prediction.  One shuffle
    on user_id for the lag window, then a map-side-combinable count
    over the tiny |types|^2 key space."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count("*").alias("n")
    )


@query(
    "events_linear_interpolation",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value
      FROM events WHERE user_id < 20
    ),
    daily AS (
      SELECT user_id, (es // 86400) * 86400 AS day_sec,
             {sql_dsum('value')} AS day_value
      FROM e GROUP BY 1, 2
    ),
    days AS (
      SELECT 1704067200 + 86400 * unnest(generate_series(0, 29)) AS day_sec
    ),
    users AS (SELECT DISTINCT user_id FROM e),
    spine AS (SELECT u.user_id, d.day_sec FROM users u CROSS JOIN days d),
    j AS (
      SELECT s.user_id, s.day_sec, daily.day_value
      FROM spine s LEFT JOIN daily USING (user_id, day_sec)
    ),
    nb AS (
      SELECT user_id, day_sec, day_value,
             last_value(day_value IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN day_value IS NOT NULL THEN day_sec END
                        IGNORE NULLS) OVER w_prev AS pd,
             first_value(day_value IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN day_value IS NOT NULL THEN day_sec END
                         IGNORE NULLS) OVER w_next AS nd
      FROM j
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY day_sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY day_sec
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day_sec, day_value,
           CASE WHEN day_value IS NOT NULL THEN day_value
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE pv + (nv - pv) * (CAST(day_sec - pd AS DOUBLE)
                                       / CAST(nd - pd AS DOUBLE))
           END AS lerp_value
    FROM nb
    """,
    tags=("events", "window", "gap-fill", "interpolation"),
)
def events_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense day spine — the lerp twin of
    events_forward_fill (LOCF): missing days take
    ``prev + (next-prev) * elapsed/gap`` between their observed
    neighbors, NULL outside the observed range (no extrapolation).
    Exact day totals come from fixed-point dsum; the lerp itself is the
    single-IEEE-op expression both engines evaluate in the same order,
    so values hash-match bit-for-bit.  Same plan shape as forward fill:
    one shuffle on user_id feeds the spine join and both neighbor
    windows."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = (
        e.select("user_id", _epoch().alias("es"), "value")
        .groupBy(
            "user_id",
            ((F.col("es") / 86400).cast("long") * 86400).alias("day_sec"),
        )
        .agg(dsum("value").alias("day_value"))
    )
    days = spark.range(30).select(
        (F.lit(1704067200) + 86400 * F.col("id")).alias("day_sec")
    )
    spine = e.select("user_id").distinct().crossJoin(F.broadcast(days))
    j = spine.join(daily, ["user_id", "day_sec"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day_sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day_sec")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day_sec"))
    nb = j.select(
        "user_id",
        "day_sec",
        "day_value",
        F.last("day_value", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("day_value", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("day_sec") - F.col("pd")).cast("double")
        / (F.col("nd") - F.col("pd")).cast("double")
    )
    return nb.select(
        "user_id",
        "day_sec",
        "day_value",
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(lerp)
        .alias("lerp_value"),
    )


@query(
    "events_asof_next_purchase",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
             MIN(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT c.user_id, c.es AS click_sec, c.click_id,
           p.es AS purchase_sec, p.purchase_id,
           p.es - c.es AS gap_sec
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND p.es >= c.es
    """,
    tags=("events", "join", "asof", "forward"),
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: every click matched to the user's earliest
    purchase at or after it — next-event conversion attribution, the
    mirror of the backward point-in-time join.  Same union + one-window
    plan (operators/asof.py direction='forward'): the only change from
    backward is the tie order and a first() frame, so the cost stays one
    key shuffle with zero row amplification.  DuckDB's ASOF JOIN with a
    >= condition is the oracle.  Purchases are pre-deduped to one per
    (user, second) so the match is deterministic."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", _epoch().alias("es"), F.col("event_id").alias("click_id")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", _epoch().alias("es"))
        .agg(F.min("event_id").alias("purchase_id"))
    )
    joined = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="es",
        right_payload=["purchase_id"],
        direction="forward",
    )
    return joined.select(
        "user_id",
        F.col("es").alias("click_sec"),
        "click_id",
        F.col("matched_es").alias("purchase_sec"),
        "purchase_id",
        (F.col("matched_es") - F.col("es")).alias("gap_sec"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    v AS (
      SELECT user_id, MIN(es) AS v_ts FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.es) AS c_ts
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.es >= v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.es) AS p_ts
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.es >= c.c_ts
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users,
           CAST(NULL AS BIGINT) AS total_gap_sec
    UNION ALL
    SELECT 'click', (SELECT COUNT(*) FROM c),
           (SELECT CAST(SUM(c.c_ts - v.v_ts) AS BIGINT)
            FROM c JOIN v ON c.user_id = v.user_id)
    UNION ALL
    SELECT 'purchase', (SELECT COUNT(*) FROM p),
           (SELECT CAST(SUM(p.p_ts - c.c_ts) AS BIGINT)
            FROM p JOIN c ON p.user_id = c.user_id)
    """,
    tags=("events", "funnel", "agg", "join"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): a user
    advances a stage only with an event AT OR AFTER their previous
    stage's first event — the ordering constraint that separates a
    funnel from three independent counts.  Three cascaded min-filter
    aggregates, each joining the (ever-shrinking) qualified-user set
    back to the events — all equi-joins on user_id; the funnel stages
    shrink monotonically so each later stage's join is cheaper.  Gap
    sums are integer seconds, so the driver hash is exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("es")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("es").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("es") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("es").alias("c_ts"), F.first("v_ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "c_ts"), "user_id")
        .filter(F.col("es") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("es").alias("p_ts"), F.first("c_ts").alias("c_ts"))
    )
    row_v = v.agg(
        F.lit("view").alias("stage"),
        F.count("*").alias("n_users"),
        F.lit(None).cast("long").alias("total_gap_sec"),
    )
    row_c = c.agg(
        F.lit("click").alias("stage"),
        F.count("*").alias("n_users"),
        F.sum(F.col("c_ts") - F.col("v_ts")).cast("long").alias("total_gap_sec"),
    )
    row_p = p.agg(
        F.lit("purchase").alias("stage"),
        F.count("*").alias("n_users"),
        F.sum(F.col("p_ts") - F.col("c_ts")).cast("long").alias("total_gap_sec"),
    )
    return row_v.unionByName(row_c).unionByName(row_p)


@query(
    "events_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 7 AS week
      FROM events
    ),
    first_week AS (
      SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY user_id
    ),
    active AS (SELECT DISTINCT user_id, week FROM ev),
    cohort_size AS (
      SELECT cohort, COUNT(*) AS n_cohort FROM first_week GROUP BY cohort
    )
    SELECT f.cohort, a.week - f.cohort AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
           CAST(MAX(s.n_cohort) AS BIGINT) AS n_cohort
    FROM active a
    JOIN first_week f ON a.user_id = f.user_id
    JOIN cohort_size s ON f.cohort = s.cohort
    GROUP BY f.cohort, a.week - f.cohort
    """,
    tags=("events", "retention", "cohort", "agg", "join"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week,
    counted distinct in each subsequent week offset — the
    product-analytics standard for "do users come back".  One distinct
    per (user, week), a min-aggregate for cohort assignment, and a
    single grouped count-distinct joined to cohort sizes; every join is
    an equi-join on user_id or cohort.  Integer week arithmetic
    end-to-end (epoch // 86400 // 7), so the driver hash is exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(_epoch() / 86400 / 7).cast("long").alias("week")
    )
    first_week = ev.groupBy("user_id").agg(F.min("week").alias("cohort"))
    active = ev.distinct()
    cohort_size = first_week.groupBy("cohort").agg(F.count("*").alias("n_cohort"))
    return (
        active.join(first_week, "user_id")
        .join(cohort_size, "cohort")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("week_offset"))
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_active"),
            F.max("n_cohort").cast("long").alias("n_cohort"),
        )
    )


@query(
    "events_scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WHERE user_id < 60
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id,
           event_type,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("events", "scd2", "window", "warehouse"),
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: collapse each user's event
    stream into ``[valid_from, valid_to)`` state periods of their
    event_type, with an open-ended ``is_current`` row per user — the
    standard warehouse dimension-history shape (the reference's
    append-only table + anti-join covers only Type 1;
    ETL_pipeline_countries.py:137).

    Two stacked window passes over the SAME partitioning: lag() marks
    change rows, lead() closes each period.  Because both windows
    partition by user_id with an identical ordering, Catalyst reuses
    one shuffle + sort for both Window operators — per-user history
    never leaves its partition, so the plan is one exchange regardless
    of corpus size.  Ties (same user, same ts) are broken by event_id
    so the period chain is deterministic.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "events_zscore_outliers",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             {sql_davg('value')} AS m,
             sqrt({sql_davg('(value * value)')}
                  - {sql_davg('value')} * {sql_davg('value')}) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.m) / s.sd AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.m) / s.sd) > 2.5
    """,
    tags=("events", "outliers", "stats", "data-quality"),
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: events whose value sits more
    than 2.5 population standard deviations from their event_type mean —
    the anomaly gate a metrics pipeline runs before aggregation.

    Mean and variance come from exact fixed-point moment sums (one
    aggregate pass, map-side partials), so they are bit-equal with the
    oracle; sqrt is IEEE-754 correctly-rounded in both engines, so the
    z-scores hash-match too.  The per-type stats table is a handful of
    rows — broadcast — making outlier scoring a map-only second pass
    over the stream (at 100 TB: aggregate once, score anywhere).
    """
    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import davg

    e = load_table(spark, sf_dir, "events")
    m = davg("value")
    m2 = davg(F.col("value") * F.col("value"))
    stats = (
        e.groupBy("event_type")
        .agg(m.alias("m"), m2.alias("m2"))
        .select(
            "event_type", "m", F.sqrt(F.col("m2") - F.col("m") * F.col("m")).alias("sd")
        )
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs("z") > 2.5)
    )


@query(
    "events_ewma_bounded",
    oracle="""
    SELECT user_id, event_id,
           0.5 * value
           + 0.25 * LAG(value, 1) OVER w
           + 0.125 * LAG(value, 2) OVER w
           + 0.125 * LAG(value, 3) OVER w AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    QUALIFY LAG(value, 3) OVER w IS NOT NULL
    """,
    tags=("events", "window", "timeseries", "smoothing"),
)
def events_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded exponentially-weighted moving average per user: a 4-tap
    EWMA with alpha = 0.5 (weights 1/2, 1/4, 1/8, 1/8 — the final tap
    absorbs the tail so weights sum to 1), emitted from each user's 4th
    event on.

    The unbounded recursive EWMA is order-dependent float recursion —
    impossible to reproduce bit-exactly across engines; the bounded
    form is a fixed multiply-add chain whose DYADIC coefficients make
    every product exact, so only the (identically ordered) additions
    round, and the result hash-matches.  One shuffle on user_id, four
    lag taps from the same sorted window frame.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events")
    l1, l2, l3 = (F.lag("value", k).over(w) for k in (1, 2, 3))
    ewma = (
        F.lit(0.5) * F.col("value")
        + F.lit(0.25) * l1
        + F.lit(0.125) * l2
        + F.lit(0.125) * l3
    )
    return (
        e.select("user_id", "event_id", ewma.alias("ewma"), l3.alias("_l3"))
        .filter(F.col("_l3").isNotNull())
        .drop("_l3")
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_disc(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS dev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM dev
      GROUP BY event_type
    )
    SELECT m.event_type, m.med, d.mad,
           CAST(COUNT(*) FILTER (
             WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
           ) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    GROUP BY m.event_type, m.med, d.mad
    """,
    tags=("events", "agg", "quality", "robust-stats"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute deviation
    (MAD) with the 1.4826 normal-consistency factor — unlike the z-score
    gate (events_zscore_outliers), a single extreme value cannot inflate
    the threshold, the property that matters when the anomaly itself is
    what you are hunting.  percentile_disc SELECTS actual data values
    (no interpolation), so medians compare bit-exactly across engines,
    and every derived double (|v - med|, 3 * 1.4826 * mad) is the same
    two-operand IEEE op in both.  Plan: two sort-based grouped medians
    + two broadcast joins back (group count is tiny); at 100 TB swap
    percentile_disc for approx_percentile's mergeable t-digest and keep
    the identical shape."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH med AS (
          SELECT event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
          FROM events GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_type, abs(e.value - m.med) AS dev
          FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
          FROM dev GROUP BY event_type
        )
        SELECT m.event_type, m.med, d.mad,
               CAST(COUNT_IF(abs(e.value - m.med) > 3 * 1.4826 * d.mad)
                    AS BIGINT) AS n_outliers,
               COUNT(*) AS n_events
        FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
        GROUP BY m.event_type, m.med, d.mad
        """
    )


@query(
    "events_gap_detection",
    oracle="""
    WITH bounds AS (
      SELECT (CAST(floor(epoch(MIN(ts))) AS BIGINT) // 3600) * 3600 AS lo,
             (CAST(floor(epoch(MAX(ts))) AS BIGINT) // 3600) * 3600 AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, 3600)) AS bucket_start
      FROM bounds
    ),
    observed AS (
      SELECT DISTINCT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_start
      FROM events
    ),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type, s.bucket_start
    FROM types t CROSS JOIN spine s
    LEFT JOIN observed o
      ON o.event_type = t.event_type AND o.bucket_start = s.bucket_start
    WHERE o.event_type IS NULL
    """,
    tags=("events", "quality", "gap-detection"),
)
def events_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-bucket detection: generate the expected hourly spine from
    the observed min/max event time, cross it with the (tiny) event-type
    dimension, and anti-join the observed (type, hour) buckets — the
    freshness/completeness monitor run before trusting ingested event
    data.  The spine is rows = hours (generated, not scanned) and the
    distinct observed buckets are bounded by types x hours, so every
    join input is O(answer), not O(events): the only corpus-size work
    is the distinct's map-side pre-aggregation.  (The deliberate cross
    join is types x spine — both tiny dimensions.)"""
    e = load_table(spark, sf_dir, "events")
    bucket = (F.floor(_epoch() / 3600) * 3600).cast("long")
    bounds = e.agg(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("bucket_start")
    )
    types = e.select("event_type").distinct()
    observed = e.select(
        "event_type", bucket.alias("bucket_start")
    ).distinct()
    return (
        types.crossJoin(spine)
        .join(observed, ["event_type", "bucket_start"], "left_anti")
    )


@query(
    "events_ohlc_resample",
    oracle=f"""
    WITH ev AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bar_start_sec,
             event_type, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    ranked AS (
      SELECT bar_start_sec, event_type, value,
             ROW_NUMBER() OVER w_asc AS rn_a,
             ROW_NUMBER() OVER w_desc AS rn_d
      FROM ev
      WINDOW w_asc AS (PARTITION BY bar_start_sec, event_type
                       ORDER BY es ASC, event_id ASC),
             w_desc AS (PARTITION BY bar_start_sec, event_type
                        ORDER BY es DESC, event_id DESC)
    )
    SELECT bar_start_sec, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS volume
    FROM ranked
    GROUP BY bar_start_sec, event_type
    """,
    tags=("events", "window-agg", "resample"),
)
def events_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series bar resampling (OHLC downsample): hourly bars per
    event type with open/high/low/close/volume — the standard
    downsampling shape for metric and market-data pipelines, where raw
    ticks compress to bars before long-horizon analytics.

    Open/close are SELECTIONS (first/last value in deterministic
    (ts, event_id) order), never arithmetic, so the raw doubles pass
    through bit-identically; volume uses the exact fixed-point dsum.
    Plan shape: one shuffle total — the two row_number windows and the
    final aggregate all key on (bar_start_sec, event_type), so Catalyst
    plans a single Exchange feeding two Sorts and a partial-merge
    HashAggregate.  At 100 TB bars parallelize by (bar, type) key —
    there is no per-series sequential dependency (unlike EWMA), so the
    operator scales with the bucket count, and a day's ticks never meet
    another day's in the shuffle."""
    e = load_table(spark, sf_dir, "events")
    es = _epoch()
    base = e.select(
        ((es / F.lit(3600)).cast("long") * F.lit(3600)).alias("bar_start_sec"),
        "event_type",
        "event_id",
        "value",
        es.alias("es"),
    )
    w_asc = Window.partitionBy("bar_start_sec", "event_type").orderBy(
        F.asc("es"), F.asc("event_id")
    )
    w_desc = Window.partitionBy("bar_start_sec", "event_type").orderBy(
        F.desc("es"), F.desc("event_id")
    )
    ranked = base.withColumn("rn_a", F.row_number().over(w_asc)).withColumn(
        "rn_d", F.row_number().over(w_desc)
    )
    return ranked.groupBy("bar_start_sec", "event_type").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("volume"),
    )


@query(
    "events_asof_tolerance",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
             MIN(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    m AS (
      SELECT c.user_id, c.es AS click_sec, c.click_id,
             p.es AS p_es, p.purchase_id AS p_id
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.es >= c.es
    )
    SELECT user_id, click_sec, click_id,
           CASE WHEN p_es - click_sec <= 1800 THEN p_es END AS purchase_sec,
           CASE WHEN p_es - click_sec <= 1800 THEN p_id END AS purchase_id,
           CASE WHEN p_es - click_sec <= 1800 THEN p_es - click_sec END
             AS gap_sec
    FROM m
    """,
    tags=("events", "join", "asof", "tolerance"),
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join WITH TOLERANCE (pandas ``merge_asof``'s
    ``tolerance`` parameter, distributed): every click matched to the
    user's next purchase only if it happens within 30 minutes —
    attribution windows, stale-quote rejection in market data, sensor
    staleness gates.  The match beyond tolerance NULLIFIES the payload
    (left row kept — how='left' semantics); operators/asof.py applies
    the gap test on the already-computed window match, so tolerance
    adds ZERO extra shuffle or join — same one-shuffle union+window
    plan as the untolerated twin (events_asof_next_purchase).  The
    oracle states it as DuckDB ASOF LEFT JOIN + a CASE nullification."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", _epoch().alias("es"), F.col("event_id").alias("click_id")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", _epoch().alias("es"))
        .agg(F.min("event_id").alias("purchase_id"))
    )
    joined = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="es",
        right_payload=["purchase_id"],
        direction="forward",
        tolerance=1800,
    )
    return joined.select(
        "user_id",
        F.col("es").alias("click_sec"),
        "click_id",
        F.col("matched_es").alias("purchase_sec"),
        "purchase_id",
        (F.col("matched_es") - F.col("es")).alias("gap_sec"),
    )


@query(
    "events_asof_nearest",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
             MIN(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    b AS (
      SELECT c.click_id, c.user_id, c.es,
             p.es AS bes, p.purchase_id AS bid
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.es <= c.es
    ),
    f AS (
      SELECT c.click_id, p.es AS fes, p.purchase_id AS fid
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.es >= c.es
    ),
    n AS (
      SELECT b.user_id, b.es, b.click_id,
             CASE WHEN bes IS NULL THEN fes
                  WHEN fes IS NULL THEN bes
                  WHEN (b.es - bes) <= (fes - b.es) THEN bes
                  ELSE fes END AS purchase_sec,
             CASE WHEN bes IS NULL THEN fid
                  WHEN fes IS NULL THEN bid
                  WHEN (b.es - bes) <= (fes - b.es) THEN bid
                  ELSE fid END AS purchase_id
      FROM b JOIN f USING (click_id)
    )
    SELECT user_id, es AS click_sec, click_id,
           purchase_sec, purchase_id,
           purchase_sec - es AS gap_sec
    FROM n
    """,
    tags=("events", "join", "asof", "nearest"),
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third merge_asof direction, closing the
    backward/forward/nearest matrix as driver-checkable queries: every
    click matched to the user's closest purchase in ABSOLUTE time,
    backward winning exact ties (pandas parity).  The signed ``gap_sec``
    is negative when the backward candidate won.

    Plan (operators/asof.py direction='nearest'): both direction frames
    evaluate over the SAME sorted union exchange — one key shuffle, one
    in-partition re-sort, zero row amplification.  DuckDB has no nearest
    ASOF, so the oracle composes its backward and forward ASOF joins and
    replays the absolute-distance argmin with the same tie rule."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", _epoch().alias("es"), F.col("event_id").alias("click_id")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", _epoch().alias("es"))
        .agg(F.min("event_id").alias("purchase_id"))
    )
    joined = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="es",
        right_payload=["purchase_id"],
        direction="nearest",
    )
    return joined.select(
        "user_id",
        F.col("es").alias("click_sec"),
        "click_id",
        F.col("matched_es").alias("purchase_sec"),
        "purchase_id",
        (F.col("matched_es") - F.col("es")).alias("gap_sec"),
    )
