"""Temporal superset queries: as-of join, sessionization, tumbling
windows (SURVEY.md §2.6 J2 generalized, §2.10 batch-first).

DuckDB oracles: ASOF JOIN is native in DuckDB; sessionization uses
the identical lag+cumsum window SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flight_data_pipeline_spark.functions.scalars import (
    to_epoch_seconds,
    to_units,
)
from flight_data_pipeline_spark.operators.relational import asof_join
from flight_data_pipeline_spark.operators.temporal import sessionize
from flight_data_pipeline_spark.plans.registry import query
from flight_data_pipeline_spark.tables import load_table


# --- as-of join (J2 generalized; SURVEY.md §7.3 "the one fiddly op") ---------
@query(
    "purchase_attribution_asof",
    oracle="""
    SELECT p.event_id                                      AS purchase_id,
           p.user_id                                       AS user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f')          AS purchase_ts,
           STRFTIME(v.ts, '%Y-%m-%d %H:%M:%S.%f')          AS view_ts,
           v.event_id                                      AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_id
    """,
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's most recent
    prior (inclusive) view — the general form of the reference's
    intensity⋈mix same-window pairing (etl_job.py:199-200,249-259).

    Spark has no native ASOF JOIN; operators.relational.asof_join
    composes it as union + last(ignorenulls) over one (user, ts) sort:
    one shuffle, linear in input. The DuckDB oracle uses its native
    ASOF LEFT JOIN.

    Tie note: views sharing a user+ts keep the max view_id (same rule
    both sides via the operator's deterministic ordering).
    """
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase")
    views = (
        ev.where(F.col("event_type") == "view")
        .select("user_id", "ts", F.col("event_id").alias("view_event"),
                F.col("ts").alias("view_time"))
    )
    joined = asof_join(
        purchases, views, on="ts", by="user_id",
        right_cols=["view_time", "view_event"], suffix="",
    )
    return (
        joined.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.date_format("view_time", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
            F.col("view_event").alias("view_id"),
        )
    )


# --- binned range join (interval join, equi-join decomposition) --------------
@query(
    "views_before_purchase_1h",
    oracle="""
    SELECT p.event_id                       AS purchase_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS n_views_1h
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts <  p.ts
    GROUP BY p.event_id
    ORDER BY purchase_id
    """,
)
def views_before_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: views by the same user in the hour before each
    purchase, counted per purchase. A literal non-equi join is a
    nested-loop plan in Spark; operators.relational.range_join_binned
    turns it into an equi-join on (user, hour-bin) — the left side
    explodes to the ≤2 bins its window spans, the exact range
    predicate filters inside the hash join, and the plan test pins
    that no CartesianProduct/BroadcastNestedLoopJoin appears."""
    from flight_data_pipeline_spark.operators.relational import range_join_binned

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"))
    joined = range_join_binned(
        purchases, views, key_cols=["user_id"],
        left_ts="ts", right_ts="view_ts",
        lower_sec=-3600, upper_sec=0, bin_sec=3600, how="left",
        left_unique=["purchase_id"],  # declared key: no rank/hash id pass
    )
    return (
        joined.groupBy("purchase_id")
        .agg(F.count("view_id").alias("n_views_1h"))
    )


# --- sessionization -----------------------------------------------------------
@query(
    "user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           COUNT(DISTINCT session_id)  AS n_sessions,
           CAST(SUM(n) AS BIGINT)      AS n_events,
           ROUND(AVG(sess_len), 4)     AS avg_session_secs
    FROM (
        SELECT user_id, session_id,
               DATE_DIFF('second', MIN(ts), MAX(ts)) AS sess_len,
               COUNT(*) AS n
        FROM sessions
        GROUP BY user_id, session_id
    ) s
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) → per-user session
    stats. operators.temporal.sessionize: lag + running sum over one
    (user, ts) window — a single shuffle; the two follow-up aggregates
    reuse the user_id partitioning."""
    ev = load_table(spark, "events", sf_dir)
    sessions = sessionize(ev, "user_id", "ts", gap_minutes=30)
    ts_secs = to_epoch_seconds(F.col("ts"))
    per_session = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            (F.max(ts_secs) - F.min(ts_secs)).alias("sess_len"),
            F.count("*").alias("n"),
        )
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.round(F.avg("sess_len"), 4).alias("avg_session_secs"),
        )
    )


# --- tumbling window agg --------------------------------------------------------
@query(
    "hourly_event_windows",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*)             AS n,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0
                                AS total_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per type (§2.10 event-time
    windows, batch form; streaming twin uses the same window() call
    under readStream). Partial agg map-side; one shuffle."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             (F.sum(to_units(F.col("value"), 2)) / 100.0)
             .alias("total_value"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


# --- native session_window vs manual lag+cumsum ------------------------------
@query(
    "session_window_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation, cross-checked
    against the manual lag+cumsum sessionization in the DuckDB oracle
    — two independent implementations of 30-min-gap sessions that
    must produce identical (user, session_start, n_events) triples.
    Native form: one gap-merging aggregate, no window function pass;
    also the streaming-capable spelling (works under readStream)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            "n_events",
        )
    )


# --- SCD2 state history -------------------------------------------------------
@query(
    "user_state_history_scd2",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT *, SUM(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS run
        FROM flagged
    ), per_run AS (
        SELECT user_id, run, event_type AS state,
               MIN(ts) AS vf,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, run, event_type
    )
    SELECT user_id, state,
           STRFTIME(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           STRFTIME(LEAD(vf) OVER (PARTITION BY user_id ORDER BY run),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           n_events
    FROM per_run
    ORDER BY user_id, valid_from
    """,
)
def user_state_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type state: consecutive
    same-type events collapse into validity intervals, closed by the
    next interval's start (NULL while current) — the warehouse
    dimension-history pattern (§2.7 islands-and-gaps; the MERGE twin
    handles the key-level upsert in late_events_merge).

    Plan: operators.temporal.scd2_history — lag-flag, running-sum run
    numbering, per-run aggregate, and lead() close-out, all
    partitioned on user_id: ONE shuffle end-to-end, no self-join.
    Timestamps surface as formatted strings (engine/oracle canonical
    form); the first-row change flag uses row_number, so a NULL
    initial state still opens an interval."""
    from flight_data_pipeline_spark.operators.temporal import scd2_history

    ev = load_table(spark, "events", sf_dir)
    hist = scd2_history(ev, "user_id", "ts", "event_type",
                        tiebreak_col="event_id")
    return hist.select(
        "user_id",
        "state",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss")
        .alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "n_events",
    )


# --- sequential conversion funnel ---------------------------------------------
@query(
    "conversion_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), s2 AS (
        SELECT user_id, ts, event_type, t1,
               MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
        FROM s1
    ), s3 AS (
        SELECT user_id, t1, t2,
               MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY user_id) AS t3
        FROM s2
    ), per_user AS (
        SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
        FROM s3 GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t1) AS BIGINT) AS n_viewed,
           CAST(COUNT(t2) AS BIGINT) AS n_clicked_after_view,
           CAST(COUNT(t3) AS BIGINT) AS n_purchased_after_click,
           ROUND(AVG(DATE_DIFF('second', t1, t3)) / 3600.0, 4)
               AS avg_hours_to_convert
    FROM per_user
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence conversion funnel (the MATCH_RECOGNIZE /
    funnel-analysis shape): users who did view → click → purchase in
    strict timestamp order, each step's anchor being the EARLIEST
    event after the previous step's anchor, plus mean conversion time.

    Plan: three per-user window passes compute the chained step
    anchors (t1 = first view; t2 = first click after t1; t3 = first
    purchase after t2) — all three windows AND the per-user collapse
    share one user_id shuffle; the final single-row aggregate is a
    count of non-nulls. No self-joins, no per-step scans: funnel
    depth adds window expressions, not passes over the fact table."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    ty = F.col("event_type")
    s1 = ev.withColumn(
        "t1", F.min(F.when(ty == "view", t)).over(w))
    s2 = s1.withColumn(
        "t2", F.min(F.when((ty == "click") & (t > F.col("t1")), t)).over(w))
    s3 = s2.withColumn(
        "t3", F.min(F.when((ty == "purchase") & (t > F.col("t2")), t))
        .over(w))
    per_user = s3.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"),
        F.min("t3").alias("t3"))
    hours = (F.col("t3").cast("long") - F.col("t1").cast("long")) / 3600.0
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
        F.round(F.avg(hours), 4).alias("avg_hours_to_convert"),
    )


# --- time-series gap fill -----------------------------------------------------
# Sparse-series parameters: hours with no qualifying purchase must
# appear zero-filled, with the price forward-filled from the last
# observed hour.
GAPFILL_MIN_VALUE = 250


@query(
    "hourly_gap_fill",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM events
        WHERE event_type = 'purchase' AND value > {GAPFILL_MIN_VALUE}
        GROUP BY hour
    )
    SELECT STRFTIME(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(a.n, 0) AS n_big_purchases,
           COALESCE(a.sum_cents, 0) AS sum_value_cents,
           CAST(FLOOR(((2 * last_value(a.sum_cents IGNORE NULLS) OVER w)
                       + last_value(a.n IGNORE NULLS) OVER w)
                      / (2.0 * last_value(a.n IGNORE NULLS) OVER w))
                AS BIGINT) AS filled_avg_cents
    FROM spine s LEFT JOIN agg a ON s.hour = a.hour
    WINDOW w AS (ORDER BY s.hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY hour
    """,
)
def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly spine generated from
    the data's own bounds, the sparse high-value-purchase series
    left-joined onto it, counts zero-filled, and the average price
    FORWARD-FILLED from the last observed hour (last ignorenulls) —
    the reporting shape every dashboard needs over sparse facts.

    Money rides as integer CENTS end-to-end (per-row floor at cents,
    integer sums, the forward-filled mean as the exact integer
    ⌊(2·sum+n)/(2n)⌋): float SUM/AVG here would hash-diverge across
    engines when partial-sum order perturbs the last bits of a value
    sitting on a rounding boundary — with 2-decimal prices a .xx5
    mean is COMMON, and sf0.1 hit it (285.905 → 285.90 vs 285.91).
    Integer partials are order-free, so both engines see identical
    numbers at every step.

    Plan: the spine comes from a one-row bounds aggregate exploded
    through sequence() — its cardinality is the TIME RANGE, not the
    fact count, so the global forward-fill window and final sort see
    hours-per-horizon rows (~720/month) at any data scale; the only
    data-sized work is the sparse aggregate, which map-side combines.
    The spine side of the left join broadcasts."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    agg = (
        ev.where((F.col("event_type") == "purchase")
                 & (F.col("value") > GAPFILL_MIN_VALUE))
        .groupBy(hour.alias("hour"))
        .agg(F.count("*").alias("n"),
             F.sum(cents).alias("sum_cents"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
        .alias("hour"))
    w = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    f_sum = F.last("sum_cents", ignorenulls=True).over(w)
    f_n = F.last("n", ignorenulls=True).over(w)
    return (
        spine.join(agg, "hour", "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n_big_purchases"),
            F.coalesce("sum_cents", F.lit(0)).alias("sum_value_cents"),
            F.floor((2 * f_sum + f_n) / (2.0 * f_n)).cast("long")
            .alias("filled_avg_cents"),
        )
        .orderBy("hour")
    )


# --- cumulative distinct users ------------------------------------------------
@query(
    "cumulative_unique_users_daily",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(DATE_TRUNC('day', ts)) AS d0 FROM events
        GROUP BY user_id
    ),
    per_day AS (
        SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_day GROUP BY d0
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_users
    FROM per_day
    ORDER BY day
    """,
)
def cumulative_unique_users_daily(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the metric a naive
    COUNT(DISTINCT) OVER (ORDER BY day) cannot compute scalably
    (running distinct state grows with users). The first-seen
    decomposition makes it exact AND cheap: distinct-to-date equals
    the running SUM of first-appearance counts.

    Plan: one per-user min-day aggregate (shuffle keyed on users),
    one per-day count (keyed on days), then a running sum over the
    DAY-cardinality frame — the only global window sees rows equal to
    the time horizon, never users or events."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"))
    per_day = first_day.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        per_day.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            F.sum("new_users").over(w).alias("cumulative_users"),
        )
        .orderBy("day")
    )


# --- cohort retention ---------------------------------------------------------
@query(
    "cohort_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(DATE_TRUNC('day', ts)) AS cohort FROM events
        GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               DATE_DIFF('day', f.cohort, DATE_TRUNC('day', e.ts))
                   AS day_offset
        FROM events e JOIN first_day f ON e.user_id = f.user_id
    ),
    sizes AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM first_day GROUP BY cohort
    )
    SELECT STRFTIME(a.cohort, '%Y-%m-%d') AS cohort,
           s.cohort_size,
           a.day_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           ROUND(COUNT(*) * 1.0 / s.cohort_size, 4) AS retention
    FROM activity a JOIN sizes s ON a.cohort = s.cohort
    WHERE a.day_offset IN (1, 7, 14)
    GROUP BY a.cohort, s.cohort_size, a.day_offset
    ORDER BY cohort, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (D1/D7/D14): users grouped by first-seen day,
    the share of each cohort active exactly N days later — the
    product-analytics table every events warehouse serves.

    Plan: the per-user first-day aggregate joins back to events on
    user_id (both sides keyed on users — one co-partitioned shuffle
    pair), the offset filter prunes BEFORE the distinct so state
    tracks (cohort, offset, user) for three offsets only, and cohort
    sizes ride a broadcast (cohort-cardinality). No events self-join
    at any point."""
    ev = load_table(spark, "events", sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort"))
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id", "cohort",
            F.datediff(day, F.col("cohort")).alias("day_offset"))
        .where(F.col("day_offset").isin(1, 7, 14))
        .distinct()
    )
    sizes = first_day.groupBy("cohort").agg(
        F.count("*").alias("cohort_size"))
    return (
        activity.groupBy("cohort", "day_offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "cohort_size", "day_offset", "active_users",
            F.round(F.col("active_users") / F.col("cohort_size"), 4)
            .alias("retention"),
        )
        .orderBy("cohort", "day_offset")
    )


@query(
    "hourly_value_ohlc",
    oracle="""
    SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           CAST(COUNT(*) AS BIGINT)          AS n_events,
           ROUND(arg_min(value, STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f')
                                || lpad(CAST(event_id AS VARCHAR), 12, '0')),
                 4)                          AS open_value,
           ROUND(MAX(value), 4)              AS high_value,
           ROUND(MIN(value), 4)              AS low_value,
           ROUND(arg_max(value, STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f')
                                || lpad(CAST(event_id AS VARCHAR), 12, '0')),
                 4)                          AS close_value
    FROM events
    GROUP BY 1 ORDER BY hour
    """,
)
def hourly_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars over event values — the classic time-series
    downsample (the hypertable/continuous-aggregate rollup shape):
    per hour bucket, first (open) and last (close) value by event
    time via min_by/max_by, plus high/low/count. Generalizes the
    reference's hour-bucket discipline (etl_job.py:226-237,
    SURVEY.md §2.10 event-time windows) from dedup keys to bar
    aggregation.

    ONE aggregate — min_by/max_by are decomposable (carry the
    (key, value) champion through partials), so the bars build
    map-side and the shuffle moves ≤ |hours| rows. The composite
    champion key is variable-width, which demotes Spark's hash
    aggregate to a SortAggregate pair (hash-agg buffers must be
    fixed-width) — a per-partition sort on the coarse hour key,
    accepted as the price of tie-determinism; the shuffle volume is
    unchanged. Still strictly better at any scale than the
    window-function formulation
    (first_value/last_value over hour partitions), which shuffles
    every event row. Champions are keyed on a FIXED-WIDTH composite
    string (microsecond timestamp ‖ zero-padded event_id), whose
    lexicographic order is chronological-then-id on both engines —
    DuckDB's arg_min/arg_max won't take a struct key — so two events
    sharing a timestamp still pick the same open/close regardless of
    fixture data or partial-agg merge order (a bare ts key is
    nondeterministic under ties)."""
    ev = load_table(spark, "events", sf_dir)
    champ_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"))
    return (
        ev.groupBy(F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00"
        ).alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min_by("value", champ_key), 4).alias("open_value"),
            F.round(F.max("value"), 4).alias("high_value"),
            F.round(F.min("value"), 4).alias("low_value"),
            F.round(F.max_by("value", champ_key), 4).alias("close_value"),
        )
        .orderBy("hour")
    )


DATE_PROBE_ANCHOR = "1995-06-15"  # pinned literal for difference functions


@query(
    "date_functions_probe",
    oracle=f"""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders)
    SELECT CAST(year(od) AS INT)                       AS y,
           CAST(quarter(od) AS INT)                    AS q,
           CAST(month(od) AS INT)                      AS m,
           CAST(dayofweek(od) + 1 AS INT)              AS dow,
           CAST(weekofyear(od) AS INT)                 AS woy,
           STRFTIME(last_day(od), '%Y-%m-%d')          AS month_end,
           STRFTIME(od + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
           CAST(datediff('day', DATE '{DATE_PROBE_ANCHOR}', od) AS INT)
                                                       AS days_from_anchor,
           CAST(COUNT(*) AS BIGINT)                    AS n
    FROM d
    GROUP BY y, q, m, dow, woy, month_end, plus_month, days_from_anchor
    ORDER BY days_from_anchor, dow
    """,
)
def date_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.9 date/time scalar surface exercised per-value and
    cross-checked (SURVEY.md §2.9: the reference uses DATE_TRUNC/
    DATE()/NOW()/interval arithmetic; this probes the wider calendar
    family an analytics surface needs): year/quarter/month,
    day-of-week, ISO week-of-year, month-end, calendar-aware
    add_months (month-end clamping included — Jan 31 + 1 month =
    Feb 29 in a leap year), and day difference from a pinned anchor.

    Engine-semantics notes the oracle encodes: DuckDB's dayofweek is
    0=Sunday vs Spark's 1=Sunday (+1 aligns them); weekofyear is ISO
    in both; date outputs travel as strings (the driver-canonicalize
    rule). Grouping by every derived value turns each distinct
    order date into one probe row — any single-function divergence
    on any date in the data breaks the hash."""
    o = load_table(spark, "orders", sf_dir)
    od = F.to_date("o_orderdate")
    return (
        o.select(
            F.year(od).alias("y"),
            F.quarter(od).alias("q"),
            F.month(od).alias("m"),
            F.dayofweek(od).alias("dow"),
            F.weekofyear(od).alias("woy"),
            F.date_format(F.last_day(od), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months(od, 1), "yyyy-MM-dd")
            .alias("plus_month"),
            F.datediff(od, F.lit(DATE_PROBE_ANCHOR).cast("date"))
            .alias("days_from_anchor"),
        )
        .groupBy("y", "q", "m", "dow", "woy", "month_end", "plus_month",
                 "days_from_anchor")
        .agg(F.count("*").alias("n"))
        .orderBy("days_from_anchor", "dow")
    )


@query(
    "rolling_median_daily_value",
    oracle="""
    WITH daily AS (
        SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT day,
           cents / 100.0 AS total,
           CAST(quantile_cont(cents, 0.5) OVER (
               ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) * 2 AS BIGINT) / 200.0 AS rolling_median_7d
    FROM daily ORDER BY day
    """,
)
def rolling_median_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing MEDIAN of daily value totals — the robust twin
    of revenue_7d_moving_avg (a mean-based trend follows one spiked
    day; the median ignores it — the anomaly-resistant dashboard
    line). Daily mass carried as integer cents (the gap-fill/
    histogram lesson: order-free partials, identical on both
    engines); the exact percentile runs as a WINDOW aggregate over
    the day-cardinality series, so the 7-row sort buffer per frame
    is trivial at any scale — the fact table is reduced to |days|
    rows before any window work. Spark percentile and DuckDB
    quantile_cont share linear interpolation (the
    order_price_quantiles precedent). The median renders on the
    exact HALF-CENT grid (x2 -> integer -> /200): the warm-up
    frames are even-sized, their interpolated midpoint is a
    half-cent, and ROUND(x.xx5, 2) half-ulp-flipped between engines
    at sf0.1 (caught by the r6 full-sf0.1 sweep; doubling first
    makes every value an exact integer before any rounding)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    daily = (
        ev.groupBy(F.date_format(F.date_trunc("day", F.col("ts")),
                                 "yyyy-MM-dd").alias("day"))
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return (
        daily.select(
            "day",
            (F.col("cents") / 100.0).alias("total"),
            ((F.expr("percentile(cents, 0.5)").over(w) * 2)
             .cast("long") / 200.0).alias("rolling_median_7d"),
        )
        .orderBy("day")
    )


SPINE_START, SPINE_END = "2024-01-01", "2024-01-30"


@query(
    "recursive_calendar_spine",
    oracle=f"""
    WITH RECURSIVE spine(d) AS (
        SELECT DATE '{SPINE_START}'
        UNION ALL
        SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM spine
        WHERE d < DATE '{SPINE_END}'
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    )
    SELECT STRFTIME(s.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily ON s.d = daily.d
    ORDER BY day
    """,
)
def recursive_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL front door (Spark 4's
    WITH RECURSIVE, new engine surface): generate the calendar spine
    by bounded recursion and left-join daily event counts — the
    gap-fill spine built the way a SQL-first user writes it
    (`hourly_gap_fill` is the sequence()/explode DataFrame twin; same
    zero-filled semantics).

    Notes the probe pins: Spark recursion currently supports
    UNION ALL only (UNION-distinct — and with it cyclic transitive
    closure — raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE; the
    engine's cyclic-graph answer stays the iterative
    operators/dedup.connected_components, which also beats row-level
    closure asymptotically). Recursion here is acyclic and bounded
    (30 steps); each step is one tiny self-union, and the spine is
    |days| rows joined against a day-cardinality aggregate — scale
    cost is the daily rollup, not the recursion."""
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(f"""
        WITH RECURSIVE spine(d) AS (
            SELECT DATE '{SPINE_START}'
            UNION ALL
            SELECT date_add(d, 1) FROM spine WHERE d < DATE '{SPINE_END}'
        ),
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT date_format(s.d, 'yyyy-MM-dd') AS day,
               CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
        FROM spine s LEFT JOIN daily ON s.d = daily.d
        ORDER BY day
    """)


@query(
    "weekly_value_growth",
    oracle="""
    WITH weekly AS (
        SELECT STRFTIME(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT week_start,
           n_events,
           ROUND(cents / 100.0, 2) AS total,
           ROUND((cents - LAG(cents) OVER (ORDER BY week_start))
                 * 100.0 / LAG(cents) OVER (ORDER BY week_start), 2)
               AS pct_change
    FROM weekly ORDER BY week_start
    """,
)
def weekly_value_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth — the period-over-period comparison every
    dashboard carries (the reference's trend queries, README.md:
    413-417, at week grain with a derivative): weekly totals (integer
    cents, order-free partials), previous week via lag, percent
    change; the first week's pct_change is NULL on both engines.
    Monday-start weeks: Spark date_trunc('week') and DuckDB
    date_trunc('week') agree on ISO Monday. One data-sized weekly
    aggregate, then lag over the |weeks|-row series — the window
    never sees event rows."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    weekly = (
        ev.groupBy(F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
                   .alias("week_start"))
        .agg(F.sum(cents).alias("cents"), F.count("*").alias("n_events"))
    )
    prev = F.lag("cents").over(Window.orderBy("week_start"))
    return (
        weekly.select(
            "week_start", "n_events",
            F.round(F.col("cents") / 100.0, 2).alias("total"),
            F.round((F.col("cents") - prev) * 100.0 / prev, 2)
            .alias("pct_change"),
        )
        .orderBy("week_start")
    )


@query(
    "range_frame_probe",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               event_id
        FROM events
    ),
    w AS (
        SELECT event_type, event_id, cents,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY cents
                                RANGE BETWEEN 1000 PRECEDING
                                          AND CURRENT ROW) AS near_sum,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY cents
                              RANGE BETWEEN 1000 PRECEDING
                                        AND 1000 FOLLOWING) AS near_n
        FROM v
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                       AS n,
           CAST(SUM(near_sum) % 1000000007 AS BIGINT)     AS sum_checksum,
           CAST(SUM(near_n) AS BIGINT)                    AS neighbor_rows,
           CAST(MAX(near_n) AS BIGINT)                    AS max_neighbors
    FROM w GROUP BY event_type ORDER BY event_type
    """,
)
def range_frame_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window semantics pinned per value: unlike ROWS
    frames (physical offsets — the sessionize/moving-average family),
    RANGE frames bound the window by the ORDER-BY VALUE, so tied
    values share one frame and the bounds are data magnitudes. Every
    row computes a trailing value-window sum and a centered
    value-window count over integer cents (exact — no float
    re-association anywhere), checksummed per event type so both
    engines must agree on every row's frame membership, including the
    tie-expansion rule.

    Plan: one shuffle on the partition key serves both frames; RANGE
    evaluation is a running two-pointer over the sorted partition —
    same cost class as ROWS at any scale."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    v = ev.select(
        "event_type", "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    trailing = (
        Window.partitionBy("event_type").orderBy("cents")
        .rangeBetween(-1000, Window.currentRow)
    )
    centered = (
        Window.partitionBy("event_type").orderBy("cents")
        .rangeBetween(-1000, 1000)
    )
    w = v.select(
        "event_type",
        F.sum("cents").over(trailing).alias("near_sum"),
        F.count("*").over(centered).alias("near_n"),
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum("near_sum") % 1000000007).cast("long")
            .alias("sum_checksum"),
            F.sum("near_n").alias("neighbor_rows"),
            F.max("near_n").alias("max_neighbors"),
        )
        .orderBy("event_type")
    )


@query(
    "multi_touch_attribution",
    oracle="""
    WITH t AS (
        SELECT p.event_id AS pid, p.ts AS pts,
               v.event_type AS touch_type, v.ts AS vts,
               v.event_id AS vid
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events
              WHERE event_type IN ('view', 'click')) v
          ON p.user_id = v.user_id
         AND v.ts >= p.ts - INTERVAL 24 HOUR
         AND v.ts <  p.ts
    ), r AS (
        SELECT pid, pts, touch_type,
               ROW_NUMBER() OVER (PARTITION BY pid
                                  ORDER BY vts, vid) AS rk,
               COUNT(*)    OVER (PARTITION BY pid)   AS n
        FROM t
    )
    SELECT STRFTIME(CAST(pts AS DATE), '%Y-%m-%d') AS day,
           touch_type,
           SUM(CASE WHEN n = 1 THEN 1000000
                    WHEN n = 2 THEN 500000
                    WHEN rk = 1 OR rk = n THEN 400000
                    ELSE CAST(FLOOR(200000.0 / (n - 2) + 0.5) AS BIGINT)
               END) / 1000000.0 AS credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM r
    GROUP BY day, touch_type
    ORDER BY day, touch_type
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    purchase distributes 1.0 of credit over the same user's
    view/click touchpoints in the preceding 24 h — 40% to the first
    touch, 40% to the last, the middle 20% split evenly
    (degenerating to 1.0 / 0.5+0.5 for 1- and 2-touch paths), summed
    per purchase day and touch channel. The ad-tech workhorse the
    funnel family lacked: conversion_funnel counts paths,
    purchase_attribution_asof picks ONE touch (last-touch); this is
    the fractional-credit generalization.

    Plan: the 24 h lookback reuses range_join_binned (equi-join on
    (user, day-bin), exact interval predicate inside the hash join —
    never a nested loop); position and path length come from one
    window pass over the matches partitioned by purchase (rank and
    count share the (pid, ts, id) sort); credit is a pure CASE
    expression in exact integer micro-credit units, so the final
    re-associated sum is association-free on both engines. Touch ties on
    identical timestamps break on event_id — deterministic at any
    parallelism."""
    from flight_data_pipeline_spark.operators.relational import (
        range_join_binned,
    )
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"))
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("vid"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("vts"))
    j = range_join_binned(
        purchases, touches, key_cols=["user_id"],
        left_ts="pts", right_ts="vts",
        lower_sec=-86400, upper_sec=0, bin_sec=86400, how="inner",
    )
    w = Window.partitionBy("pid")
    rk = F.row_number().over(w.orderBy("vts", "vid"))
    n = F.count("*").over(w)
    r = j.select(
        "pid", "pts", "touch_type",
        rk.alias("rk"), n.alias("n"),
    )
    # credit in exact integer micro-units (1.0 == 1_000_000): the only
    # non-terminating split (0.2/(n-2)) is floored to a micro-credit
    # identically on both engines, so the final re-associated sum is an
    # integer — association-free, no ROUND needed
    credit_e6 = (
        F.when(F.col("n") == 1, F.lit(1_000_000))
        .when(F.col("n") == 2, F.lit(500_000))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")),
              F.lit(400_000))
        .otherwise(F.floor(F.lit(200000.0) / (F.col("n") - 2) + 0.5)
                   .cast("long"))
    )
    return (
        r.groupBy(
            F.date_format(F.col("pts").cast("date"), "yyyy-MM-dd")
            .alias("day"),
            "touch_type",
        )
        .agg(
            (F.sum(credit_e6) / 1000000.0).alias("credit"),
            F.count("*").alias("n_touches"),
        )
        .orderBy("day", "touch_type")
    )


@query(
    "event_pattern_match",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(s) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(s, 'vc')) AS INT) AS n_view_click,
           CAST(CASE WHEN regexp_matches(s, 'v[^p]*p')
                     THEN 1 ELSE 0 END AS INT) AS converted,
           CAST(COALESCE(list_max(list_transform(
                regexp_extract_all(s, 'v+'), x -> len(x))), 0) AS INT)
               AS longest_view_run
    FROM seq ORDER BY user_id
    """,
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching, Spark-first:
    each user's event history collapses to ONE symbol string (initial
    per event, (ts, event_id)-ordered inside a sort_array — no window
    needed), and row-pattern questions become regexes over it:
    adjacency counts ('vc'), eventually-followed-by conversion
    ('v[^p]*p' — a view later converts with no purchase in between),
    longest unbroken run ('v+' max match length). The classic funnel
    queries special-case what this generalizes: ANY regex over the
    event alphabet without new shuffles — one groupBy, then pure
    string expressions.

    Scale: the symbol string is ~1 byte/event — a 10^5-event user is
    a 100 KB value, fine for a row; beyond that, sessionize first and
    pattern-match per session. Ordering inside the collected array is
    total ((ts, event_id) in the struct prefix), so the string is
    deterministic at any parallelism."""
    ev = load_table(spark, "events", sf_dir)
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        "ts", "event_id",
                        F.substring("event_type", 1, 1).alias("c")))),
                    lambda x: x["c"],
                )).alias("s"))
    )
    runs = F.transform(
        F.regexp_extract_all("s", F.lit("(v+)"), 1), F.length)
    return (
        seq.select(
            "user_id",
            F.length("s").alias("seq_len"),
            F.regexp_count("s", F.lit("vc")).alias("n_view_click"),
            F.col("s").rlike("v[^p]*p").cast("int").alias("converted"),
            F.coalesce(F.array_max(runs), F.lit(0))
            .alias("longest_view_run"),
        )
        .orderBy("user_id")
    )


@query(
    "point_in_time_state_join",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT *, SUM(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS run
        FROM flagged
    ), per_run AS (
        SELECT user_id, run, event_type AS state, MIN(ts) AS vf
        FROM runs GROUP BY user_id, run, event_type
    ), p AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'
    ), cand AS (
        SELECT p.event_id, r.state,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY r.vf DESC, r.state DESC) AS rn
        FROM p JOIN per_run r
          ON p.user_id = r.user_id AND r.vf < p.ts
    ), latest AS (
        SELECT event_id, state FROM cand WHERE rn = 1
    )
    SELECT COALESCE(l.state, '(new)') AS prior_state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
    FROM p LEFT JOIN latest l USING (event_id)
    GROUP BY prior_state
    ORDER BY prior_state
    """,
)
def point_in_time_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension join — the feature-leakage
    rule every training-data pipeline must obey: each purchase is
    enriched with the user's SCD2 state interval that was valid
    STRICTLY BEFORE the purchase instant (never the interval the
    purchase itself opened — joining state at ts >= own-event time is
    exactly how label leakage enters offline feature sets). Purchases
    with no prior history surface as '(new)'.

    Plan: the SCD2 history build (operators.temporal.scd2_history —
    one user_id shuffle, no self-join) feeds interval STARTS into
    operators.relational.asof_join with strict=True — the union +
    last(ignorenulls) window zip, one more (user, ts) sort, never an
    interval-containment nested loop. Equal-start ties (two runs
    opening on the same timestamp) break on max state, mirrored in
    the oracle's explicit rn window because native ASOF leaves ties
    undefined."""
    from flight_data_pipeline_spark.operators.temporal import scd2_history

    ev = load_table(spark, "events", sf_dir)
    hist = scd2_history(ev, "user_id", "ts", "event_type",
                        tiebreak_col="event_id")
    runs = hist.select("user_id", F.col("valid_from").alias("ts"), "state")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts")
    joined = asof_join(purchases, runs, on="ts", by="user_id",
                       right_cols=["state"], suffix="", strict=True)
    return (
        joined.groupBy(
            F.coalesce(F.col("state"), F.lit("(new)")).alias("prior_state"))
        .agg(F.count("*").alias("n_purchases"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy("prior_state")
    )


# Seasonal-naive backtest: the 1-week seasonality lag.
SEASONAL_LAG_DAYS = 7


@query(
    "seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_trunc('day', ts) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, day
    ),
    scored AS (
        SELECT a.event_type,
               a.cents       AS actual_c,
               f.cents       AS forecast_c
        FROM daily a
        JOIN daily f ON a.event_type = f.event_type
                    AND f.day + INTERVAL {SEASONAL_LAG_DAYS} DAY = a.day
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                      AS n_days_scored,
           CAST(SUM(ABS(actual_c - forecast_c)) AS BIGINT)
               AS total_abs_err_cents,
           ((2 * SUM(ABS(actual_c - forecast_c)) + COUNT(*))
            // (2 * COUNT(*))) / 100.0                   AS mae_value,
           CAST(SUM(actual_c - forecast_c) AS BIGINT)    AS bias_cents
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's value mass
    per event type as the SAME WEEKDAY one week earlier and score the
    prediction where both days exist — the baseline every forecasting
    model must beat, and the backtest harness shape (join actuals to
    lagged actuals, aggregate the error) that scores real models the
    same way at scale.

    The 7-day shift is an explicit self-JOIN on ``day − 7`` rather
    than ``LAG(7)`` over day-ordered rows: LAG counts ROWS, so one
    missing calendar day silently misaligns every later forecast —
    the join keys on the calendar itself. Errors ride as exact
    integer cents (|a−f| of two integer sums), MAE renders half-up on
    the integer grid, and the signed bias column exposes systematic
    over/under-forecast. Plan: one map-side-combined daily aggregate
    (events scanned once), then a day-keyed self-join of
    summary-sized frames and a per-type fold."""
    ev = load_table(spark, "events", sf_dir).where(
        F.col("value").isNotNull())
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(to_units(F.col("value"), 2)).alias("cents"))
    )
    fc = daily.select(
        "event_type",
        (F.col("day") + F.expr(f"INTERVAL {SEASONAL_LAG_DAYS} DAY"))
        .alias("day"),
        F.col("cents").alias("forecast_c"),
    )
    scored = daily.withColumnRenamed("cents", "actual_c").join(
        fc, ["event_type", "day"])
    err = F.abs(F.col("actual_c") - F.col("forecast_c"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.sum(err).alias("total_abs_err_cents"),
            (F.expr("(2 * sum(abs(actual_c - forecast_c)) + count(*)) "
                    "div (2 * count(*))") / 100.0).alias("mae_value"),
            F.sum(F.col("actual_c") - F.col("forecast_c"))
            .alias("bias_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "ewma_control_chart",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, day
    ),
    idx AS (
        SELECT event_type, day, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS i
        FROM daily
    ),
    scaled AS (
        SELECT event_type, day, c, i,
               SUM(CASE WHEN i = 1 THEN c
                        ELSE c * (1::BIGINT << (i - 2)) END)
                   OVER (PARTITION BY event_type ORDER BY i
                         ROWS UNBOUNDED PRECEDING) AS s
        FROM idx
    ),
    flagged AS (
        SELECT event_type, day, c, i, s,
               LAG(s) OVER (PARTITION BY event_type ORDER BY i)
                   AS s_prev
        FROM scaled
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN i > 1 AND
                    5 * ABS(c * (1::BIGINT << (i - 2)) - s_prev)
                        > s_prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_control,
           ROUND(MAX(CASE WHEN i = (SELECT MAX(i) FROM flagged f2
                                    WHERE f2.event_type = flagged.event_type)
                          THEN s / POWER(2.0, i - 1) END) / 100.0, 4)
               AS ewma_final
    FROM flagged
    GROUP BY event_type ORDER BY event_type
    """,
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over the daily value series, EXACT across
    engines — the batch twin of the streaming ``ewma_fold`` state
    operator, and a worked answer to "recursive smoothing can't be
    hash-checked": with α = 1/2 the recursion
    ``e_i = (c_i + e_{i-1})/2`` scales to pure integers,
    ``S_i = e_i·2^{i-1} = S_{i-1} + c_i·2^{i-2}`` — a plain window
    cumsum of shift-weighted cents — and the control test
    ``|c_i − e_{i-1}| > 20%·e_{i-1}`` becomes the integer comparison
    ``5·|c_i·2^{i-2} − S_{i-1}| > S_{i-1}``. The only float is the
    final display: BIGINT→DOUBLE conversion (correctly rounded,
    engine-identical — above 2^53 it may drop low bits but both
    engines drop the SAME bits) then an exact power-of-two division.
    Overflow headroom: 31 days ⇒ S < 2^30·daily-cents ≪ 2^63 even
    at sf1.

    Out-of-control days compare each observation against the PRIOR
    day's smoothed level (the standard chart direction — the point
    must not influence the limit it is tested against). Plan: one
    daily aggregate, one window sort per type reused by
    row_number/cumsum/lag, a 5-row output."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(
        F.col("value").isNotNull())
    daily = (
        ev.groupBy("event_type",
                   F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(to_units(F.col("value"), 2)).alias("c"))
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(wo))
    wi = Window.partitionBy("event_type").orderBy("i")
    scaled = idx.withColumn(
        "s",
        F.sum(F.expr("IF(i = 1, c, c * shiftleft(1L, i - 2))"))
        .over(wi.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)))
    flagged = scaled.withColumn("s_prev", F.lag("s").over(wi))
    out_of_control = F.expr(
        "IF(i > 1 AND 5 * abs(c * shiftleft(1L, i - 2) - s_prev)"
        " > s_prev, 1, 0)")
    wlast = Window.partitionBy("event_type")
    last_ewma = F.when(
        F.col("i") == F.max("i").over(wlast),
        F.col("s") / F.pow(F.lit(2.0), F.col("i") - 1))
    return (
        flagged.withColumn("__last", last_ewma)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(out_of_control).alias("n_out_of_control"),
            F.round(F.max("__last") / 100.0, 4).alias("ewma_final"),
        )
        .orderBy("event_type")
    )


@query(
    "hourly_linear_interpolation",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS c
        FROM events
        WHERE event_type = 'purchase' AND value > {GAPFILL_MIN_VALUE}
        GROUP BY hour
    ),
    joined AS (
        SELECT s.hour, a.c,
               SUM(CASE WHEN a.c IS NOT NULL THEN 1 ELSE 0 END)
                   OVER (ORDER BY s.hour
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM spine s LEFT JOIN agg a ON s.hour = a.hour
    ),
    walls AS (
        SELECT hour, c, grp,
               MAX(c) OVER (PARTITION BY grp) AS prev_c,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hour) - 1
                   AS k,
               COUNT(*) OVER (PARTITION BY grp) AS gap1
        FROM joined
    ),
    nexts AS (
        SELECT hour, c, prev_c, k, gap1,
               MAX(next_anchor) OVER (ORDER BY hour DESC
                                      ROWS UNBOUNDED PRECEDING)
                   AS next_c
        FROM (SELECT *,
                     CASE WHEN c IS NOT NULL THEN c END AS next_anchor
              FROM walls)
    )
    SELECT STRFTIME(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           c IS NOT NULL AS observed,
           CASE
             WHEN c IS NOT NULL THEN c
             WHEN prev_c IS NULL THEN next_c
             WHEN next_c IS NULL THEN prev_c
             ELSE (2 * (prev_c * (gap1 - k) + next_c * k) + gap1)
                  // (2 * gap1)
           END AS value_cents
    FROM nexts ORDER BY hour
    """,
)
def hourly_linear_interpolation(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Linear-interpolation gap fill — the complement of
    hourly_gap_fill's forward fill: a missing hour takes the value on
    the straight line between its two surrounding observations
    (edges clamp to the nearest anchor), which is what
    sensor/financial resampling wants when the series is a LEVEL,
    not a flow. Exact across engines: anchors are integer cent sums,
    and the interpolation ``prev + (next−prev)·k/gap`` renders
    half-up as one integer division (k = offset in the gap, counted
    by a run-id window; gap = the run's length to the next anchor).

    Plan: the dense spine left-joins the sparse series (the
    hourly_gap_fill shape), then THREE window passes over the
    spine-sized frame — run-id cumsum, per-run offset/anchor, and a
    reversed running MAX for the next anchor — no self-join, no
    explode; spine length bounds every intermediate."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    agg = (
        ev.where((F.col("event_type") == "purchase")
                 & (F.col("value") > GAPFILL_MIN_VALUE))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.sum(to_units(F.col("value"), 2)).alias("c"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(
            F.col("lo"), F.col("hi"),
            F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    joined = spine.join(agg, "hour", "left")
    wfwd = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wbwd = Window.orderBy(F.desc("hour")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    withgrp = joined.withColumn(
        "grp", F.sum(F.when(F.col("c").isNotNull(), 1).otherwise(0))
        .over(wfwd))
    wgrp = Window.partitionBy("grp")
    wgrpo = Window.partitionBy("grp").orderBy("hour")
    walls = (
        withgrp
        .withColumn("prev_c", F.max("c").over(wgrp))
        .withColumn("k", F.row_number().over(wgrpo) - 1)
        .withColumn("gap1", F.count("*").over(wgrp))
        .withColumn("next_c",
                    F.max(F.when(F.col("c").isNotNull(), F.col("c")))
                    .over(wbwd))
    )
    interp = F.expr(
        "CASE WHEN c IS NOT NULL THEN c "
        "WHEN prev_c IS NULL THEN next_c "
        "WHEN next_c IS NULL THEN prev_c "
        "ELSE (2 * (prev_c * (gap1 - k) + next_c * k) + gap1) "
        "div (2 * gap1) END")
    return (
        walls.select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("c").isNotNull().alias("observed"),
            interp.alias("value_cents"),
        )
        .orderBy("hour")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST((n * 1000) // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_permille
    FROM pairs ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the user journey —
    the user-flow staple between the funnel (fixed path) and
    MATCH_RECOGNIZE (regex paths): every within-user adjacent event
    pair counted into a from×to matrix with row-normalized
    probabilities in integer permille. Ties on the timestamp break
    on event_id (the driver-determinism rule), so the pair stream —
    and therefore the matrix — is engine-identical.

    Plan: one per-user window sort (shared with the sessionize
    family), one |types|² aggregate, and a window over the 25-row
    matrix for row totals — the shuffle carries the matrix, not the
    events. At 100 TB the same plan yields per-cohort matrices by
    adding the cohort key to both the partition and the group."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"),
                 F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return (
        pairs.withColumn("__total", F.sum("n").over(wrow))
        .select(
            "from_type", "to_type", "n",
            F.expr("(n * 1000) div __total").alias("p_permille"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "points_balance_floor_zero",
    oracle="""
    WITH ledger AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN -CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 10
               END AS delta_c
        FROM events WHERE value IS NOT NULL
    ),
    prefix AS (
        SELECT user_id, ts, event_id, delta_c,
               SUM(delta_c) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS p
        FROM ledger
    ),
    pre AS (
        SELECT user_id, delta_c, p,
               MIN(p) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_min
        FROM prefix
    ),
    bal AS (
        SELECT user_id, delta_c,
               p - LEAST(run_min, 0) AS s
        FROM pre
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)  AS n_entries,
           CAST(SUM(CASE WHEN delta_c > 0 THEN delta_c ELSE 0 END)
                AS BIGINT)           AS earned_c,
           CAST(SUM(CASE WHEN delta_c < 0 THEN -delta_c ELSE 0 END)
                AS BIGINT)           AS attempted_spend_c,
           CAST(MAX(s) AS BIGINT)    AS peak_balance_c
    FROM bal GROUP BY user_id
    ORDER BY user_id LIMIT 20
    """,
)
def points_balance_floor_zero(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Floor-at-zero running balance — the Lindley recursion
    ``s_i = max(0, s_{i-1} + x_i)`` that models any clamped
    accumulator (loyalty points where overspend forfeits, inventory
    that can't go negative, battery charge), which LOOKS like it
    needs per-row iteration but has the exact closed form
    ``s_i = P_i − min(0, min_{k≤i} P_k)`` over plain prefix sums —
    two stacked window passes on one sort, fully parallel, no
    recursion. Deltas: non-purchase events earn value/10 in cents,
    purchases attempt to spend their value; everything integer so
    the clamp comparison is exact.

    Per-user summary (first 20 users): entries, earned, attempted
    spend, and the peak clamped balance. The recursion-free identity
    is the point — the same trick that turns "capped cumulative
    sums" from an iterative UDF into codegen'd windows at 100 TB."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(
        F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    ledger = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "purchase", -cents)
        .otherwise(F.expr(
            "cast(floor(value * 100 + 0.5) as bigint) div 10"))
        .alias("delta_c"),
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = ledger.withColumn("p", F.sum("delta_c").over(w)).withColumn(
        "run_min", F.min("p").over(w))
    bal = pre.withColumn(
        "s", F.col("p") - F.least(F.col("run_min"), F.lit(0)))
    return (
        bal.groupBy("user_id")
        .agg(
            F.count("*").alias("n_entries"),
            F.sum(F.when(F.col("delta_c") > 0, F.col("delta_c"))
                  .otherwise(0)).alias("earned_c"),
            F.sum(F.when(F.col("delta_c") < 0, -F.col("delta_c"))
                  .otherwise(0)).alias("attempted_spend_c"),
            F.max("s").alias("peak_balance_c"),
        )
        .orderBy("user_id")
        .limit(20)
    )


# --- interval concurrency (sweep line) ---------------------------------------
@query(
    "max_concurrent_sessions",
    oracle="""
    WITH iv AS (
        SELECT event_id, event_type,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   + 60 + (CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % 3540)
                   AS e
        FROM events WHERE value IS NOT NULL
    ),
    pts AS (
        SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta, event_id FROM iv
    ),
    swept AS (
        SELECT event_type, t,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta, event_id
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM pts
    ),
    peaks AS (
        SELECT event_type, t, conc,
               MAX(conc) OVER (PARTITION BY event_type) AS peak
        FROM swept
    )
    SELECT event_type,
           CAST(MAX(peak) AS BIGINT)                 AS peak_concurrency,
           CAST(MIN(CASE WHEN conc = peak THEN t END) AS BIGINT)
                                                     AS first_peak_epoch_s
    FROM peaks
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency — the classic "max simultaneous
    sessions" problem, solved without any interval self-join: each
    event opens a synthetic session of 60 s + (value-cents mod 3540)
    (deterministic 1-60 min duration), every interval contributes a
    (+1, start) and a (-1, end) point, and one windowed running sum
    over (t, delta, event_id) IS the concurrency curve. Ends sort
    before starts at the same second (delta -1 < +1), so touching
    intervals never overlap — the standard half-open [s, e) rule.

    A naive interval-overlap self-join is O(n·k) pairs and quadratic
    on hot spots; the sweep line is one shuffle (the window sort) and
    stays linear at 100 TB — per event_type partitions bound the sort
    width. All arithmetic on BIGINT epoch seconds for hash parity.
    Output: per event type, the peak concurrency and the first time
    it is reached."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    es = to_epoch_seconds(F.col("ts"))
    iv = ev.select(
        "event_id", "event_type", es.alias("s"),
        (es + F.lit(60) + to_units(F.col("value"), 2) % F.lit(3540)).alias("e"),
    )
    pts = (
        iv.select("event_type", F.col("s").alias("t"),
                  F.lit(1).alias("delta"), "event_id")
        .unionByName(
            iv.select("event_type", F.col("e").alias("t"),
                      F.lit(-1).alias("delta"), "event_id"))
    )
    w = (Window.partitionBy("event_type").orderBy("t", "delta", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    swept = pts.withColumn("conc", F.sum("delta").over(w))
    peaks = swept.withColumn(
        "peak", F.max("conc").over(Window.partitionBy("event_type")))
    return (
        peaks.groupBy("event_type")
        .agg(
            F.max("peak").cast("long").alias("peak_concurrency"),
            F.min(F.when(F.col("conc") == F.col("peak"), F.col("t")))
            .cast("long").alias("first_peak_epoch_s"),
        )
        .orderBy("event_type")
    )


# --- integer-exact per-group feature scaling ---------------------------------
@query(
    "group_feature_scaling",
    oracle="""
    WITH c AS (
        SELECT event_type, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
    ),
    stats AS (
        SELECT event_type,
               COUNT(*)       AS n,
               SUM(c)         AS s,
               SUM(c * c)     AS q,
               MIN(c)         AS lo,
               MAX(c)         AS hi
        FROM c GROUP BY event_type
    ),
    scored AS (
        SELECT c.event_type, c.event_id, stats.n,
               (stats.n * c.c - stats.s)
                   / NULLIF(SQRT(CAST(stats.n * stats.q
                                      - stats.s * stats.s
                                      AS DOUBLE)), 0) AS z,
               (c.c - stats.lo) * 1.0
                   / NULLIF(stats.hi - stats.lo, 0)   AS mm
        FROM c JOIN stats USING (event_type)
    ),
    ranked AS (
        SELECT event_type, event_id, n,
               ROUND(z, 6) AS z6, ROUND(mm, 6) AS minmax6,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ROUND(ABS(z), 6) DESC, event_id)
                   AS rk
        FROM scored
    )
    SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id,
           CAST(n AS BIGINT) AS n, z6, minmax6
    FROM ranked WHERE rk <= 3
    ORDER BY event_type, rk
    """,
)
def group_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling (z-score + min-max) with the integer
    fixed-point discipline that makes the floats ENGINE-IDENTICAL:
    moments ride as exact BIGINT sums (n, Σc, Σc², min, max over
    value-cents), and z = (n·c − Σc)/sqrt(n·Σc² − (Σc)²) — an
    algebraic rearrangement whose numerator/denominator are exact
    integers, so the one division and sqrt are IEEE correctly-rounded
    on both engines (SUM(double) re-association, the usual parity
    killer, never happens). Top-3 |z| outliers per event type,
    round-then-rank with event_id tie-break.

    Plan shape: one partial-agg shuffle for the moments, a broadcast
    join of the 5-row stats frame back onto events, one window for
    the top-3 cut. At 100 TB the stats frame is still 5 rows — the
    scaling pass is map-side."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    c = ev.select("event_type", "event_id",
                  to_units(F.col("value"), 2).alias("c"))
    stats = c.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
        F.min("c").alias("lo"), F.max("c").alias("hi"),
    )
    scored = (
        c.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "event_id", "n",
            ((F.col("n") * F.col("c") - F.col("s"))
             / F.nullif(
                 F.sqrt((F.col("n") * F.col("q")
                         - F.col("s") * F.col("s")).cast("double")),
                 F.lit(0.0))).alias("z"),
            ((F.col("c") - F.col("lo")) * F.lit(1.0)
             / F.nullif((F.col("hi") - F.col("lo")).cast("double"),
                        F.lit(0.0))).alias("mm"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.round(F.abs(F.col("z")), 6).desc(), "event_id")
    return (
        scored.select(
            "event_type", "event_id", "n",
            F.round("z", 6).alias("z6"), F.round("mm", 6).alias("minmax6"),
            F.row_number().over(wr).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", "n", "z6", "minmax6")
        .orderBy("event_type", "rk")
    )


# --- closed-form per-group OLS trend -----------------------------------------
@query(
    "group_ols_trend",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS x,
               CAST(FLOOR(value + 0.5) AS BIGINT)        AS yd
        FROM events WHERE value IS NOT NULL
    ),
    daily AS (
        SELECT event_type, x, SUM(yd) AS y
        FROM d GROUP BY event_type, x
    ),
    m AS (
        SELECT event_type,
               COUNT(*)   AS n,
               SUM(x)     AS sx,
               SUM(y)     AS sy,
               SUM(x * y) AS sxy,
               SUM(x * x) AS sxx,
               SUM(y * y) AS syy
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0), 6)
               AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE), 0), 6)
               AS r_squared
    FROM m ORDER BY event_type
    """,
)
def group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope / intercept / R²)
    of daily event value against time, via the closed form over EXACT
    integer moments — the same discipline as group_feature_scaling:
    n, Σx, Σy, Σxy, Σx², Σy² all ride as BIGINT sums (x = epoch day
    ~2×10⁴, y = whole-dollar daily totals), so

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    divides two exactly-representable doubles — IEEE correctly
    rounded, bit-identical on both engines; SUM(double)
    re-association, the cross-engine parity killer, never occurs.
    R² = cov²/(varₓ·var_y) from the same six moments. Overflow head-
    room: Σy² caps at ~3×10¹⁵ here (whole dollars, ~30 days); at
    larger spans, center x at the group's min day and y in coarser
    units — the moments stay exact BIGINTs.

    This is regression-as-aggregation: one partial-agg shuffle to
    daily grain, one 5-row moment aggregate, zero iterations — how a
    trend fit over 100 TB of telemetry actually runs (REGR_SLOPE's
    float path can't hash-match; this can)."""
    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    d = ev.select(
        "event_type",
        to_epoch_seconds(F.col("ts")).alias("es"),
        to_units(F.col("value"), 0).alias("yd"),
    ).select("event_type", F.expr("es div 86400").alias("x"), "yd")
    daily = d.groupBy("event_type", "x").agg(F.sum("yd").alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        F.lit(0.0),
    )
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = cov / varx
    return (
        m.select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.round(slope, 6).alias("slope"),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double"), 6).alias("intercept"),
            F.round(cov * cov / F.nullif(varx * vary, F.lit(0.0)), 6)
            .alias("r_squared"),
        )
        .orderBy("event_type")
    )


# --- CUSUM change-point detection (integer-exact) ----------------------------
@query(
    "value_cusum_changepoint",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS x,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT)  AS c
        FROM events WHERE value IS NOT NULL
    ),
    daily AS (
        SELECT event_type, x, SUM(c) AS y
        FROM d GROUP BY event_type, x
    ),
    tot AS (
        SELECT event_type, COUNT(*) AS n, SUM(y) AS s
        FROM daily GROUP BY event_type
    ),
    cum AS (
        SELECT daily.event_type, daily.x, tot.n, tot.s,
               SUM(daily.y) OVER (PARTITION BY daily.event_type
                                  ORDER BY daily.x) AS cy,
               ROW_NUMBER() OVER (PARTITION BY daily.event_type
                                  ORDER BY daily.x) AS k
        FROM daily JOIN tot ON daily.event_type = tot.event_type
    ),
    best AS (
        SELECT *,
               ABS(n * cy - k * s) AS adev,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(n * cy - k * s) DESC, x)
                   AS rk
        FROM cum
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           STRFTIME(DATE '1970-01-01' + CAST(x AS INTEGER), '%Y-%m-%d')
               AS changepoint_day,
           CAST(adev AS BIGINT) AS max_abs_dev,
           CAST((2 * cy + k) // (2 * k) AS BIGINT) AS mean_before_c,
           CAST((2 * (s - cy) + (n - k)) // NULLIF(2 * (n - k), 0)
               AS BIGINT) AS mean_after_c
    FROM best WHERE rk = 1
    ORDER BY event_type
    """,
)
def value_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily value series of
    each event type — where did the level shift? The classic offline
    CUSUM statistic G_k = sum_{i<=k}(y_i - mean) peaks at the split
    point; multiplying through by n makes it EXACTLY integer:

        n * G_k = n * cumsum_k - k * total

    so the argmax (and the reported deviation) is a pure BIGINT
    computation — no float mean, no re-association, bit-identical on
    both engines. The before/after level estimates come out as
    half-up integer cents via the (2s+n) div (2n) pattern (the
    repo-wide float discipline; see rolling_median_daily_value).

    Plan shape: one partial-agg shuffle to daily grain (the raw scan
    never reaches the window), one per-type window cumsum over ~30
    rows per group, a 5-row argmax. At 100 TB the window input is
    |types| x |days| — thousands of rows regardless of event volume;
    change-point detection rides entirely on the pre-aggregation.
    Tie-break: earliest day at equal deviation."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    d = ev.select(
        "event_type",
        to_epoch_seconds(F.col("ts")).alias("es"),
        to_units(F.col("value"), 2).alias("c"),
    ).select("event_type", F.expr("es div 86400").alias("x"), "c")
    daily = d.groupBy("event_type", "x").agg(F.sum("c").alias("y"))
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("y").alias("s"))
    wcum = Window.partitionBy("event_type").orderBy("x")
    cum = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("cy", F.sum("y").over(wcum))
        .withColumn("k", F.row_number().over(wcum))
    )
    adev = F.abs(F.col("n") * F.col("cy") - F.col("k") * F.col("s"))
    best = cum.withColumn("adev", adev).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(adev.desc(), "x")),
    )
    return (
        best.where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.date_format(
                F.expr("date_add(DATE'1970-01-01', CAST(x AS INT))"),
                "yyyy-MM-dd").alias("changepoint_day"),
            F.col("adev").cast("long").alias("max_abs_dev"),
            F.expr("CAST((2 * cy + k) div (2 * k) AS BIGINT)")
            .alias("mean_before_c"),
            F.expr("CAST((2 * (s - cy) + (n - k))"
                   " div NULLIF(2 * (n - k), 0) AS BIGINT)")
            .alias("mean_after_c"),
        )
        .orderBy("event_type")
    )


# --- exact sliding-window distinct (explode-by-offset) -----------------------
@query(
    "sliding_7d_distinct_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS d,
               user_id
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    contrib AS (
        SELECT du.d + offs.k AS wd, du.user_id
        FROM du, (SELECT UNNEST(range(0, 7)) AS k) offs
    )
    SELECT STRFTIME(DATE '1970-01-01' + CAST(days.d AS INTEGER),
                    '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT contrib.user_id) AS BIGINT) AS n_users_7d
    FROM days JOIN contrib ON contrib.wd = days.d
    GROUP BY days.d
    ORDER BY days.d
    """,
)
def sliding_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-day sliding distinct users per day — the windowed
    companion to cumulative_unique_users_daily (unbounded) and
    rolling_distinct_users_hll (sketch tier). Distinct-over-a-sliding-
    window famously doesn't decompose (you can't subtract yesterday's
    leavers from a count), so the scalable exact formulation is
    EXPLODE-BY-OFFSET: each distinct (day, user) observation is
    replicated to the 7 window-end days it falls inside — a map-side
    constant factor of 7 — and one (window_day, user) distinct
    aggregate does the rest. No per-day self-join over raw events, no
    O(days) window scan; shuffle volume is 7 x |distinct day-user
    pairs| regardless of event volume, and the factor is the window
    length in GRAIN units (7), not in events.

    Days land as epoch-day BIGINTs and only days that actually occur
    are reported (the semi join against the day list), so the check is
    pure integer/date arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    du = (
        ev.select(
            to_epoch_seconds(F.col("ts")).alias("es"), "user_id")
        .select(F.expr("es div 86400").alias("d"), "user_id")
        .distinct()
    )
    days = du.select("d").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6)))
        .alias("wd"),
        "user_id",
    )
    return (
        contrib.join(days.withColumnRenamed("d", "wd"), "wd")
        .groupBy("wd")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users_7d"))
        .select(
            F.date_format(
                F.expr("date_add(DATE'1970-01-01', CAST(wd AS INT))"),
                "yyyy-MM-dd").alias("day"),
            "n_users_7d",
            F.col("wd").alias("__ord"),
        )
        .orderBy("__ord")
        .drop("__ord")
    )


# --- rolling correlation over exact windowed moments --------------------------
@query(
    "rolling_14d_type_correlation",
    oracle="""
    WITH d AS (
        SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day,
               event_type,
               CAST(FLOOR(value + 0.5) AS BIGINT) AS yd
        FROM events WHERE value IS NOT NULL
    ),
    spine AS (SELECT DISTINCT day FROM d),
    v AS (SELECT day, SUM(yd) AS v FROM d WHERE event_type = 'view'
          GROUP BY day),
    p AS (SELECT day, SUM(yd) AS p FROM d WHERE event_type = 'purchase'
          GROUP BY day),
    series AS (
        SELECT spine.day,
               COALESCE(v.v, 0) AS v,
               COALESCE(p.p, 0) AS p
        FROM spine LEFT JOIN v ON spine.day = v.day
                   LEFT JOIN p ON spine.day = p.day
    ),
    m AS (
        SELECT day,
               COUNT(*)   OVER w AS n,
               SUM(v)     OVER w AS sx,
               SUM(p)     OVER w AS sy,
               SUM(v * p) OVER w AS sxy,
               SUM(v * v) OVER w AS sxx,
               SUM(p * p) OVER w AS syy
        FROM series
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
                     AND CURRENT ROW)
    )
    SELECT STRFTIME(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m-%d')
               AS day,
           CAST(n AS BIGINT) AS n_days_window,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)
               AS corr6
    FROM m ORDER BY m.day
    """,
)
def rolling_14d_type_correlation(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Rolling 14-day Pearson correlation between the daily view and
    purchase value series — windowed statistics via EXACT windowed
    moments, extending group_ols_trend's closed-form discipline from
    one global fit to a sliding fit per day: the six sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy²) ride as BIGINT window sums
    over a dense day spine (missing days coalesce to 0 so the frame
    is truly 14 calendar-grain rows at steady state), and
    corr = (nΣxy − ΣxΣy) / sqrt((nΣxx − Σx²)(nΣyy − Σy²)) divides
    exactly-representable doubles — no float re-association anywhere,
    so a famously noisy statistic hash-checks. Whole-dollar units
    keep nΣxy far inside 2^63 at any per-day volume this fixture
    reaches; at bigger volumes, coarsen the unit — the moments stay
    exact. Zero-variance windows (a constant series) yield NULL via
    NULLIF, not a throw (ANSI guard).

    Plan shape: one partial-agg shuffle to (day, type) grain, two
    spine joins over day-count-sized frames, one unpartitioned window
    over |days| rows (~30 here; a production spine partitions by
    year). The raw scan never reaches the window."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    d = ev.select(
        to_epoch_seconds(F.col("ts")).alias("es"),
        "event_type",
        to_units(F.col("value"), 0).alias("yd"),
    ).select(F.expr("es div 86400").alias("day"), "event_type", "yd")
    spine = d.select("day").distinct()
    v = (d.where(F.col("event_type") == "view")
         .groupBy("day").agg(F.sum("yd").alias("v")))
    p = (d.where(F.col("event_type") == "purchase")
         .groupBy("day").agg(F.sum("yd").alias("p")))
    series = (
        spine.join(v, "day", "left").join(p, "day", "left")
        .select("day",
                F.coalesce("v", F.lit(0)).alias("v"),
                F.coalesce("p", F.lit(0)).alias("p"))
    )
    w = Window.orderBy("day").rowsBetween(-13, Window.currentRow)
    m = series.select(
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("v").over(w).alias("sx"),
        F.sum("p").over(w).alias("sy"),
        F.sum(F.col("v") * F.col("p")).over(w).alias("sxy"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("sxx"),
        F.sum(F.col("p") * F.col("p")).over(w).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        m.select(
            F.date_format(
                F.expr("date_add(DATE'1970-01-01', CAST(day AS INT))"),
                "yyyy-MM-dd").alias("day_s"),
            F.col("n").cast("long").alias("n_days_window"),
            F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("corr6"),
            F.col("day").alias("__ord"),
        )
        .orderBy("__ord")
        .select(F.col("day_s").alias("day"), "n_days_window", "corr6")
    )
