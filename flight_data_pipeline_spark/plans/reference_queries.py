"""Reference-parity analytics surface (SURVEY.md §2.4-2.6, §2.3).

The reference's query semantics live in the SQL it ships against its
Postgres sink (daily-rollup view + monitoring queries in
README.md:171-195,394-404,546-563 and docs/GITHUB_ACTIONS_SETUP.md:79-106)
plus the hour-dedup probe in etl_job.py:226-237. The fixture star schema
has no ``grid_telemetry``/``etl_runs`` tables, so each query is expressed
over ``events`` (ts ≈ run_timestamp, value ≈ execution_time_ms /
intensity, event_type ≈ status) with semantics preserved exactly.

"now" is pinned to 2024-01-31 00:00:00 UTC (just past the fixture's max
event time) — SURVEY.md §7.4 item 6: current_timestamp() is not
hash-stable across engine and oracle.

Scale notes: every query here is a single scan → partial (map-side)
aggregate → final aggregate, or a scan → window. At 100 TB the events
sink would be date-partitioned; the day filters below prune partitions,
the aggregations combine map-side, and top-k plans compile to
TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flight_data_pipeline_spark.plans.registry import query
from flight_data_pipeline_spark.tables import load_table

NOW = "2024-01-31 00:00:00"


# --- A1: daily rollup (view_daily_cleanliness, README.md:394-404) ----------
@query(
    "daily_rollup",
    oracle=f"""
    SELECT STRFTIME(ts, '%Y-%m-%d')                           AS day,
           ROUND(AVG(value), 4)                               AS avg_value,
           ROUND(AVG(CASE WHEN event_type = 'purchase'
                          THEN value END), 4)                 AS avg_purchase_value,
           COUNT(*)                                           AS n_events
    FROM events
    GROUP BY STRFTIME(ts, '%Y-%m-%d')
    ORDER BY day DESC
    """,
)
def daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily GROUP BY rollup: the reference's ``view_daily_cleanliness``
    (README.md:394-404 — DATE(timestamp), AVG(intensity), conditional
    AVG, COUNT(*), ORDER BY 1 DESC) re-expressed over events."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(
                F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 4
            ).alias("avg_purchase_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.desc("day"))
    )


# --- A2: success rate per day over trailing window (README.md:171-181) -----
@query(
    "success_rate_7d",
    oracle=f"""
    SELECT STRFTIME(ts, '%Y-%m-%d')                               AS day,
           COUNT(*)                                               AS total_runs,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS successful,
           ROUND(100.0 * SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) / COUNT(*), 2)    AS success_rate,
           ROUND(AVG(value), 4)                                   AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '{NOW}' - INTERVAL 7 DAY
    GROUP BY STRFTIME(ts, '%Y-%m-%d')
    ORDER BY day DESC
    """,
)
def success_rate_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day success rate with conditional SUM(CASE WHEN) and a 7-day
    interval filter (README.md:172-181; dup at 553-563 adds
    AVG(execution_time_ms) — included here as avg_value)."""
    from flight_data_pipeline_spark.operators.temporal import within_interval

    ev = load_table(spark, "events", sf_dir)
    successful = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    )
    return (
        ev.where(within_interval(F.col("ts"), F.lit(NOW).cast("timestamp"), days=7))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("total_runs"),
            successful.alias("successful"),
            F.round(100.0 * successful / F.count("*"), 2).alias("success_rate"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy(F.desc("day"))
    )


# --- A3: status distribution w/ scalar subquery (docs:83-89) ----------------
@query(
    "status_distribution",
    oracle="""
    SELECT event_type                                            AS status,
           COUNT(*)                                              AS n,
           ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM events), 2) AS pct
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, status
    """,
)
def status_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT per status with percentage vs a scalar subquery grand
    total (docs/GITHUB_ACTIONS_SETUP.md:83-89). DataFrame form uses an
    empty-partition window count — Catalyst plans the same single-pass
    aggregate; no driver round-trip."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.col("event_type").alias("status"))
        .agg(F.count("*").alias("n"))
        .withColumn("pct", F.round(100.0 * F.col("n") / F.sum("n").over(Window.partitionBy()), 2))
        .orderBy(F.desc("n"), "status")
    )


# --- A4: execution-time trend (docs:97-105) ---------------------------------
@query(
    "exec_time_trend",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d %H:%M:%S')  AS day,
           ROUND(AVG(value), 4)                      AS avg_value,
           ROUND(MAX(value), 4)                      AS max_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY DATE_TRUNC('day', ts)
    ORDER BY day DESC
    """,
)
def exec_time_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC('day') AVG/MAX trend filtered to one status
    (docs/GITHUB_ACTIONS_SETUP.md:97-105). The status filter pushes
    down into the parquet scan (PushedFilters)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias("day"))
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy(F.desc("day"))
    )


# --- O1/O2: ORDER BY ... DESC LIMIT k (README.md:185-188,194,546-552) -------
@query(
    "recent_runs_topk",
    oracle="""
    SELECT event_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 10
    """,
)
def recent_runs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-recent-k rows (README.md:185-188 LIMIT 10). Catalyst plans
    TakeOrderedAndProject — true top-k with per-partition heaps, no
    global sort; event_id tiebreak keeps selection deterministic."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"), "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(10)
    )


# --- D1: event-time hour dedup (etl_job.py:226-237) -------------------------
@query(
    "hour_dedup",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           event_id, value
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY DATE_TRUNC('hour', ts)
                 ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY hour_bucket
    """,
)
def hour_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's single most load-bearing operator: idempotent
    append keyed on DATE_TRUNC('hour', event_time) (etl_job.py:226-237;
    headlined README.md:17,78,86-87). Batch determinization: keep the
    earliest row per hour bucket (ts, event_id tiebreak) — exactly what
    repeated half-hourly runs against an hour-deduped sink converge to.

    Implemented via operators.dedup.first_per_bucket (window row_number
    → filter), a single shuffle on the bucket key."""
    from flight_data_pipeline_spark.operators.dedup import first_per_bucket

    ev = load_table(spark, "events", sf_dir)
    deduped = first_per_bucket(
        ev, bucket=F.date_trunc("hour", "ts"), order=["ts", "event_id"]
    )
    return (
        deduped.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"), "event_id", "value"
        ).orderBy("hour_bucket")
    )


# --- A5/A6: scalar counts (README.md:193; docs:81) ---------------------------
@query(
    "scalar_counts",
    oracle="""
    SELECT COUNT(*)                 AS n_events,
           COUNT(DISTINCT user_id)  AS n_users
    FROM events
    """,
)
def scalar_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total scalar aggregates (README.md:193, docs:81), plus a
    distinct-count superset. Partial aggregation makes this one
    all-to-one exchange of a single row per partition."""
    ev = load_table(spark, "events", sf_dir)
    return ev.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- P7-P10: conjunctive quality gate, flag-don't-drop (etl_job.py:204-218) --
@query(
    "quality_gate_daily",
    oracle="""
    SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
           COUNT(*)         AS total_rows,
           CAST(SUM(CASE WHEN value IS NOT NULL AND value BETWEEN 0 AND 500
                     AND event_type <> 'error'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           ROUND(100.0 * SUM(CASE WHEN value IS NOT NULL
                                   AND value BETWEEN 0 AND 500
                                   AND event_type <> 'error'
                                  THEN 1 ELSE 0 END) / COUNT(*), 2) AS valid_pct
    FROM events
    GROUP BY STRFTIME(ts, '%Y-%m-%d')
    ORDER BY day
    """,
)
def quality_gate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's conjunctive validation gate (etl_job.py:204-218):
    range + null + status predicates combined, rows FLAGGED not dropped
    (invalid rows still counted in total_rows — SURVEY.md §7.4 item 2),
    rolled up per day."""
    from flight_data_pipeline_spark.operators.quality import range_check

    ev = load_table(spark, "events", sf_dir)
    is_valid = (
        range_check(F.col("value"), 0, 500) & (F.col("event_type") != "error")
    )
    flagged = ev.withColumn("is_valid", is_valid)  # flag, never filter
    return (
        flagged.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("total_rows"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("n_valid"),
            F.round(
                100.0
                * F.sum(F.when(F.col("is_valid"), 1).otherwise(0))
                / F.count("*"),
                2,
            ).alias("valid_pct"),
        )
        .orderBy("day")
    )


# --- §2.9 JSON scalar functions (etl_job.py:101-122 parse surface) -----------
@query(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k,
           COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS INT) > 50
                 THEN 1 END)                                      AS n_high_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (the §2.9 JSON surface:
    .get() chains → get_json_object/from_json). The events.props JSON
    string is parsed inline — one map-side extraction, no UDF; at
    scale, repeated access would from_json once into a struct column
    instead of re-parsing per expression."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = load_table(spark, "events", sf_dir)
    k = F.from_json("props", StructType([StructField("k", IntegerType())]))["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high_k"),
        )
        .orderBy("event_type")
    )


# --- A1 superset: pivoted daily rollup ---------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "daily_event_type_pivot",
    oracle="""
    SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
    """ + ",\n".join(
        f"       CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    ) + """
    FROM events
    GROUP BY STRFTIME(ts, '%Y-%m-%d')
    ORDER BY day
    """,
)
def daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT rollup: one column of counts per event_type per day — the
    wide form of the A1 daily rollup (the reference's fuel-mix pivot
    P5, etl_job.py:124-135, applied to statuses). The pivot values are
    pinned literals so Spark skips the extra distinct-values job and
    the plan stays a single partial+final aggregate."""
    ev = load_table(spark, "events", sf_dir)
    pivoted = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    ).orderBy("day")


# --- P9: freshness flag (warn-only, etl_job.py:74-83) ------------------------
@query(
    "freshness_flags_daily",
    oracle=f"""
    SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
           COUNT(*)                 AS n_rows,
           CAST(SUM(CASE WHEN DATE_DIFF('second', ts, TIMESTAMP '{NOW}') / 3600.0 > 2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
           CAST(SUM(CASE WHEN DATE_DIFF('second', ts, TIMESTAMP '{NOW}') / 3600.0 > 2
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_fresh
    FROM events
    GROUP BY STRFTIME(ts, '%Y-%m-%d')
    ORDER BY day
    """,
)
def freshness_flags_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness check as a FLAG, never a filter (etl_job.py:79-83
    warns on >2h-old data but still writes it): per-day stale/fresh
    counts against the pinned 'now'. Total rows per day must equal
    the unfiltered count — the warn-only semantics made visible."""
    from flight_data_pipeline_spark.operators.quality import stale_flag

    ev = load_table(spark, "events", sf_dir)
    now = F.lit(NOW).cast("timestamp")
    flagged = ev.withColumn("stale", stale_flag(F.col("ts"), now))
    return (
        flagged.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("stale"), 1).otherwise(0)).alias("n_stale"),
            F.sum(F.when(F.col("stale"), 0).otherwise(1)).alias("n_fresh"),
        )
        .orderBy("day")
    )


@query(
    "props_variant_stats",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS ok
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)     AS n_events,
           CAST(SUM(ok) AS BIGINT)      AS n_parsed,
           CAST(MIN(k) AS INT)          AS min_k,
           CAST(MAX(k) AS INT)          AS max_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``try_parse_json`` decodes events.props into the binary variant
    encoding once, ``variant_get`` does typed path extraction — the
    engine's modern alternative to per-expression string re-parsing
    (json_props_stats is the from_json twin; same §2.9 surface,
    etl_job.py:101-122).

    Why variant at scale: the open-schema case (keys vary per row)
    where a rigid from_json struct can't be declared up front —
    parse once, extract many paths, each extraction navigating the
    binary encoding instead of re-tokenizing JSON text; with variant
    shredding in Parquet the path read prunes like a real column.
    try_parse_json → NULL (not error) on malformed rows, counted
    here as n_parsed vs n_events — the dead-letter accounting knob."""
    ev = load_table(spark, "events", sf_dir)
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", v.alias("v"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
            .alias("n_parsed"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )
