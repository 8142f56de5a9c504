"""Temporal operators: time buckets, interval filters, sessionization.

Reference surface: DATE_TRUNC hour/day buckets (etl_job.py:228-229,
README.md:396, docs:98-99), NOW() - INTERVAL filters (README.md:178).
Extension: gap-based sessionization and tumbling windows — the batch
expression of §2.10's streaming semantics (streaming twin in
streaming/pipeline_stream.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flight_data_pipeline_spark.functions.scalars import to_epoch_seconds


def within_interval(ts: Column, now: Column, days: int) -> Column:
    """``ts >= now - INTERVAL n DAYS`` (README.md:178). ``now`` is a
    parameter so checked queries stay deterministic."""
    return ts >= now - F.expr(f"INTERVAL {int(days)} DAYS")


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_minutes: int = 30, session_col: str = "session_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap
    since the user's previous event exceeds ``gap_minutes``.

    lag + conditional-sum over one (user, ts) window — a single
    shuffle on the user key, both window passes reuse the same
    partitioning (no second exchange). The streaming analogue is
    ``session_window``/``applyInPandasWithState``.
    """
    by_user = Window.partitionBy(user_col).orderBy(ts_col)
    secs = to_epoch_seconds(F.col(ts_col))
    gap_s = secs - F.lag(secs).over(by_user)
    is_new = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return (
        df.withColumn("__new_session", is_new)
        .withColumn(
            session_col,
            F.sum("__new_session").over(
                by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("__new_session")
    )


def scd2_history(df: DataFrame, key_col: str, ts_col: str, state_col: str,
                 tiebreak_col: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each run of
    consecutive equal ``state_col`` values per key into one validity
    interval — (key, state, valid_from, valid_to, n_events), with
    ``valid_to`` NULL on the current (open) interval.

    The islands-and-gaps build: lag-compare flags state changes, a
    running sum numbers the runs, one aggregate per run takes the
    interval bounds, and lead() closes each interval with the next
    run's start. Every window and the aggregate partition on
    ``key_col`` — ONE shuffle serves all four steps at any scale, and
    no interval self-join ever happens (the naive SCD2 build joins
    each row to its successor). ``tiebreak_col`` makes same-timestamp
    ordering deterministic; state equality is null-safe.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(state_col).over(w)
    chg = F.when(
        (F.row_number().over(w) == 1)
        | ~prev.eqNullSafe(F.col(state_col)), 1).otherwise(0)
    runs = (
        df.withColumn("__chg", chg)
        .withColumn(
            "__run",
            F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    per_run = (
        runs.groupBy(key_col, "__run", state_col)
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.count("*").alias("n_events"),
        )
    )
    w_runs = Window.partitionBy(key_col).orderBy("__run")
    return (
        per_run.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .select(key_col, F.col(state_col).alias("state"),
                "valid_from", "valid_to", "n_events")
    )


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str,
                        *aggs: Column) -> DataFrame:
    """Tumbling event-time window aggregate (§2.10: hour buckets for
    dedup, day buckets for rollups, generalized). Batch form of
    ``groupBy(window(ts, duration))`` — partial aggregation map-side,
    one shuffle on the window start."""
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("win")).agg(*aggs)
    agg_cols = [c for c in out.columns if c != "win"]
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *agg_cols,
    )
