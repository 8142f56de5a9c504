"""Deduplication operators.

Reference parity: the hour-bucket idempotent-append dedup at
etl_job.py:226-237 (a COUNT(*) existence probe against the sink before
insert — i.e. a left anti join of the incoming batch against the sink
on DATE_TRUNC('hour', event_time)).

Extension scope (BASELINE.json north star): exact and near-duplicate
document dedup — hash-groupBy, MinHash+LSH, SimHash, n-gram Jaccard —
see also plans/dedup_queries.py for the checked query forms.

Scale posture: every operator here is one shuffle on the dedup key (or
the LSH band key). No collects, no driver-side loops; skewed bucket
keys are AQE-split.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dedup_against_sink(incoming: DataFrame, sink: DataFrame,
                       bucket: Column, ts_col: str = "timestamp") -> DataFrame:
    """Reference D1 (etl_job.py:226-237): drop incoming rows whose hour
    bucket already exists in the sink — a left anti join, the
    distributed form of the reference's ``SELECT COUNT(*) ... WHERE
    DATE_TRUNC('hour', timestamp) = DATE_TRUNC('hour', %s)`` probe.

    At scale the sink side reduces to its distinct buckets first (tiny
    relation ⇒ Catalyst broadcasts it), so the anti join never shuffles
    the big incoming side.
    """
    sink_buckets = sink.select(bucket.alias("__bucket")).distinct()
    return (
        incoming.withColumn("__bucket", bucket)
        .join(F.broadcast(sink_buckets), on="__bucket", how="left_anti")
        .drop("__bucket")
    )


def first_per_bucket(df: DataFrame, bucket: Column,
                     order: Sequence[str | Column]) -> DataFrame:
    """Keep the first row per bucket under a total order — the batch
    determinization of hour-dedup (repeated half-hourly ingests against
    an hour-deduped sink converge to first-row-per-hour; SURVEY.md
    §7.4 item 3). ``order`` must end in a unique key for determinism.

    One shuffle on the bucket key; rank computed streaming within each
    partition (no buffering beyond the window frame).
    """
    w = Window.partitionBy(bucket).orderBy(*[F.asc(c) if isinstance(c, str) else c for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, cols: Sequence[str],
                tiebreak: Sequence[str] = ()) -> DataFrame:
    """Exact deduplication on ``cols``.

    With ``tiebreak`` given, keeps the first row per key under that
    order (deterministic, oracle-checkable). Without it, defers to
    Spark's ``dropDuplicates`` (hash-aggregate based, cheaper — fine
    when any representative row will do).
    """
    if tiebreak:
        key = F.struct(*[F.col(c) for c in cols])
        return first_per_bucket(df, key, list(tiebreak))
    return df.dropDuplicates(list(cols))
