"""Fixture-drift canary + timestamp-type hardening tests.

Round 3 regressed because the driver regenerated the parquet fixtures
from TIMESTAMP(NANOS) to timestamp[us] (no tz) and the loader's
bigint-only normalization stopped firing — Spark 4 read ``events.ts``
as TIMESTAMP_NTZ and every ``ts.cast("long")`` crashed (VERDICT r3).
These tests pin the loader contract (ts is always TimestampType) and
prove the operators are type-agnostic via ``to_epoch_seconds``.
"""

from __future__ import annotations

import datetime
import os

import pyspark.sql.functions as F
import pytest

from flight_data_pipeline_spark.functions.scalars import to_epoch_seconds
from flight_data_pipeline_spark.operators.relational import range_join_binned
from flight_data_pipeline_spark.operators.temporal import sessionize
from flight_data_pipeline_spark.tables import TABLES, load_table

SF_DIRS = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_loader_ts_columns_are_timestamp(spark, sf_dir):
    """Canary: whatever physical type a future fixture regen ships
    (bigint nanos, timestamp_ntz, timestamp_ltz), every loader-emitted
    ``ts`` column must surface as plain ``timestamp``. If this fails,
    fix flight_data_pipeline_spark/tables.py:load_table — NOT the
    operators (they may assume TimestampType after loading)."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        for col, dtype in df.dtypes:
            if col == "ts":
                assert dtype == "timestamp", (
                    f"{sf_dir}/{name}.ts loaded as {dtype}, expected timestamp "
                    "— fixture drift not absorbed by tables.load_table"
                )


def _ltz_and_ntz_frames(spark):
    """The same little event log as TIMESTAMP (LTZ) and TIMESTAMP_NTZ."""
    rows = [
        (1, 1, datetime.datetime(2025, 1, 1, 10, 0, 0)),
        (2, 1, datetime.datetime(2025, 1, 1, 10, 10, 0)),
        (3, 1, datetime.datetime(2025, 1, 1, 11, 30, 0)),   # >30min gap
        (4, 2, datetime.datetime(2025, 1, 1, 9, 0, 30)),
        (5, 2, datetime.datetime(2025, 1, 1, 9, 59, 30)),   # 59min gap
    ]
    ltz = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    ntz = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz")
    return ltz, ntz


def test_to_epoch_seconds_ltz_ntz_identical(spark):
    ltz, ntz = _ltz_and_ntz_frames(spark)
    a = [r[0] for r in ltz.select(to_epoch_seconds(F.col("ts"))).collect()]
    b = [r[0] for r in ntz.select(to_epoch_seconds(F.col("ts"))).collect()]
    assert a == b
    # session tz pinned UTC: 2025-01-01T10:00:00Z
    assert a[0] == 1735725600


def test_sessionize_handles_ntz(spark):
    ltz, ntz = _ltz_and_ntz_frames(spark)
    out = {}
    for tag, df in (("ltz", ltz), ("ntz", ntz)):
        got = (
            sessionize(df, "user_id", "ts", gap_minutes=30)
            .select("event_id", "session_id")
            .orderBy("event_id")
            .collect()
        )
        out[tag] = [(r.event_id, r.session_id) for r in got]
    assert out["ltz"] == out["ntz"] == [(1, 1), (2, 1), (3, 2), (4, 1), (5, 2)]


def test_range_join_binned_handles_ntz(spark):
    ltz, ntz = _ltz_and_ntz_frames(spark)
    out = {}
    for tag, df in (("ltz", ltz), ("ntz", ntz)):
        left = df.select("user_id", F.col("event_id").alias("lid"),
                         F.col("ts").alias("lts"))
        right = df.select("user_id", F.col("event_id").alias("rid"),
                          F.col("ts").alias("rts"))
        got = range_join_binned(
            left, right, key_cols=["user_id"], left_ts="lts", right_ts="rts",
            lower_sec=-3600, upper_sec=0, bin_sec=3600,
        ).select("lid", "rid").orderBy("lid", "rid").collect()
        out[tag] = [(r.lid, r.rid) for r in got]
    # each event sees strictly-earlier same-user events within 1h
    assert out["ltz"] == out["ntz"] == [(2, 1), (5, 4)]
