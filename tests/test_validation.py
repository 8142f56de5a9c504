"""Ports of the reference's 12 unit tests (tests/test_etl.py:1-148)
as DataFrame-expression tests, using the same literals.

The reference validates with pure-Python predicates; here each
predicate is a Column expression evaluated over a one-column frame —
same semantics, vectorized execution.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from flight_data_pipeline_spark.functions.scalars import coalesce_falsy, parse_iso8601
from flight_data_pipeline_spark.operators.quality import (
    stale_flag,
    valid_fuel_pct,
    valid_intensity,
    valid_timestamp,
)

NOW = dt.datetime(2025, 12, 9, 15, 0, 0)


def eval_predicate(spark, values, dtype, predicate):
    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    rows = df.select(predicate(F.col("v")).alias("ok")).collect()
    return [r.ok for r in rows]


class TestDataValidation:
    # test_etl.py:23-28
    def test_validate_intensity_valid(self, spark):
        assert eval_predicate(spark, [150.0, 0.0, 1000.0, 250.5], "double",
                              valid_intensity) == [True] * 4

    # test_etl.py:30-35 — "150" (string) is a schema concern in Spark:
    # a failed cast to double is NULL, which the predicate rejects
    def test_validate_intensity_invalid(self, spark):
        assert eval_predicate(spark, [None, -10.0, 1500.0], "double",
                              valid_intensity) == [False] * 3
        df = spark.createDataFrame([("150x",)], "v string")
        assert df.select(
            valid_intensity(F.col("v").try_cast("double")).alias("ok")
        ).first().ok is False

    # test_etl.py:37-42
    def test_validate_fuel_percentage_valid(self, spark):
        assert eval_predicate(spark, [50.0, 0.0, 100.0, 25.7], "double",
                              valid_fuel_pct) == [True] * 4

    # test_etl.py:44-48
    def test_validate_fuel_percentage_invalid(self, spark):
        assert eval_predicate(spark, [-5.0, 150.0], "double",
                              valid_fuel_pct) == [False] * 2
        df = spark.createDataFrame([("50x",)], "v string")
        assert df.select(
            valid_fuel_pct(F.col("v").try_cast("double")).alias("ok")
        ).first().ok is False

    # test_etl.py:50-53
    def test_validate_timestamp_valid(self, spark):
        assert eval_predicate(spark, [NOW], "timestamp", valid_timestamp) == [True]

    # test_etl.py:55-57
    def test_validate_timestamp_invalid(self, spark):
        assert eval_predicate(spark, [None], "timestamp", valid_timestamp) == [False]

    # etl_job.py:79-83 — staleness warns (flags) but never fails
    def test_freshness_warns_not_fails(self, spark):
        old = NOW - dt.timedelta(hours=3)
        df = spark.createDataFrame([(old,), (NOW,)], "v timestamp")
        out = df.select(
            valid_timestamp(F.col("v")).alias("ok"),
            stale_flag(F.col("v"), F.lit(NOW)).alias("stale"),
        ).collect()
        assert [r.ok for r in out] == [True, True]
        assert [r.stale for r in out] == [True, False]


class TestDateParsing:
    def parse(self, spark, s):
        df = spark.createDataFrame([(s,)], "v string")
        return df.select(parse_iso8601(F.col("v")).alias("ts")).first().ts

    # test_etl.py:63-71
    def test_parse_iso8601_valid(self, spark):
        ts = self.parse(spark, "2025-12-09T14:00Z")
        assert ts is not None
        assert (ts.year, ts.month, ts.day, ts.hour) == (2025, 12, 9, 14)

    # test_etl.py:73-77
    def test_parse_iso8601_with_offset(self, spark):
        assert self.parse(spark, "2025-12-09T14:00+00:00") is not None

    # test_etl.py:79-83
    def test_parse_iso8601_invalid(self, spark):
        for bad in [None, "invalid", ""]:
            assert self.parse(spark, bad) is None


class TestIntegration:
    # test_etl.py:89-107
    def test_full_validation_pipeline(self, spark):
        df = spark.createDataFrame(
            [(180.0, NOW, 45.5, 20.0, 25.3, 5.2)],
            "intensity double, ts timestamp, gas double, nuclear double, "
            "wind double, solar double",
        )
        row = df.select(
            valid_intensity(F.col("intensity")).alias("a"),
            valid_timestamp(F.col("ts")).alias("b"),
            *[valid_fuel_pct(F.col(c)).alias(c) for c in
              ("gas", "nuclear", "wind", "solar")],
        ).first()
        assert all(row)

    # test_etl.py:109-124
    def test_validation_pipeline_with_invalid_data(self, spark):
        df = spark.createDataFrame(
            [(-50.0, None, 150.0)], "intensity double, ts timestamp, gas double"
        )
        row = df.select(
            valid_intensity(F.col("intensity")).alias("a"),
            valid_timestamp(F.col("ts")).alias("b"),
            valid_fuel_pct(F.col("gas")).alias("c"),
        ).first()
        assert not any(row)


class TestDuplicatePrevention:
    # test_etl.py:130-143 — hour-bucket equality is the dedup key
    def test_duplicate_detection_logic(self, spark):
        t1 = dt.datetime(2025, 12, 9, 15, 0, 0)
        t2 = dt.datetime(2025, 12, 9, 15, 0, 0)
        t3 = dt.datetime(2025, 12, 9, 16, 0, 0)
        df = spark.createDataFrame([(t1,), (t2,), (t3,)], "ts timestamp")
        n = (df.select(F.date_trunc("hour", "ts").alias("h"))
               .distinct().count())
        assert n == 2  # t1/t2 same bucket, t3 distinct


class TestFalsyCoalesce:
    # SURVEY.md §7.4 item 1 — pin Python `or` semantics (etl_job.py:106)
    def test_zero_actual_falls_through_to_forecast(self, spark):
        df = spark.createDataFrame(
            [(0.0, 95.0), (None, 95.0), (90.0, 95.0)], "actual double, forecast double"
        )
        vals = [r.v for r in df.select(
            coalesce_falsy(F.col("actual"), F.col("forecast")).alias("v")
        ).collect()]
        assert vals == [95.0, 95.0, 90.0]


class TestIsoParseEdges:
    # beyond the reference's literals: seconds + fractional forms the
    # API could emit (fromisoformat accepts them; so must we)
    def test_seconds_and_fraction_forms(self, spark):
        df = spark.createDataFrame(
            [("2025-12-09T14:00:30Z",), ("2025-12-09T14:00:30.250000+00:00",),
             ("2025-12-09T14:00:30",)],
            "v string")
        out = [r.ts for r in df.select(
            parse_iso8601(F.col("v")).alias("ts")).collect()]
        assert all(t is not None for t in out)
        assert out[0].second == 30
        assert out[1].microsecond == 250000
