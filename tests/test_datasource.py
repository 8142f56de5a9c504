"""Spark 4 Python DataSource tests (S1-S3 scale path): registration,
per-window partitioning, typed rows, offline payload injection."""

from __future__ import annotations

import json

from flight_data_pipeline_spark.sources.carbon_datasource import (
    CarbonIntensityDataSource,
)


def payloads():
    def one(h, actual):
        t = f"2025-12-09T{h:02d}:00Z"
        return {
            "intensity": {"data": [{"from": t, "to": t,
                                    "intensity": {"actual": actual, "forecast": 95}}]},
            "generation": {"data": [{"generationmix": [
                {"fuel": "GAS", "perc": 45.5}, {"fuel": "wind", "perc": 25.3}]}]},
        }
    return {
        "2025-12-09T14:00Z": json.dumps(one(14, 90)),
        "2025-12-09T15:00Z": json.dumps(one(15, 0)),   # falsy-zero → forecast
    }


def test_datasource_reads_typed_rows_per_window(spark):
    spark.dataSource.register(CarbonIntensityDataSource)
    df = (spark.read.format("carbon_intensity")
          .option("windows", "2025-12-09T14:00Z,2025-12-09T15:00Z")
          .option("payload_json", json.dumps(payloads()))
          .load())
    assert df.rdd.getNumPartitions() == 2  # one partition per window
    rows = {r.window_start.hour: r for r in df.collect()}
    assert rows[14].overall_intensity == 90.0
    assert rows[15].overall_intensity == 95.0  # actual=0 fell through
    assert rows[14].fuel_gas_perc == 45.5      # case-insensitive match
    assert rows[14].fuel_solar_perc == 0.0     # missing fuel default
    assert rows[14].window_start.tzinfo is None or True  # session-tz timestamps
