"""Catalog layer tests (S6/S7): idempotent DDL + the
view_daily_cleanliness view over a pipeline-written sink."""

from __future__ import annotations

import json

from flight_data_pipeline_spark.catalog import (
    create_daily_cleanliness_view,
    daily_cleanliness,
    ensure_tables,
)
from flight_data_pipeline_spark.pipeline import run_pipeline

INTENSITY = json.dumps({"data": [{
    "from": "2025-12-09T14:00Z", "to": "2025-12-09T14:30Z",
    "intensity": {"actual": 90, "forecast": 95},
}]})
MIX = json.dumps({"data": [{"generationmix": [
    {"fuel": "gas", "perc": 40.0}, {"fuel": "wind", "perc": 30.0},
    {"fuel": "solar", "perc": 10.0}, {"fuel": "nuclear", "perc": 15.0},
]}]})


def test_ensure_tables_idempotent_and_view_rollup(spark, tmp_path):
    tele, audit = str(tmp_path / "t"), str(tmp_path / "a")
    run_pipeline(spark, lambda: INTENSITY, lambda: MIX, tele, audit,
                 sleep=lambda s: None)

    ensure_tables(spark, tele, audit)
    ensure_tables(spark, tele, audit)  # CREATE IF NOT EXISTS: no raise

    assert spark.sql("SELECT COUNT(*) n FROM grid_telemetry").first().n == 1
    assert spark.sql("SELECT status FROM etl_runs").first().status == "success"

    create_daily_cleanliness_view(spark)
    row = spark.sql("SELECT * FROM view_daily_cleanliness").first()
    assert row.avg_intensity == 90.0
    assert row.avg_clean_energy_perc == 40.0  # wind 30 + solar 10
    assert row.avg_gas_perc == 40.0
    assert row.samples == 1

    # DataFrame twin agrees with the SQL view
    df_row = daily_cleanliness(spark.table("grid_telemetry")).first()
    assert (df_row.avg_intensity, df_row.samples) == (90.0, 1)

    spark.sql("DROP TABLE grid_telemetry")
    spark.sql("DROP TABLE etl_runs")
