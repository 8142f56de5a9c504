"""Catalog layer: table provisioning + derived views (S6, S7).

The reference provisions its two tables with CREATE TABLE IF NOT
EXISTS on every run (ensure_table, etl_job.py:139-166) and ships one
derived relation, ``view_daily_cleanliness`` (README.md:394-404). The
Spark-native equivalents: idempotent catalog DDL over parquet
locations, and the view as both a spark.sql VIEW and a DataFrame
builder (plans/reference_queries.daily_rollup is the checked twin).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flight_data_pipeline_spark.sinks import AUDIT_SCHEMA, TELEMETRY_SCHEMA


def ensure_tables(spark: SparkSession, telemetry_path: str, audit_path: str) -> None:
    """CREATE TABLE IF NOT EXISTS × 2 (etl_job.py:139-166): register
    the two sinks as external parquet tables so the SQL surface
    (spark.sql) sees them by name. Idempotent; safe on every run."""
    ddl = {
        "grid_telemetry": (TELEMETRY_SCHEMA, telemetry_path),
        "etl_runs": (AUDIT_SCHEMA, audit_path),
    }
    for name, (schema, path) in ddl.items():
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({cols}) "
            f"USING parquet LOCATION '{path}'"
        )


def create_daily_cleanliness_view(spark: SparkSession,
                                  table: str = "grid_telemetry") -> None:
    """view_daily_cleanliness (README.md:394-404): daily rollup of
    intensity, clean-energy share (wind+solar), gas share, sample
    count, registered as a temp view.

    Deliberate deviations from the reference view (which emits
    unrounded AVGs named avg_renewables_perc/avg_fossil_perc): the
    averages here are ROUND(...,0)/(,1)-ed so results are hash-stable
    against a DuckDB oracle (float summation order differs between
    engines), and the columns are named avg_clean_energy_perc /
    avg_gas_perc to say what they aggregate. Grouping, measures, and
    ordering are otherwise identical."""
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY VIEW view_daily_cleanliness AS
        SELECT DATE(timestamp)                                   AS day,
               ROUND(AVG(overall_intensity), 0)                  AS avg_intensity,
               ROUND(AVG(fuel_wind_perc + fuel_solar_perc), 1)   AS avg_clean_energy_perc,
               ROUND(AVG(fuel_gas_perc), 1)                      AS avg_gas_perc,
               COUNT(*)                                          AS samples
        FROM {table}
        GROUP BY DATE(timestamp)
        ORDER BY day DESC
    """)


def daily_cleanliness(df: DataFrame) -> DataFrame:
    """DataFrame-builder twin of the view (README.md:394-404, with
    the same deliberate rounding/renaming as
    create_daily_cleanliness_view) for callers composing plans
    directly."""
    return (
        df.groupBy(F.to_date("timestamp").alias("day"))
        .agg(
            F.round(F.avg("overall_intensity"), 0).alias("avg_intensity"),
            F.round(F.avg(F.col("fuel_wind_perc") + F.col("fuel_solar_perc")), 1)
            .alias("avg_clean_energy_perc"),
            F.round(F.avg("fuel_gas_perc"), 1).alias("avg_gas_perc"),
            F.count("*").alias("samples"),
        )
        .orderBy(F.desc("day"))
    )
