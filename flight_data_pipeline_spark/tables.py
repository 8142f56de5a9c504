"""Typed loaders for the test star schema + extension tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1 for bench,
sf0.001/sf0.01 for smoke/correctness).

Scale posture: these are plain ``spark.read.parquet`` scans so
Catalyst's predicate pushdown / column pruning / partition pruning all
apply. At 100 TB the same loaders point at a partitioned directory
tree (e.g. ``events/date=.../*.parquet``) and nothing above them
changes — loaders return lazy DataFrames, never collect.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flight_data_pipeline_spark.session import apply_runtime_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one fixture table as a typed DataFrame.

    ``events.ts`` is normalized to TimestampType (UTC) whatever the
    fixture's physical parquet type is — the fixtures have shipped
    two encodings across rounds and the loader is the single place
    that absorbs the drift (tests/test_tables.py pins this):

    - ``TIMESTAMP(NANOS)``: Spark 4 rejects it natively; with
      ``nanosAsLong`` it arrives as an epoch-nanos ``bigint`` that we
      convert to microsecond TimestampType.
    - ``timestamp[us]`` with no timezone (isAdjustedToUTC=false):
      Spark 4 infers ``TIMESTAMP_NTZ``; under the pinned UTC session
      timezone a plain cast to ``timestamp`` is value-preserving and
      matches the DuckDB oracle, which reads the same column as a
      naive timestamp and compares in UTC.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    apply_runtime_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division — float division of epoch-nanos loses µs
            # precision (1.7e18 exceeds double's 53-bit mantissa)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_tables(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
