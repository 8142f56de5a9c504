"""Bucketed-table layout: the shuffle-free co-located join path.

At 100 TB the dominant cost of a large equi-join is the shuffle of
both sides. Spark's bucketing (``DataFrameWriter.bucketBy(n, key)``
+ ``saveAsTable``) pre-partitions a table ON DISK by
``hash(key) % n``: two tables bucketed on the same key with the same
bucket count join with ZERO exchange — each task reads bucket i of
both sides. ``sortBy`` additionally pre-sorts within buckets so the
sort-merge join skips its sort. This is the batch analogue of the
reference's Postgres PK index on (timestamp) (reference
``etl_job.py:239-260`` relies on the index for its dedup probe);
here the layout cost is paid once at write time and every subsequent
join/aggregate on the key is shuffle-free.

Usage pattern for a fact/dim star at scale::

    write_bucketed(orders,   "orders_b",   "o_custkey", 64)
    write_bucketed(customer, "customer_b", "c_custkey", 64)
    o, c = read_bucketed(spark, "orders_b"), read_bucketed(spark, "customer_b")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"])  # no Exchange

Notes for real clusters:
- bucket count is fixed at write time: size it to ~128-256 MB per
  bucket at the target scale, and keep it a power of two so a later
  2× re-bucket can coalesce pairs of files.
- bucketed tables must be saved through the session catalog
  (``saveAsTable``) — bucketing metadata lives in the metastore, not
  in parquet footers. Plain ``.parquet(path)`` writes lose it.
- AQE cannot invent bucketing at runtime; it can only avoid the
  shuffle the layout already makes unnecessary.

tests/test_bucketing.py pins the contract: the bucketed-bucketed
join plan contains no ShuffleExchange, and results equal the
shuffled join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | Sequence[str],
                   num_buckets: int, *, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    by ``key``. Joins/aggregations on ``key`` against any table
    bucketed the same way then plan without an Exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(num_buckets, *keys))
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the layout
    metadata only survives a catalog read)."""
    return spark.table(table)
