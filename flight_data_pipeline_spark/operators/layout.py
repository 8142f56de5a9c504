"""Data-layout operators for min/max file skipping: range clustering
and Z-order keys.

Parquet scans prune at two granularities: directory partitions
(partition pruning) and row-group/file min-max statistics (data
skipping). Hash bucketing (operators/bucketing.py) serves JOIN
co-location but scatters value ranges across every file — a range
predicate still touches all of them. The complementary layout is
CLUSTERING: sort the data so each file holds a narrow value range,
making footer min/max statistics selective. This is what Delta
``OPTIMIZE ZORDER BY`` / Iceberg sort orders do; here it is expressed
with vanilla Spark writes so any parquet reader benefits.

- :func:`cluster_by_range` — repartitionByRange + sortWithinPartitions
  + write: one range exchange (sampling pass picks balanced bounds),
  after which every file covers a disjoint slice of the cluster key.
  Best when queries filter on ONE leading dimension (time, tenant).
- :func:`zorder_key` — Morton (bit-interleaved) key over several
  normalized dimensions, built from shiftleft/or built-ins (codegen,
  no UDF). Range-cluster BY the z-key and a filter on ANY of the
  interleaved dimensions maps to a bounded set of z-ranges, so
  min/max skipping works for all of them at once — the multi-
  dimension trade Delta's ZORDER makes (each dimension's skipping is
  a bit weaker than a dedicated sort, but every dimension gets some).
- :func:`file_minmax_stats` — driver-side audit of parquet footers
  (pyarrow): the evidence that clustering produced skippable files.
  An audit/ops utility, deliberately NOT a distributed operator.

At 100 TB: the range exchange is the one-time layout cost (identical
shape to any global sort — sample, then shuffle once); reads then
prune at file granularity forever. Re-cluster only what compaction
touches.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(cols: Sequence[Column], mins: Sequence[float],
               maxs: Sequence[float], bits_per_dim: int = 16) -> Column:
    """Morton/Z-order key: each column is normalized to an integer in
    [0, 2^bits), then the dimensions' bits are interleaved (dimension
    d contributes bit i at position ``i * ndims + d``).

    ``mins``/``maxs`` are PINNED normalization bounds (compute them
    once from table stats; pinning keeps the key stable across
    incremental writes — recomputing per batch would re-cluster old
    data differently). Values outside the bounds clamp. The whole
    expression is shiftleft/or/cast built-ins — whole-stage codegen,
    one pass, no UDF.
    """
    ndims = len(cols)
    if not (len(mins) == len(maxs) == ndims):
        raise ValueError("cols, mins, maxs must align")
    scale = (1 << bits_per_dim) - 1
    quantized = []
    for c, lo, hi in zip(cols, mins, maxs):
        unit = (c.cast("double") - float(lo)) / (float(hi) - float(lo))
        clamped = F.least(F.greatest(unit, F.lit(0.0)), F.lit(1.0))
        quantized.append(F.round(clamped * scale).cast("long"))
    parts = []
    for d, q in enumerate(quantized):
        # spread bit i of q to position i*ndims + d
        parts.extend(
            F.shiftleft(
                F.shiftrightunsigned(q, i).bitwiseAND(F.lit(1)),
                i * ndims + d)
            for i in range(bits_per_dim)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zorder_key")


def cluster_by_range(df: DataFrame, out_path: str, *cluster_cols: Column,
                     num_files: int = 8) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``: one
    repartitionByRange (sampled balanced bounds) + in-partition sort,
    so every output file covers a disjoint slice of the key space and
    its footer min/max prunes range predicates.

    Pass a :func:`zorder_key` as the cluster column to get
    multi-dimensional skipping from the same single exchange.
    """
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def file_minmax_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (name, min, max) of ``column`` from parquet footers —
    the skipping audit: disjoint ranges ⇒ a point/range predicate
    touches few files. Driver-side by design (footers are KBs; this
    is an ops check, not a data-path operator)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                s = col.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
        out.append((name, lo, hi))
    return out


def compact_small_files(spark, path: str, target_mb: int = 128,
                        cluster_cols: Sequence[Column] = ()) -> int:
    """Compact a parquet directory's small files into ~``target_mb``
    outputs (returns the new file count). The small-files problem is
    the steady-state failure mode of incremental writes: a 30-minute
    append cadence yields 17k files/year whose open/footer overhead
    eventually dominates scans.

    Plan: size the output count from the directory's actual bytes
    (driver-side listing — metadata, not data), then one
    ``repartition(n)`` round-robin shuffle (or a range exchange when
    ``cluster_cols`` are given, preserving/establishing the clustered
    layout of :func:`cluster_by_range` through the compaction) and an
    atomic directory swap. At 100 TB compaction runs per PARTITION
    (compact yesterday's directory, not the table), so the shuffle is
    bounded by one partition's bytes; table formats (Delta OPTIMIZE,
    Iceberg rewrite_data_files) schedule exactly this job.
    """
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet"))
    n = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if cluster_cols:
        df = df.repartitionByRange(n, *cluster_cols) \
               .sortWithinPartitions(*cluster_cols)
    else:
        df = df.repartition(n)
    tmp = path.rstrip("/") + ".compact-tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact-old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def expire_partitions(path: str, partition_col: str, keep_from: str) -> list[str]:
    """Retention: drop `<partition_col>=<value>` directories whose
    value sorts below ``keep_from`` (ISO date strings compare
    lexicographically). Returns the dropped partition values.

    Partition-directory deletion IS the scalable retention path — a
    DELETE WHERE over 100 TB rewrites data; dropping directories
    touches only the listing (Hive `DROP PARTITION`, Delta `VACUUM`
    after a partition-predicate delete). Readers never see a partial
    partition: removal is per-directory, and a concurrent scan either
    listed the directory before (reads it whole) or after (skips it).
    """
    import os
    import shutil

    dropped = []
    prefix = f"{partition_col}="
    for name in sorted(os.listdir(path)):
        if name.startswith(prefix) and name[len(prefix):] < keep_from:
            shutil.rmtree(os.path.join(path, name))
            dropped.append(name[len(prefix):])
    return dropped
