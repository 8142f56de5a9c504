"""Range-clustered / Z-ordered layout: written files must expose
disjoint (or near-disjoint) footer min/max ranges so predicates prune
at file granularity — plus Z-order locality properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from flight_data_pipeline_spark.operators.layout import (
    cluster_by_range,
    file_minmax_stats,
    zorder_key,
)


class TestClusterByRange:
    def test_files_cover_disjoint_ranges(self, spark, tmp_path):
        df = spark.range(0, 10_000).select(
            (F.col("id") * 37 % 10_000).alias("k"),
            F.col("id").alias("payload"))
        out = str(tmp_path / "clustered")
        cluster_by_range(df, out, F.col("k"), num_files=8)
        stats = [s for s in file_minmax_stats(out, "k") if s[1] is not None]
        assert len(stats) >= 4
        # sort files by min; each file's range must not overlap the next
        by_min = sorted(stats, key=lambda s: s[1])
        for (_, _, hi), (_, lo2, _) in zip(by_min, by_min[1:]):
            assert hi <= lo2
        # a point predicate therefore touches exactly one file
        hits = [s for s in stats if s[1] <= 1234 <= s[2]]
        assert len(hits) == 1

    def test_unclustered_write_overlaps(self, spark, tmp_path):
        # control: the same data written round-robin has ~full-range
        # files, proving the clustering (not parquet) creates skipping
        df = spark.range(0, 10_000).select(
            (F.col("id") * 37 % 10_000).alias("k"))
        out = str(tmp_path / "plain")
        df.repartition(8).write.mode("overwrite").parquet(out)
        stats = [s for s in file_minmax_stats(out, "k") if s[1] is not None]
        spans = [hi - lo for _, lo, hi in stats]
        assert max(spans) > 9_000  # every file spans ~the whole domain


class TestZorderKey:
    def test_quadrant_prefix(self, spark):
        # top bit of each dimension becomes the top two bits of the
        # z-key: points in the same quadrant share the z-key prefix
        df = spark.createDataFrame(
            [(x, y) for x in (10.0, 200.0) for y in (10.0, 200.0)],
            "x double, y double")
        rows = df.select(
            "x", "y",
            zorder_key([F.col("x"), F.col("y")], [0.0, 0.0],
                       [255.0, 255.0], bits_per_dim=8).alias("z"),
        ).collect()
        quad = {(r.x > 127, r.y > 127): r.z >> 14 for r in rows}
        # quadrant id == interleaved top bits (x bit at position 14,
        # y bit at 15)
        assert quad[(False, False)] == 0
        assert quad[(True, False)] == 1
        assert quad[(False, True)] == 2
        assert quad[(True, True)] == 3

    def test_clamps_out_of_bounds(self, spark):
        df = spark.createDataFrame([(-5.0, 999.0)], "x double, y double")
        z = df.select(zorder_key(
            [F.col("x"), F.col("y")], [0.0, 0.0], [255.0, 255.0],
            bits_per_dim=8).alias("z")).first().z
        # x clamps to 0, y clamps to 255: z = interleave(0, 255)
        want = sum(1 << (i * 2 + 1) for i in range(8))
        assert z == want


class TestCompaction:
    def test_small_files_become_few(self, spark, tmp_path):
        from flight_data_pipeline_spark.operators.layout import (
            compact_small_files,
        )
        out = str(tmp_path / "t")
        df = spark.range(0, 20_000).select(
            F.col("id"), (F.col("id") % 97).alias("k"))
        df.repartition(64).write.parquet(out)
        import os
        before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
        assert before >= 32
        total_before = spark.read.parquet(out).count()
        n = compact_small_files(spark, out, target_mb=128)
        assert n < before
        assert spark.read.parquet(out).count() == total_before

    def test_compaction_can_establish_clustering(self, spark, tmp_path):
        from flight_data_pipeline_spark.operators.layout import (
            compact_small_files,
            file_minmax_stats,
        )
        out = str(tmp_path / "t")
        spark.range(0, 20_000).select(
            (F.col("id") * 31 % 5_000).alias("k")) \
            .repartition(16).write.parquet(out)
        compact_small_files(spark, out, target_mb=1,
                            cluster_cols=(F.col("k"),))
        stats = [s for s in file_minmax_stats(out, "k") if s[1] is not None]
        if len(stats) > 1:
            by_min = sorted(stats, key=lambda s: s[1])
            for (_, _, hi), (_, lo2, _) in zip(by_min, by_min[1:]):
                assert hi <= lo2


class TestRetention:
    def test_expire_partitions_drops_old_only(self, spark, tmp_path):
        from flight_data_pipeline_spark.operators.layout import (
            expire_partitions,
        )
        out = str(tmp_path / "t")
        df = spark.createDataFrame(
            [("2024-01-0%d" % d, d) for d in range(1, 6)],
            "day string, v long")
        df.write.partitionBy("day").parquet(out)
        dropped = expire_partitions(out, "day", keep_from="2024-01-03")
        assert dropped == ["2024-01-01", "2024-01-02"]
        # Spark infers date-shaped partition values as dates; compare
        # as strings
        left = {str(r.day) for r in spark.read.parquet(out).collect()}
        assert left == {"2024-01-03", "2024-01-04", "2024-01-05"}
