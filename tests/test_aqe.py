"""Adaptive Query Execution evidence: the 100 TB claims lean on AQE
for runtime re-planning (skew-join splitting, partition coalescing,
join-strategy demotion). These tests pin that the engine's sessions
actually get those behaviors — not just that the configs are set."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_sort_merge_join(spark):
    """A hot key whose partition dwarfs the median must trigger
    OptimizeSkewedJoin under thresholds scaled to test data: the
    final adaptive plan reports the skew split (isSkew=true /
    skewed-partition annotation), and results equal the plain join.

    This is the path skew_split_join deliberately complements: AQE
    only splits SORT-MERGE joins, and only at join time — aggregation
    skew and broadcastable-hot-minority cases still need the explicit
    operators (salted_groupby_agg / skew_split_join)."""
    conf = spark.conf
    old = {k: conf.get(k) for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "20KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # forbid broadcast so the join stays sort-merge (the only
        # shape AQE's skew split handles)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        left = spark.range(60_000).select(
            F.when(F.col("id") % 10 == 0, F.lit(0))
            .otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pl"))
        right = spark.createDataFrame(
            [(i, f"r{i}") for i in range(0, 2000)], "k long, rv string")

        joined = left.join(right, "k")
        n = joined.toPandas().shape[0]
        # plain-join cardinality: hot key 0 has 6000 left rows x 1
        # right row; other matching keys (1..1999 excl. multiples of
        # 10) 1 x 1
        assert n == 6000 + sum(1 for i in range(1, 2000) if i % 10 != 0)

        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in final_plan
        assert "isSkew=true" in final_plan or "skewed" in final_plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE must collapse the 32 configured shuffle partitions of a
    tiny aggregate into few post-shuffle partitions
    (AQEShuffleRead coalesced) — the behavior that keeps
    small-dimension aggregates from scheduling 200 empty tasks at
    cluster scale."""
    conf = spark.conf
    old_en = conf.get("spark.sql.adaptive.enabled")
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        df = spark.range(1000).groupBy((F.col("id") % 5).alias("g")) \
            .agg(F.count("*").alias("n"))
        df.toPandas()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in plan and "coalesced" in plan
    finally:
        if old_en is None:
            conf.unset("spark.sql.adaptive.enabled")
        else:
            conf.set("spark.sql.adaptive.enabled", old_en)
