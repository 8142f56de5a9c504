"""Mergeable frequent-items sketch (Space-Saving / Misra-Gries).

Extension scope (no sketch surface in the reference; its aggregation
is exact SQL — etl_job.py:154-200): the heavy-hitters primitive the
exact ``top_tokens`` path can't provide at corpus scale. An exact
token top-k shuffles the ENTIRE vocabulary (every distinct token is a
shuffle row); the sketch shuffles at most ``k_counters`` rows per
partition — shuffle volume k·P, independent of vocabulary size — and
still guarantees every item with true frequency > N/k_counters
survives, with per-item error bounded by its ``err`` column
(count − err ≤ true ≤ count; Metwally et al., ICDT'05).

Two-level shape (the same partial/final discipline as Spark's own
aggregates):

1. PER PARTITION (``mapInPandas`` — the whole partition streams
   through one Python state, Arrow-batched): classic space-saving
   over ``k_counters`` counters, but fed batch VALUE COUNTS rather
   than raw tokens — each Arrow batch collapses to its distinct items
   first (weighted update, identical guarantee), so Python touches
   O(distinct-per-batch) values, not every row.
2. MERGE: union the partition summaries, sum (count, err) per item —
   the standard mergeable-summaries combine — then one
   TakeOrderedAndProject for the global top-k with a deterministic
   (count desc, item) tie-break.

When ``k_counters`` ≥ the distinct items a partition sees, no
eviction ever fires and the sketch IS the exact count (err = 0) —
the fixture-scale driver query runs in that regime, so it
hash-checks against the exact SQL oracle; the sub-k regime's
guarantee is property-tested separately (tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SUMMARY_SCHEMA = "item string, cnt bigint, err bigint"


def _space_saving_partition(k_counters: int, item_col: str):
    """Per-partition summarizer: dict of item -> [count, overcount]."""
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]):
        counters: dict[str, list[int]] = {}
        for pdf in batches:
            # collapse the batch to weighted distinct items; sorted so
            # the eviction sequence is deterministic per partition
            vc = pdf[item_col].value_counts().sort_index()
            for item, w in vc.items():
                w = int(w)
                if item in counters:
                    counters[item][0] += w
                elif len(counters) < k_counters:
                    counters[item] = [w, 0]
                else:
                    # evict the (count, item)-minimal counter; the
                    # newcomer inherits its count as overcount err
                    evict = min(counters, key=lambda i: (counters[i][0], i))
                    floor = counters.pop(evict)[0]
                    counters[item] = [floor + w, floor]
        yield pd.DataFrame(
            {"item": list(counters),
             "cnt": [c[0] for c in counters.values()],
             "err": [c[1] for c in counters.values()]})

    return summarize


def frequent_items(df: DataFrame, item_col: str,
                   k_counters: int = 256, top: int = 20) -> DataFrame:
    """Approximate top-``top`` items of ``item_col`` →
    (item, cnt, err) with cnt − err ≤ true-count ≤ cnt, every item
    whose true count exceeds N/``k_counters`` guaranteed present."""
    summaries = (
        df.select(F.col(item_col).cast("string").alias(item_col))
        .mapInPandas(_space_saving_partition(k_counters, item_col),
                     SUMMARY_SCHEMA)
    )
    return (
        summaries.groupBy("item")
        .agg(F.sum("cnt").alias("cnt"), F.sum("err").alias("err"))
        .orderBy(F.desc("cnt"), "item")
        .limit(top)
    )


def mg_merge(old: DataFrame, delta: DataFrame,
             k_counters: int = 256) -> DataFrame:
    """Misra-Gries REDUCE of two summaries → one bounded summary
    (item, cnt): sum counts per item, subtract the (k+1)-th largest,
    drop the non-positive. This is the mergeable-summaries result
    (Agarwal et al., PODS'12): merges may chain in ANY order/shape —
    micro-batch after micro-batch, tree-reduce across shards — and the
    bound composes: cnt is an UNDERestimate with
    true − N/(k+1) ≤ cnt ≤ true over the total N ever merged, so
    every item with true count > N/(k+1) is guaranteed present.

    (Counter-style vs frequent_items' (cnt, err) OVERestimate: the
    streaming maintenance path uses this form because subtraction
    makes truncation safe without tracking per-item error.)

    All DataFrame ops on SUMMARY-sized data (≤ k + batch-vocabulary
    rows): one sum-aggregate, one single-partition rank over the
    bounded summary — never over the stream."""
    summed = (
        old.unionByName(delta)
        .groupBy("item").agg(F.sum("cnt").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), "item")
    ranked = summed.withColumn("__r", F.row_number().over(w))
    cut = ranked.agg(
        F.max(F.when(F.col("__r") == k_counters + 1, F.col("cnt")))
        .alias("__cut"))
    return (
        ranked.crossJoin(F.broadcast(cut))
        .withColumn("cnt", F.col("cnt") - F.coalesce("__cut", F.lit(0)))
        .where(F.col("cnt") > 0)
        .select("item", "cnt")
    )
