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
from pyspark.sql import DataFrame, Window

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
    rows): one sum-aggregate, then the (k+1)-th-largest cut via
    ORDER BY … LIMIT k+1 — TakeOrderedAndProject, a per-partition
    top-(k+1) + driver-side merge of k+1-row heads, so even a
    stream-sized mistake in the input never funnels through one
    sorting partition (the r5 nit: the previous global rank window
    did). The cut is the min of that head when it holds exactly k+1
    rows (fewer means nothing to evict — cut 0)."""
    summed = (
        old.unionByName(delta)
        .groupBy("item").agg(F.sum("cnt").alias("cnt"))
    )
    head = summed.orderBy(F.desc("cnt"), "item").limit(k_counters + 1)
    cut = head.agg(
        F.when(F.count("*") == k_counters + 1, F.min("cnt"))
        .otherwise(F.lit(0)).alias("__cut"))
    return (
        summed.crossJoin(F.broadcast(cut))
        .withColumn("cnt", F.col("cnt") - F.col("__cut"))
        .where(F.col("cnt") > 0)
        .select("item", "cnt")
    )


def _cm_col(item, seed: int, width: int):
    """Cell column for one CM hash row: the md5 of ``seed|item``'s
    leading 32 bits mod width. md5 (not xxhash64) so the SAME sketch
    is constructible in any engine — the driver's DuckDB oracle
    rebuilds it bit-for-bit; swap in xxhash64 for pure-Spark speed."""
    return (
        F.conv(F.substring(F.md5(
            F.concat(F.lit(str(seed)), F.lit("|"), item)), 1, 8), 16, 10)
        .cast("long") % width
    )


def count_min_build(df: DataFrame, item_col: str,
                    depth: int = 3, width: int = 64) -> DataFrame:
    """Count-Min sketch as a relation: (i, col, cnt) — depth·width
    cells, built in ONE scan (each row explodes to its ``depth``
    cells, then a partial+final aggregate). Point estimates
    OVERcount: est(x) = min_i cell(i, h_i(x)) ≥ true(x), within
    ε·N with ε = e/width at δ = e^-depth. The third sketch tier:
    HLL/theta answer "how many distinct", Space-Saving answers
    "which are frequent", Count-Min answers "how often is THIS one"
    in O(depth·width) state regardless of vocabulary."""
    rows = F.array(*[
        F.struct(F.lit(i).alias("i"),
                 _cm_col(F.col(item_col), i, width).alias("col"))
        for i in range(depth)
    ])
    return (
        df.select(F.explode(rows).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(cm: DataFrame, probes: DataFrame, item_col: str,
                       depth: int = 3, width: int = 64) -> DataFrame:
    """Point-frequency estimates for ``probes[item_col]``: each probe
    expands to its ``depth`` cells, joins the (broadcastable,
    depth·width-row) sketch, and takes the per-item MIN — returns the
    probe columns + ``est_n``."""
    exploded = probes.select(
        "*",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("i"),
                     _cm_col(F.col(item_col), i, width).alias("col"))
            for i in range(depth)
        ])).alias("c"),
    ).select("*", F.col("c.i").alias("i"), F.col("c.col").alias("col"))
    return (
        exploded.join(F.broadcast(cm), ["i", "col"])
        .groupBy(*probes.columns)
        .agg(F.min("cnt").alias("est_n"))
    )


# --- distinct-count tier: HyperLogLog + KMV bottom-k -------------------------

HLL_M = 256          # 2^8 buckets: ~6.5% std error — fixture-appropriate
HLL_W = 25           # max rho over the 24-bit suffix (+1 for all-zero)
# alpha_m * m^2 * 2^W as ONE Python-computed double literal, embedded
# identically in the Spark plan and the SQL oracle so the final
# floor-divide is engine-identical (no repeated float arithmetic)
HLL_NUMERATOR = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * (1 << HLL_W)
KMV_K = 64           # bottom-k size: ~12.5% std error
KMV_BITS = 52        # 13 md5 hex chars; (k-1)*2^52 stays inside BIGINT


def _hll_bucket_rho(item):
    """(bucket, rho) for one item from the leading 32 bits of its md5
    — reproducible in ANY engine (the _cm_col md5 trick applied to
    HLL): bucket = top 8 bits; rho = leading-zero count of the 24-bit
    suffix + 1, clamped to HLL_W for the all-zero suffix. The
    leading-zero count is pure STRING arithmetic on the hex form
    (zero-prefix length x 4 + a 4-way CASE on the first nonzero hex
    digit) — no float log2, whose half-ulp at exact powers of two
    would flip registers between libm implementations."""
    hex8 = F.substring(F.md5(item), 1, 8)
    bucket = F.conv(F.substring(hex8, 1, 2), 16, 10).cast("int")
    suffix = F.substring(hex8, 3, 6)
    lzhex = F.length(F.regexp_extract(suffix, r"^(0*)", 1))
    d = F.conv(F.substr(suffix, lzhex + 1, F.lit(1)), 16, 10).cast("int")
    bitlen = (F.when(d >= 8, 4).when(d >= 4, 3)
              .when(d >= 2, 2).otherwise(1))
    rho = F.when(lzhex == 6, F.lit(HLL_W)).otherwise(
        4 * lzhex + (4 - bitlen) + 1)
    return bucket, rho


def hll_estimate(df: DataFrame, item_col: str,
                 group_cols: Sequence[str] = ()) -> DataFrame:
    """HyperLogLog distinct-count estimate per group, built so an SQL
    oracle reproduces it BIT-IDENTICALLY: registers are (bucket,
    max rho) — max is association-free — and the harmonic mean runs
    in SCALED INTEGERS (sum of 2^(W - rho) as BIGINT, absent buckets
    contributing 2^W each), so the only float op is one final
    constant/integer divide. Raw Flajolet et al. estimate, no small/
    large-range corrections (both engines apply the same formula, so
    parity holds regardless; accuracy is pinned loosely vs the exact
    count in the checked query). State is m registers per group —
    the 'how many distinct' tier beside Space-Saving ('which are
    frequent') and Count-Min ('how often is this one')."""
    gcols = list(group_cols)
    bucket, rho = _hll_bucket_rho(F.col(item_col))
    regs = (
        df.select(*gcols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*gcols, "__b")
        .agg(F.max("__rho").alias("__r"))
    )
    return hll_estimate_from_registers(regs, gcols)


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: Sequence[str] = (),
                                bucket_col: str = "__b",
                                rho_col: str = "__r") -> DataFrame:
    """Apply the estimate formula to a stored (group, bucket, max-rho)
    register relation — the consumer half of the streaming register
    maintenance (pipeline_stream.stream_distinct_registers): registers
    MAX-merge forever; the estimate is recomputable from them at any
    time."""
    gcols = list(group_cols)
    regs = regs.select(*gcols, F.col(bucket_col).alias("__b"),
                       F.col(rho_col).alias("__r"))
    scaled = F.expr(f"shiftleft(1L, {HLL_W} - __r)")
    agg = (
        regs.groupBy(*gcols)
        .agg(
            (F.sum(scaled)
             + (F.lit(HLL_M) - F.count("*"))
             * F.lit(1 << HLL_W).cast("long")).alias("__s"),
            (F.lit(HLL_M) - F.count("*")).alias("__v"),  # empty buckets
        )
    )
    raw = F.floor(F.lit(HLL_NUMERATOR) / F.col("__s"))
    # Flajolet small-range correction: LinearCounting on the empty-
    # bucket count when raw <= 2.5m (raw HLL overestimates badly for
    # n << m — the fixture's 31-token vocabularies hit exactly this).
    # ln runs on an exact integer ratio computed identically on both
    # engines; a cross-libm 1-ulp log delta could only flip the floor
    # if m*ln(m/V) sat within ~1e-13 of an integer — none of the 256
    # possible V values do.
    lin = F.floor(F.lit(float(HLL_M))
                  * F.log(F.lit(float(HLL_M)) / F.col("__v")))
    est = F.when((raw <= 2.5 * HLL_M) & (F.col("__v") > 0), lin) \
        .otherwise(raw)
    return agg.select(*gcols, est.cast("long").alias("hll_est"))


def kmv_estimate(df: DataFrame, item_col: str,
                 group_cols: Sequence[str] = ()) -> DataFrame:
    """KMV (bottom-k / k-minimum-values) distinct-count estimate per
    group: over the DISTINCT 52-bit md5-derived hashes, the k-th
    smallest h_k gives est = (k-1)*2^52 div h_k (Bar-Yossef et al.'s
    unbiased form) — pure integer arithmetic end to end, so any
    engine agrees exactly. Groups with fewer than k distinct hashes
    return the exact distinct count (the sketch IS the distinct set
    there). Doubles as a deterministic uniform sample of the distinct
    domain (the bottom-k hash set)."""
    gcols = list(group_cols)
    h = F.conv(F.substring(F.md5(F.col(item_col)), 1, 13), 16, 10) \
        .cast("long")
    hashes = df.select(*gcols, h.alias("__h")).distinct()
    w = Window.partitionBy(*gcols).orderBy("__h")
    ranked = hashes.select(
        *gcols, "__h", F.row_number().over(w).alias("__rn"))
    per_group = (
        ranked.groupBy(*gcols)
        .agg(F.max(F.when(F.col("__rn") == KMV_K, F.col("__h")))
             .alias("__hk"),
             F.count("*").alias("__nd"))
    )
    est = F.when(
        F.col("__nd") < KMV_K, F.col("__nd")
    ).otherwise(F.expr(f"({KMV_K} - 1) * {1 << KMV_BITS}L div __hk"))
    return per_group.select(*gcols, est.cast("long").alias("kmv_est"))


# --- membership tier: Bloom filter -------------------------------------------

BLOOM_BITS = 32768   # 2^15-bit space
BLOOM_D = 3          # hash rows (reuses the count-min md5 cells)


def bloom_build(df: DataFrame, item_col: str,
                m_bits: int = BLOOM_BITS, depth: int = BLOOM_D) -> DataFrame:
    """Bloom filter as a relation of SET BIT positions: each item
    lights ``depth`` md5-derived positions (the count-min ``_cm_col``
    hash rows aimed at one shared bit space), distinct-collapsed.
    ≤ depth·|items| rows, broadcastable — membership probes become a
    map-side broadcast join instead of a shuffle semi-join, the
    standard pre-filter in front of an exact join at scale (false
    positives possible at rate ~(1-e^(-dn/m))^d, false negatives
    impossible). md5 keeps the filter reconstructible bit-for-bit in
    any engine, so probes hash-check INCLUDING their false positives.
    At 100 TB the relation packs into m/64 BIGINT words via
    ``bit_or(shiftleft(1, pos % 64))`` grouped by word — same
    semantics, denser broadcast; the relation form is kept here for
    oracle parity."""
    positions = F.explode(F.array(*[
        _cm_col(F.col(item_col), i, m_bits) for i in range(depth)
    ]))
    return df.select(positions.alias("pos")).distinct()


def bloom_probe(bloom: DataFrame, probes: DataFrame, item_col: str,
                m_bits: int = BLOOM_BITS, depth: int = BLOOM_D) -> DataFrame:
    """Membership verdict per probe row: an item MAY be in the built
    set iff all ``depth`` of its positions are set. Returns the probe
    columns + boolean ``bloom_hit``. The bloom side broadcasts."""
    exploded = probes.select(
        "*",
        F.explode(F.array(*[
            _cm_col(F.col(item_col), i, m_bits) for i in range(depth)
        ])).alias("pos"),
    )
    return (
        exploded.join(F.broadcast(bloom.withColumn("__set", F.lit(1))),
                      "pos", "left")
        .groupBy(*probes.columns)
        .agg((F.sum(F.coalesce(F.col("__set"), F.lit(0))) == depth)
             .alias("bloom_hit"))
    )


def quantiles_from_histogram(hist: DataFrame, group_cols: list[str],
                             bin_width: int,
                             permilles: list[int]) -> DataFrame:
    """Rank queries answered from a SUM-mergeable integer histogram —
    the reusable half of the `quantile_histogram_estimates` checked
    query, factored out so every histogram producer (the batch
    aggregate, `streaming_value_histogram`'s maintained state, a
    union of per-shard partials) serves quantiles through ONE
    implementation.

    ``hist`` carries (group_cols..., bin, n) where bin = unit-value
    div ``bin_width`` (clamping, if any, happened at build time).
    For each permille p: target rank = ceil(p·total/1000), the
    crossing bin is located on the cumulative counts, and the
    estimate interpolates INSIDE the bin with pure integer division
    — engine-identical, association-free, exactly the discipline of
    the checked query. Returns (group_cols..., permille, n_values,
    est_units). Estimate error ≤ bin_width per query; the histogram
    is the only state, so partials from disjoint shards merge by
    summing n per (group, bin) — the property the mergeability test
    pins."""
    spark = hist.sparkSession
    gp = [F.col(c) for c in group_cols]
    wcum = (Window.partitionBy(*group_cols).orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy(*group_cols)
    cum = hist.select(
        *gp, "bin", "n",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(wall).alias("total"),
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in permilles])).alias("p"))
    need = F.expr("(p * total + 999) div 1000")
    return (
        cum.crossJoin(F.broadcast(grid))
        .where((F.col("c") >= need) & (F.col("c") - F.col("n") < need))
        .groupBy(*group_cols, F.col("p").alias("permille"))
        .agg(
            F.min("total").alias("n_values"),
            (F.min("bin") * bin_width
             + F.expr(f"({bin_width} * ((permille * min(total) + 999) "
                      f"div 1000 - (min(c) - min(n)))) div min(n)"))
            .alias("est_units"),
        )
    )
