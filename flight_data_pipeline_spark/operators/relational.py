"""Relational operator library (SURVEY.md §2.6-2.8 superset).

Equi/semi/anti/outer joins, set ops, and rollups are vanilla
DataFrame calls left to Catalyst (sort-merge vs broadcast-hash chosen
by stats + AQE). This module adds the two compositions Spark SQL
lacks natively:

- **as-of join** (J2 generalized, SURVEY.md §7.3): nearest
  right-row with ``right.ts <= left.ts`` per key. Implemented as
  union + last(ignorenulls) over one event-time sort — a single
  shuffle on the key, no range-explosion cross join, no per-key
  driver loop. This is the standard distributed as-of pattern and
  scales linearly with input (each partition sorts once).

- **join helpers** that pin broadcast for dimension tables the
  planner can't always size (e.g. freshly-derived tiny frames).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flight_data_pipeline_spark.functions.scalars import to_epoch_seconds


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: Sequence[str], suffix: str = "_asof",
              strict: bool = False) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[on] <= left[on]`` (or ``<`` when ``strict``) within the
    same ``by`` group.

    Plan shape: union the two sides tagged by origin, shuffle once on
    ``by``, sort by event time within partitions, and carry the last
    seen right-side values forward with last(ignorenulls) — then keep
    only left rows. At 100 TB this is one exchange + one sort,
    versus the quadratic blowup of a naive range join.

    Ties on ``on``: non-strict joins see a right row occurring at the
    left row's exact timestamp (right sorts first via the origin tag);
    among right rows sharing a timestamp the last in ``right_cols[0]``
    order wins deterministically.
    """
    lcols = left.columns
    tag = "__is_left"
    seq = "__seq"

    r = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn(tag, F.lit(1 if strict else 0))
    l = left.withColumn(tag, F.lit(0 if strict else 1))

    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows order before left rows at equal ts (inclusive join);
    # strict flips the tag so equal-ts right rows sort after
    order = Window.partitionBy(by).orderBy(
        F.col(on).asc(), F.col(tag).asc(),
        F.col(f"{right_cols[0]}{suffix}").asc_nulls_first(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(order).alias(f"{c}__c")
            for c in right_cols
        ],
    )
    is_left_row = F.col(tag) == (0 if strict else 1)
    return (
        carried.where(is_left_row & F.col(lcols[0]).isNotNull())
        .select(*lcols, *[F.col(f"{c}__c").alias(f"{c}{suffix}") for c in right_cols])
    )


def range_join_binned(left: DataFrame, right: DataFrame,
                      key_cols: Sequence[str], left_ts: str, right_ts: str,
                      lower_sec: int, upper_sec: int, bin_sec: int,
                      how: str = "inner",
                      left_unique: Sequence[str] | None = None) -> DataFrame:
    """Time-range join — ``right[right_ts] ∈ [left[left_ts]+lower,
    left[left_ts]+upper)`` per key — as an EQUI-join on (key, time
    bin), never a non-equi join.

    A naive range join is a BroadcastNestedLoopJoin/Cartesian in
    Spark (quadratic, the forbidden plan in tests/test_plans.py). The
    binned form: the right side maps each row to its ``bin_sec``
    bucket; the left side explodes to the (few) buckets its window
    spans; both shuffle once on (key, bin); the exact range predicate
    filters inside the hash join. Each right row carries a single
    bin, so a (left,right) match appears exactly once — no post-join
    dedup. Fan-out per left row = window/bin_sec + 1 (pick bin_sec ≈
    the window width). With ``how="left"`` unmatched left rows survive
    with null right columns (aggregate with count(right_id) → 0);
    pass ``left_unique`` (a non-null unique key of ``left`` whose
    names don't collide with ``right``'s) to skip the derived-row-id
    pass the left path otherwise needs.

    This is the standard interval-join decomposition (Flink's interval
    join and Spark's own stream-stream time-bound joins bucket state
    the same way) expressed for batch.

    Sub-second semantics: the exact range predicate compares the
    ORIGINAL timestamp columns with interval arithmetic (µs-exact) —
    whole-second truncation is used only for bin ASSIGNMENT, where it
    is safe because bins only need to cover. Coverage with fractional
    left timestamps needs the bin range widened to
    floor((⌊l⌋+upper)/bin): a right row at l+upper−ε can truncate to
    ⌊l⌋+upper when l has a fractional part (ADVICE r2 — the old
    upper−1 end silently dropped such matches). Costs at most one
    extra bin per left row. Both ts columns must be TIMESTAMP typed.
    """
    # to_epoch_seconds handles LTZ and NTZ inputs alike (truncation
    # toward −∞ for epochs ≥ 0)
    if how == "left":
        # True row-level LEFT semantics: the bin explode duplicates
        # each left row across its spanned bins, so a naive left join
        # yields one null-match row PER BIN for unmatched lefts
        # (caught by tests/test_properties.py::
        # test_range_join_binned_left_keeps_unmatched). Instead: tag
        # left rows with a DETERMINISTIC id, inner-join the exploded
        # form, and re-attach matches to the original unexploded left
        # — unmatched rows survive exactly once with null right
        # columns. The id must be a pure function of row content, not
        # monotonically_increasing_id: the tagged frame feeds TWO plan
        # branches, and a nondeterministic id recomputed after lost
        # partitions (localCheckpoint is non-reliable) would disagree
        # between branches, silently duplicating or dropping left rows
        # (ADVICE r5). Callers that can declare a unique left key
        # (``left_unique``) get the id for free; otherwise a
        # duplicate-rank window over the full row plus two independent
        # 64-bit content hashes (128 bits — collision-safe at 1e10+
        # rows) builds one, costing one extra all-columns shuffle.
        if left_unique:
            id_cols = list(left_unique)
            lid = left
        else:
            id_cols = ["__lh1", "__lh2", "__lr"]
            all_cols = [F.col(c) for c in left.columns]
            rank = F.row_number().over(
                Window.partitionBy(*left.columns).orderBy(F.lit(1)))
            lid = (
                left.withColumn("__lr", rank)
                .withColumn("__lh1",
                            F.xxhash64(F.struct(*all_cols), F.col("__lr")))
                .withColumn("__lh2",
                            F.xxhash64(F.col("__lr"), F.lit(-711),
                                       F.struct(*all_cols)))
            )
        lsec = to_epoch_seconds(F.col(left_ts))
        rsec = to_epoch_seconds(F.col(right_ts))
        le = lid.withColumn(
            "__bin",
            F.explode(F.sequence(F.floor((lsec + lower_sec) / bin_sec),
                                 F.floor((lsec + upper_sec) / bin_sec))),
        ).alias("__L")
        re = right.withColumn("__bin", F.floor(rsec / bin_sec)).alias("__R")
        cond = F.col("__L.__bin") == F.col("__R.__bin")
        for k in key_cols:
            cond = cond & (F.col(f"__L.{k}") == F.col(f"__R.{k}"))
        lo = F.make_interval(secs=F.lit(lower_sec))
        hi = F.make_interval(secs=F.lit(upper_sec))
        cond = (cond
                & (F.col(f"__R.{right_ts}")
                   >= F.col(f"__L.{left_ts}") + lo)
                & (F.col(f"__R.{right_ts}")
                   < F.col(f"__L.{left_ts}") + hi))
        rhs = (
            le.join(re, cond, "inner")
            .select(*[F.col(f"__L.{c}").alias(c) for c in id_cols],
                    *[F.col(f"__R.{c}") for c in right.columns])
        )
        out = lid.join(rhs, id_cols, "left")
        return out.drop("__lh1", "__lh2", "__lr") if not left_unique else out
    lsec = to_epoch_seconds(F.col(left_ts))
    rsec = to_epoch_seconds(F.col(right_ts))
    l = left.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor((lsec + lower_sec) / bin_sec),
                             F.floor((lsec + upper_sec) / bin_sec))),
    ).alias("__L")
    r = right.withColumn("__bin", F.floor(rsec / bin_sec)).alias("__R")
    cond = F.col("__L.__bin") == F.col("__R.__bin")
    for k in key_cols:
        cond = cond & (F.col(f"__L.{k}") == F.col(f"__R.{k}"))
    lo = F.make_interval(secs=F.lit(lower_sec))
    hi = F.make_interval(secs=F.lit(upper_sec))
    cond = cond & (F.col(f"__R.{right_ts}") >= F.col(f"__L.{left_ts}") + lo) \
                & (F.col(f"__R.{right_ts}") < F.col(f"__L.{left_ts}") + hi)
    return l.join(r, cond, how).drop("__bin")


def merge_upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str],
                 action_col: str | None = None) -> DataFrame:
    """MERGE (upsert): rows in ``updates`` overwrite matching ``keys``
    rows in ``base``, unmatched update rows insert, untouched base
    rows carry through — the batch generalization of the reference's
    idempotent hour-dedup append (etl_job.py:226-237 skips the write
    when the key exists; MERGE replaces instead), and the engine-side
    twin of Delta/Iceberg ``MERGE INTO`` merge-on-read.

    Semantics: both frames must share the schema. On matched keys the
    update row's value wins EVEN WHEN NULL (presence-flag selection,
    not coalesce — ``coalesce(u.c, b.c)`` would silently resurrect the
    old value when an update nulls a field). ``action_col`` optionally
    appends 'insert' / 'update' / 'carry' per row for audit counts.

    Plan shape: one full-outer equi-join on ``keys`` — each side
    shuffles once on the key. A full outer join has no broadcast form
    in Spark (both sides must see all keys), so at 100 TB this is a
    sort-merge join; co-locate it with the bucketed layout
    (operators/bucketing.py) to delete both exchanges on reruns, and
    partition-prune the base side to the touched partitions (the
    dynamic-partition-overwrite rerun path) so the join reads only the
    slice the updates can hit.
    """
    keys = list(keys)
    val_cols = [c for c in base.columns if c not in keys]
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in val_cols],
    ).withColumn("__u_present", F.lit(1))
    b = base.withColumn("__b_present", F.lit(1))
    upd = F.col("__u_present").isNotNull()
    joined = b.join(u, keys, "full_outer")
    out = joined.select(
        *keys,
        *[
            F.when(upd, F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            for c in val_cols
        ],
        *(
            [
                F.when(~upd, F.lit("carry"))
                .when(F.col("__b_present").isNull(), F.lit("insert"))
                .otherwise(F.lit("update"))
                .alias(action_col)
            ]
            if action_col
            else []
        ),
    )
    return out


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  compare_cols: Sequence[str],
                  action_col: str = "action") -> DataFrame:
    """Change-data derivation between two table snapshots: one
    full-outer equi-join on ``keys`` classifying every key as
    'insert' (new only), 'delete' (old only), or 'update' (present in
    both with any ``compare_cols`` value differing, null-safely) —
    unchanged rows drop out. Emits the NEW values (old values for
    deletes) plus the action tag: the feed a downstream consumer
    replays to converge on the new snapshot (Delta CDF computed from
    plain tables).

    Plan: the same single-shuffle-per-side full-outer shape as
    merge_upsert — snapshot_diff is its inverse (merge applies a
    change set; diff recovers one). At scale, partition-prune both
    snapshots to the window that can differ before diffing.
    """
    keys = list(keys)
    o = old.select(
        *keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols]
    ).withColumn("__o_present", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols]
    ).withColumn("__n_present", F.lit(1))
    joined = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    action = (
        F.when(F.col("__o_present").isNull(), "insert")
        .when(F.col("__n_present").isNull(), "delete")
        .when(changed, "update")
    )
    return (
        joined.withColumn(action_col, action)
        .where(F.col(action_col).isNotNull())
        .select(
            *keys,
            *[
                F.when(F.col(action_col) == "delete", F.col(f"__o_{c}"))
                .otherwise(F.col(f"__n_{c}")).alias(c)
                for c in compare_cols
            ],
            action_col,
        )
    )


FINGERPRINT_MOD = 1_000_000_007


def table_fingerprint(df: DataFrame, cols: Sequence[Column],
                      group_by: Sequence[str] = ()) -> DataFrame:
    """Order-insensitive content fingerprint of a table (optionally
    per group): md5 each row's canonical string, keep 48 bits, reduce
    per-row mod a prime, SUM — two frames with equal fingerprints and
    counts are (overwhelmingly likely) row-for-row equal regardless of
    order or partitioning. The migration-validation primitive: run it
    on the source system and the Spark copy and compare one number
    per group, instead of shipping either table anywhere.

    Portability contract: ``cols`` must already be ENGINE-STABLE
    strings (ints/ISO dates stringify identically everywhere; floats
    do NOT — encode them first, e.g. a cents bigint). md5 is
    bit-identical across engines, unlike xxhash64/Spark ``hash``. The
    mod keeps the 48-bit terms summable in a BIGINT to ~10^9 rows per
    group; beyond that, re-reduce partial sums mod p (the sum of
    residues is itself a residue stream).

    Plan: one map-side expression pass + one (grouped or global)
    SUM — partial aggregation combines map-side, the shuffle carries
    one row per group.
    """
    key = F.concat_ws("|", *cols)
    term = (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
        % FINGERPRINT_MOD
    )
    aggs = [F.count("*").alias("n_rows"),
            F.sum(term).alias("fingerprint")]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def combine_partial_aggs(base: DataFrame, delta: DataFrame,
                         keys: Sequence[str],
                         agg_cols: Sequence[str]) -> DataFrame:
    """Incremental materialized-view maintenance for decomposable
    aggregates: merge a precomputed per-key aggregate (``base``, the
    materialized view) with the same aggregate over a delta batch by
    SUMMING partials per key — never rescanning the base fact table.
    ``agg_cols`` are additive partials (count, sum; avg = sum/count
    composed by the caller; min/max work for inserts-only deltas).

    Plan: one full-outer equi-join on ``keys`` between two frames
    sized by KEY CARDINALITY, not fact rows — at 100 TB the view and
    the delta aggregate are both tiny next to the facts, which this
    path never reads. Missing-side partials coalesce to 0, so
    new-key and untouched-key rows both fall out of the same
    expression.
    """
    keys = list(keys)
    d = delta.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in agg_cols])
    return (
        base.join(d, keys, "full_outer")
        .select(
            *keys,
            *[
                (F.coalesce(F.col(c), F.lit(0))
                 + F.coalesce(F.col(f"__d_{c}"), F.lit(0))).alias(c)
                for c in agg_cols
            ],
        )
    )


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS (etl_job.py:226-232's probe shape as a relational op)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — the dedup primitive D1 (etl_job.py:226-237)."""
    return left.join(right, on=on, how="left_anti")


def broadcast_join(big: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Equi-join with the dimension side pinned broadcast — use when
    the dim is known-small but statistics can't prove it (derived
    frames, post-filter dims). Avoids shuffling the big side."""
    return big.join(F.broadcast(dim), on=on, how=how)


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """ORDER BY ... LIMIT k — Catalyst compiles to
    TakeOrderedAndProject (per-partition heaps; no global sort).
    ``order`` must end in a unique column for deterministic output."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order: Sequence[Column], k: int = 1,
                    rank_col: str = "rn") -> DataFrame:
    """Grouped top-k via row_number window — one shuffle on the group
    key; rank is computed streaming, only k rows survive per group."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def salted_groupby_agg(df: DataFrame, key_cols: Sequence[str],
                       aggs: dict[str, tuple[str, str]],
                       salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    Phase 1 groups on (key, salt) where salt = hash(whole row) % N —
    a hot key's rows spread over N reducers instead of one; phase 2
    re-aggregates the N partials per key. ``aggs`` maps output column
    → (input column, func) for the decomposable aggregates sum/count/
    min/max (avg = sum+count composed by the caller).

    Use when one key dominates (power-law producers: one hot user_id/
    token/tenant) and AQE's skew handling can't help because the skew
    is in an aggregate, not a join. Costs one extra (tiny) shuffle of
    N·|keys| partial rows.
    """
    import pyspark.sql.functions as F

    first_phase = {
        "sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
    }
    second_phase = {  # how partials combine
        "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
    }
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets)
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[first_phase[fn](col).alias(out)
               for out, (col, fn) in aggs.items()])
    )
    return (
        partial.groupBy(*key_cols)
        .agg(*[second_phase[fn](out).alias(out)
               for out, (col, fn) in aggs.items()])
    )


def salted_join(skewed: DataFrame, small: DataFrame, on: str,
                salt_buckets: int = 8) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side's key, explode the
    small side across all salt values, join on (key, salt).

    The hot key's rows land on ``salt_buckets`` reducers instead of
    one; the small side is replicated ×N (fine — it's small). Prefer
    AQE's automatic skew-join split when it applies (sort-merge joins
    over statistics it can see); this is the manual fallback for
    deliberate repartitioning or non-SMJ plans.
    """
    import pyspark.sql.functions as F

    salted_big = skewed.withColumn(
        "__salt",
        (F.abs(F.xxhash64(*[F.col(c) for c in skewed.columns])) % salt_buckets),
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_big.join(replicated, on=[on, "__salt"]).drop("__salt")


def skew_split_join(left: DataFrame, right: DataFrame, on: str,
                    hot_threshold: int, how: str = "inner",
                    right_hot_max: int | None = None) -> DataFrame:
    """Two-path skew join for LARGE ⋈ LARGE with a hot-key minority —
    the case salted_join (small right side) and AQE's SMJ skew split
    don't cover: keys whose LEFT-side frequency exceeds
    ``hot_threshold`` take a broadcast path (the right side's slice
    for those keys broadcasts — small precisely because hot keys are
    few), every other key takes the ordinary shuffle join; the union
    is EXACTLY the plain join because the key space partitions into
    hot/cold and cross terms are empty by construction.

    Hot-key detection is an aggregation broadcast back as semi/anti
    filters — never a driver collect, so the operator stays a single
    declarative plan Catalyst can see through. ``how`` supports
    "inner" and "left" (each left row lives in exactly one path, so
    LEFT semantics union cleanly; full/right outer would need
    right-side path bookkeeping and is deliberately not offered).

    At 100 TB: the shuffle path stops spilling on the hot reducers
    (they no longer exist there), and the broadcast path turns the
    hot keys' quadratic-ish reducer into a map-side hash probe. The
    threshold is rows-per-key on the LEFT; pick it near the point
    where one key's rows stop fitting a single reducer comfortably.

    Two scale guards (ADVICE r5):
    - ``hot`` is materialized once (eager localCheckpoint of a
      keys-above-threshold frame — summary-sized by construction)
      instead of re-deriving the full left scan+aggregate under each
      of the four semi/anti branches; recompute after a lost
      partition is harmless because the content is deterministic.
    - ``broadcast(right_hot)`` is unbounded when a key is hot on BOTH
      sides. Pass ``right_hot_max`` to exclude keys whose right-side
      count exceeds it from the hot set — they fall back to the
      shuffle path (correct by the same partition argument; their
      skew is then AQE's to handle), at the cost of one extra
      keys-only aggregate over ``right``. Default None keeps the
      single-pass plan for the common dim-like-right case.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports inner/left, got {how!r}")
    import pyspark.sql.functions as F

    hot = (
        left.groupBy(on).agg(F.count("*").alias("__n"))
        .where(F.col("__n") > hot_threshold)
        .select(on)
    )
    if right_hot_max is not None:
        rcnt = right.groupBy(on).agg(F.count("*").alias("__nr"))
        hot = (
            hot.join(rcnt, on, "left")
            .where(F.coalesce(F.col("__nr"), F.lit(0)) <= right_hot_max)
            .select(on)
        )
    hot = hot.localCheckpoint(eager=True)
    left_hot = left.join(F.broadcast(hot), on, "left_semi")
    left_cold = left.join(F.broadcast(hot), on, "left_anti")
    right_hot = right.join(F.broadcast(hot), on, "left_semi")
    right_cold = right.join(F.broadcast(hot), on, "left_anti")
    return (
        left_cold.join(right_cold, on, how)
        .unionByName(left_hot.join(F.broadcast(right_hot), on, how))
    )


def assign_contiguous_ids(df: DataFrame, id_col: str = "row_id",
                          order_within_partition: Sequence[str] = ()
                          ) -> DataFrame:
    """Contiguous 0..n−1 64-bit row ids without a global sort — the
    engine's stand-in for the reference's BIGSERIAL surrogate keys
    (reference schema README.md:171-195: `id BIGSERIAL PRIMARY KEY`;
    SURVEY §7.3 flags `monotonically_increasing_id` as non-contiguous).

    Plan shape (all in-plan, nothing collected): the default path
    decomposes ``monotonically_increasing_id`` — documented as
    ``partition_id << 33 | row-index-within-partition`` with the low
    bits contiguous from 0 — into (pid, local index), aggregates
    per-partition counts (shuffle cardinality = partition count, not
    row count), turns their running sum into per-partition offsets,
    and broadcast-joins the offsets back: the DATA never crosses an
    exchange. With ``order_within_partition`` the local index instead
    comes from a row_number window partitioned by
    ``spark_partition_id`` — that costs one hash shuffle on the
    partition id (load-shaped like the input, never a single task,
    unlike `row_number() OVER (ORDER BY …)` which funnels 100 TB
    through one partition).

    Like BIGSERIAL, assignment order is an implementation detail: ids
    depend on the physical partitioning (stable for a deterministic
    plan, not across repartitionings). Pass ``order_within_partition``
    to fix intra-partition order by data columns."""
    if order_within_partition:
        part = df.withColumn("__pid", F.spark_partition_id())
        w = Window.partitionBy("__pid").orderBy(
            *[F.col(c) for c in order_within_partition])
        local = part.withColumn("__rn", F.row_number().over(w) - 1)
    else:
        mid = F.monotonically_increasing_id()
        local = (df.withColumn("__mid", mid)
                 .withColumn("__pid", F.shiftrightunsigned("__mid", 33))
                 .withColumn("__rn", F.col("__mid").bitwiseAND((1 << 33) - 1))
                 .drop("__mid"))
    offsets = (
        local.groupBy("__pid").agg(F.count("*").alias("__n"))
        .withColumn(
            "__offset",
            F.sum("__n").over(
                Window.orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("__pid", F.coalesce("__offset", F.lit(0)).alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, (F.col("__offset") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__offset")
    )


def prorate_largest_remainder(df: DataFrame, key: str, total_col: str,
                              weight_col: str, tiebreak_col: str) -> DataFrame:
    """Largest-remainder (Hamilton) proration: split each ``key``
    group's ``total_col`` (an exact integer, e.g. cents) across its
    rows proportionally to ``weight_col`` (exact integer weights),
    with NO lost units: floor allocations ``(total*w) div sum_w``
    first, then the leftover ``total - sum(floors)`` units (always
    0 <= r < n_rows) go one unit each to the rows with the largest
    division remainders, ties broken by ``tiebreak_col``. Adds
    ``alloc_c`` (the row's allocation) and ``bumped`` (1 if the row
    received a remainder unit). Sum(alloc_c) == total per group by
    construction — the reconciliation-grade invariant float proration
    cannot give (property-tested against a serial Python oracle in
    tests/test_properties.py).

    Plan shape: every window (group sum, remainder rank, residual)
    partitions on ``key``, so Spark shuffles once and reuses the
    exchange; cost is one sort of the group's rows. Assumes
    weights >= 0 with a positive group sum (a zero-weight-sum group
    would divide by zero — callers filter empty/degenerate groups)."""
    w_grp = Window.partitionBy(key)
    sized = (
        df.withColumn("__sum_w", F.sum(weight_col).over(w_grp))
        .withColumn("__prod", F.col(total_col) * F.col(weight_col))
    )
    flo = (
        sized.withColumn("__alloc_floor",
                         F.expr(f"__prod div __sum_w"))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    (F.col("__prod") % F.col("__sum_w")).desc(),
                    tiebreak_col)),
        )
    )
    resid = flo.withColumn(
        "__residual",
        F.col(total_col) - F.sum("__alloc_floor").over(w_grp))
    bump = (F.col("__rk") <= F.col("__residual")).cast("long")
    return (
        resid.withColumn("alloc_c", F.col("__alloc_floor") + bump)
        .withColumn("bumped", bump)
        .drop("__sum_w", "__prod", "__alloc_floor", "__rk", "__residual")
    )
