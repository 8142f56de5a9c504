"""Stratified sampling / source mixing (extension scope: the
data-mixing step of training-data pipelines — re-weighting a corpus
toward target source/language proportions).

Map-side only: ``sampleBy`` is per-row Bernoulli against a seeded
hash, so sampling 100 TB is one scan with zero shuffle. The weight →
fraction conversion is a pure-Python helper fed by a prior audit
aggregate (per-stratum counts), keeping the no-driver-collect
discipline: counting is its own (tiny) query, not a hidden action
inside the operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample: keep each row of stratum s with
    probability fractions[s] (strata absent from the dict are
    dropped — the reject-a-source case of mixing). Deterministic via
    seed *for a fixed partitioning*: ``sampleBy`` draws from a
    per-partition RNG, so a repartition (or a different input split
    at another scale factor) yields a DIFFERENT sample of the same
    distribution. Use :func:`stratified_sample_hash` when the sample
    must be a pure function of the data — reruns, backfills, and
    cross-engine checks."""
    return df.sampleBy(strata_col, fractions, seed)


def hash_slot(key: Column, seed: str, buckets: int = 1000) -> Column:
    """Deterministic per-row slot in [0, buckets): the first 8 hex
    digits of md5(seed|key) reduced mod buckets — the same keyed-hash
    rank the bottom-k reservoir uses, coarsened to a bucket id. Pure
    column expression (JVM md5, whole-stage codegen), replayable
    verbatim by any engine with md5()."""
    return (
        F.conv(F.substring(F.md5(
            F.concat(F.lit(seed + "|"), key.cast("string"))), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def stratified_sample_hash(df: DataFrame, strata_col: str,
                           permille: dict, key_col: str,
                           seed: str = "ss") -> DataFrame:
    """Per-stratum sampling as a KEYED-HASH GATE: keep a row of
    stratum s iff hash_slot(key) < permille[s] (strata absent from
    the dict drop — the reject-a-source case of mixing). Unlike
    ``sampleBy``'s per-partition RNG, the decision is a pure function
    of (seed, key, stratum): stable under repartitioning, executor
    count, and reruns — the idempotent-backfill property every other
    sink in this repo guarantees, extended to sampling. Two engines
    replaying the same md5 arithmetic produce the IDENTICAL sample,
    which is what promotes the sampling query to hash-checked.

    Scale shape: map-side only — one hash + one broadcast-literal map
    lookup per row, no shuffle, no state. Correlated sampling comes
    free: the same (seed, key) gate applied to another table yields
    the matching rows (sample docs and their chunks consistently)."""
    lookup = F.create_map(*[
        lit for s, p in permille.items()
        for lit in (F.lit(s), F.lit(int(p)))
    ])
    slot = hash_slot(F.col(key_col), seed)
    return df.where(slot < lookup[F.col(strata_col)])


def temperature_weights(counts: dict, alpha: float) -> dict:
    """Temperature-scaled mixture weights: w_s ∝ counts[s]**alpha,
    normalized to sum 1 — the standard multilingual/multi-source
    balancing rule (alpha=1 reproduces natural proportions, alpha=0
    uniform, the usual 0.2-0.7 range boosts low-resource strata
    sub-linearly). Feed the result to :func:`mixture_fractions` to
    turn weights into per-stratum sampling fractions. Pure python on
    an audit aggregate's counts — no driver collect hidden here."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    raw = {s: float(c) ** alpha for s, c in counts.items() if c > 0}
    z = sum(raw.values()) or 1.0
    return {s: w / z for s, w in raw.items()}


def mixture_fractions(counts: dict, target_weights: dict,
                      total_out: int) -> dict:
    """Convert target mixture weights into per-stratum sampling
    fractions: stratum s should contribute weight[s]·total_out rows
    out of counts[s] available. Fractions cap at 1.0 (can't upsample
    with Bernoulli; callers needing oversampling union repeated
    samples). Pure python — inputs come from an audit aggregate."""
    wsum = float(sum(target_weights.values()))
    return {
        s: min(1.0, (target_weights[s] / wsum) * total_out / counts[s])
        for s in target_weights
        if counts.get(s)
    }
