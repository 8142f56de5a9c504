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

from pyspark.sql import DataFrame


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample: keep each row of stratum s with
    probability fractions[s] (strata absent from the dict are
    dropped — the reject-a-source case of mixing). Deterministic via
    seed; no shuffle, no state."""
    return df.sampleBy(strata_col, fractions, seed)


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
