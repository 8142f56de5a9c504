"""Data-quality validation operators (reference P7-P10).

The reference validates row fields with pure-Python predicates
(etl_job.py:51-83) and combines them conjunctively into a run status
(etl_job.py:204-218). Two semantics preserved exactly:

- **flag, don't drop** (etl_job.py:213-218): a failed validation marks
  the run ``partial`` but the row is still written;
- **freshness warns, null fails** (etl_job.py:74-83): event time older
  than 2h logs a warning; a missing event time fails validation.

Everything here is built-in column expressions — whole-stage codegen
evaluates them vectorized; zero Python UDFs (SURVEY.md §2.11).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Reference validation ranges (etl_job.py:59, :69)
INTENSITY_RANGE = (0, 1000)
FUEL_PCT_RANGE = (0, 100)
FRESHNESS_HOURS = 2  # etl_job.py:80


def range_check(col: Column, lo: float, hi: float) -> Column:
    """Non-null + bounded predicate (validate_intensity,
    etl_job.py:51-62; validate_fuel_percentage, etl_job.py:64-72).
    The reference's isinstance() numeric check is schema-enforced in
    Spark — a non-numeric value is NULL after cast and fails here."""
    return col.isNotNull() & col.between(lo, hi)


def valid_intensity(col: Column) -> Column:
    """etl_job.py:51-62 — intensity ∈ [0, 1000], non-null."""
    return range_check(col, *INTENSITY_RANGE)


def valid_fuel_pct(col: Column) -> Column:
    """etl_job.py:64-72 — fuel percentage ∈ [0, 100], non-null."""
    return range_check(col, *FUEL_PCT_RANGE)


def valid_timestamp(col: Column) -> Column:
    """etl_job.py:74-83 — NULL event time fails validation. Staleness
    does NOT fail (it only warns) — see ``stale_flag``."""
    return col.isNotNull()


def stale_flag(ts: Column, now: Column, hours: int = FRESHNESS_HOURS) -> Column:
    """etl_job.py:79-83 — event time older than ``hours`` relative to
    ``now`` is flagged stale (warn-only; never filters). ``now`` is a
    parameter, not current_timestamp(), for deterministic checking."""
    age_hours = (F.unix_timestamp(now) - F.unix_timestamp(ts)) / 3600.0
    return ts.isNotNull() & (age_hours > hours)


def quality_gate(df: DataFrame, checks: dict[str, Column],
                 status_col: str = "run_status") -> DataFrame:
    """Conjunctive quality gate (etl_job.py:204-218): adds one boolean
    column per named check plus a status column — 'success' when all
    pass, 'partial' otherwise. Rows are flagged, never dropped."""
    out = df
    all_ok = F.lit(True)
    for name, check in checks.items():
        out = out.withColumn(f"check_{name}", check)
        all_ok = all_ok & check
    return out.withColumn(
        status_col, F.when(all_ok, F.lit("success")).otherwise(F.lit("partial"))
    )


def observe_quality(df: DataFrame, name: str,
                    checks: dict[str, Column]) -> "tuple[DataFrame, object]":
    """Attach quality metrics to a plan as an OBSERVATION — Spark's
    accumulator-backed `DataFrame.observe`: the counters ride the
    job that was running anyway (no second scan, no extra shuffle)
    and surface after any action on the returned frame. This is how
    a 100 TB load reports its violation counts for free — the
    expectations_audit query is the standalone gate; this is the
    zero-cost inline form for pipelines that already write the data.

    ``checks`` maps metric name → BOOLEAN violation column; each is
    observed as ``count_if(check)`` beside a total row count. Returns
    (df, observation); read ``observation.get`` after an action on
    df. Works for batch frames; for streams use the same Observation
    with the listener bus (`streaming/observability`)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [F.count_if(col).alias(k) for k, col in checks.items()]
    return df.observe(obs, *metrics), obs
