"""Scalar column functions (reference §2.9 + ingestion P2-P4).

All built-in expression compositions — they stay inside whole-stage
codegen; no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def parse_iso8601(col: Column) -> Column:
    """ISO8601 parse with invalid→NULL semantics (_parse_iso8601,
    etl_job.py:85-94). The reference normalizes the API's ``Z`` suffix
    to ``+00:00`` then datetime.fromisoformat; any failure → None.

    ``try_to_timestamp`` reproduces null-on-failure; the regexp
    handles the ``Z`` form. Accepts 'yyyy-MM-ddTHH:mm' with optional
    seconds/fraction/offset (fromisoformat's envelope for this API).
    """
    cleaned = F.regexp_replace(col, "Z$", "+00:00")
    return F.coalesce(
        # offset-carrying forms, with and without seconds
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        # naive forms (fromisoformat accepts these too)
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(cleaned),
    )


def coalesce_falsy(primary: Column, fallback: Column) -> Column:
    """Python ``a or b`` coalesce (etl_job.py:106: ``actual or
    forecast``) — unlike SQL COALESCE, a *zero* primary also falls
    through to the fallback. SURVEY.md §7.4 item 1: this is a
    deliberate, pinned behavioral choice matching the reference.
    """
    return F.when(
        primary.isNotNull() & (primary != 0), primary
    ).otherwise(fallback)


def default_to(col: Column, default: Column) -> Column:
    """NULL-defaulting (etl_job.py:107: missing event time ⇒ now)."""
    return F.coalesce(col, default)


def age_hours(ts: Column, now: Column) -> Column:
    """Event-time age in fractional hours (etl_job.py:80)."""
    return (F.unix_timestamp(now) - F.unix_timestamp(ts)) / 3600.0


def to_epoch_seconds(ts: Column) -> Column:
    """Whole-second epoch value of a time column, tolerant of the
    column's exact type: TIMESTAMP, TIMESTAMP_NTZ, and DATE all work.

    Spark 4 forbids ``CAST(timestamp_ntz AS BIGINT)`` directly (the
    round-3 fixture drift crashed every operator that assumed LTZ); a
    first cast to ``timestamp`` is a no-op for LTZ inputs and a
    value-preserving reinterpretation for NTZ/DATE under the engine's
    pinned UTC session timezone. Truncation is toward −∞ for epochs
    ≥ 0 (same as the previous direct cast), so bin assignment in
    range_join_binned is unchanged.
    """
    return ts.cast("timestamp").cast("long")


# Pinned equi-width histogram bounds for event values — shared by the
# batch histogram (event_value_histogram), the PSI drift monitor
# (value_psi_drift), and the streaming baseline maintenance
# (streaming/pipeline_stream.streaming_value_histogram): all three
# MUST bin identically or the persisted-baseline drift story breaks.
HIST_LO, HIST_HI, HIST_BINS = 0.0, 500.0, 20


def to_units(col: Column, decimals: int) -> Column:
    """Exact fixed-point integer units: ``floor(col * 10^decimals + 0.5)``
    as BIGINT.

    Money discipline for cross-engine hash parity (the market_share_by_year
    lesson): a double column on a d-decimal grid is converted to integer
    units ONCE per row — a deterministic function of the stored double, so
    every engine computes the identical integer — and summed as integers,
    which is association-free. ``ROUND(SUM(double))`` by contrast depends on
    partial-sum order and half-ulp-flips between Spark and an oracle engine
    when the exact sum sits on a rounding boundary (guaranteed reachable
    whenever the summand grid is finer than the rounding grid, e.g.
    4-decimal price*(1-discount) rounded to 2).

    Valid while the unit sum stays under 2^63; at warehouse scale pick the
    coarsest sufficient grid (cents for 1e17-row sums still fits).
    """
    return F.floor(col * F.lit(10 ** decimals) + F.lit(0.5)).cast("long")
