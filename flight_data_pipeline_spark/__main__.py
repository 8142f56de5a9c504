"""Batch CLI entry point — EP2 parity.

The reference runs as ``python etl_job.py`` under a cron workflow
(etl_job.py:290-293; .github/workflows/etl.yml:4-6 schedules it every
30 minutes). This module is the spark-submit-able equivalent:

    python -m flight_data_pipeline_spark [--telemetry PATH] [--audit PATH]

One invocation = one pipeline run (fetch → validate → dedup → load →
audit), exiting non-zero on the failure status exactly as the workflow
expects. Cadence stays external (cron / Airflow / the Structured
Streaming trigger in streaming/pipeline_stream.py — SURVEY.md EP2).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None,
         fetch_intensity=None, fetch_mix=None) -> int:
    """Run one batch pipeline. ``fetch_*`` are injectable for tests;
    the defaults fetch the reference's public API endpoints through
    the retry envelope (etl_job.py:96-137)."""
    parser = argparse.ArgumentParser(prog="flight_data_pipeline_spark")
    parser.add_argument("--telemetry",
                        default=os.environ.get("TELEMETRY_PATH",
                                               "spark-warehouse/grid_telemetry"))
    parser.add_argument("--audit",
                        default=os.environ.get("AUDIT_PATH",
                                               "spark-warehouse/etl_runs"))
    args = parser.parse_args(argv)

    if fetch_intensity is None or fetch_mix is None:  # pragma: no cover - network
        from flight_data_pipeline_spark.sources.carbon_datasource import API_BASE
        from flight_data_pipeline_spark.sources.rest_json import fetch_json

        fetch_intensity = fetch_intensity or (
            lambda: fetch_json(f"{API_BASE}/intensity"))
        fetch_mix = fetch_mix or (lambda: fetch_json(f"{API_BASE}/generation"))

    from flight_data_pipeline_spark.pipeline import run_pipeline
    from flight_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="flight_data_pipeline_spark.batch")
    result = run_pipeline(spark, fetch_intensity, fetch_mix,
                          args.telemetry, args.audit)
    print(f"status={result.status} rows_inserted={result.rows_inserted} "
          f"execution_time_ms={result.execution_time_ms}"
          + (f" error={result.error_message!r}" if result.error_message else ""))
    return 1 if result.status == "failure" else 0


if __name__ == "__main__":  # pragma: no cover - exercised via main()
    sys.exit(main())
