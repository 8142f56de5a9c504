"""Flow-orchestration twin tests (reference prefect_flow.py contract,
README.md:374-389: task-level retries, concurrent fetches, schedule in
code). The pipeline underneath is run_pipeline, already covered by
test_pipeline.py — these tests pin what the FLOW adds."""

from __future__ import annotations

import threading
from datetime import datetime

import pytest

from flight_data_pipeline_spark.flow import (
    GRID_ETL_SCHEDULE,
    Task,
    grid_etl_flow,
    next_fire,
    task,
)
from flight_data_pipeline_spark.sinks import AuditSink, TelemetrySink
from tests.test_pipeline import INTENSITY, MIX


@pytest.fixture
def paths(tmp_path):
    return str(tmp_path / "telemetry"), str(tmp_path / "audit")


def run_flow(spark, paths, fetch_intensity=lambda: INTENSITY,
             fetch_mix=lambda: MIX, **kw):
    tele, audit = paths
    return grid_etl_flow(
        spark,
        fetch_intensity=fetch_intensity,
        fetch_mix=fetch_mix,
        telemetry_path=tele,
        audit_path=audit,
        sleep=lambda s: None,
        **kw,
    )


class TestTask:
    def test_retries_then_succeeds_with_attempt_count(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ValueError("transient")
            return "payload"

        run = Task(flaky, retries=3).run(sleep=lambda s: None)
        assert (run.ok, run.attempts, run.result) == (True, 3, "payload")

    def test_exhausted_retries_reports_error(self):
        def broken():
            raise ValueError("permanent")

        run = Task(broken, name="fetch", retries=3).run(sleep=lambda s: None)
        assert (run.ok, run.attempts) == (False, 3)
        assert "permanent" in run.error

    def test_backoff_schedule_is_exponential(self):
        """The reference's documented 2s/4s/8s ladder (README.md:352)
        at the task level."""
        waits = []

        def broken():
            raise ValueError("x")

        Task(broken, retries=4, base_delay=2.0).run(sleep=waits.append)
        assert waits == [2.0, 4.0, 8.0]

    def test_decorator_form(self):
        @task(retries=2, name="t")
        def f():
            return 7

        assert f() == 7
        assert f.run().attempts == 1


class TestGridEtlFlow:
    def test_fetches_run_concurrently(self, spark, paths):
        """Both fetch tasks must be in flight at once: each blocks on a
        2-party barrier, so a sequential orchestrator would deadlock
        (and trip the barrier timeout) — README.md:377 'Fetch intensity
        and generation concurrently'."""
        barrier = threading.Barrier(2, timeout=30)

        def fetch_intensity():
            barrier.wait()
            return INTENSITY

        def fetch_mix():
            barrier.wait()
            return MIX

        run = run_flow(spark, paths, fetch_intensity, fetch_mix)
        assert run.status == "success"
        assert [t.ok for t in run.tasks] == [True, True]

    def test_success_path_writes_sink_and_audit(self, spark, paths):
        run = run_flow(spark, paths)
        assert run.status == "success"
        assert run.result.rows_inserted == 1
        assert TelemetrySink(spark, paths[0]).read().count() == 1
        assert AuditSink(spark, paths[1]).read().first().status == "success"

    def test_task_retry_recovers_transient_fetch(self, spark, paths):
        calls = {"n": 0}

        def flaky_intensity():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ValueError("transient")
            return INTENSITY

        run = run_flow(spark, paths, fetch_intensity=flaky_intensity)
        assert run.status == "success"
        assert run.tasks[0].attempts == 3

    def test_exhausted_fetch_fails_flow_but_audits(self, spark, paths):
        """A fetch task that spends all its retries lands in the
        reference's fetch-failure path: status='failure', zero rows,
        audit row still written (etl_job.py:276-286)."""
        def broken():
            raise ValueError("api down")

        run = run_flow(spark, paths, fetch_intensity=broken)
        assert run.status == "failure"
        assert (run.tasks[0].ok, run.tasks[0].attempts) == (False, 3)
        assert run.result.rows_inserted == 0
        arow = AuditSink(spark, paths[1]).read().first()
        assert arow.status == "failure"
        assert "fetch_intensity" in arow.error_message
        assert TelemetrySink(spark, paths[0]).read().count() == 0

    def test_rerun_is_skipped_not_duplicated(self, spark, paths):
        """The flow inherits the pipeline's hour-bucket idempotency:
        an orchestrator re-firing the same window is a no-op."""
        assert run_flow(spark, paths).status == "success"
        rerun = run_flow(spark, paths)
        assert (rerun.status, rerun.result.rows_inserted) == ("skipped", 0)
        assert TelemetrySink(spark, paths[0]).read().count() == 1


class TestNextFire:
    def test_hourly_schedule(self):
        t = next_fire(GRID_ETL_SCHEDULE, datetime(2026, 8, 15, 14, 30))
        assert t == datetime(2026, 8, 15, 15, 0)

    def test_exact_boundary_is_strictly_after(self):
        t = next_fire("0 * * * *", datetime(2026, 8, 15, 15, 0))
        assert t == datetime(2026, 8, 15, 16, 0)

    def test_step_and_list_fields(self):
        t = next_fire("*/15 * * * *", datetime(2026, 8, 15, 14, 31))
        assert t == datetime(2026, 8, 15, 14, 45)
        t = next_fire("5 9,18 * * *", datetime(2026, 8, 15, 10, 0))
        assert t == datetime(2026, 8, 15, 18, 5)

    def test_day_of_week_and_sunday_aliases(self):
        # 2026-08-15 is a Saturday; next Monday 09:00 is the 17th
        t = next_fire("0 9 * * 1", datetime(2026, 8, 15, 12, 0))
        assert t == datetime(2026, 8, 17, 9, 0)
        # dow 0 and 7 are both Sunday
        for f in ("0 9 * * 0", "0 9 * * 7"):
            assert next_fire(f, datetime(2026, 8, 15, 12, 0)) \
                == datetime(2026, 8, 16, 9, 0)

    def test_vixie_or_rule_when_both_day_fields_restricted(self):
        # day-of-month 20 OR Monday: Monday the 17th comes first
        t = next_fire("0 0 20 * 1", datetime(2026, 8, 15, 12, 0))
        assert t == datetime(2026, 8, 17, 0, 0)

    def test_month_rollover(self):
        t = next_fire("0 0 1 * *", datetime(2026, 8, 15, 12, 0))
        assert t == datetime(2026, 9, 1, 0, 0)

    def test_stepped_wildcard_dom_is_unrestricted_for_or_rule(self):
        # ADVICE r7: vixie keys the OR rule on the field starting
        # with '*' — '0 0 */2 * 1' = (odd day-of-month) AND Monday,
        # the intersection, not the union. 2026-08-17 is a Monday
        # (day 17, odd → in */2 from day 1); the 16th (Sunday) and
        # the 19th (odd but Wednesday) must NOT fire.
        t = next_fire("0 0 */2 * 1", datetime(2026, 8, 15, 12, 0))
        assert t == datetime(2026, 8, 17, 0, 0)
        # next after the 17th: Monday 2026-08-31 (the 24th is even)
        t = next_fire("0 0 */2 * 1", datetime(2026, 8, 17, 0, 0))
        assert t == datetime(2026, 8, 31, 0, 0)

    def test_number_with_step_expands_to_range(self):
        # ADVICE r7: '5/15' in the minute field = 5,20,35,50 (vixie
        # expands N/step as N-max/step), not the single minute 5
        t = next_fire("5/15 * * * *", datetime(2026, 8, 15, 14, 6))
        assert t == datetime(2026, 8, 15, 14, 20)
        t = next_fire("5/15 * * * *", datetime(2026, 8, 15, 14, 50))
        assert t == datetime(2026, 8, 15, 15, 5)

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            next_fire("0 * * *", datetime(2026, 8, 15))
        with pytest.raises(ValueError):
            next_fire("99 * * * *", datetime(2026, 8, 15))


class TestFlowCli:
    def test_flow_subcommand_runs_orchestrated_pipeline(self, spark, paths,
                                                        capsys):
        """`python -m flight_data_pipeline_spark flow` is the
        reference's `python prefect_flow.py` twin: same CLI contract
        as the batch form plus per-task records on stdout."""
        from flight_data_pipeline_spark.__main__ import main

        tele, audit = paths
        rc = main(["flow", "--telemetry", tele, "--audit", audit],
                  fetch_intensity=lambda: INTENSITY, fetch_mix=lambda: MIX)
        out = capsys.readouterr().out
        assert rc == 0
        assert "task=fetch_intensity ok=True attempts=1" in out
        assert "task=fetch_mix ok=True attempts=1" in out
        assert "status=success rows_inserted=1" in out
        assert TelemetrySink(spark, tele).read().count() == 1

    def test_flow_subcommand_exit_code_on_failure(self, spark, paths,
                                                  capsys):
        from flight_data_pipeline_spark.__main__ import main

        def boom():
            raise ValueError("api down")

        tele, audit = paths
        rc = main(["flow", "--telemetry", tele, "--audit", audit],
                  fetch_intensity=boom, fetch_mix=lambda: MIX)
        out = capsys.readouterr().out
        assert rc == 1
        assert "task=fetch_intensity ok=False attempts=3" in out
        assert "status=failure" in out
