"""E2E pipeline tests (SURVEY.md §5 item 3): synthetic API payloads →
full pipeline → sink rows, dedup-skip behavior, status machine, audit
rows — mirroring run_pipeline's control flow (etl_job.py:184-288).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from flight_data_pipeline_spark.pipeline import build_telemetry_batch, run_pipeline
from flight_data_pipeline_spark.sinks import AuditSink, TelemetrySink
from flight_data_pipeline_spark.sources.rest_json import (
    parse_generation_mix,
    parse_intensity,
    payload_df,
    retry_with_backoff,
)

INTENSITY = json.dumps({"data": [{
    "from": "2025-12-09T14:00Z", "to": "2025-12-09T14:30Z",
    "intensity": {"actual": 90, "forecast": 95},
}]})
MIX = json.dumps({"data": [{"generationmix": [
    {"fuel": "gas", "perc": 45.5}, {"fuel": "WIND", "perc": 25.3},
    {"fuel": "nuclear", "perc": 20.0}, {"fuel": "solar", "perc": 5.2},
]}]})


@pytest.fixture
def paths(tmp_path):
    return str(tmp_path / "telemetry"), str(tmp_path / "audit")


def run(spark, paths, intensity=INTENSITY, mix=MIX, **kw):
    tele, audit = paths
    return run_pipeline(
        spark,
        fetch_intensity=lambda: intensity,
        fetch_mix=lambda: mix,
        telemetry_path=tele,
        audit_path=audit,
        sleep=lambda s: None,
        **kw,
    )


class TestParsing:
    def test_intensity_parse(self, spark):
        row = parse_intensity(payload_df(spark, [INTENSITY])).first()
        assert row.overall_intensity == 90.0
        assert (row.window_start.year, row.window_start.hour,
                row.window_start.minute) == (2025, 14, 0)
        assert row.window_end.minute == 30

    def test_intensity_actual_zero_uses_forecast(self, spark):
        p = json.dumps({"data": [{"from": "2025-12-09T14:00Z",
                                  "intensity": {"actual": 0, "forecast": 95}}]})
        assert parse_intensity(payload_df(spark, [p])).first().overall_intensity == 95.0

    def test_intensity_bad_from_defaults_to_now(self, spark):
        p = json.dumps({"data": [{"from": "garbage",
                                  "intensity": {"actual": 90}}]})
        now = F.lit("2025-12-09 16:00:00").cast("timestamp")
        row = parse_intensity(payload_df(spark, [p]), now=now).first()
        assert row.window_start.hour == 16

    def test_mix_list_and_dict_drift(self, spark):
        # etl_job.py:121 — data may be a dict rather than a list
        as_dict = json.dumps({"data": {"generationmix": [
            {"fuel": "Gas", "perc": 40.0}]}})
        for payload in (MIX, as_dict):
            row = parse_generation_mix(payload_df(spark, [payload])).first()
            assert row.fuel_gas_perc in (45.5, 40.0)

    def test_mix_case_insensitive_and_missing_default(self, spark):
        row = parse_generation_mix(payload_df(spark, [MIX])).first()
        assert row.fuel_wind_perc == 25.3  # "WIND" matched case-insensitively
        only_gas = json.dumps({"data": [{"generationmix": [
            {"fuel": "gas", "perc": 45.5}]}]})
        row = parse_generation_mix(payload_df(spark, [only_gas])).first()
        assert (row.fuel_nuclear_perc, row.fuel_wind_perc, row.fuel_solar_perc) \
            == (0.0, 0.0, 0.0)


class TestPipelineRuns:
    def test_first_run_success(self, spark, paths):
        res = run(spark, paths)
        assert (res.status, res.rows_inserted) == ("success", 1)
        tele = TelemetrySink(spark, paths[0]).read()
        assert tele.count() == 1
        audit = AuditSink(spark, paths[1]).read().first()
        assert audit.status == "success" and audit.rows_inserted == 1

    def test_second_run_same_hour_skipped(self, spark, paths):
        run(spark, paths)
        res = run(spark, paths)  # same hour → dedup skip (etl_job.py:234-237)
        assert (res.status, res.rows_inserted) == ("skipped", 0)
        assert TelemetrySink(spark, paths[0]).read().count() == 1
        statuses = {r.status for r in AuditSink(spark, paths[1]).read().collect()}
        assert statuses == {"success", "skipped"}

    def test_different_hour_inserted(self, spark, paths):
        run(spark, paths)
        later = INTENSITY.replace("T14:00Z", "T15:00Z").replace("T14:30Z", "T15:30Z")
        res = run(spark, paths, intensity=later)
        assert (res.status, res.rows_inserted) == ("success", 1)
        assert TelemetrySink(spark, paths[0]).read().count() == 2

    def test_invalid_data_still_written(self, spark, paths):
        # flag-don't-drop + the reference's success-overwrites-partial
        # quirk (etl_job.py:213-218, 262): row written, status 'success'
        bad_mix = json.dumps({"data": [{"generationmix": [
            {"fuel": "gas", "perc": 150.0}]}]})
        res = run(spark, paths, mix=bad_mix)
        assert res.status == "success"
        row = TelemetrySink(spark, paths[0]).read().first()
        assert row.fuel_gas_perc == 150.0  # written, not dropped/clamped

    def test_fetch_failure_audited(self, spark, paths):
        def boom():
            raise ValueError("api down")
        tele, audit = paths
        res = run_pipeline(spark, boom, lambda: MIX, tele, audit,
                           sleep=lambda s: None)
        assert res.status == "failure"
        assert "api down" in res.error_message
        audit_row = AuditSink(spark, audit).read().first()
        assert audit_row.status == "failure"
        assert "api down" in audit_row.error_message


class TestBatchCli:
    def test_main_runs_one_pipeline_and_exits_zero(self, spark, paths, capsys):
        """EP2 parity: `python -m flight_data_pipeline_spark` runs one
        batch pipeline (etl_job.py:290-293) and exits 0 on success,
        1 on failure — what the cron workflow keys its status on."""
        from flight_data_pipeline_spark.__main__ import main

        tele, audit = paths
        rc = main(["--telemetry", tele, "--audit", audit],
                  fetch_intensity=lambda: INTENSITY, fetch_mix=lambda: MIX)
        assert rc == 0
        assert "status=success rows_inserted=1" in capsys.readouterr().out
        assert TelemetrySink(spark, tele).read().first().overall_intensity == 90.0

    def test_main_exit_code_on_failure(self, paths):
        from flight_data_pipeline_spark.__main__ import main

        def boom():
            raise ValueError("api down")

        tele, audit = paths
        rc = main(["--telemetry", tele, "--audit", audit],
                  fetch_intensity=boom, fetch_mix=lambda: MIX)
        assert rc == 1


class TestRetry:
    def test_backoff_schedule_and_reraise(self):
        calls, waits = [], []

        def flaky():
            calls.append(1)
            raise ConnectionError("nope")

        with pytest.raises(ConnectionError):
            retry_with_backoff(flaky, sleep=waits.append)()
        assert len(calls) == 3            # etl_job.py:32 MAX_RETRIES
        assert waits == [2.0, 4.0]        # 2·2^n, no sleep after last

    def test_parse_errors_fail_fast(self):
        """The reference retries only requests.RequestException
        (etl_job.py:41): a ValueError from a malformed payload must
        propagate on the first attempt, with zero backoff waits."""
        calls, waits = [], []

        def malformed():
            calls.append(1)
            raise ValueError("bad payload")

        with pytest.raises(ValueError):
            retry_with_backoff(malformed, sleep=waits.append)()
        assert len(calls) == 1
        assert waits == []

    def test_recovers_after_transient(self):
        attempts = []

        def flaky():
            attempts.append(1)
            if len(attempts) < 3:
                raise ConnectionError("transient")
            return "ok"

        assert retry_with_backoff(flaky, sleep=lambda s: None)() == "ok"


class TestBatchJoin:
    def test_single_row_zip(self, spark):
        row = build_telemetry_batch(spark, INTENSITY, MIX).first()
        assert row.overall_intensity == 90.0
        assert row.fuel_gas_perc == 45.5
        assert row.timestamp.hour == 14


class TestEmptyPayloads:
    # etl_job.py:102-103,118-119 — empty/malformed payloads raise, the
    # run is audited as 'failure', and NO row reaches the sink
    def test_garbage_json_is_failure(self, spark, paths):
        res = run(spark, paths, intensity="not json {")
        assert res.status == "failure"
        assert "No intensity data returned" in res.error_message
        assert TelemetrySink(spark, paths[0]).read().count() == 0

    def test_empty_data_is_failure(self, spark, paths):
        res = run(spark, paths, intensity=json.dumps({"data": []}))
        assert res.status == "failure"
        assert TelemetrySink(spark, paths[0]).read().count() == 0
        assert AuditSink(spark, paths[1]).read().first().status == "failure"

    def test_empty_mix_is_failure(self, spark, paths):
        res = run(spark, paths, mix=json.dumps({"data": []}))
        assert res.status == "failure"
        assert "No generation data returned" in res.error_message


class TestMultiWindowBatch:
    def test_backfill_equi_join_pairs_by_window(self, spark):
        from flight_data_pipeline_spark.pipeline import build_telemetry_batch_multi

        def mk_int(h, actual):
            return json.dumps({"data": [{"from": f"2025-12-09T{h:02d}:00Z",
                                         "intensity": {"actual": actual}}]})

        def mk_mix(gas):
            return json.dumps({"data": [{"generationmix": [
                {"fuel": "gas", "perc": gas}]}]})

        pairs = [
            ("w14", mk_int(14, 90), mk_mix(40.0)),
            ("w15", mk_int(15, 80), mk_mix(50.0)),
            ("w16", "garbage {", mk_mix(60.0)),          # dead-lettered
            ("w17", mk_int(17, 70), json.dumps({"data": []})),  # dead-lettered
        ]
        rows = {r.timestamp.hour: r
                for r in build_telemetry_batch_multi(spark, pairs).collect()}
        assert sorted(rows) == [14, 15]  # bad windows dropped, not mis-paired
        assert rows[14].overall_intensity == 90.0 and rows[14].fuel_gas_perc == 40.0
        assert rows[15].overall_intensity == 80.0 and rows[15].fuel_gas_perc == 50.0


class TestPartitionedSink:
    def test_day_partitioned_sink_round_trip_and_dedup(self, spark, tmp_path):
        import datetime as dt
        from flight_data_pipeline_spark.sinks import TelemetrySink

        sink = TelemetrySink(spark, str(tmp_path / "tele"), partition_by_day=True)
        batch = spark.createDataFrame(
            [(dt.datetime(2025, 12, 9, 14), 90.0, 1.0, 2.0, 3.0, 4.0),
             (dt.datetime(2025, 12, 10, 9), 80.0, 1.0, 2.0, 3.0, 4.0)],
            sink.schema)
        assert sink.append_dedup(batch) == 2
        # directory layout: one bucket_date= dir per day (partition pruning)
        dirs = {p.name for p in (tmp_path / "tele").iterdir() if p.is_dir()}
        assert {"bucket_date=2025-12-09", "bucket_date=2025-12-10"} <= dirs
        # re-run: same hours -> 0 inserted; new hour same day -> 1
        assert sink.append_dedup(batch) == 0
        more = spark.createDataFrame(
            [(dt.datetime(2025, 12, 9, 15), 85.0, 1.0, 2.0, 3.0, 4.0)],
            sink.schema)
        assert sink.append_dedup(more) == 1
        assert sink.read().count() == 3

    def test_read_range_prunes_partitions(self, spark, tmp_path):
        import datetime as dt
        from flight_data_pipeline_spark.sinks import TelemetrySink

        sink = TelemetrySink(spark, str(tmp_path / "tele"), partition_by_day=True)
        batch = spark.createDataFrame(
            [(dt.datetime(2025, 12, d, 14), 90.0, 1.0, 2.0, 3.0, 4.0)
             for d in (9, 10, 11)],
            sink.schema)
        sink.append_dedup(batch)
        df = sink.read_range("2025-12-10", "2025-12-10")
        assert df.count() == 1
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket_date" in plan

    def test_overwrite_days_replaces_only_touched_partitions(self, spark, tmp_path):
        """Rerun/backfill discipline: dynamic partition overwrite
        replaces exactly the days in the corrected batch; untouched
        days keep their rows (SURVEY §7.3 — the engine's answer to
        the reference's Postgres upsert correction path)."""
        import datetime as dt
        from flight_data_pipeline_spark.sinks import TelemetrySink

        sink = TelemetrySink(spark, str(tmp_path / "tele"), partition_by_day=True)
        batch = spark.createDataFrame(
            [(dt.datetime(2025, 12, 9, 14), 90.0, 1.0, 2.0, 3.0, 4.0),
             (dt.datetime(2025, 12, 9, 15), 91.0, 1.0, 2.0, 3.0, 4.0),
             (dt.datetime(2025, 12, 10, 9), 80.0, 1.0, 2.0, 3.0, 4.0)],
            sink.schema)
        sink.append_dedup(batch)
        # recompute day 9 with corrected values, one row instead of two
        fixed = spark.createDataFrame(
            [(dt.datetime(2025, 12, 9, 14), 55.5, 9.0, 2.0, 3.0, 4.0)],
            sink.schema)
        sink.overwrite_days(fixed)
        rows = {(r.timestamp, r.overall_intensity)
                for r in sink.read().collect()}
        assert rows == {
            (dt.datetime(2025, 12, 9, 14), 55.5),   # replaced
            (dt.datetime(2025, 12, 10, 9), 80.0),   # untouched day kept
        }
        with pytest.raises(ValueError, match="partition_by_day"):
            TelemetrySink(spark, str(tmp_path / "flat")).overwrite_days(fixed)


class TestContiguousIds:
    def test_assign_contiguous_ids(self, spark):
        """0..n−1, unique, contiguous — over a multi-partition frame,
        without any global sort (the BIGSERIAL stand-in)."""
        from flight_data_pipeline_spark.operators.relational import (
            assign_contiguous_ids,
        )

        df = spark.range(0, 1000, 1, 7).withColumnRenamed("id", "k")
        out = assign_contiguous_ids(df, order_within_partition=("k",))
        rows = out.collect()
        assert sorted(r.row_id for r in rows) == list(range(1000))
        # ids ascend with k (spark.range partitions are contiguous
        # ranges and offsets accumulate in partition order, so the
        # declared order key implies globally k-sorted ids here)
        by_k = sorted(rows, key=lambda r: r.k)
        assert [r.row_id for r in by_k] == list(range(1000))

    def test_assign_contiguous_ids_default_path_shuffle_free(self, spark):
        """Default (arrival-order) path: ids still 0..n−1 and the
        data row stream never crosses an exchange — the local index
        is decomposed from monotonically_increasing_id, offsets
        arrive via broadcast, and the only hashpartitioning exchange
        in the plan belongs to the per-partition COUNT aggregate
        (partial-aggregated: it ships one row per partition)."""
        from flight_data_pipeline_spark.operators.relational import (
            assign_contiguous_ids,
        )

        df = spark.range(0, 1000, 1, 7).withColumnRenamed("id", "k")
        out = assign_contiguous_ids(df)
        assert sorted(r.row_id for r in out.collect()) == list(range(1000))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the data (streamed) side prints before the broadcast child:
        # it must cross no exchange at all. The offsets subtree keeps
        # its two tiny ones (partial count agg + partition-count-row
        # running-sum window).
        data_side = plan.split("BroadcastExchange")[0]
        assert "Exchange" not in data_side
        # no Window over the data in the default path
        assert "row_number" not in data_side

    def test_assign_contiguous_ids_ordered_path_no_single_partition(self, spark):
        from flight_data_pipeline_spark.operators.relational import (
            assign_contiguous_ids,
        )

        df = spark.range(0, 1000, 1, 7).withColumnRenamed("id", "k")
        plan = assign_contiguous_ids(df, order_within_partition=("k",)) \
            ._jdf.queryExecution().executedPlan().toString()
        # the data-side window partitions by spark_partition_id — no
        # single-partition Exchange of the full data (the scale trap
        # of row_number() OVER (ORDER BY ...))
        assert "Exchange SinglePartition" not in plan.split("BroadcastExchange")[0]


class TestQueryCli:
    def test_list_names_all_queries(self, capsys):
        from flight_data_pipeline_spark.__main__ import main
        from flight_data_pipeline_spark.plans import registry

        registry.load_all()
        assert main(["query", "--list"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == len(registry.QUERIES)
        assert any(line.startswith("daily_rollup\tchecked") for line in out)

    def test_unknown_query_exits_2(self, capsys):
        from flight_data_pipeline_spark.__main__ import main

        assert main(["query", "no_such_query"]) == 2

    def test_runs_query_and_prints_head(self, spark, capsys):
        from flight_data_pipeline_spark.__main__ import main
        from tests.conftest import SF_DIR

        assert main(["query", "scalar_counts", "--sf-dir", SF_DIR]) == 0
        assert "n_events" in capsys.readouterr().out


class TestSqlCli:
    """EP3 raw-SQL parity (VERDICT r7 #6): the reference's documented
    monitoring SQL runs VERBATIM through `query --sql` against this
    engine's sinks, and each result equals its checked-query twin's
    DataFrame logic computed over the same sink rows."""

    # verbatim from the reference docs — do not reformat
    SQL_SUCCESS_RATE = """SELECT
  DATE(run_timestamp) AS day,
  COUNT(*) AS total_runs,
  SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END) AS successful,
  ROUND(100.0 * SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END) / COUNT(*), 2) AS success_pct
FROM etl_runs
WHERE run_timestamp >= NOW() - INTERVAL '7 days'
GROUP BY 1
ORDER BY 1 DESC;"""  # README.md:171-181
    SQL_RECENT = """SELECT run_timestamp, status, rows_inserted, execution_time_ms, error_message
FROM etl_runs
ORDER BY run_timestamp DESC
LIMIT 10;"""  # README.md:184-188
    SQL_STATUS_PCT = """SELECT
  status,
  COUNT(*) as count,
  ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM etl_runs), 1) as pct
FROM etl_runs
GROUP BY status;"""  # docs/GITHUB_ACTIONS_SETUP.md:83-89
    SQL_TREND = """SELECT
  DATE_TRUNC('day', run_timestamp) as day,
  AVG(execution_time_ms) as avg_ms,
  MAX(execution_time_ms) as max_ms
FROM etl_runs
WHERE status = 'success'
GROUP BY 1
ORDER BY 1 DESC;"""  # docs/GITHUB_ACTIONS_SETUP.md:97-105
    SQL_TOTAL = "SELECT COUNT(*) FROM etl_runs;"       # docs:81
    SQL_TELE = "SELECT COUNT(*) FROM grid_telemetry;"  # README.md:193

    @pytest.fixture
    def populated(self, spark, paths):
        """Three pipeline runs → etl_runs rows with success / skipped /
        failure statuses and one telemetry row."""
        run(spark, paths)                       # success
        run(spark, paths)                       # same hour → skipped

        def boom():
            raise ValueError("api down")

        tele, audit = paths
        run_pipeline(spark, boom, lambda: MIX, tele, audit,
                     sleep=lambda s: None)      # failure
        return paths

    def _sql(self, spark, populated, sql):
        from flight_data_pipeline_spark.__main__ import sql_client
        from tests.conftest import SF_DIR

        tele, audit = populated
        return sql_client(spark, sql, SF_DIR, tele, audit)

    def test_verbatim_success_rate_equals_twin(self, spark, populated):
        got = self._sql(spark, populated, self.SQL_SUCCESS_RATE).collect()
        audit = AuditSink(spark, populated[1]).read()
        twin = (
            audit.groupBy(F.to_date("run_timestamp").alias("day"))
            .agg(F.count("*").alias("total_runs"),
                 F.sum(F.when(F.col("status") == "success", 1)
                       .otherwise(0)).alias("successful"))
            .collect()
        )
        assert len(got) == len(twin) == 1
        assert (got[0].total_runs, got[0].successful) \
            == (twin[0].total_runs, twin[0].successful) == (3, 1)
        # Spark types ROUND(100.0 * …, 2) as DECIMAL — compare as float
        assert float(got[0].success_pct) == round(100.0 * 1 / 3, 2)

    def test_verbatim_recent_runs_equals_twin(self, spark, populated):
        got = self._sql(spark, populated, self.SQL_RECENT).collect()
        audit = AuditSink(spark, populated[1]).read()
        twin = (audit.orderBy(F.desc("run_timestamp")).limit(10)
                .select("run_timestamp", "status", "rows_inserted",
                        "execution_time_ms", "error_message").collect())
        assert [tuple(r) for r in got] == [tuple(r) for r in twin]
        assert {r.status for r in got} == {"success", "skipped", "failure"}

    def test_verbatim_status_distribution_equals_twin(self, spark,
                                                      populated):
        got = {r.status: (r["count"], float(r.pct))
               for r in self._sql(spark, populated,
                                  self.SQL_STATUS_PCT).collect()}
        assert got == {"success": (1, 33.3), "skipped": (1, 33.3),
                       "failure": (1, 33.3)}

    def test_verbatim_trend_and_scalar_counts(self, spark, populated):
        trend = self._sql(spark, populated, self.SQL_TREND).collect()
        audit = AuditSink(spark, populated[1]).read()
        ms = [r.execution_time_ms for r in
              audit.where(F.col("status") == "success").collect()]
        assert len(trend) == 1
        assert trend[0].avg_ms == sum(ms) / len(ms)
        assert trend[0].max_ms == max(ms)
        assert self._sql(spark, populated,
                         self.SQL_TOTAL).first()[0] == 3
        assert self._sql(spark, populated, self.SQL_TELE).first()[0] == 1

    def test_cli_flag_prints_result(self, spark, populated, capsys):
        from flight_data_pipeline_spark.__main__ import main
        from tests.conftest import SF_DIR

        tele, audit = populated
        rc = main(["query", "--sql", self.SQL_TOTAL, "--sf-dir", SF_DIR,
                   "--telemetry", tele, "--audit", audit])
        assert rc == 0
        assert "3" in capsys.readouterr().out

    def test_name_and_sql_are_exclusive(self, capsys):
        from flight_data_pipeline_spark.__main__ import main

        assert main(["query", "daily_rollup", "--sql", "SELECT 1"]) == 2


class TestSingleProbeAction:
    def test_run_pipeline_uses_one_driver_probe(self, spark, paths,
                                                monkeypatch):
        """VERDICT r4 item 8: missing-payload detection and the
        partial-validation probe fold into ONE driver round-trip per
        run (a single .first() aggregate; zero isEmpty jobs) — the
        write is the only other action."""
        # patch the CONCRETE class (Spark 4's classic DataFrame
        # subclass defines these itself, shadowing the abstract base)
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # older layout
            from pyspark.sql import DataFrame

        calls = {"first": 0, "isEmpty": 0, "collect": 0, "count": 0}
        for name in calls:
            orig = getattr(DataFrame, name)

            def wrapped(self, *a, _n=name, _o=orig, **kw):
                calls[_n] += 1
                return _o(self, *a, **kw)

            monkeypatch.setattr(DataFrame, name, wrapped)

        res = run(spark, paths)
        assert res.status == "success"
        assert calls["isEmpty"] == 0
        assert calls["first"] == 1
        # (collect/count are not asserted: first() routes through
        # collect() internally, and sinks.py legitimately counts
        # appended rows — the reference's rows_inserted contract)


class TestJdbcSinkEmbeddedDerby:
    """Execute the literal-parity S4 JDBC sink (sinks.JdbcSink,
    mirroring etl_job.py:222-260's psycopg INSERT + commit) against
    embedded Derby — previously the one reference behavior never run
    in-container (VERDICT r6 "what's missing" item 3). Derby ships in
    pyspark/jars (Spark's Hive-metastore dependency), so local-mode
    executors can always load org.apache.derby.jdbc.EmbeddedDriver;
    skip — rather than fail — if a trimmed distribution dropped it."""

    PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    def _sink(self, spark, tmp_path, table):
        from flight_data_pipeline_spark.sinks import JdbcSink

        url = f"jdbc:derby:{tmp_path}/db;create=true"
        return JdbcSink(spark, url, table, dict(self.PROPS))

    def test_telemetry_and_audit_append_roundtrip(self, spark, tmp_path):
        import datetime as dt

        from flight_data_pipeline_spark.sinks import (
            AUDIT_SCHEMA,
            TELEMETRY_SCHEMA,
        )

        tele = self._sink(spark, tmp_path, "grid_telemetry")
        rows = [
            (dt.datetime(2025, 12, 9, 14, 0), 90.0, 45.5, 20.0, 25.3, 5.2),
            (dt.datetime(2025, 12, 9, 15, 0), 85.0, 44.0, 21.0, 26.0, 6.0),
        ]
        df = spark.createDataFrame(rows, TELEMETRY_SCHEMA)
        try:
            tele.append(df)
        except Exception as exc:  # pragma: no cover - non-local setups
            if "EmbeddedDriver" in str(exc) or "ClassNotFound" in str(exc):
                pytest.skip(f"embedded Derby driver unavailable: {exc}")
            raise

        # the reference's two-table shape: telemetry first, audit second
        audit = self._sink(spark, tmp_path, "etl_runs")
        audit.append(spark.createDataFrame(
            [(dt.datetime(2025, 12, 9, 14, 0, 5), "success", 2, 120, None)],
            AUDIT_SCHEMA))

        got = tele.read()
        assert got.count() == 2
        assert {f.name for f in got.schema.fields} \
            == {f.name for f in TELEMETRY_SCHEMA.fields}
        assert {r.overall_intensity for r in got.collect()} == {90.0, 85.0}
        arow = audit.read().first()
        assert (arow.status, arow.rows_inserted) == ("success", 2)

        # JDBC append is plain SQL INSERT (the database commits it, as
        # psycopg did for the reference): a re-append adds rows — the
        # idempotency discipline lives ABOVE the sink (append_dedup)
        tele.append(df)
        assert tele.read().count() == 4
