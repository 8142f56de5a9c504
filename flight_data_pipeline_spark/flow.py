"""Flow-orchestration twin of the reference's documented prefect_flow.py.

The reference README documents a Prefect flow — ``grid_etl_flow`` —
with task-level retries, CONCURRENT fetch of the intensity and
generation endpoints, and cron schedules declared in code
(README.md:339,374-389,575); ``prefect_flow.py`` itself is absent from
the reference snapshot, so this module re-expresses the *documented*
contract without the Prefect dependency (not installed here, and a
workflow server is out of engine scope):

- :func:`task` / :class:`Task` — named task with task-level retry
  config (exponential backoff, the same 2·2^n policy as
  ``sources.rest_json.retry_with_backoff``); every execution returns a
  :class:`TaskRun` record (attempts, wall ms, error) — the in-code
  stand-in for the Prefect UI's per-task view.
- :func:`grid_etl_flow` — runs the two fetch tasks CONCURRENTLY on a
  driver-side thread pool (they are plain Python HTTP calls; no Spark
  job executes inside the pool — Spark work stays on the caller's
  thread), then hands the pre-fetched payloads to
  ``pipeline.run_pipeline``, which keeps the reference's
  validate/dedup/load/audit status machine bit-for-bit. A fetch task
  that exhausts its retries surfaces through run_pipeline's
  fetch-failure path: status='failure' and the audit row still lands
  (etl_job.py:276-286 semantics).
- :func:`next_fire` — 5-field cron evaluation for the
  schedule-declared-in-code part; *executing* the cadence belongs to
  an external scheduler (the reference's hourly GitHub Actions
  workflow) or to the engine's own streaming source
  (``sources/stream_datasource.CarbonIntensityStream``), both already
  covered — this flow is the one-shot orchestrated entry point those
  schedulers invoke.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import Column, SparkSession

from flight_data_pipeline_spark.pipeline import RunResult, run_pipeline
from flight_data_pipeline_spark.sources.rest_json import retry_with_backoff

# the reference's documented cadence: hourly (README.md:383 deploys
# "hourly-carbon-etl"; .github/workflows/etl.yml is the hourly cron)
GRID_ETL_SCHEDULE = "0 * * * *"


@dataclass
class TaskRun:
    """One task execution: the Prefect-UI facts as a plain record."""

    name: str
    ok: bool
    attempts: int
    ms: int
    error: str | None = None
    result: object = field(default=None, repr=False)


class Task:
    """A named callable with task-level retry config. Unlike the REST
    source's network-only default, a flow task retries ANY exception
    (Prefect's task semantics — the reference attaches retries to the
    task, not to the socket)."""

    def __init__(self, fn: Callable, name: str | None = None,
                 retries: int = 3, base_delay: float = 2.0,
                 retryable: type[BaseException] | tuple = (Exception,)):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "task")
        self.retries = max(1, retries)
        self.base_delay = base_delay
        self.retryable = retryable

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs).result

    def run(self, *args, sleep: Callable[[float], None] = time.sleep,
            **kwargs) -> TaskRun:
        attempts = 0

        def counted(*a, **k):
            nonlocal attempts
            attempts += 1
            return self.fn(*a, **k)

        t0 = time.time()
        try:
            result = retry_with_backoff(
                counted, max_retries=self.retries,
                base_delay=self.base_delay, sleep=sleep,
                retryable=self.retryable)(*args, **kwargs)
            return TaskRun(self.name, True, attempts,
                           int((time.time() - t0) * 1000), None, result)
        except Exception as e:
            return TaskRun(self.name, False, attempts,
                           int((time.time() - t0) * 1000),
                           f"{type(e).__name__}: {e}")


def task(fn: Callable | None = None, *, name: str | None = None,
         retries: int = 3, base_delay: float = 2.0) -> Callable:
    """Decorator form: ``@task(retries=3)`` wraps a function as a
    :class:`Task` (call it for the value, ``.run()`` for the record)."""
    def wrap(f: Callable) -> Task:
        return Task(f, name=name, retries=retries, base_delay=base_delay)
    return wrap(fn) if fn is not None else wrap


@dataclass
class FlowRun:
    """One flow execution: per-task records + the pipeline outcome."""

    flow: str
    tasks: list[TaskRun]
    result: RunResult | None
    status: str


def _handoff(run: TaskRun) -> Callable[[], str]:
    """Adapt a completed TaskRun into run_pipeline's fetch callable: a
    succeeded task hands over its payload; a failed one raises a
    non-network error, which run_pipeline's retry wrapper does NOT
    retry (the task already spent its own retries) — it falls straight
    through to the reference's fetch-failure path (status='failure',
    audit row written)."""
    if run.ok:
        return lambda: run.result

    def exhausted() -> str:
        raise RuntimeError(
            f"task {run.name} failed after {run.attempts} attempts: "
            f"{run.error}")
    return exhausted


def grid_etl_flow(spark: SparkSession,
                  fetch_intensity: Callable[[], str],
                  fetch_mix: Callable[[], str],
                  telemetry_path: str,
                  audit_path: str,
                  now: Column | None = None,
                  sleep: Callable[[float], None] = time.sleep,
                  retries: int = 3,
                  base_delay: float = 2.0) -> FlowRun:
    """The orchestrated ETL run: both endpoint fetches execute
    concurrently with task-level retries, then the engine pipeline
    validates/dedups/loads/audits exactly as ``run_pipeline`` does.
    The parallel fetch halves the wall-clock the reference's
    sequential script spends on the two HTTP round-trips — the one
    behavior Prefect added over etl_job.py."""
    fetch_tasks = (
        Task(fetch_intensity, name="fetch_intensity",
             retries=retries, base_delay=base_delay),
        Task(fetch_mix, name="fetch_mix",
             retries=retries, base_delay=base_delay),
    )
    with ThreadPoolExecutor(max_workers=len(fetch_tasks)) as pool:
        runs = list(pool.map(lambda t: t.run(sleep=sleep), fetch_tasks))

    result = run_pipeline(
        spark,
        fetch_intensity=_handoff(runs[0]),
        fetch_mix=_handoff(runs[1]),
        telemetry_path=telemetry_path,
        audit_path=audit_path,
        now=now,
        sleep=sleep,
    )
    return FlowRun("grid_etl_flow", runs, result, result.status)


# --- cron schedule evaluation -------------------------------------------------

def _cron_field(expr: str, lo: int, hi: int) -> frozenset[int]:
    """One 5-field-cron field → the set of matching values. Supports
    ``*``, numbers, ranges ``a-b``, lists ``a,b,c`` and steps ``/n``
    (steps count from the range start, standard cron semantics)."""
    vals: set[int] = set()
    for part in expr.split(","):
        step = 1
        stepped = "/" in part
        if stepped:
            part, s = part.split("/", 1)
            step = int(s)
        if part in ("*", ""):
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        elif stepped:
            # vixie: a bare number with a step means N-max/step
            # ("5/15" in the minute field = 5,20,35,50), not {N}
            rng = range(int(part), hi + 1)
        else:
            rng = range(int(part), int(part) + 1)
        vals.update(v for i, v in enumerate(rng) if i % step == 0)
    bad = vals - set(range(lo, hi + 1))
    if bad:
        raise ValueError(f"cron field {expr!r} out of range {lo}-{hi}: {bad}")
    return frozenset(vals)


def next_fire(cron: str, after: datetime) -> datetime:
    """First fire time strictly after ``after`` for a 5-field cron
    expression (minute hour day-of-month month day-of-week; dow 0/7 =
    Sunday). Standard vixie-cron OR rule: when BOTH day fields are
    restricted, a day matches if EITHER does. Minute-resolution walk
    bounded at 366 days — enough for any calendar schedule."""
    fields = cron.split()
    if len(fields) != 5:
        raise ValueError(f"need 5 cron fields, got {cron!r}")
    minute = _cron_field(fields[0], 0, 59)
    hour = _cron_field(fields[1], 0, 23)
    dom = _cron_field(fields[2], 1, 31)
    month = _cron_field(fields[3], 1, 12)
    dow = frozenset((v % 7) for v in _cron_field(fields[4], 0, 7))

    # vixie keys the dom/dow OR rule on the field STARTING with '*':
    # '*/2' in dom is still "unrestricted" for the rule, so
    # '0 0 */2 * 1' fires on (every-2nd-day AND Monday), not the union
    dom_any = fields[2].startswith("*")
    dow_any = fields[4].startswith("*")

    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    for _ in range(366 * 24 * 60):
        if t.month in month and t.minute in minute and t.hour in hour:
            day_dom = t.day in dom
            day_dow = ((t.weekday() + 1) % 7) in dow  # Sunday = 0
            day_ok = ((day_dom or day_dow) if not (dom_any or dow_any)
                      else (day_dom and day_dow))
            if day_ok:
                return t
        t += timedelta(minutes=1)
    raise ValueError(f"no fire within 366 days for {cron!r}")
