"""Streaming observability: a StreamingQueryListener that lands every
micro-batch's progress as one JSONL row — the §2.10 state/audit story
extended from per-batch WRITES (AuditSink inside foreachBatch) to
ENGINE-LEVEL metrics (input rows, batch duration, state-store rows,
watermark) that foreachBatch code never sees. The reference's analog
is its per-run audit INSERT (etl_job.py:239-267); this is the
streaming-native form: metrics arrive on the driver's listener bus,
so the hot path pays nothing.

At scale the JSONL sink swaps for the metrics system's ingest API —
the listener contract (one progress event per trigger, terminated
event with exception on failure) is the stable part."""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressAuditListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch progress event to
    ``path`` (driver-local; thread-safe — listener callbacks can
    interleave across queries). Captures the fields an on-call
    engineer actually pages on: rows in, duration, state rows,
    watermark, and sink description."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._emit({"event": "started", "id": str(event.id),
                    "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "event": "progress",
            "id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])),
            "watermark": (p.eventTime or {}).get("watermark"),
            "sink": getattr(p.sink, "description", None),
        }
        self._emit(row)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit({"event": "terminated", "id": str(event.id),
                    "exception": event.exception})

    def _emit(self, row: dict) -> None:
        with self._lock:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(row) + "\n")


def attach_progress_audit(spark, path: str) -> ProgressAuditListener:
    """Attach a ProgressAuditListener to the session; returns it so
    callers can detach (spark.streams.removeListener) when done."""
    listener = ProgressAuditListener(path)
    spark.streams.addListener(listener)
    return listener
