"""Python DataSource WRITER: a manifest-committed JSONL sink.

Completes the Spark 4 Python DataSource surface the engine already
uses on the read side (sources/carbon_datasource.py batch reader,
sources/stream_datasource.py streaming reader) with the WRITE half —
and demonstrates the object-store commit problem in miniature: tasks
write UUID-named temp files and report them in commit messages; only
the DRIVER's commit() publishes a ``_MANIFEST`` naming the committed
files; abort() removes the orphans. Readers that trust the manifest
(``read_jsonl_manifest``) therefore never observe partial output from
failed/speculative tasks — the same contract FileOutputCommitter /
Delta's transaction log provide, expressed in the smallest form the
DataSource API allows.

Scale notes: one temp file per task (no renames of data bytes across
"directories" — object-store friendly); the manifest is one small
driver-side write, making job commit O(1) in data size; reruns with
``mode("overwrite")`` supersede the manifest atomically (tmp +
os.replace), so readers see the old or the new listing, never a mix.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor side: one temp-named part file per task. The name
        is unattackable by concurrent/speculative attempts (uuid) and
        invisible to manifest readers until the driver commits."""
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return JsonlCommit(filename=name, n_rows=n)

    def commit(self, messages):
        """Driver side: publish the manifest atomically. Files not
        listed here (crashed attempts, aborted jobs) are dead bytes a
        vacuum can sweep — they are never read."""
        manifest = {
            "files": sorted(m.filename for m in messages if m),
            "n_rows": sum(m.n_rows for m in messages if m),
        }
        tmp = os.path.join(self.path, f"._manifest-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlSinkWriter(self.options, schema, overwrite)


def read_jsonl_manifest(spark, path: str):
    """Read ONLY the manifest-committed files — the reader half of
    the commit contract (uncommitted part files are invisible)."""
    with open(os.path.join(path, "_MANIFEST")) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        raise ValueError(f"empty manifest at {path}")
    return spark.read.json(files)
