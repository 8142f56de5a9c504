"""JSONL corpus ingestion: schema-enforced document reads with
corrupt-record dead-lettering.

Training corpora land as JSON-lines shards (one document object per
line — the WebDataset/Dolma/RedPajama distribution shape) before they
become parquet. This source reads such a landing zone into the same
typed `documents` schema the rest of the engine consumes, without ever
failing the job on a torn line: malformed records split into a
dead-letter frame (the batch twin of the streaming pipeline's
dead-letter path, streaming/pipeline_stream.py) and the good rows
proceed.

Scale posture: `spark.read.json` with an EXPLICIT schema does no
inference pass (an unschema'd read scans the corpus once just to
guess types — at 100 TB that is a full extra read); PERMISSIVE mode
keeps parse errors per-row instead of per-task; and the split into
good/dead-letter shares ONE parse via a deliberately small cache of
the parsed batch — the cost is the scan, never a second one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# The engine's document schema (TESTDATA.md `documents` table) plus
# the corrupt-record capture column.
DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_CORRUPT = "_corrupt_record"


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema: T.StructType = DOC_SCHEMA,
                      ) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document landing zone → (documents, dead_letters).

    Documents parse against the EXPLICIT ``schema`` (no inference
    scan); lines that fail to parse come back whole in the
    dead-letter frame's ``raw`` column for quarantine/replay — the
    reference's fail-the-run-on-bad-payload behavior
    (etl_job.py:117-128) relaxed to per-record quarantine, which is
    the only viable contract when one shard out of a million has a
    torn line.

    The parsed frame is cached before splitting: Spark refuses
    queries that project ONLY the internal corrupt-record column from
    a streaming-style lazy parse, and the cache also makes the
    good/bad split one scan instead of two. Callers should
    ``unpersist()`` the returned frames' parent when done with both
    (or let the context clean it up).
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .cache()
    )
    good = parsed.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    dead = parsed.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw"))
    return good, dead


def write_dead_letters(dead: DataFrame, path: str) -> None:
    """Quarantine malformed lines as text for offline inspection and
    replay (append — reruns accumulate, dedup happens at replay)."""
    dead.write.mode("append").text(path)
