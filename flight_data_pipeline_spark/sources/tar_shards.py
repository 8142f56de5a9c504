"""Tar-shard media source (WebDataset-style layout — extension
scope: the de-facto storage format for large multimodal training
corpora: one ``.tar`` per shard, members named ``<key>.<ext>``, all
files of one sample sharing the key).

Spark-first shape: ``spark.read.format("binaryFile")`` lists and
reads the shard files (pushdown on path glob / modificationTime
comes free from the file source), then ONE ``mapInPandas`` stage
unpacks members with the stdlib ``tarfile`` module — so the unit of
parallelism is the shard, exactly how WebDataset readers scale: a
1000-executor cluster streams 100k shards with zero coordination,
no shuffle, and per-task memory bounded by one shard. Members flow
out as the engine's standard media rows (payload + typed metadata),
so the whole decode/featurize/resize/frame-sample tier
(operators/multimodal.py) applies unchanged downstream.

Reference parity note: the reference pipeline (etl_job.py) has no
media surface; this source is extension scope per SURVEY.md §2's
LLM-data-pipeline additions (multimodal columns).
"""

from __future__ import annotations

import posixpath
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

#: one row per tar member: sample key + format + opaque payload
TAR_MEMBER_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),      # shard file name
    T.StructField("key", T.StringType()),        # member name sans ext
    T.StructField("format", T.StringType()),     # member extension
    T.StructField("payload", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])

#: media kinds by extension — anything else is passed through as
#: kind='blob' (labels/captions/json ride beside their media member)
_KIND_BY_EXT = {
    "ppm": "image", "pgm": "image", "bmp": "image", "png": "image",
    "jpg": "image", "jpeg": "image",
    "wav": "audio", "flac": "audio", "mp3": "audio",
    "mp4": "video", "m4v": "video", "mov": "video",
}


def read_tar_shards(spark: SparkSession, path: str,
                    suffix: str = "*.tar",
                    skip_corrupt: bool = False) -> DataFrame:
    """Read every tar shard under ``path`` into member rows.

    One input task per shard (binaryFile's natural split unit for
    non-splittable payloads); the untar runs inside mapInPandas so
    member bytes stay in Arrow record batches. Ordering within a
    shard is the tar's member order — the sequential-read order
    WebDataset pipelines rely on for sample grouping.

    ``skip_corrupt=True`` quarantines unreadable shards instead of
    failing the job: a corrupt tar yields ONE row with
    key='__corrupt__', format='error' and the exception text as the
    payload, so a 100k-shard read survives the shards that WILL be
    truncated at that scale while keeping an auditable record (the
    flag-don't-drop discipline; filter format='error' into the
    dead-letter table downstream). Default stays fail-fast."""
    shards = (spark.read.format("binaryFile")
              .option("pathGlobFilter", suffix)
              .load(path)
              .select("path", "content"))

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        for pdf in batches:
            for path_str, content in zip(pdf["path"], pdf["content"]):
                shard = posixpath.basename(path_str)
                rows = {"shard": [], "key": [], "format": [],
                        "payload": [], "n_bytes": []}
                try:
                    with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            data = tf.extractfile(m).read()
                            name = posixpath.basename(m.name)
                            key, dot, ext = name.rpartition(".")
                            rows["shard"].append(shard)
                            rows["key"].append(key if dot else name)
                            rows["format"].append(
                                ext.lower() if dot else "")
                            rows["payload"].append(data)
                            rows["n_bytes"].append(len(data))
                except (tarfile.TarError, EOFError, OSError) as exc:
                    if not skip_corrupt:
                        raise
                    err = f"{type(exc).__name__}: {exc}".encode()[:300]
                    rows = {"shard": [shard], "key": ["__corrupt__"],
                            "format": ["error"], "payload": [err],
                            "n_bytes": [len(content)]}
                # one pandas batch per shard: bounds task memory by a
                # single shard even when binaryFile batches several
                yield pd.DataFrame(rows)

    return shards.mapInPandas(unpack, schema=TAR_MEMBER_SCHEMA)


def tar_members_as_media(members: DataFrame) -> DataFrame:
    """Adapt tar member rows to the media-row contract
    (operators/multimodal.MEDIA_SCHEMA): media_id is a stable 64-bit
    hash of (shard, member key, format) — deterministic across runs
    and engines, no global sort or zipWithIndex — and kind is derived
    from the extension. Non-media members (labels, captions, json)
    come through as kind='blob' so samples stay joinable on media_id
    upstream of any filter."""
    import pyspark.sql.functions as F

    kind = F.coalesce(
        *[F.when(F.col("format") == ext, F.lit(k))
          for ext, k in _KIND_BY_EXT.items()],
        F.lit("blob"))
    return members.select(
        F.xxhash64("shard", "key", "format").alias("media_id"),
        F.col("payload"),
        F.struct(
            kind.alias("kind"),
            F.col("format"),
            F.col("n_bytes").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
