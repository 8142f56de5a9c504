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

#: one row per tar member: sample key + format + opaque payload.
#: ``ordinal`` is the member's 0-based position among the shard's file
#: members — duplicate member names inside one tar are legal, so
#: (shard, ordinal) is the only per-member unique key the container
#: guarantees (quarantine rows carry ordinal=-1).
TAR_MEMBER_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),      # shard file name
    T.StructField("ordinal", T.IntegerType()),   # position in the tar
    T.StructField("key", T.StringType()),        # member name sans ext
    T.StructField("format", T.StringType()),     # member extension
    T.StructField("payload", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])

#: media kinds by extension — anything else is passed through as
#: kind='blob' (labels/captions/json ride beside their media member)
_KIND_BY_EXT = {
    "ppm": "image", "pgm": "image", "bmp": "image", "png": "image",
    "gif": "image", "jpg": "image", "jpeg": "image",
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
        for pdf in batches:
            for path_str, content in zip(pdf["path"], pdf["content"]):
                # one pandas batch per shard: bounds task memory by a
                # single shard even when binaryFile batches several
                yield _untar_rows(posixpath.basename(path_str), content,
                                  skip_corrupt)

    return shards.mapInPandas(unpack, schema=TAR_MEMBER_SCHEMA)


def _untar_rows(shard: str, content: bytes,
                skip_corrupt: bool) -> pd.DataFrame:
    """One shard's bytes → one member-row pandas batch (shared by the
    batch reader above and the streaming path below)."""
    import io
    import tarfile

    rows = {"shard": [], "ordinal": [], "key": [], "format": [],
            "payload": [], "n_bytes": []}
    try:
        with tarfile.open(fileobj=io.BytesIO(content)) as tf:
            ordinal = 0
            for m in tf:
                if not m.isfile():
                    continue
                data = tf.extractfile(m).read()
                name = posixpath.basename(m.name)
                key, dot, ext = name.rpartition(".")
                rows["shard"].append(shard)
                rows["ordinal"].append(ordinal)
                rows["key"].append(key if dot else name)
                rows["format"].append(ext.lower() if dot else "")
                rows["payload"].append(data)
                rows["n_bytes"].append(len(data))
                ordinal += 1
    except (tarfile.TarError, EOFError, OSError) as exc:
        if not skip_corrupt:
            raise
        err = f"{type(exc).__name__}: {exc}".encode()[:300]
        rows = {"shard": [shard], "ordinal": [-1], "key": ["__corrupt__"],
                "format": ["error"], "payload": [err],
                "n_bytes": [len(content)]}
    return pd.DataFrame(rows)


def stream_tar_members(shard_paths: DataFrame,
                       skip_corrupt: bool = False) -> DataFrame:
    """Expand a stream (or frame) of shard PATHS into member rows —
    the executor-side half of the streaming tar source: the driver
    only ever lists names; file bytes are opened and untarred inside
    mapInPandas on executors, one pandas batch per shard. Composes
    identically on batch DataFrames (the path-listing twin of
    read_tar_shards for pre-listed work queues)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_str in pdf["shard_path"]:
                local = (path_str[7:] if path_str.startswith("file://")
                         else path_str)
                with open(local, "rb") as fh:
                    content = fh.read()
                yield _untar_rows(posixpath.basename(path_str), content,
                                  skip_corrupt)

    return shard_paths.mapInPandas(unpack, schema=TAR_MEMBER_SCHEMA)


def tar_members_as_media(members: DataFrame) -> DataFrame:
    """Adapt tar member rows to the media-row contract
    (operators/multimodal.MEDIA_SCHEMA): media_id is a stable 64-bit
    hash of (shard, member ordinal, key, format) — deterministic
    across runs and engines, no global sort or zipWithIndex — and kind
    is derived from the extension. The ordinal is in the hash because
    duplicate member names within one tar are legal; without it two
    same-named members would collide and break the joinability this
    contract promises. Non-media members (labels, captions, json)
    come through as kind='blob' so samples stay joinable on media_id
    upstream of any filter."""
    import pyspark.sql.functions as F

    kind = F.coalesce(
        *[F.when(F.col("format") == ext, F.lit(k))
          for ext, k in _KIND_BY_EXT.items()],
        F.lit("blob"))
    return members.select(
        F.xxhash64("shard", "ordinal", "key", "format").alias("media_id"),
        F.col("payload"),
        F.struct(
            kind.alias("kind"),
            F.col("format"),
            F.col("n_bytes").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# streaming ingestion: new shards as they land
# --------------------------------------------------------------------------

class TarShardStreamReader:
    """Driver-side shard LISTER with a lexicographic name watermark as
    the offset: ``{"last": "<highest shard name ingested>"}``.

    Contract (the standard WebDataset landing-zone discipline, stated
    rather than assumed):
    - shard names sort in arrival order (``shard-%06d.tar`` — the
      universal convention), so "name > last" identifies exactly the
      new files and the offset stays O(1) no matter how many shards
      have ever landed (a seen-set offset would grow unbounded at
      100k shards);
    - shards are immutable and land atomically (temp + rename), so
      re-listing a (start, end] name range during replay returns the
      identical file set — that is what makes readBetweenOffsets
      deterministic without any driver-side payload staging (unlike
      the carbon poll source, the shard files ARE the WAL).

    The reader emits only (shard_path, n_bytes) rows — bytes are read
    and untarred executor-side by ``stream_tar_members``, keeping the
    driver's per-batch work at one directory listing.

    Contract violations are AUDITABLE, not silent (VERDICT r9 item 5):
    a shard that lands with a name <= the watermark (out-of-order
    arrival, retried upload under an old name) can never be ingested
    by a name watermark, so each ``read`` diffs the listing's below-
    watermark tail against the previous listing — in-memory only, NOT
    part of the checkpointed offset, which stays O(1) — counts fresh
    appearances in ``watermark_violations``, and logs them. Restart
    resets the diff baseline (first read after restart can't tell old
    from new below-watermark names), so the counter is a lower bound;
    the log line names the offending shards for operator follow-up."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("tar_shards_stream requires .option('path', ...)")
        self._dir = path[7:] if path.startswith("file://") else path
        self._suffix = options.get("suffix", ".tar")
        self._prev_listing: set[str] | None = None
        #: cumulative count of shards that appeared below the
        #: watermark after a prior listing (never ingested)
        self.watermark_violations = 0

    def _list(self):
        import os as _os

        try:
            names = _os.listdir(self._dir)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.endswith(self._suffix))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict):
        import logging

        last = start["last"]
        names = self._list()
        if self._prev_listing is not None:
            stale = [n for n in names
                     if n <= last and n not in self._prev_listing]
            if stale:
                self.watermark_violations += len(stale)
                logging.getLogger(__name__).warning(
                    "tar_shards_stream: %d shard(s) landed at or below "
                    "the name watermark %r and will NOT be ingested "
                    "(arrival-order contract violated): %s",
                    len(stale), last, stale[:10])
        self._prev_listing = set(names)
        new = [n for n in names if n > last]
        rows = [(posixpath.join(self._dir, n),
                 _file_size(posixpath.join(self._dir, n))) for n in new]
        end = {"last": new[-1] if new else last}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start["last"], end["last"]
        names = [n for n in self._list() if lo < n <= hi]
        return iter([(posixpath.join(self._dir, n),
                      _file_size(posixpath.join(self._dir, n)))
                     for n in names])

    def commit(self, end: dict) -> None:
        pass  # shards are immutable; nothing staged driver-side


def _file_size(p: str) -> int:
    import os as _os

    return _os.stat(p).st_size


def tar_shard_stream_source():
    """Build the DataSource class lazily (pyspark.sql.datasource import
    kept out of module import time, same pattern as the carbon
    stream's registration path)."""
    import pyspark.sql.types as T_
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    path_schema = T_.StructType([
        T_.StructField("shard_path", T_.StringType(), nullable=False),
        T_.StructField("n_bytes", T_.LongType(), nullable=False),
    ])

    class _Reader(TarShardStreamReader, SimpleDataSourceStreamReader):
        pass

    class TarShardStreamDataSource(DataSource):
        """``spark.readStream.format("tar_shards_stream")`` — new tar
        shards in a landing directory become micro-batches of shard
        paths; pipe through ``stream_tar_members`` →
        ``tar_members_as_media`` → the media tier, giving the
        multimodal family its streaming ingestion form."""

        @classmethod
        def name(cls) -> str:
            return "tar_shards_stream"

        def schema(self):
            return path_schema

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    return TarShardStreamDataSource
