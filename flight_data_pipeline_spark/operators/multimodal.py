"""Multimodal column handling (extension scope, BASELINE.json):
image/audio/video as opaque ``binary`` columns with typed metadata,
processed by Arrow-batched pandas functions via mapInPandas.

The decode step is STUBBED — codec libraries (PIL/ffmpeg/torchcodec)
are not in this container — behind ``decoder=`` injection points with
a deterministic fake, so the Spark-side plumbing (schema, batch
iteration, partition-preserving UDF shape, metadata passthrough) is
real and tested. Swapping in a real decoder changes ONE function.

Scale posture: binary payloads stay in Arrow record batches end to
end (no per-row Python); mapInPandas streams batches so a partition
never materializes fully; feature extraction is map-side only —
partitioning by content hash or source happens upstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

# media row: payload + typed metadata (the fixed-schema discipline of
# the reference's DDL, etl_job.py:141-151, applied to media)
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("format", T.StringType()),    # png | wav | mp4 | ...
        T.StructField("n_bytes", T.LongType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_mean", T.DoubleType()),
    T.StructField("byte_entropy", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def real_decode(payload: bytes, fmt: str):  # pragma: no cover - stub
    """Real media decode — NOT IMPLEMENTED in this container (no codec
    libs). Production swaps this for PIL/soundfile/ffmpeg."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject a decoder"
    )


def fake_decode(payload: bytes, fmt: str) -> "pd.Series":
    """Deterministic stand-in decoder: 16-bin byte histogram as the
    'decoded feature'. Exercises the exact batch shape a real decoder
    produces (ndarray per row) without codec deps."""
    import numpy as np

    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.histogram(arr, bins=16, range=(0, 256))[0].astype("float32")
    total = hist.sum() or 1.0
    return hist / total


def binarize_documents(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap document text bytes as fake media rows so
    the binary plumbing runs against real distributed data. (The
    corpus ships no true media; payload content is irrelevant to the
    plumbing under test.)"""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("raw").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame,
                     decoder: Callable = fake_decode) -> DataFrame:
    """Decode + featurize media batches via mapInPandas.

    Arrow streams record batches into pandas; each batch is processed
    vectorized (numpy over the payload column) and yielded — constant
    memory per task regardless of partition size."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, means, ents = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                vec = decoder(payload, meta["format"])
                arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                p = np.bincount(arr, minlength=256) / max(len(arr), 1)
                nz = p[p > 0]
                feats.append(vec)
                means.append(float(arr.mean()))
                ents.append(float(-(nz * np.log2(nz)).sum()))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": [m["kind"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "byte_mean": means,
                "byte_entropy": ents,
                "feature": feats,
            })

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(MEDIA_SCHEMA.fields + [
    T.StructField("target_w", T.IntegerType()),
    T.StructField("target_h", T.IntegerType()),
])


def fake_resize(payload: bytes, fmt: str, w: int, h: int) -> bytes:
    """Deterministic stand-in for pixel resampling: byte-stride
    downsample of the payload to exactly w·h bytes (pad cyclically if
    short). Exercises the real contract — binary in, binary of the
    target geometry out — without codec deps."""
    import numpy as np

    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    n = w * h
    idx = (np.arange(n) * max(len(arr) // n, 1)) % len(arr)
    return arr[idx].tobytes()


def resize_media(media: DataFrame, width: int, height: int,
                 resizer: Callable = fake_resize) -> DataFrame:
    """Resize every media payload to (width, height) via mapInPandas —
    the standard image-normalization step before feature extraction or
    training. Map-side only: batches stream through Arrow, the output
    schema extends the input row with the target geometry, and
    ``meta.n_bytes`` is updated to the resized payload. Production
    swaps ``resizer`` for a PIL/opencv kernel; the batch shape is
    identical (tests pin output sizes and metadata consistency)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [
                resizer(p, m["format"], width, height)
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out_payload,
                "meta": [
                    {"kind": m["kind"], "format": m["format"],
                     "n_bytes": len(p)}
                    for m, p in zip(pdf["meta"], out_payload)
                ],
                "target_w": width,
                "target_h": height,
            })

    return media.mapInPandas(process, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
    T.StructField("n_frames_total", T.IntegerType()),
])


def fake_frame_extract(payload: bytes, fmt: str) -> list[bytes]:
    """Deterministic stand-in for video demuxing: split the payload
    into fixed 256-byte 'frames'. Real ffmpeg/torchcodec substitution
    changes only this function; the row-expansion plumbing is what is
    under test."""
    chunk = 256
    data = payload or b"\x00"
    return [data[i:i + chunk] for i in range(0, len(data), chunk)]


def sample_frames(media: DataFrame, every_n: int = 2,
                  extractor: Callable = fake_frame_extract) -> DataFrame:
    """Frame sampling: one OUTPUT ROW per kept frame (every
    ``every_n``-th), via mapInPandas — the row-EXPANDING media op
    (video → frame table), which is why it is mapInPandas and not a
    scalar UDF: a batch may yield more rows than it received. Frames
    keep (media_id, frame_index) so downstream image ops (resize,
    featurize, embedding) treat the frame table as ordinary media.
    Map-side; at 100 TB the frame table is written partitioned by
    media shard so per-video frame locality survives."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, totals = [], [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                allf = extractor(payload, meta["format"])
                for i in range(0, len(allf), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(allf[i])
                    totals.append(len(allf))
            yield pd.DataFrame({
                "media_id": ids, "frame_index": idxs,
                "frame": frames, "n_frames_total": totals,
            })

    return media.mapInPandas(process, schema=FRAME_SCHEMA)
