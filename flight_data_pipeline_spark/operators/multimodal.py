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
