"""Embedding similarity checked queries (extension scope): exact
cosine top-k (DuckDB list_cosine_similarity oracle), per-label
centroid stats, and the LSH-bucketed ANN scale path (rows-only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flight_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    binarize_documents,
    extract_features,
    sample_frames,
)
from flight_data_pipeline_spark.operators.vectors import (
    ann_lsh_topk,
    as_double,
    cosine_topk,
    l2_norm,
)
from flight_data_pipeline_spark.operators.text import STOPWORDS
from flight_data_pipeline_spark.plans.registry import query
from flight_data_pipeline_spark.tables import load_table

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

QUERY_VEC_ID = 0  # pinned query vector for deterministic checks


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    SELECT vec_id,
           ROUND(list_cosine_similarity(
               CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                WHERE vec_id = {QUERY_VEC_ID})), 4)
               AS cosine_sim
    FROM embeddings
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a pinned query vector. Spark: zip_with
    dot product + TakeOrderedAndProject; DuckDB: native
    list_cosine_similarity with a scalar subquery. Similarity rounded
    to 4 digits *before* ranking on both sides so float summation
    order can't flip the top-k cut."""
    emb = load_table(spark, "embeddings", sf_dir)
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return cosine_topk(emb, qv, vec_col="embedding", id_col="vec_id", k=10)


@query(
    "label_centroid_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding,
                                                  x -> CAST(x AS DOUBLE) * x)))), 4)
               AS avg_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats (count + mean L2 norm) — vector math
    as map-side higher-order functions, one tiny aggregate shuffle."""
    emb = load_table(spark, "embeddings", sf_dir)
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(l2_norm(as_double(F.col("embedding")))), 4)
            .alias("avg_norm"),
        )
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label, ROUND(sqrt(SUM(m * m)), 4) AS centroid_norm
    FROM (
      SELECT label, pos, AVG(val) AS m
      FROM (
        SELECT label,
               unnest(CAST(embedding AS DOUBLE[])) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
      GROUP BY label, pos)
    GROUP BY label
    ORDER BY label
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vector-mean (centroid) per label, reported as the
    centroid's L2 norm: posexplode → per-(label, dim) partial+final
    average → per-label fold. This is the building block of embedding
    clustering/IVF training expressed in pure DataFrame ops — the
    shuffle carries (labels × dims) rows regardless of input size, so
    it holds at any row count. (label_centroid_stats reports the avg
    per-vector norm; this is the norm of the mean vector.)"""
    emb = load_table(spark, "embeddings", sf_dir)
    per_dim = (
        emb.select("label", F.posexplode(as_double(F.col("embedding")))
                   .alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
    )
    return (
        per_dim.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4)
             .alias("centroid_norm"))
    )


def _lsh_component(b: int, i: int) -> float:
    """The hyperplane component formula of
    operators/vectors.hyperplane_signature, reproduced so the oracle
    can inline the IDENTICAL plane literals (sha256-derived, salt 0).
    repr() round-trips doubles exactly, so both engines dot against
    bit-identical planes."""
    import hashlib

    h = int.from_bytes(
        hashlib.sha256(f"{b}:{i}".encode()).digest()[:8], "big")
    return (h % 10_000_001) / 5_000_000.0 - 1.0


_LSH_BITS, _LSH_DIM = 4, 64


def _lsh_sig_sql(salt: int = 0) -> str:
    """DuckDB expression computing the ``salt``-offset hyperplane
    signature over the ``embedding`` column — the oracle-side replay
    of operators/vectors.hyperplane_signature(bits=4, salt=salt),
    against bit-identical inlined plane literals. salt=0 is the
    single-bucket probe family; salt=64*b is band b of the multi-band
    candidate generator (lsh_candidate_pairs)."""
    return " + ".join(
        "(CASE WHEN list_sum(list_transform(generate_series(1, {d}),"
        " i -> CAST(embedding[i] AS DOUBLE) * ([{lits}]::DOUBLE[])[i]))"
        " > 0 THEN {w} ELSE 0 END)".format(
            d=_LSH_DIM,
            lits=", ".join(repr(_lsh_component(salt + b, i))
                           for i in range(_LSH_DIM)),
            w=1 << b)
        for b in range(_LSH_BITS))


_LSH_SIG_SQL = _lsh_sig_sql(0)

_LSH_ORACLE = f"""
    WITH sig AS (
        SELECT vec_id, embedding, ({_LSH_SIG_SQL}) AS s FROM embeddings
    ),
    q AS (SELECT embedding AS qe, s AS qs FROM sig
          WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           ROUND(list_cosine_similarity(
               CAST(sig.embedding AS DOUBLE[]),
               CAST((SELECT qe FROM q) AS DOUBLE[])), 4) AS cosine_sim
    FROM sig WHERE s = (SELECT qs FROM q)
    ORDER BY cosine_sim DESC, vec_id LIMIT 10
"""


@query("ann_lsh_topk", oracle=_LSH_ORACLE)
def ann_lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k for the pinned query vector —
    the scale path (probe one hyperplane bucket instead of the full
    table). PROMOTED from rows-only (r6s4): "approximate" means
    approximate RECALL vs the exact scan, not nondeterminism — the
    hyperplane planes are sha256-derived literals the oracle inlines
    verbatim, so bucket assignment and the in-bucket exact cosine
    top-10 replay on the oracle engine and the result hash-matches.
    (Sign tests on dots of O(1) magnitude tolerate any cross-engine
    summation-order noise at 1e-15.) Recall vs the exact query
    remains measured in tests/test_extensions.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return ann_lsh_topk(emb, qv, vec_col="embedding", id_col="vec_id",
                        k=10, bits=4)


@query(
    "int8_quantization_error",
    oracle="""
    WITH q AS (
        SELECT label,
               e,
               127.0 / greatest(list_max(list_transform(e, x -> abs(x))), 1e-12)
                   AS scale
        FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    )
    SELECT label,
           ROUND(AVG(list_cosine_similarity(
               e, list_transform(e, x -> floor(x * scale + 0.5) / scale))), 4)
               AS avg_cos,
           ROUND(MIN(list_cosine_similarity(
               e, list_transform(e, x -> floor(x * scale + 0.5) / scale))), 4)
               AS min_cos
    FROM q
    GROUP BY label
    ORDER BY label
    """,
)
def int8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding compression audit: cosine similarity between each
    vector and its symmetric-int8 quantized reconstruction, per label
    (avg + worst case). The quantize→dequantize round-trip is one
    map-side HOF expression (operators.vectors.dequantized_int8); the
    floor(x+0.5) rounding is pinned identical across engines so the
    query is exactly checkable."""
    from flight_data_pipeline_spark.operators.vectors import (
        as_double,
        cosine,
        dequantized_int8,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    e = as_double(F.col("embedding"))
    cos = cosine(e, dequantized_int8(e))
    return (
        emb.select("label", cos.alias("c"))
        .groupBy("label")
        .agg(F.round(F.avg("c"), 4).alias("avg_cos"),
             F.round(F.min("c"), 4).alias("min_cos"))
    )


_LSH_MULTIPROBE_ORACLE = f"""
    WITH sig AS (
        SELECT vec_id, embedding, ({_LSH_SIG_SQL}) AS s FROM embeddings
    ),
    q AS (SELECT embedding AS qe, s AS qs FROM sig
          WHERE vec_id = {QUERY_VEC_ID}),
    probes AS (
        SELECT xor((SELECT qs FROM q), f) AS p
        FROM (SELECT unnest([0, 1, 2, 4, 8]) AS f)
    )
    SELECT vec_id,
           ROUND(list_cosine_similarity(
               CAST(sig.embedding AS DOUBLE[]),
               CAST((SELECT qe FROM q) AS DOUBLE[])), 4) AS cosine_sim
    FROM sig WHERE s IN (SELECT p FROM probes)
    ORDER BY cosine_sim DESC, vec_id LIMIT 10
"""


@query("ann_lsh_topk_multiprobe", oracle=_LSH_MULTIPROBE_ORACLE)
def ann_lsh_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: the query's bucket plus every Hamming-1
    neighbor (one hyperplane vote flipped) — measured 2× the recall
    of single-probe at identical bits on the fixture (adversarially
    far vectors), at (bits+1)/2^bits scan fraction. PROMOTED from
    rows-only (r8): the probe set is the query signature XOR each
    power of two — with the sha256-derived planes inlined as
    literals (the ``ann_lsh_topk`` r6 recipe) the oracle replays
    bucket assignment, the 5-bucket probe list, and the in-bucket
    exact cosine top-10, so the result hash-matches. Recall-dominates-
    single-probe stays pinned in tests."""
    emb = load_table(spark, "embeddings", sf_dir)
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return ann_lsh_topk(emb, qv, vec_col="embedding", id_col="vec_id",
                        k=10, bits=4, multi_probe=True)


@query("multimodal_byte_features")  # mapInPandas plumbing ⇒ rows-only
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline: documents' bytes wrapped as
    media rows (payload + typed metadata struct) → Arrow-batched
    mapInPandas decode/featurize (decode stubbed: deterministic byte
    histogram — container has no codec libs; plumbing is real).
    Aggregated per kind so output is small and stable."""
    docs = load_table(spark, "documents", sf_dir)
    feats = extract_features(binarize_documents(docs))
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
            F.round(F.avg("byte_entropy"), 4).alias("avg_entropy"),
            F.round(F.avg(F.element_at("feature", 1)), 4).alias("avg_feat0"),
        )
    )


MEDIA_PROFILE_DOCS = 20  # fixed carve: payload content is md5-derived
_HEXD = "0123456789abcdef"


def _md5_ppm_media(docs: DataFrame, salt: str) -> DataFrame:
    """Shared fixture construction for the two checked media queries:
    an 8×8 RGB PPM per doc whose 192 raster bytes are the
    md5(salt|doc_id|j) digests for j in 0..11, assembled JVM-side via
    unhex(concat(md5…)) — whole-stage codegen, zero Python. BOTH
    DuckDB oracles replay this exact byte recipe, so the builder must
    stay byte-identical for both; that is why it is one function."""
    hex_cat = F.concat(*[
        F.md5(F.concat(F.lit(f"{salt}|"), F.col("doc_id").cast("string"),
                       F.lit(f"|{j}")))
        for j in range(12)])
    payload = F.concat(F.lit(b"P6\n8 8\n255\n"), F.unhex(hex_cat))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("ppm").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"))

_MEDIA_PPM_ORACLE = f"""
    SELECT doc_id AS media_id, 'ppm' AS fmt,
           {", ".join(
               f"CAST(SUM(CASE WHEN nib = '{d}' THEN 1 ELSE 0 END) "
               f"AS BIGINT) AS b{i}"
               for i, d in enumerate(_HEXD))}
    FROM (
        SELECT doc_id,
               substr({" || ".join(
                   f"md5('mp|' || CAST(doc_id AS VARCHAR) || '|{j}')"
                   for j in range(12))},
                      2 * g.i - 1, 1) AS nib
        FROM documents,
             (SELECT unnest(generate_series(1, 192)) AS i) g
        WHERE doc_id < {MEDIA_PROFILE_DOCS}
    ) GROUP BY doc_id
"""

_MEDIA_JPEG_ORACLE = f"""
    SELECT doc_id AS media_id, 'jpeg' AS fmt,
           {", ".join(
               f"CAST(CASE WHEN substr(md5('mj|' || CAST(doc_id AS "
               f"VARCHAR)), 1, 1) = '{d}' THEN 64 ELSE 0 END AS BIGINT) "
               f"AS b{i}"
               for i, d in enumerate(_HEXD))}
    FROM documents WHERE doc_id < {MEDIA_PROFILE_DOCS}
"""


@query(
    "media_decode_profile",
    oracle=(_MEDIA_PPM_ORACLE + " UNION ALL " + _MEDIA_JPEG_ORACLE
            + " ORDER BY media_id, fmt"),
)
def media_decode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal family's HASH-CHECKED form: real pixel payloads
    are built in-plan, pushed through the REAL decode path (netpbm +
    baseline-JPEG codecs inside Arrow mapInPandas), and the per-doc
    decoded-intensity bin counts must equal what the DuckDB oracle
    predicts from the md5 generating formula ALONE — the oracle never
    sees a payload, so a hash MATCH certifies the entire Spark-side
    encode → decode → featurize pipeline end to end (payload
    assembly, Arrow batch transfer, header/raster parsing, JPEG
    Huffman + IDCT, histogram featurization).

    Two constructions with exact decode guarantees:
    - ppm: an 8×8 RGB raster whose 192 bytes are md5('mp|'||doc_id
      ||'|'||j) digests — built JVM-side via unhex(concat(md5…)), so
      payload assembly is whole-stage codegen, zero Python. Netpbm
      decode is lossless; bin b = count of bytes with high nibble b,
      which in the oracle is a count over the digests' odd hex chars.
    - jpeg: a solid-color 8×8 grayscale image (value = first byte of
      md5('mj|'||doc_id)) encoded by the pure-python encoder inside
      mapInPandas with the all-ones quant table. A DC-only block
      round-trips bit-exactly through quantization + IDCT (pinned in
      tests for all 256 values), so all 64 decoded pixels land in the
      value's nibble bin.

    Counts are recovered from the normalized float32 histogram by
    round(f·n) — exact for all k/n at these n (pinned in tests), so
    the checked columns are pure BIGINTs with no float discipline
    risk. Fixed 20-doc carve: the decode work is per-payload constant;
    scale comes from the mapInPandas batch path, which the rows-only
    ``multimodal_byte_features`` exercises corpus-wide."""
    docs = (load_table(spark, "documents", sf_dir)
            .where(F.col("doc_id") < MEDIA_PROFILE_DOCS)
            .select("doc_id"))
    media_ppm = _md5_ppm_media(docs, "mp")

    def _jpeg_media(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from flight_data_pipeline_spark.operators.jpeg_codec import (
            encode_jpeg)

        for pdf in batches:
            payloads = [
                encode_jpeg(np.full((8, 8), int(hashlib.md5(
                    f"mj|{did}".encode()).hexdigest()[:2], 16),
                    dtype=np.uint8))
                for did in pdf["doc_id"]]
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "payload": payloads,
                "meta": [{"kind": "image", "format": "jpeg",
                          "n_bytes": len(p)} for p in payloads],
            })

    media_jpeg = docs.mapInPandas(_jpeg_media, schema=MEDIA_SCHEMA)

    def _bins(feats: DataFrame, n_values: int, fmt: str) -> DataFrame:
        return feats.select(
            "media_id",
            F.lit(fmt).alias("fmt"),
            *[F.round(F.element_at("feature", i + 1).cast("double")
                      * n_values).cast("long").alias(f"b{i}")
              for i in range(16)])

    return (
        _bins(extract_features(media_ppm), 192, "ppm")
        .unionByName(_bins(extract_features(media_jpeg), 64, "jpeg"))
        .orderBy("media_id", "fmt")
    )


_MEDIA_GIF_ORACLE = f"""
    SELECT doc_id AS media_id, 'gif' AS fmt,
           {", ".join(
               f"CAST(3 * (SUM(CASE WHEN nib = '{d}' THEN 1 ELSE 0 END)"
               f" + CASE WHEN MAX(bg) = '{d}' THEN 32 ELSE 0 END) "
               f"AS BIGINT) AS b{i}"
               for i, d in enumerate(_HEXD))}
    FROM (
        SELECT doc_id,
               substr(md5('mg|' || CAST(doc_id AS VARCHAR)), g.i, 1) AS nib,
               substr(md5('mgbg|' || CAST(doc_id AS VARCHAR)), 1, 1) AS bg
        FROM documents,
             (SELECT unnest(generate_series(1, 32)) AS i) g
        WHERE doc_id < {MEDIA_PROFILE_DOCS}
    ) GROUP BY doc_id ORDER BY media_id
"""


@query("media_decode_profile_gif", oracle=_MEDIA_GIF_ORACLE)
def media_decode_profile_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF decode hash-certified END TO END (VERDICT r10 item 4) —
    the GIF sibling of ``media_decode_profile``'s JPEG arm: a real
    GIF89a payload is LZW-ENCODED in-plan per doc (multimodal
    .encode_gif inside mapInPandas), decoded by the pure-stdlib
    decoder on the default extract_features path, and the per-doc
    decoded-intensity bins must equal what the oracle predicts from
    the md5 generating formula ALONE — certifying the LZW bitstream
    (variable code width, LSB packing, sub-blocks), the palette
    mapping, AND the logical-screen compositing bytes in one MATCH.

    Construction with exact decode guarantees: a 4×8 frame whose 32
    indices are the hex nibbles of md5('mg|'||doc_id), placed at
    top=2 on an 8×8 logical screen filled with background color
    bg = first nibble of md5('mgbg|'||doc_id); the 16-entry palette
    maps nibble i to gray i·16+8 (bin centers), so decoded bin i
    counts 3·(frame nibbles equal to i, + 32 if bg is i). GIF decode
    is lossless, making every count exact; round(f·192) recovers
    BIGINT counts from the normalized histogram as in the JPEG arm.
    Scale shape identical to media_decode_profile: fixed 20-doc
    carve, map-side build, one Arrow stage."""
    docs = (load_table(spark, "documents", sf_dir)
            .where(F.col("doc_id") < MEDIA_PROFILE_DOCS)
            .select("doc_id"))

    def _gif_media(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from flight_data_pipeline_spark.operators.multimodal import (
            encode_gif)

        palette = np.array([[i * 16 + 8] * 3 for i in range(16)],
                           np.uint8)
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                hx = hashlib.md5(f"mg|{did}".encode()).hexdigest()
                idx = np.array([int(c, 16) for c in hx],
                               np.uint8).reshape(4, 8)
                bg = int(hashlib.md5(
                    f"mgbg|{did}".encode()).hexdigest()[0], 16)
                payloads.append(encode_gif(idx, palette, bg=bg,
                                           screen=(8, 8), top=2))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "payload": payloads,
                "meta": [{"kind": "image", "format": "gif",
                          "n_bytes": len(p)} for p in payloads],
            })

    media_gif = docs.mapInPandas(_gif_media, schema=MEDIA_SCHEMA)
    feats = extract_features(media_gif)
    return (
        feats.select(
            "media_id",
            F.lit("gif").alias("fmt"),
            *[F.round(F.element_at("feature", i + 1).cast("double")
                      * 192).cast("long").alias(f"b{i}")
              for i in range(16)])
        .orderBy("media_id")
    )


_MEDIA_FLAC_ORACLE = f"""
    SELECT doc_id AS media_id, 'flac' AS fmt,
           {", ".join(
               f"CAST(SUM(CASE WHEN bin = {i} THEN 1 ELSE 0 END) "
               f"AS BIGINT) AS b{i}"
               for i in range(16))}
    FROM (
        SELECT doc_id, (v + 32768) // 4096 AS bin FROM (
            SELECT doc_id,
                   CASE WHEN raw >= 32768 THEN raw - 65536
                        ELSE raw END AS v
            FROM (
                SELECT doc_id,
                       ('0x' || substr(
                           md5('ma|' || CAST(doc_id AS VARCHAR)
                               || '|' || CAST(g.j AS VARCHAR)),
                           4 * s.i - 3, 4))::BIGINT AS raw
                FROM documents,
                     (SELECT unnest(generate_series(0, 3)) AS j) g,
                     (SELECT unnest(generate_series(1, 8)) AS i) s
                WHERE doc_id < {MEDIA_PROFILE_DOCS}
            )
        )
    ) GROUP BY doc_id ORDER BY media_id
"""


@query("media_decode_profile_audio", oracle=_MEDIA_FLAC_ORACLE)
def media_decode_profile_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC decode hash-certified END TO END — the audio sibling of
    the ppm/jpeg/gif arms: a real FLAC stream is Rice-ENCODED in-plan
    per doc (flac_codec.encode_flac, fixed-order-1 predictor, inside
    mapInPandas), decoded by the pure-integer decoder on the default
    extract_features path, and the per-doc decoded-AMPLITUDE bins
    must equal what the oracle predicts from the md5 generating
    formula alone — one MATCH certifies the Rice bitstream (unary +
    low bits), the fixed-predictor reconstruction, CRC framing, and
    the [-1,1) sample normalization.

    Construction with exact guarantees: 32 int16 samples per doc —
    the 4-hex-char groups of md5('ma|'||doc_id||'|'||j) for j in
    0..3, sign-corrected — FLAC is lossless so decode returns them
    exactly, and v/32768 is a dyadic rational exact in float32, so
    the 16-bin histogram over [-1, 1) is bin = (v+32768) div 4096 in
    pure integers on both engines; round(f·32) recovers the BIGINT
    counts. Fixed 20-doc carve, map-side build, one Arrow stage —
    the media_decode_profile scale shape."""
    docs = (load_table(spark, "documents", sf_dir)
            .where(F.col("doc_id") < MEDIA_PROFILE_DOCS)
            .select("doc_id"))

    def _flac_media(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from flight_data_pipeline_spark.operators.flac_codec import (
            encode_flac)

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                raw = b"".join(
                    hashlib.md5(f"ma|{did}|{j}".encode()).digest()
                    for j in range(4))
                samples = np.frombuffer(raw, dtype=">i2").astype(np.int64)
                payloads.append(encode_flac(samples, sample_rate=8000,
                                            bps=16, mode="fixed1"))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "payload": payloads,
                "meta": [{"kind": "audio", "format": "flac",
                          "n_bytes": len(p)} for p in payloads],
            })

    media_flac = docs.mapInPandas(_flac_media, schema=MEDIA_SCHEMA)
    feats = extract_features(media_flac)
    return (
        feats.select(
            "media_id",
            F.lit("flac").alias("fmt"),
            *[F.round(F.element_at("feature", i + 1).cast("double")
                      * 32).cast("long").alias(f"b{i}")
              for i in range(16)])
        .orderBy("media_id")
    )


_MEDIA_VIDEO_ORACLE = f"""
    SELECT doc_id AS media_id, 'video' AS fmt,
           CAST(fi AS INTEGER) AS frame_index,
           {", ".join(
               f"CAST(64 * SUM(CASE WHEN nib = '{d}' THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS b{i}"
               for i, d in enumerate(_HEXD))}
    FROM (
        SELECT doc_id, f.fi,
               substr(md5('mv|' || CAST(doc_id AS VARCHAR)
                          || '|' || CAST(f.fi AS VARCHAR)), g.i, 1) AS nib
        FROM documents,
             (SELECT unnest([0, 2, 4]) AS fi) f,
             (SELECT unnest(generate_series(1, 4)) AS i) g
        WHERE doc_id < {MEDIA_PROFILE_DOCS}
    ) GROUP BY doc_id, fi ORDER BY media_id, frame_index
"""


@query("media_decode_profile_video", oracle=_MEDIA_VIDEO_ORACLE)
def media_decode_profile_video(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """VIDEO decode hash-certified END TO END (VERDICT r11 item 1) —
    the last media tier without an oracle-checked query, completing
    the media_decode_profile family (ppm/jpeg/gif/flac/video): a real
    Motion-JPEG-in-MP4 payload is MUXED in-plan per doc (5 JPEG
    frames through mp4_demux.mux_mp4_video inside mapInPandas),
    routed through the PRODUCTION ``sample_frames`` (ISO-BMFF box
    walk → stsd-fourcc MJPEG routing → jpeg_codec entropy decode →
    netpbm re-emission) then ``extract_features`` on the emitted
    frames, and the per-frame decoded-intensity bins must equal what
    the oracle predicts from the md5 generating formula ALONE — one
    MATCH certifies demux arithmetic (stsz/stsc/stco/stts), the
    every_n=2 sampling stride, JPEG entropy decode, the PGM re-emit,
    and the histogram featurization in a single hash.

    Construction with exact decode guarantees: frame f of doc d is a
    16×16 GRAYSCALE image of four 8×8 constant blocks whose values
    are nibble·16+8 (bin centers) for the first 4 hex nibbles of
    md5('mv|'||d||'|'||f) — block-constant gray input round-trips
    encode_jpeg/decode_jpeg byte-exactly at QUANT_ONES (no YCbCr
    rounding: single component), so bin i of a sampled frame counts
    exactly 64·(#nibbles equal to i) of its 256 pixels; round(f·256)
    recovers the BIGINT counts. every_n=2 over 5 frames keeps frames
    {{0, 2, 4}}, which the oracle enumerates literally. Fixed 20-doc
    carve pushed to the parquet scan (doc_id-only ReadSchema, pinned
    by the tests/test_plans.py scan-discipline test), map-side build,
    Arrow stages only — the media_decode_profile scale shape.

    Reference parity: the reference pipeline has no media tier
    (etl_job.py is REST-JSON→postgres); this is extension scope."""
    docs = (load_table(spark, "documents", sf_dir)
            .where(F.col("doc_id") < MEDIA_PROFILE_DOCS)
            .select("doc_id"))

    def _mp4_media(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from flight_data_pipeline_spark.operators.jpeg_codec import (
            encode_jpeg)
        from flight_data_pipeline_spark.operators.mp4_demux import (
            mux_mp4_video)

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                frames = []
                for f in range(5):
                    hx = hashlib.md5(
                        f"mv|{did}|{f}".encode()).hexdigest()[:4]
                    nib = np.array([int(c, 16) for c in hx],
                                   np.uint8).reshape(2, 2)
                    img = np.repeat(np.repeat(nib * 16 + 8, 8, axis=0),
                                    8, axis=1)[:, :, None]
                    frames.append(encode_jpeg(img))
                payloads.append(mux_mp4_video(frames, codec=b"jpeg"))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "payload": payloads,
                "meta": [{"kind": "video", "format": "mp4",
                          "n_bytes": len(p)} for p in payloads],
            })

    media_mp4 = docs.mapInPandas(_mp4_media, schema=MEDIA_SCHEMA)
    frames = sample_frames(media_mp4, every_n=2)
    # the sampled frames are ordinary image media: re-enter the media
    # tier through the SAME extract_features the ppm/gif arms certify
    # (frame_index < 8, so media_id·8+index is collision-free)
    frame_media = frames.select(
        (F.col("media_id") * 8 + F.col("frame_index")).alias("media_id"),
        F.col("frame").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("pgm").alias("format"),
            F.length("frame").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_features(frame_media)
    return (
        feats.select(
            F.floor(F.col("media_id") / 8).cast("long").alias("media_id"),
            F.lit("video").alias("fmt"),
            (F.col("media_id") % 8).cast("int").alias("frame_index"),
            *[F.round(F.element_at("feature", i + 1).cast("double")
                      * 256).cast("long").alias(f"b{i}")
              for i in range(16)])
        .orderBy("media_id", "frame_index")
    )


_MEDIA_HIER_ORACLE = f"""
    SELECT doc_id AS media_id, 'hier' AS fmt,
           {", ".join(
               f"CAST(64 * SUM(CASE WHEN nib = '{d}' THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS b{i}"
               for i, d in enumerate(_HEXD))}
    FROM (
        SELECT doc_id,
               substr(md5('mh|' || CAST(doc_id AS VARCHAR)),
                      g.i, 1) AS nib
        FROM documents,
             (SELECT unnest(generate_series(1, 4)) AS i) g
        WHERE doc_id < {MEDIA_PROFILE_DOCS}
    ) GROUP BY doc_id ORDER BY media_id
"""


@query("media_decode_profile_hier", oracle=_MEDIA_HIER_ORACLE)
def media_decode_profile_hier(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """HIERARCHICAL + arithmetic JPEG hash-certified end to end
    (r13) — one payload per doc exercises the round's entire new
    T.81 surface in a single oracle-checked pass: an arithmetic
    LOSSLESS first frame (SOF11, the H.1.2.2 QM conditioning model),
    EXP reference expansion, a differential PROGRESSIVE arithmetic
    frame (SOF14: PRED=0 QM DC scan + spectral-selection AC band
    scans), and an arithmetic differential-lossless correction frame
    (SOF15). Because the pyramid base and the correction frame are
    both lossless, decode is BIT-EXACT by construction — so the
    oracle predicts the decoded-intensity bins from the md5
    generating formula alone, never seeing a payload, and one hash
    MATCH certifies the QM coder, all three new frame types, the
    Annex-J pyramid walk, and the histogram featurization together.

    Construction (the media_decode_profile_video image formula): doc
    d's image is 16×16 GRAYSCALE, four 8×8 constant blocks valued
    nibble·16+8 for the first 4 hex nibbles of md5('mh|'||d) — so
    bin i counts exactly 64·(#nibbles equal to i) of the 256 pixels,
    recovered from the normalized histogram by round(f·256). Fixed
    20-doc carve pushed to the parquet scan (doc_id-only ReadSchema,
    pinned with the gif/audio/video siblings in tests/test_plans.py),
    map-side payload build, Arrow stages only.

    Reference parity: the reference pipeline has no media tier
    (etl_job.py is REST-JSON→postgres); extension scope."""
    docs = (load_table(spark, "documents", sf_dir)
            .where(F.col("doc_id") < MEDIA_PROFILE_DOCS)
            .select("doc_id"))

    def _hier_media(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from flight_data_pipeline_spark.operators.jpeg_codec import (
            encode_jpeg_hierarchical)

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                hx = hashlib.md5(
                    f"mh|{did}".encode()).hexdigest()[:4]
                nib = np.array([int(c, 16) for c in hx],
                               np.uint8).reshape(2, 2)
                img = np.repeat(np.repeat(
                    nib.astype(np.int64) * 16 + 8, 8, axis=0),
                    8, axis=1)
                payloads.append(encode_jpeg_hierarchical(
                    img, levels=2, arithmetic=True, progressive=True,
                    first_frame="lossless", lossless_final=True))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"],
                "payload": payloads,
                "meta": [{"kind": "image", "format": "jpeg",
                          "n_bytes": len(p)} for p in payloads],
            })

    media_hier = docs.mapInPandas(_hier_media, schema=MEDIA_SCHEMA)
    return (
        extract_features(media_hier).select(
            "media_id",
            F.lit("hier").alias("fmt"),
            *[F.round(F.element_at("feature", i + 1).cast("double")
                      * 256).cast("long").alias(f"b{i}")
              for i in range(16)])
        .orderBy("media_id")
    )


_MEDIA_QUALITY_ORACLE = f"""
    WITH v AS (
        SELECT doc_id,
               ('0x' || substr({" || ".join(
                   f"md5('mq|' || CAST(doc_id AS VARCHAR) || '|{j}')"
                   for j in range(12))},
                      2 * g.i - 1, 2))::BIGINT AS val
        FROM documents,
             (SELECT unnest(generate_series(1, 192)) AS i) g
        WHERE doc_id < {MEDIA_PROFILE_DOCS}
    )
    SELECT doc_id AS media_id,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(val) AS BIGINT) AS px_sum,
           CAST(SUM(val * val) AS BIGINT) AS px_sumsq,
           CAST(MIN(val) AS INTEGER) AS px_min,
           CAST(MAX(val) AS INTEGER) AS px_max
    FROM v GROUP BY doc_id ORDER BY media_id
"""


@query("media_quality_profile", oracle=_MEDIA_QUALITY_ORACLE)
def media_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-quality gate's hash-checked form — the VALUE-level
    sibling of ``media_decode_profile`` (which checks the bin level):
    md5-derived 8×8 PPM payloads flow through the real decoder into
    ``media_quality``'s exact integer pixel moments (n_px, Σv, Σv²,
    min, max — brightness and contrast are pure arithmetic on these),
    and the DuckDB oracle recomputes every moment from the md5 hex
    pairs alone. A hash MATCH certifies every decoded BYTE, not just
    its high nibble — header bytes leaking into the stats, a channel
    swap, or a stride bug all break Σv/Σv² immediately.

    The full operator (variance-of-Laplacian sharpness, audio
    RMS/clipping) is pinned in pytest with constructed fixtures; this
    checked form covers the cross-engine-replayable integer core.
    Scale shape: map-side payload build (whole-stage codegen md5),
    one Arrow stage, per-doc output."""
    from flight_data_pipeline_spark.operators.multimodal import (
        media_quality)

    docs = (load_table(spark, "documents", sf_dir)
            .where(F.col("doc_id") < MEDIA_PROFILE_DOCS)
            .select("doc_id"))
    return (
        media_quality(_md5_ppm_media(docs, "mq"))
        .select("media_id", "width", "height", "n_px",
                "px_sum", "px_sumsq", "px_min", "px_max")
        .orderBy("media_id")
    )


_IVF_INDEXES: dict = {}  # (applicationId, sf_dir) → built-once IvfIndex
_IVF_CACHE_MAX = 4       # datasets cached per process before eviction


def _ivf_index_for(spark: SparkSession, sf_dir: str):
    """Build the IVF index once per (session, dataset) and reuse it —
    index construction (sampled KMeans + full-set assignment) is an
    offline build job, never part of the query path. The cache is
    capped: beyond _IVF_CACHE_MAX datasets the oldest entry is evicted
    and its persisted assignments unpersisted, so a long-lived session
    iterating over many datasets can't pin unbounded executor storage
    (ADVICE r2)."""
    from flight_data_pipeline_spark.operators.vectors import build_ivf_index

    key = (spark.sparkContext.applicationId, sf_dir)
    idx = _IVF_INDEXES.get(key)
    if idx is None:
        while len(_IVF_INDEXES) >= _IVF_CACHE_MAX:
            oldest = next(iter(_IVF_INDEXES))  # dicts preserve insertion order
            _IVF_INDEXES.pop(oldest).unpersist()
        emb = load_table(spark, "embeddings", sf_dir)
        idx = build_ivf_index(emb, vec_col="embedding", id_col="vec_id",
                              n_lists=16, seed=42)
        _IVF_INDEXES[key] = idx
    return idx


# ann_ivf_topk is registered further down, after _KM_CENTS_SQL: the
# checked form replays md5-seeded integer centroids on both engines
# (the semdedup_prune_stats r8 recipe). The trained-KMeans IVF path
# stays query-exposed through the ann_ivf_pq_topk family below, which
# keeps using _ivf_index_for's persisted sampled-KMeans index.


@query(
    "closest_pair_per_label",
    oracle=f"""
    SELECT label,
           vec_a,
           vec_b,
           sim AS cosine_sim
    FROM (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS sim,
               ROW_NUMBER() OVER (
                   PARTITION BY a.label
                   ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                         CAST(b.embedding AS DOUBLE[])), 4) DESC,
                            a.vec_id, b.vec_id) AS rn
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    WHERE rn = 1
    ORDER BY label
    """,
)
def closest_pair_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, blocked by label: the most
    similar vector pair within each label (the dedup family's
    embedding member — with a real-dup corpus the same query takes a
    threshold filter instead of top-1). Label blocking bounds the
    pair join exactly like `source` does for text jaccard; the grouped
    top-1 is one window pass over the pair stream."""
    from flight_data_pipeline_spark.operators.relational import top_k_per_group
    from flight_data_pipeline_spark.operators.vectors import as_double, cosine

    emb = load_table(spark, "embeddings", sf_dir)
    a = emb.select(F.col("label"), F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("ea"))
    b = emb.select(F.col("label"), F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, ["label"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "label", "vec_a", "vec_b",
            F.round(cosine(as_double(F.col("ea")), as_double(F.col("eb"))), 4)
            .alias("cosine_sim"),
        )
    )
    best = top_k_per_group(
        pairs, ["label"],
        [F.desc("cosine_sim"), F.asc("vec_a"), F.asc("vec_b")], k=1,
    )
    return best.select("label", "vec_a", "vec_b", "cosine_sim")


NEAR_DUP_COS = 0.32  # pinned: yields a meaningful pair set on the fixture


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    SELECT a.label  AS label,
           a.vec_id AS vec_a,
           b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cosine_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= {NEAR_DUP_COS}
    ORDER BY label, vec_a, vec_b
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold form of embedding-cosine near-dup detection: ALL
    pairs within a label whose cosine ≥ threshold — what a dedup
    pipeline actually consumes (closest_pair_per_label is the top-1
    diagnostic view of the same pair stream). Exactly SQL-expressible,
    so this is the checked twin; closest_pair_per_label_lsh is the
    banded scale path for the same semantics."""
    from flight_data_pipeline_spark.operators.vectors import as_double, cosine

    emb = load_table(spark, "embeddings", sf_dir)
    a = emb.select(F.col("label"), F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("ea"))
    b = emb.select(F.col("label"), F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("eb"))
    return (
        a.join(b, ["label"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "label", "vec_a", "vec_b",
            F.round(cosine(as_double(F.col("ea")), as_double(F.col("eb"))), 4)
            .alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= NEAR_DUP_COS)
    )


# multi-band replay: band b of lsh_candidate_pairs(bits=4, bands=3)
# uses the salt=64*b plane family
_LSH_BAND_SIGS = [_lsh_sig_sql(64 * b) for b in range(3)]

_CLOSEST_LSH_ORACLE = f"""
    WITH sig AS (
        SELECT label, vec_id, embedding,
               ({_LSH_BAND_SIGS[0]}) AS s0,
               ({_LSH_BAND_SIGS[1]}) AS s1,
               ({_LSH_BAND_SIGS[2]}) AS s2
        FROM embeddings
    ),
    scored AS (
        SELECT a.label  AS label,
               a.vec_id AS vec_a,
               b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 4) AS cosine_sim
        FROM sig a JOIN sig b
          ON a.label = b.label AND a.vec_id < b.vec_id
         AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2)
    )
    SELECT label, vec_a, vec_b, cosine_sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                   ORDER BY cosine_sim DESC, vec_a, vec_b) AS rn
        FROM scored) WHERE rn = 1
"""


@query("closest_pair_per_label_lsh", oracle=_CLOSEST_LSH_ORACLE)
def closest_pair_per_label_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-blocked twin of closest_pair_per_label: candidate pairs
    come from multi-band hyperplane buckets (within each label) instead
    of the label-wide all-pairs join — the shape that survives one
    huge label at 100 TB, where a per-block quadratic join does not.
    Same output schema as the exact query; recall vs the exact pair
    set is pinned in tests/test_extensions.py.

    PROMOTED from rows-only (r9), the ``ann_lsh_topk`` r6 recipe
    extended to the multi-band family: the oracle inlines all THREE
    salt-offset plane families (salt=0/64/128, sha256-derived
    literals, repr-round-tripped doubles) and replays candidate
    generation itself — a pair is a candidate iff it shares ANY band
    signature within its label — then scores ROUND(cos, 4) and takes
    the per-label top-1 with the same (sim DESC, vec_a, vec_b)
    tie-break. "Approximate" means approximate RECALL vs the exact
    all-pairs twin, not nondeterminism: on identical planes both
    engines derive the identical candidate set. (The oracle's
    label-wide pair join is fixture-scale only — the Spark plan joins
    banded buckets, never all pairs.)"""
    from flight_data_pipeline_spark.operators.relational import top_k_per_group
    from flight_data_pipeline_spark.operators.vectors import (
        as_double,
        cosine,
        lsh_candidate_pairs,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cands = lsh_candidate_pairs(emb, vec_col="embedding", id_col="vec_id",
                                block_col="label", bits=4, bands=3)
    ea = emb.select(F.col("label"), F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = (
        cands.join(ea, "id_a").join(eb, "id_b")
        .select(
            "label",
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round(cosine(as_double(F.col("ea")), as_double(F.col("eb"))), 4)
            .alias("cosine_sim"),
        )
    )
    best = top_k_per_group(
        pairs, ["label"],
        [F.desc("cosine_sim"), F.asc("vec_a"), F.asc("vec_b")], k=1,
    )
    return best.select("label", "vec_a", "vec_b", "cosine_sim")


@query(
    "embedding_norm_outliers",
    oracle="""
    WITH norms AS (
        SELECT label,
               sqrt(list_sum(list_transform(embedding,
                                            x -> CAST(x AS DOUBLE) * x)))
                   AS norm
        FROM embeddings
    ),
    stats AS (
        SELECT label, norm,
               AVG(norm) OVER (PARTITION BY label) AS mu,
               STDDEV_SAMP(norm) OVER (PARTITION BY label) AS sigma
        FROM norms
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(norm), 4) AS avg_norm,
           ROUND(MAX(sigma), 4) AS std_norm,
           CAST(SUM(CASE WHEN ABS(norm - mu) > 2 * sigma THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM stats
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QC audit: per-label L2-norm distribution plus a
    2-sigma outlier count (degenerate / corrupted vectors surface as
    norm outliers before they poison ANN recall). Two-pass z-score as
    ONE label-partitioned window over map-side norms — the stats and
    the flags share a single shuffle; no self-join, nothing on the
    driver. Labels with one vector have NULL sigma ⇒ zero outliers on
    both sides."""
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir)
    w = Window.partitionBy("label")
    norms = emb.select(
        "label", l2_norm(as_double(F.col("embedding"))).alias("norm"))
    stats = norms.select(
        "label", "norm",
        F.avg("norm").over(w).alias("mu"),
        F.stddev_samp("norm").over(w).alias("sigma"))
    return (
        stats.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.max("sigma"), 4).alias("std_norm"),
            F.sum(F.when(F.abs(F.col("norm") - F.col("mu"))
                         > 2 * F.col("sigma"), 1).otherwise(0))
            .alias("n_outliers"),
        )
    )


SEMDEDUP_TAU = NEAR_DUP_COS  # reuse the fixture-meaningful threshold
KM_K = 8      # md5-seeded centroids (shared with kmeans_assignment_round)
KM_DIM = 64   # fixture embedding width

_KM_CENTS_SQL = f"""
    SELECT k, list_transform(range(1, {KM_DIM} + 1), d ->
               ('0x' || substr(md5('km' || CAST(k AS VARCHAR) || '_'
                                   || CAST(d AS VARCHAR)), 1, 8))::BIGINT
               % 2001 - 1000) AS c
    FROM (SELECT UNNEST(range(0, {KM_K})) AS k)
"""


IVF_N_PROBE = 2  # lists probed of KM_K in the checked IVF query

_IVF_QUANT_D2 = (
    "list_sum(list_transform(range(1, {dim} + 1), i -> "
    "(CAST(FLOOR(CAST({vec}[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
    " - cents.c[i]) * "
    "(CAST(FLOOR(CAST({vec}[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
    " - cents.c[i])))")

_IVF_TOPK_ORACLE = f"""
    WITH cents AS ({_KM_CENTS_SQL}),
    q AS (SELECT embedding AS qe FROM embeddings
          WHERE vec_id = {QUERY_VEC_ID}),
    qd2 AS (
        SELECT cents.k,
               {_IVF_QUANT_D2.format(dim=KM_DIM, vec='q.qe')} AS d2
        FROM cents CROSS JOIN q
    ),
    probe AS (SELECT k FROM qd2 ORDER BY d2, k LIMIT {IVF_N_PROBE}),
    dist2 AS (
        SELECT e.vec_id, e.embedding, cents.k,
               {_IVF_QUANT_D2.format(dim=KM_DIM, vec='e.embedding')} AS d2
        FROM embeddings e CROSS JOIN cents
    ),
    asn AS (
        SELECT vec_id, embedding, k FROM (
            SELECT vec_id, embedding, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, k) AS rn
            FROM dist2) WHERE rn = 1
    )
    SELECT asn.vec_id,
           ROUND(list_cosine_similarity(
               CAST(asn.embedding AS DOUBLE[]),
               CAST(q.qe AS DOUBLE[])), 4) AS cosine_sim
    FROM asn CROSS JOIN q
    WHERE asn.k IN (SELECT k FROM probe)
    ORDER BY cosine_sim DESC, asn.vec_id LIMIT 10
"""


@query("ann_ivf_topk", oracle=_IVF_TOPK_ORACLE)
def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k: probe the ``IVF_N_PROBE``
    coarse lists nearest the pinned query vector, exact rounded
    cosine within — the second ANN scale path beside hyperplane LSH
    (scan fraction ≈ n_probe/n_lists; files outside the probed lists
    are partition-pruned when the index is written
    partitionBy(ivf_list), see operators/vectors.IvfIndex.write).

    PROMOTED from rows-only (r9), the ``semdedup_prune_stats`` r8
    recipe: the coarse quantizer is the md5-seeded integer milli-unit
    centroid set + quantized-Lloyd argmin both engines rebuild
    bit-identically (pure BIGINT arithmetic, order-free), so list
    assignment AND probe selection (same integer d2, (d2, k)
    tie-break) replay exactly on the oracle; the in-list scoring is
    the checked ROUND(cos, 4) discipline. "Approximate" means
    approximate RECALL vs the exact scan, not nondeterminism. The
    trained-KMeans IVF index (sampled, persisted, session-cached)
    remains the production quantizer, exercised by the
    ann_ivf_pq_topk family and its recall tests."""
    from flight_data_pipeline_spark.operators.vectors import (
        as_double,
        cosine,
        md5_seed_centroids,
        quantized_lloyd_assignment,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cents = md5_seed_centroids(spark, KM_K, KM_DIM)
    asn = quantized_lloyd_assignment(emb, cents).select("vec_id", "k")
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    # probe selection: integer d2 of the quantized query against every
    # centroid (a KM_K-row broadcast), (d2, k) tie-break — replayed
    # verbatim in the oracle's qd2/probe CTEs
    qq = qv.select(F.expr(
        "transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))").alias("q"))
    qd2 = qq.crossJoin(F.broadcast(cents)).select(
        "k",
        F.expr("aggregate(zip_with(q, c, (x, ci) -> (x - ci) * (x - ci)), "
               "CAST(0 AS BIGINT), (acc, v) -> acc + v)").alias("d2"))
    probe = qd2.orderBy("d2", "k").limit(IVF_N_PROBE).select("k")
    qdf = qv.select(as_double(F.col("embedding")).alias("__qvec"))
    return (
        emb.join(asn, "vec_id")
        .join(F.broadcast(probe), "k", "left_semi")
        .crossJoin(F.broadcast(qdf))
        .select(
            "vec_id",
            F.round(cosine(as_double(F.col("embedding")), F.col("__qvec")), 4)
            .alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(10)
    )


@query(
    "semdedup_prune_stats",
    oracle=f"""
    WITH RECURSIVE cents AS ({_KM_CENTS_SQL}),
    dist2 AS (
        SELECT e.vec_id, e.embedding, cents.k,
               list_sum(list_transform(range(1, {KM_DIM} + 1), i ->
                   (CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000 + 0.5)
                         AS BIGINT) - cents.c[i])
                 * (CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000 + 0.5)
                         AS BIGINT) - cents.c[i]))) AS d2
        FROM embeddings e CROSS JOIN cents
    ),
    asn AS (
        SELECT vec_id, embedding, k FROM (
            SELECT vec_id, embedding, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, k) AS rn
            FROM dist2) WHERE rn = 1
    ),
    edges AS (
        SELECT a.vec_id AS s, b.vec_id AS d
        FROM asn a JOIN asn b ON a.k = b.k AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 4) >= {SEMDEDUP_TAU}
    ),
    sym AS (SELECT s AS a, d AS b FROM edges
            UNION SELECT d, s FROM edges),
    reach(v, lab) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.v
    ),
    labels AS (SELECT v, MIN(lab) AS lab FROM reach GROUP BY v),
    tot AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
    nl AS (SELECT COUNT(DISTINCT k) AS n_lists FROM asn),
    comp AS (
        SELECT COUNT(*) AS n_near_dup_vecs,
               COUNT(DISTINCT lab) AS n_components,
               SUM(CASE WHEN v <> lab THEN 1 ELSE 0 END) AS n_pruned
        FROM labels
    )
    SELECT CAST(n_vecs AS BIGINT)          AS n_vecs,
           CAST(n_lists AS BIGINT)         AS n_lists,
           CAST(n_near_dup_vecs AS BIGINT) AS n_near_dup_vecs,
           CAST(n_components AS BIGINT)    AS n_components,
           CAST(COALESCE(n_pruned, 0) AS BIGINT) AS n_pruned,
           ROUND((n_vecs - COALESCE(n_pruned, 0)) * 1.0 / n_vecs, 4)
               AS keep_rate
    FROM tot, nl, comp
    """,
)
def semdedup_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup audit: prune counts from cluster-scoped embedding
    dedup — τ-cosine components computed only within coarse k-means
    lists, keep the min-id vector per component. One summary row:
    corpus size, cluster count, vectors touching a τ-edge, component
    count, pruned count, keep rate.

    PROMOTED from rows-only (r8), by making every stage replayable:
    (1) list assignment uses the md5-seeded integer milli-unit
    centroids + quantized Lloyd argmin of the checked
    ``kmeans_assignment_round`` (bit-identical on both engines)
    instead of the session's sampled-KMeans IVF index — the paper's
    semantics are "any coarse clustering scopes the pair space", so
    a deterministic clustering is a faithful instance, and the
    trained-IVF scale path stays exercised by the ANN tier queries;
    (2) τ-edges compare the ROUND(cos, 4) sim (the
    ``embedding_near_dup_pairs`` discipline); (3) the oracle replays
    min-label connected components exactly with a recursive CTE
    (set-semantics UNION reaches the same fixpoint the operator's
    converged pointer-jumping loop returns). The keep/prune contract
    additionally stays pinned by property tests (kept set is
    τ-independent within every list, components match a union-find
    oracle)."""
    from flight_data_pipeline_spark.operators.vectors import (
        md5_seed_centroids,
        quantized_lloyd_assignment,
        semdedup_labels,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    asn = (
        emb.join(
            quantized_lloyd_assignment(
                emb, md5_seed_centroids(spark, KM_K, KM_DIM))
            .select("vec_id", F.col("k").alias("ivf_list")),
            "vec_id")
    )
    # max_iter=24: the md5-seeded coarse lists (unlike trained KMeans
    # lists) leave long-diameter τ-chains on the near-random fixture —
    # 10 pointer-jumping rounds measurably split one component at
    # sf0.01; the loop early-exits on convergence so the higher cap
    # costs nothing once settled. strict=True: this query is
    # oracle-checked, so non-convergence at a larger sf must surface
    # as a clear error, not a downstream hash MISMATCH.
    labels = semdedup_labels(asn, tau=SEMDEDUP_TAU, sim_digits=4,
                             max_iter=24, strict=True)
    totals = asn.agg(
        F.count("*").alias("n_vecs"),
        F.countDistinct("ivf_list").alias("n_lists"))
    comp = labels.agg(
        F.count("*").alias("n_near_dup_vecs"),
        F.countDistinct("label").alias("n_components"),
        F.sum((F.col("v") != F.col("label")).cast("bigint"))
        .alias("n_pruned"))
    return (
        totals.crossJoin(comp)
        .select(
            "n_vecs", "n_lists", "n_near_dup_vecs", "n_components",
            F.coalesce(F.col("n_pruned"), F.lit(0)).alias("n_pruned"),
            F.round((F.col("n_vecs") - F.coalesce(F.col("n_pruned"), F.lit(0)))
                    / F.col("n_vecs"), 4).alias("keep_rate"),
        )
    )


EVAL_MOD = 17  # deterministic eval-set carve: vec_id % 17 == 0


@query(
    "embedding_decontamination_audit",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE vec_id % {EVAL_MOD} = 0
    ),
    tr AS (
        SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id % {EVAL_MOD} <> 0
    ),
    best AS (
        SELECT tr.label, tr.vec_id,
               MAX(ROUND(list_cosine_similarity(tr.e, ev.e), 4))
                   AS max_cos4
        FROM tr CROSS JOIN ev
        GROUP BY tr.label, tr.vec_id
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST((SELECT COUNT(*) FROM ev) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN max_cos4 >= {NEAR_DUP_COS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN max_cos4 >= {NEAR_DUP_COS}
                         THEN vec_id ELSE 0 END) AS BIGINT)
               AS contaminated_checksum,
           MAX(max_cos4) AS top_cos4
    FROM best GROUP BY label ORDER BY label
    """,
)
def embedding_decontamination_audit(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """EMBEDDING-space decontamination — the semantic twin of the
    n-gram/Bloom benchmark decontamination family: a deterministic
    eval carve-out (vec_id % EVAL_MOD (=17) == 0, the held-out benchmark
    stand-in) is screened against every training vector; a train
    vector whose best eval cosine clears the near-dup threshold is a
    semantic leak an n-gram overlap can miss (paraphrases). Reports
    per label: train/eval sizes, contaminated count + id checksum
    (membership pinned, not just counts), and the worst similarity.

    Checked via the ROUND(cos, 4)-before-threshold discipline; MAX of
    identically-rounded values is engine-identical.

    Scale shape — the production decontamination plan: the EVAL side
    is tiny (benchmarks are KBs against 100 TB of train), so it rides
    a broadcast as ONE collected row of eval vectors and the
    per-train-row best-eval-cosine is a map-side array fold — the
    |train| × |eval| work happens entirely inside the scan, no
    train-side self-join and NO per-train-row shuffle (the r8 form's
    groupBy(label, vec_id) partial-MAX exchanged one summary row per
    train vector — correct but linear shuffle; measured in the r9
    scale curve, this fold form's shuffle is flat per-label partials
    only). The LSH/IVF tiers in this file are the sub-linear path
    when eval outgrows broadcast."""
    from flight_data_pipeline_spark.operators.vectors import (
        as_double,
        l2_norm,
    )

    from flight_data_pipeline_spark.session import cpu_dense_partitions

    emb = load_table(spark, "embeddings", sf_dir)
    # norms hoisted to per-ROW columns before the fan-out: inside the
    # |train|x|eval| loop only the dot remains (the norm folds would
    # otherwise re-run per PAIR — 3x the HOF work); same operands and
    # association as cosine(), so values are IEEE-identical
    ev = (emb.where(F.col("vec_id") % EVAL_MOD == 0)
          .select(as_double(F.col("embedding")).alias("ev_e"))
          .select("ev_e", l2_norm(F.col("ev_e")).alias("ev_n")))
    # vec_id-repartitioned BEFORE the |train|×|eval| fold: the fixture
    # scan is one file → ONE task, so the whole fan-out — the query's
    # entire CPU — serialized on a single core (measured r14: 9 tasks
    # total, 1.6 s single-task stage wall at sf0.1/local[32]); the
    # same cpu-dense-width fix as the r13 simhash/minhash/bloom
    # widens (guide §2.5 — bytes are the wrong work proxy for a
    # row-expanding fold stage). Per-row values are untouched.
    tr = (emb.where(F.col("vec_id") % EVAL_MOD != 0)
          .repartition(cpu_dense_partitions(spark), "vec_id")
          .select("label", "vec_id",
                  as_double(F.col("embedding")).alias("tr_e"))
          .select("label", "vec_id", "tr_e",
                  l2_norm(F.col("tr_e")).alias("tr_n")))
    n_eval = ev.agg(F.count("*").alias("n_eval"))
    # ONE row holding every eval (vector, norm): broadcast-attached so
    # the per-train-row fold below runs inside the train scan. The
    # inner dot is the same zip_with/aggregate fold as dot() over the
    # same operand values, so sims are IEEE-identical to the r8
    # join+groupBy form (the oracle hash pins this).
    ev_pack = ev.agg(
        F.collect_list(F.struct("ev_e", "ev_n")).alias("evs"))
    best = (
        tr.crossJoin(F.broadcast(ev_pack))
        .select(
            "label", "vec_id",
            F.expr("""
                aggregate(evs, CAST(-2.0 AS DOUBLE), (acc, ev) ->
                    greatest(acc, round(
                        aggregate(zip_with(tr_e, ev.ev_e,
                                           (x, y) -> x * y),
                                  CAST(0.0 AS DOUBLE),
                                  (a, v) -> a + v)
                        / (tr_n * ev.ev_n), 4)))
            """).alias("max_cos4"))
    )
    contaminated = F.col("max_cos4") >= NEAR_DUP_COS
    return (
        best.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            F.sum(F.when(contaminated, 1).otherwise(0)).cast("long")
            .alias("n_contaminated"),
            F.sum(F.when(contaminated, F.col("vec_id")).otherwise(0))
            .cast("long").alias("contaminated_checksum"),
            F.max("max_cos4").alias("top_cos4"),
        )
        .crossJoin(F.broadcast(n_eval))
        .select("label", "n_train",
                F.col("n_eval").cast("long").alias("n_eval"),
                "n_contaminated", "contaminated_checksum", "top_cos4")
        .orderBy("label")
    )


@query(
    "doc_embedding_quality_join",
    oracle=f"""
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * x)))), 4) AS avg_norm,
           ROUND(AVG(len(string_split(d.text, ' '))), 4) AS avg_tokens
    FROM (
        SELECT doc_id, text,
               CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 500
                     AND len(list_filter(string_split(text, ' '),
                                         t -> t IN ({_SW_SQL})))
                         * 1.0 / len(string_split(text, ' '))
                         BETWEEN 0.0 AND 0.8
                    THEN 'good' ELSE 'low' END AS band
        FROM documents
    ) d
    JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY band
    ORDER BY band
    """,
)
def doc_embedding_quality_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal audit: the text-quality band of each document
    joined to its embedding row (doc_id = vec_id — the layout a
    multimodal training table uses), rolled up to per-band counts,
    mean embedding norm, and mean token length. One equi-join on the
    id key (both sides shuffle-hash on it; at 100 TB the two tables
    would be co-bucketed on the id so this join is zero-shuffle —
    see tests/test_bucketed_join.py) and one small aggregate."""
    from flight_data_pipeline_spark.operators.text import (
        quality_band,
        token_count,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        quality_band(F.col("text")).alias("band"),
        token_count(F.col("text")).alias("n_tok"))
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        l2_norm(as_double(F.col("embedding"))).alias("norm"))
    return (
        docs.join(emb, "doc_id")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
    )


_PQ_CACHE: dict = {}  # (applicationId, sf_dir) → (codebooks, encoded)
_PQ_CACHE_MAX = 4


def _pq_for(spark: SparkSession, sf_dir: str):
    """Train PQ codebooks + encode the IVF assignments once per
    (session, dataset) — codebook training and corpus encoding are
    offline index-build steps (the one Arrow/numpy kernel in the
    vector family), never part of the query path. Cache capped like
    the IVF cache."""
    from flight_data_pipeline_spark.operators.vectors import (
        pq_encode,
        train_pq_codebooks,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PQ_CACHE.get(key)
    if hit is None:
        while len(_PQ_CACHE) >= _PQ_CACHE_MAX:
            _PQ_CACHE.pop(next(iter(_PQ_CACHE)))[1].unpersist()
        idx = _ivf_index_for(spark, sf_dir)
        cb = train_pq_codebooks(idx.assignments, "embedding",
                                m=8, ksub=16, seed=42)
        encoded = pq_encode(idx.assignments, "embedding", cb).persist()
        hit = (cb, encoded)
        _PQ_CACHE[key] = hit
    return hit


@query("ann_ivf_pq_topk")  # approximate + iterative training ⇒ rows-only
def ann_ivf_pq_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact refinement — the billion-scale ANN layout
    (Jégou et al. TPAMI 2011; the FAISS IVFPQ recipe, public): coarse
    IVF probe prunes to 4/16 lists (partition pruning in the durable
    index form), 8-byte PQ codes ADC-score the survivors through a
    broadcast lookup-table join (no Python, no raw vectors touched),
    and exact cosine re-ranks only the 100-row shortlist. Rows-only:
    KMeans-trained and approximate by design; shortlist recall floor
    vs exact is pinned in tests/test_extensions.py::TestPq."""
    from flight_data_pipeline_spark.operators.vectors import pq_refined_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    idx = _ivf_index_for(spark, sf_dir)
    cb, encoded = _pq_for(spark, sf_dir)
    return pq_refined_topk(encoded, emb, qv, cb, "embedding", "vec_id",
                           k=10, shortlist=100, index=idx, n_probe=4)


# Matryoshka (MRL) truncation audit: prefix dimensions to evaluate.
MRL_DIMS = (8, 16, 32, 64)


@query(
    "matryoshka_dim_audit",
    oracle=f"""
    WITH dims AS (SELECT unnest([{", ".join(map(str, MRL_DIMS))}]) AS dim),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = {QUERY_VEC_ID}
    ),
    p AS (
        SELECT e.vec_id, d.dim,
               list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[])[1:d.dim],
                   (SELECT qv FROM q)[1:d.dim]) AS cd,
               list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   (SELECT qv FROM q)) AS cf
        FROM embeddings e CROSS JOIN dims d
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY dim
                   ORDER BY ROUND(cd, 6) DESC, vec_id) AS rd,
               ROW_NUMBER() OVER (PARTITION BY dim
                   ORDER BY ROUND(cf, 6) DESC, vec_id) AS rf
        FROM p
    )
    SELECT dim,
           ROUND(AVG(ABS(cd - cf)), 4) AS avg_abs_cos_err,
           ROUND(SUM(CASE WHEN rd <= 10 AND rf <= 10
                     THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
    FROM r GROUP BY dim
    ORDER BY dim
    """,
)
def matryoshka_dim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit: how much similarity signal
    each PREFIX of the embedding keeps — per truncation dim, the mean
    |cosine_prefix − cosine_full| against a pinned query vector and
    the top-10 recall of the truncated ranking. The measurement
    behind the MRL serving trade (search shortlists on cheap prefix
    dims, re-rank on full vectors — the same shortlist+refine shape
    as the IVF-PQ path).

    Plan: one broadcast of the single query row, a 4× explode over
    the audited dims, map-side sliced-cosine arithmetic, and two
    rankings per dim over the (dims × corpus) frame — windows and
    the final rollup all partition on dim. Sims are rounded BEFORE
    ranking on both engines so float summation order can't flip a
    rank at the cut."""
    from flight_data_pipeline_spark.operators.vectors import (
        as_double,
        cosine,
    )
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        as_double(F.col("embedding")).alias("qv"))
    p = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.explode(F.array(*[F.lit(d) for d in MRL_DIMS])).alias("dim"),
            as_double(F.col("embedding")).alias("ev"),
            "qv")
        .select(
            "vec_id", "dim",
            cosine(F.slice("ev", 1, F.col("dim")),
                   F.slice("qv", 1, F.col("dim"))).alias("cd"),
            cosine(F.col("ev"), F.col("qv")).alias("cf"))
    )
    wd = Window.partitionBy("dim")
    r = p.select(
        "*",
        F.row_number().over(
            wd.orderBy(F.round("cd", 6).desc(), "vec_id")).alias("rd"),
        F.row_number().over(
            wd.orderBy(F.round("cf", 6).desc(), "vec_id")).alias("rf"),
    )
    return (
        r.groupBy("dim")
        .agg(
            F.round(F.avg(F.abs(F.col("cd") - F.col("cf"))), 4)
            .alias("avg_abs_cos_err"),
            F.round(
                F.sum(F.when((F.col("rd") <= 10) & (F.col("rf") <= 10), 1)
                      .otherwise(0)) / 10.0, 2)
            .alias("recall_at_10"),
        )
        .orderBy("dim")
    )


@query(
    "dedup_signal_agreement",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS t
        FROM documents
    ), text_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.t, b.t))
              * 1.0 / len(list_distinct(list_concat(a.t, b.t))) >= 0.8
    ), emb_pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              >= {NEAR_DUP_COS}
    )
    SELECT CASE WHEN t.id_a IS NOT NULL AND e.id_a IS NOT NULL THEN 'both'
                WHEN t.id_a IS NOT NULL THEN 'text_only'
                ELSE 'embedding_only' END AS signal,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM text_pairs t FULL OUTER JOIN emb_pairs e
      ON t.id_a = e.id_a AND t.id_b = e.id_b
    GROUP BY signal ORDER BY signal
    """,
)
def dedup_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal dedup agreement audit: the verified text-Jaccard
    pair set (near_dup_jaccard_pairs' semantics, source-blocked)
    FULL-OUTER-joined against the embedding-cosine pair set
    (embedding_near_dup_pairs', label-blocked) on the pair key —
    how often the lexical and semantic detectors agree, and what
    each uniquely contributes. The calibration readout a pipeline
    needs before trusting either tier alone: 'both' pairs are safe
    drops, single-signal pairs are the review queue (SemDeDup-style
    semantic dedup is exactly the embedding_only band).

    Plan: two already-bounded pair generators (prefix-filtered
    posting join; label-blocked cosine join) meet in ONE full outer
    join on the (id_a, id_b) key — pair-set cardinality, never
    corpus-sized — and reduce to a 3-row category count."""
    from flight_data_pipeline_spark.operators.dedup import (
        jaccard_pairs_blocked,
    )
    from flight_data_pipeline_spark.operators.vectors import as_double, cosine

    docs = load_table(spark, "documents", sf_dir)
    tp = jaccard_pairs_blocked(
        docs, id_col="doc_id", block_col="source", text_col="text",
        threshold=0.8, prefix_filter=True,
    ).select("id_a", "id_b", F.lit(1).alias("t"))

    emb = load_table(spark, "embeddings", sf_dir)
    a = emb.select("label", F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("ea"))
    b = emb.select("label", F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("eb"))
    ep = (
        a.join(b, ["label"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cosine(as_double(F.col("ea")),
                              as_double(F.col("eb"))), 4) >= NEAR_DUP_COS)
        .select("id_a", "id_b", F.lit(1).alias("e"))
    )
    signal = (
        F.when(F.col("t").isNotNull() & F.col("e").isNotNull(), "both")
        .when(F.col("t").isNotNull(), "text_only")
        .otherwise("embedding_only")
    )
    return (
        tp.join(ep, ["id_a", "id_b"], "full_outer")
        .select(signal.alias("signal"))
        .groupBy("signal")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("signal")
    )


# 64-dim embeddings ⇒ the sign sketch packs into exactly ONE BIGINT.
# DuckDB's checked arithmetic rejects 1::BIGINT << 63, so the sign
# bit is the min-long literal; Spark's shiftleft(1L, 63) wraps to the
# same value.
_SIGN_MASK_DUCK = """list_sum(list_transform(range(0, 64),
    i -> CASE WHEN embedding[i + 1] > 0
              THEN (CASE WHEN i = 63 THEN -9223372036854775807 - 1
                         ELSE (1::BIGINT << i) END)
              ELSE 0::BIGINT END))"""


@query(
    "hamming_sign_topk",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, CAST({_SIGN_MASK_DUCK} AS BIGINT) AS mask
        FROM embeddings
    )
    SELECT m.vec_id,
           CAST(bit_count(xor(m.mask,
                (SELECT mask FROM m WHERE vec_id = {QUERY_VEC_ID}))) AS INT)
               AS hamming
    FROM m
    ORDER BY hamming, vec_id
    LIMIT 10
    """,
)
def hamming_sign_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary sign-sketch ANN — the cheapest similarity tier below
    IVF/PQ: each 64-dim embedding collapses to a single BIGINT of
    sign bits (sign of a dot product with coordinate axes — a 1-bit
    LSH family for cosine), and neighbor search is XOR + popcount —
    pure codegen'd integer ops, 8 bytes per vector, no floats at
    query time. Top-10 by Hamming distance to the pinned query
    vector, tie-broken on id; exact-checked against DuckDB building
    the identical sketch.

    At 100 TB this is the memory-resident prefilter tier: 10^10
    vectors fit in 80 GB of masks; survivors re-rank with exact
    cosine (the cosine_topk_bruteforce plan) — the classic
    sketch-then-rerank cascade. Recall behavior is pinned in
    tests/test_extensions.py (query vector at distance 0; sketch
    distance correlates with cosine rank)."""
    emb = load_table(spark, "embeddings", sf_dir)
    mask_expr = F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + "
        "IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))")
    m = emb.select("vec_id", mask_expr.alias("mask"))
    q = m.where(F.col("vec_id") == 0).select(
        F.col("mask").alias("qmask"))
    return (
        m.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.bit_count(F.col("mask").bitwiseXOR(F.col("qmask")))
            .cast("int").alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(10)
    )


@query(
    "label_medoids",
    oracle="""
    WITH pairs AS (
        SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS sim
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    per AS (
        SELECT label, ia, ROUND(AVG(sim), 4) AS avg_cos
        FROM pairs GROUP BY label, ia
    ),
    ranked AS (
        SELECT label, ia, avg_cos,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY avg_cos DESC, ia) AS rk
        FROM per
    )
    SELECT label, CAST(ia AS BIGINT) AS medoid_id, avg_cos
    FROM ranked WHERE rk = 1 ORDER BY label
    """,
)
def label_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact medoid per label: the member vector with the highest mean
    cosine similarity to the rest of its group — the representative-
    selection step semantic dedup and cluster summarization need (a
    centroid is not a member; a medoid is).

    THE legitimate grouped-``applyInPandas`` shape: per-group work is
    O(k²·d) dense linear algebra on a SMALL group (one numpy matmul
    per label), which no built-in aggregate expresses, while groups
    themselves distribute across executors — one shuffle on the label
    key, Arrow both ways, no driver involvement. Mean similarities
    are ROUNDED to 4 before the argmax on BOTH engines (the
    round-then-rank discipline of cosine_topk_bruteforce) with id
    tie-break, so float association can't flip the winner. Singleton
    groups have no medoid-vs-others semantics and emit nothing
    (matching the oracle's pair join). At 100 TB: group size is
    bounded (labels/clusters), group count is the parallelism; for
    mega-groups switch to the centroid + cosine_topk shortlist."""
    import pandas as pd

    emb = load_table(spark, "embeddings", sf_dir)

    def medoid(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame(
                columns=["label", "medoid_id", "avg_cos"])
        X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        np.fill_diagonal(S, 0.0)
        m = np.round(S.sum(axis=1) / (len(X) - 1), 4)
        ids = pdf["vec_id"].to_numpy()
        cand = np.flatnonzero(m == m.max())
        best = cand[np.argmin(ids[cand])]
        return pd.DataFrame({
            "label": [int(pdf["label"].iloc[0])],
            "medoid_id": [int(ids[best])],
            "avg_cos": [float(m[best])],
        })

    return (
        emb.groupBy("label")
        .applyInPandas(medoid,
                       schema="label int, medoid_id bigint, avg_cos double")
        .orderBy("label")
    )


# --- Quantized / truncated serving tiers (round 6, session 2) ---------------

# Per-vector symmetric int8 quantization: q_i = round(x_i / scale * 127)
# with scale = max|x| — the storage layout vector stores serve from
# (4 bytes/dim → 1 byte/dim). The quantize expression is a
# deterministic function of each stored float (one division, one
# multiplication, one floor — all IEEE correctly-rounded, identical
# expression tree on both engines), so the int8 codes are
# bit-identical cross-engine and the integer dot products are exact.
_Q8_DUCK = """
        list_transform(CAST(embedding AS DOUBLE[]),
            x -> CASE WHEN scale = 0 THEN 0::BIGINT
                      ELSE CAST(FLOOR(x / scale * 127.0 + 0.5) AS BIGINT)
                 END)"""


@query(
    "int8_quantized_cosine_topk",
    oracle=f"""
    WITH scaled AS (
        SELECT vec_id,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x))) AS scale,
               embedding
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, {_Q8_DUCK} AS qv
        FROM scaled
    ),
    paired AS (
        SELECT q.vec_id,
               CAST(list_sum(list_transform(range(64),
                    i -> q.qv[i + 1] * qq.qv[i + 1])) AS BIGINT) AS dot_q,
               CAST(list_sum(list_transform(q.qv, v -> v * v))
                    AS BIGINT) AS na,
               (SELECT CAST(list_sum(list_transform(qv, v -> v * v))
                            AS BIGINT)
                FROM q WHERE vec_id = {QUERY_VEC_ID}) AS nb
        FROM q CROSS JOIN (SELECT qv FROM q
                           WHERE vec_id = {QUERY_VEC_ID}) qq
    )
    SELECT vec_id, dot_q,
           ROUND(dot_q / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 4)
               AS cosine_q8
    FROM paired
    ORDER BY cosine_q8 DESC, vec_id
    LIMIT 10
    """,
)
def int8_quantized_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-10 — the serving-standard compression
    tier between exact float (cosine_topk_bruteforce) and the 1-bit
    sign sketch (hamming_sign_topk): per-vector max-abs symmetric
    quantization to int8 codes, then EXACT integer dot products over
    the codes (|q|≤127, d=64 ⇒ dot ≤ ~10^6, nowhere near overflow).
    The only floats are the final norm division — correctly-rounded
    IEEE ops on identical inputs, rounded to 4 before ranking with id
    tie-breaks, so the cut is engine-stable. ``dot_q`` rides as the
    exact integer audit column.

    At 100 TB: 64 B/vector instead of 256 B — the brute-force scan
    tier gets 4× more vectors per byte of scan, and the integer dot
    kernel vectorizes better than float; survivors re-rank with exact
    cosine if the 4-digit margin matters. One scan, one broadcast of
    the 1-row query code, TakeOrderedAndProject."""
    emb = load_table(spark, "embeddings", sf_dir)
    scaled = emb.select(
        "vec_id",
        F.array_max(F.transform(
            as_double(F.col("embedding")), lambda x: F.abs(x))
        ).alias("scale"),
        "embedding",
    )
    qv = F.expr(
        "transform(CAST(embedding AS ARRAY<DOUBLE>), "
        "x -> IF(scale = 0D, 0L, "
        "CAST(floor(x / scale * 127.0D + 0.5D) AS BIGINT)))")
    q = scaled.select("vec_id", qv.alias("qv"))
    qrow = q.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("qv").alias("qq"),
        F.expr("aggregate(transform(qv, v -> v * v), 0L, "
               "(acc, v) -> acc + v)").alias("nb"))
    return (
        q.crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.expr("aggregate(zip_with(qv, qq, (x, y) -> x * y), 0L, "
                   "(acc, v) -> acc + v)").alias("dot_q"),
            F.expr("aggregate(transform(qv, v -> v * v), 0L, "
                   "(acc, v) -> acc + v)").alias("na"),
            "nb",
        )
        .select(
            "vec_id", "dot_q",
            F.round(F.col("dot_q")
                    / F.sqrt(F.col("na").cast("double")
                             * F.col("nb").cast("double")), 4)
            .alias("cosine_q8"),
        )
        .orderBy(F.desc("cosine_q8"), "vec_id")
        .limit(10)
    )


MATRYOSHKA_DIMS = 16  # leading-prefix dimensionality for the cheap tier


@query(
    "matryoshka_prefix_topk",
    oracle=f"""
    SELECT vec_id,
           ROUND(list_cosine_similarity(
               CAST(embedding[1:{MATRYOSHKA_DIMS}] AS DOUBLE[]),
               (SELECT CAST(embedding[1:{MATRYOSHKA_DIMS}] AS DOUBLE[])
                FROM embeddings WHERE vec_id = {QUERY_VEC_ID})), 4)
               AS cosine_sim
    FROM embeddings
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def matryoshka_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncated-embedding search: rank by cosine
    over only the LEADING 16 dimensions — the
    coarse-tier trick MRL-trained embedding models enable (prefixes
    are themselves valid embeddings, so a 4× shorter vector gives a
    4× cheaper scan for candidate generation, re-ranked by the full
    vector when needed). Same round-before-rank + id tie-break
    discipline as the full-width exact query; `slice` keeps the
    truncation in the scan projection, so only 1/4 of the vector
    bytes ever leave the column reader."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.slice(F.col("embedding"), 1, MATRYOSHKA_DIMS)
        .alias("embedding"))
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return cosine_topk(emb, qv, vec_col="embedding", id_col="vec_id", k=10)


CASCADE_SHORTLIST = 50  # sketch-tier survivors re-ranked exactly


@query(
    "sketch_rerank_cascade",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, CAST({_SIGN_MASK_DUCK} AS BIGINT) AS mask
        FROM embeddings
    ),
    shortlist AS (
        SELECT m.vec_id
        FROM m
        ORDER BY bit_count(xor(m.mask,
                 (SELECT mask FROM m WHERE vec_id = {QUERY_VEC_ID}))),
                 m.vec_id
        LIMIT {CASCADE_SHORTLIST}
    )
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                WHERE vec_id = {QUERY_VEC_ID})), 4) AS cosine_sim
    FROM embeddings e JOIN shortlist s ON e.vec_id = s.vec_id
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def sketch_rerank_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN cascade as ONE checked plan: the 8-byte sign
    sketch (XOR+popcount — hamming_sign_topk's tier) prefilters to a
    50-vector shortlist, and only the shortlist pays
    exact float cosine. Both stages are deterministic (hamming and
    similarity ties break on vec_id), so the composed result is
    hash-checkable end to end — the property that lets a cascade be
    validated stage-by-stage at 100 TB instead of trusted.

    Scale shape: stage 1 scans masks only (8 B/vector — memory-tier),
    TakeOrderedAndProject keeps the shortlist driver-free; stage 2's
    semi-join touches only shortlist-many full vectors regardless of
    corpus size. Recall vs exact top-10 is pinned in
    tests/test_extensions.py (sketch tier ranks true neighbors high)."""
    emb = load_table(spark, "embeddings", sf_dir)
    mask_expr = F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + "
        "IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))")
    m = emb.select("vec_id", mask_expr.alias("mask"))
    qm = m.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("mask").alias("qmask"))
    shortlist = (
        m.crossJoin(F.broadcast(qm))
        .select(
            "vec_id",
            F.bit_count(F.col("mask").bitwiseXOR(F.col("qmask")))
            .alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(CASCADE_SHORTLIST)
        .select("vec_id")
    )
    survivors = emb.join(F.broadcast(shortlist), "vec_id", "left_semi")
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return cosine_topk(survivors, qv, vec_col="embedding",
                       id_col="vec_id", k=10)


# --- hybrid retrieval: reciprocal-rank fusion --------------------------------
from flight_data_pipeline_spark.plans.text_queries import BM25_AGG_SQL

_RRF_ORACLE = """
    WITH {BM25_AGG},
    bm AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_u DESC, doc_id) AS rnk
        FROM agg
    ),
    cos AS (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = {QV})), 4) DESC, vec_id) AS rnk
        FROM embeddings
    ),
    fused AS (
        SELECT COALESCE(bm.doc_id, cos.doc_id) AS doc_id,
               COALESCE(1000000000000 // (60 + bm.rnk), 0)
                   + COALESCE(1000000000000 // (60 + cos.rnk), 0) AS rrf_u,
               bm.rnk  AS bm25_rank,
               cos.rnk AS cosine_rank
        FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id
    )
    SELECT CAST(rk AS BIGINT)           AS rk,
           doc_id,
           CAST(rrf_u AS BIGINT)        AS rrf_pico,
           CAST(bm25_rank AS BIGINT)    AS bm25_rank,
           CAST(cosine_rank AS BIGINT)  AS cosine_rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_u DESC, doc_id) AS rk
          FROM fused)
    WHERE rk <= 10 ORDER BY rk
""".format(BM25_AGG=BM25_AGG_SQL.strip(), QV=QUERY_VEC_ID)


@query("hybrid_retrieval_rrf", oracle=_RRF_ORACLE)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion — the standard way
    a RAG stack combines a lexical ranking (BM25 over pinned query
    terms; text_queries.bm25_doc_scores, shared SQL) with a dense
    ranking (cosine against the pinned query vector, the
    cosine_topk_bruteforce discipline: round-4 then rank): each
    document's fused score is sum over legs of 1/(60 + rank). The
    fusion is computed in INTEGER pico-units — 10^12 div (60 + rank)
    — so the classically-float RRF sum is exact BIGINT addition,
    hash-identical on both engines (the div floor loses < 1 pico-unit
    per leg, far below the ~10^8 gap between adjacent ranks).
    Documents missing from a leg (no BM25 term match) contribute 0
    from that leg via the full outer join, exactly as RRF specifies.

    Plan shape: both legs are rank-stamped aggregates orders of
    magnitude smaller than the corpus (BM25 rides posting lists for
    |query terms|; the dense leg is the brute-force scorer whose
    IVF/PQ/Hamming scale tiers already exist in this file — swap in
    hamming_sign_topk's prefilter at 100 TB); the fusion join is
    doc-keyed over candidate sets, and the global rank windows run
    over candidate-sized frames, not the corpus. Top-10, doc_id
    tie-break everywhere."""
    from flight_data_pipeline_spark.operators.vectors import cosine
    from flight_data_pipeline_spark.plans.text_queries import bm25_doc_scores

    emb = load_table(spark, "embeddings", sf_dir)
    qv = (emb.where(F.col("vec_id") == QUERY_VEC_ID)
          .select(as_double(F.col("embedding")).alias("__qvec")))
    cos_ranked = (
        emb.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(as_double(F.col("embedding")), F.col("__qvec")), 4)
            .alias("sim"),
        )
        .select(
            "doc_id",
            F.row_number().over(Window.orderBy(F.desc("sim"), "doc_id"))
            .alias("rnk"),
        )
    )
    bm_ranked = bm25_doc_scores(spark, sf_dir).select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("bm25_u"), "doc_id"))
        .alias("rnk"),
    )
    fused = (
        bm_ranked.withColumnRenamed("rnk", "bm_rnk")
        .join(cos_ranked.withColumnRenamed("rnk", "cos_rnk"),
              "doc_id", "full_outer")
        .select(
            "doc_id",
            (F.coalesce(F.expr("1000000000000 div (60 + bm_rnk)"), F.lit(0))
             + F.coalesce(F.expr("1000000000000 div (60 + cos_rnk)"),
                          F.lit(0))).alias("rrf_u"),
            F.col("bm_rnk").alias("bm25_rank"),
            F.col("cos_rnk").alias("cosine_rank"),
        )
    )
    w = Window.orderBy(F.desc("rrf_u"), "doc_id")
    top = fused.orderBy(F.desc("rrf_u"), "doc_id").limit(10)
    return (
        top.select(
            F.row_number().over(w).cast("long").alias("rk"),
            "doc_id",
            F.col("rrf_u").cast("long").alias("rrf_pico"),
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            F.col("cosine_rank").cast("long").alias("cosine_rank"),
        )
        .orderBy("rk")
    )


# --- ANN tier recall audit ----------------------------------------------------
from flight_data_pipeline_spark.plans.registry import ORACLE_SQL as _OSQL

_RECALL_ORACLE = f"""
    WITH exact AS (SELECT vec_id FROM ({_OSQL["cosine_topk_bruteforce"]})),
    ham AS (
        SELECT COUNT(*) AS c FROM
        (SELECT vec_id FROM ({_OSQL["hamming_sign_topk"]})) t
        JOIN exact USING (vec_id)
    ),
    i8 AS (
        SELECT COUNT(*) AS c FROM
        (SELECT vec_id FROM ({_OSQL["int8_quantized_cosine_topk"]})) t
        JOIN exact USING (vec_id)
    ),
    lsh AS (
        SELECT COUNT(*) AS c FROM
        (SELECT vec_id FROM ({_OSQL["ann_lsh_topk"]})) t
        JOIN exact USING (vec_id)
    )
    SELECT tier, CAST(10 AS BIGINT) AS k, CAST(c AS BIGINT) AS n_hits,
           CAST(c * 100 AS BIGINT) AS recall_permille
    FROM (
        SELECT 'hamming' AS tier, c FROM ham
        UNION ALL SELECT 'int8', c FROM i8
        UNION ALL SELECT 'lsh', c FROM lsh
    ) ORDER BY tier
"""


@query("ann_recall_audit", oracle=_RECALL_ORACLE)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of every approximate serving tier against the exact
    cosine top-10 — the EVALUATION HARNESS a serving stack ships
    with, itself a checked query: every tier is deterministic
    (round-then-rank cuts, pinned constants), so the recall numbers
    hash-match the oracle, which rebuilds all four rankings from the
    tiers' own oracle SQL verbatim (single source of truth — a
    semantics change in any tier flips this audit too). Exact-tier
    ids are lazily checkpointed and broadcast into the three
    candidate-sized intersection joins; nothing leaves the plan.

    Reading at fixture scale: hamming/int8 recall is high (tight
    approximations of the same metric), LSH recall is whatever its
    4-bit bucket happened to capture — the audit is the measurement,
    not a target; production tunes bits/probes against exactly this
    number at scale."""
    exact = (
        cosine_topk_bruteforce(spark, sf_dir)
        .select("vec_id")
        .localCheckpoint(eager=False)
    )
    tiers = (
        ("hamming", hamming_sign_topk),
        ("int8", int8_quantized_cosine_topk),
        ("lsh", ann_lsh_topk_query),
    )
    out = None
    for name, fn in tiers:
        hits = (
            fn(spark, sf_dir).select("vec_id")
            .join(F.broadcast(exact), "vec_id")
            .agg(F.count("*").alias("c"))
            .select(
                F.lit(name).alias("tier"),
                F.lit(10).cast("long").alias("k"),
                F.col("c").cast("long").alias("n_hits"),
                (F.col("c") * 100).cast("long").alias("recall_permille"),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out.orderBy("tier")


# --- k-means Lloyd assignment, hash-proven (integer milli-unit twin) ----------
# (KM_K / KM_DIM are defined above semdedup_prune_stats, which shares
# the same md5-seeded centroid family)


@query(
    "kmeans_assignment_round",
    oracle=f"""
    WITH cents AS (
        SELECT k, list_transform(range(1, {KM_DIM} + 1), d ->
                   ('0x' || substr(md5('km' || CAST(k AS VARCHAR) || '_'
                                       || CAST(d AS VARCHAR)), 1, 8))::BIGINT
                   % 2001 - 1000) AS c
        FROM (SELECT UNNEST(range(0, {KM_K})) AS k)
    ),
    d2 AS (
        SELECT e.vec_id, cents.k,
               list_sum(list_transform(range(1, {KM_DIM} + 1), i ->
                   (CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000 + 0.5)
                         AS BIGINT) - cents.c[i])
                 * (CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000 + 0.5)
                         AS BIGINT) - cents.c[i]))) AS d2
        FROM embeddings e CROSS JOIN cents
    ),
    assigned AS (
        SELECT vec_id, k, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, k) AS rn
        FROM d2
    )
    SELECT CAST(k AS BIGINT)            AS k,
           CAST(COUNT(*) AS BIGINT)     AS n_assigned,
           CAST(SUM(d2) AS BIGINT)      AS inertia_milli2,
           CAST(SUM(vec_id) AS BIGINT)  AS vec_id_checksum
    FROM assigned WHERE rn = 1
    GROUP BY k ORDER BY k
    """,
)
def kmeans_assignment_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment round PROVEN BY VALUE HASH — the check-tier
    twin of the production float KMeans that trains the IVF index
    (operators/vectors.build_ivf_index, rows-only because float
    argmin over engine-ordered partial sums is not replayable).
    Discipline, same as the integer PageRank/TextRank promotions:
    centroids are md5-derived integer milli-units both engines
    rebuild bit-identically, vectors are quantized to milli-units
    with half-up FLOOR (mul on identical doubles is IEEE
    correctly-rounded, so the quantization is engine-identical), and
    squared distance is pure BIGINT arithmetic — order-free, so
    Spark's sequential zip_with fold and the oracle's list_sum cannot
    disagree. Argmin ties break on centroid id. Per-centroid counts,
    integer inertia, and the member-id checksum pin the ASSIGNMENT
    itself, not just sizes.

    Scale shape: centroids broadcast (K×dim literals), one map-side
    fold per (vector, k) — embarrassingly parallel scan, partial
    aggregate on k; this is exactly the per-iteration cost profile of
    distributed Lloyd, so proving one round proves the building block
    the iterative trainer loops. The centroids and the assignment are
    the shared operators (vectors.md5_seed_centroids /
    quantized_lloyd_assignment) the streaming sufficient-stats
    maintenance folds with (pipeline_stream.apply_centroid_stats_delta),
    so batch-checked and stream-maintained forms cannot drift."""
    from flight_data_pipeline_spark.operators.vectors import (
        md5_seed_centroids,
        quantized_lloyd_assignment,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    assigned = quantized_lloyd_assignment(
        emb, md5_seed_centroids(spark, KM_K, KM_DIM))
    return (
        assigned
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_assigned"),
            F.sum("d2").cast("long").alias("inertia_milli2"),
            F.sum("vec_id").cast("long").alias("vec_id_checksum"),
        )
        .select(F.col("k").cast("long").alias("k"), "n_assigned",
                "inertia_milli2", "vec_id_checksum")
        .orderBy("k")
    )


# --- product quantization, hash-proven (integer milli-unit codebooks) ---------

PQ_M = 8        # subspaces (64 dims / 8)
PQ_SUBDIM = 8
PQ_CODES = 16   # codes per subspace → 8×16 codebook, 64-bit code/vec


@query(
    "pq_reconstruction_error",
    oracle=f"""
    WITH cb AS (
        SELECT CAST(idx // {PQ_CODES} AS BIGINT) AS sub,
               CAST(idx % {PQ_CODES} AS BIGINT)  AS code,
               list_transform(range(1, {PQ_SUBDIM} + 1), d ->
                   ('0x' || substr(md5('pqc'
                        || CAST(idx // {PQ_CODES} AS VARCHAR) || '_'
                        || CAST(idx % {PQ_CODES} AS VARCHAR) || '_'
                        || CAST(d AS VARCHAR)), 1, 8))::BIGINT
                   % 2001 - 1000) AS c
        FROM (SELECT UNNEST(range(0, {PQ_M * PQ_CODES})) AS idx)
    ),
    q AS (
        SELECT vec_id, list_transform(range(1, {PQ_M * PQ_SUBDIM} + 1), i ->
            CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))
            AS q
        FROM embeddings
    ),
    d2 AS (
        SELECT q.vec_id, cb.sub, cb.code,
               list_sum(list_transform(range(1, {PQ_SUBDIM} + 1), d ->
                   (q.q[cb.sub * {PQ_SUBDIM} + d] - cb.c[d])
                 * (q.q[cb.sub * {PQ_SUBDIM} + d] - cb.c[d]))) AS d2
        FROM q CROSS JOIN cb
    ),
    best AS (
        SELECT vec_id, sub, code, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, code) AS rn
        FROM d2
    )
    SELECT CAST(sub AS BIGINT)                  AS sub,
           CAST(COUNT(*) AS BIGINT)             AS n_vecs,
           CAST(COUNT(DISTINCT code) AS BIGINT) AS codes_used,
           CAST(SUM(d2) AS BIGINT)              AS err_milli2,
           CAST((2 * SUM(d2) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS err_mean_milli2,
           CAST(SUM(vec_id * (code + 1)) AS BIGINT) AS code_checksum
    FROM best WHERE rn = 1
    GROUP BY sub ORDER BY sub
    """,
)
def pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization audit PROVEN BY VALUE HASH — the
    check-tier twin of the trained PQ behind ann_ivf_pq_topk
    (rows-only: float KMeans subquantizers are not replayable). With
    kmeans_assignment_round (coarse/IVF tier) this makes BOTH halves
    of the IVF-PQ index construction-replayed exactly: codebooks are
    md5-derived integer milli-units rebuilt bit-identically by both
    engines (operators/vectors.md5_seed_codebooks), vectors quantize
    half-up, each 8-dim slice scores against its subspace's 16 codes
    in pure BIGINT, and the argmin ties break on code id. Per
    subspace the report pins the assignment itself (vec_id×code
    checksum), codebook utilization (codes_used — a dead codebook
    half is THE classic PQ training failure), total distortion, and
    mean distortion per vector — exactly the audit a 100 TB
    embedding-compression rollout runs before swapping the serving
    index to 64-bit codes (here 8 bytes/vec vs 256: a 32× scan-byte
    cut, the reason PQ exists; cf. minhash_jaccard_estimate_error for
    the same estimator-accuracy discipline on the dedup side).

    Scale shape: the 128-row codebook broadcasts; assignment is one
    map-side fold per (vector, sub, code) + a partial+final
    min(struct) aggregate on (vec, sub) — no window sort, no shuffle
    wider than |vecs|×m summary rows; the final rollup is m rows."""
    from flight_data_pipeline_spark.operators.vectors import (
        md5_seed_codebooks,
        pq_assign,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    assigned = pq_assign(
        emb, md5_seed_codebooks(spark, PQ_M, PQ_CODES, PQ_SUBDIM),
        subdim=PQ_SUBDIM)
    return (
        assigned
        .groupBy("sub")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.countDistinct("code").cast("long").alias("codes_used"),
            F.sum("d2").cast("long").alias("err_milli2"),
            F.expr("CAST((2 * SUM(d2) + COUNT(*)) div (2 * COUNT(*))"
                   " AS BIGINT)").alias("err_mean_milli2"),
            F.sum(F.col("vec_id") * (F.col("code") + F.lit(1)))
            .cast("long").alias("code_checksum"),
        )
        .select(F.col("sub").cast("long").alias("sub"), "n_vecs",
                "codes_used", "err_milli2", "err_mean_milli2",
                "code_checksum")
        .orderBy("sub")
    )
