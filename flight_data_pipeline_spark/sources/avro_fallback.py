"""Avro Object Container File source without the spark-avro jar.

Spark ships Avro as an EXTERNAL module; a cluster (or this container)
without the jar can't `spark.read.format("avro")` at all. This module
is the pure-python fallback: the OCF framing and the Avro binary
encoding (zigzag-varint longs, length-prefixed bytes/strings, records
/ arrays / maps / nullable unions / enums / fixed, deflate or null
codec) are simple enough to decode in-process, so an Avro landing
zone stays readable with zero new dependencies.

Scale shape (the tar_shards pattern): `spark.read.format("binaryFile")`
lists and distributes the .avro files — the FILE is the unit of
parallelism, each mapInPandas task parses its own container blocks
with memory bounded by one file — and the writer schema embedded in
the first file's header (read driver-side, header bytes only) becomes
the DataFrame schema. Corrupt containers raise ValueError (the
dead-letter contract; route through skip_corrupt upstream if needed).

The test-grade `write_avro_ocf` is the write half (the encode_jpeg /
encode_gif fixture philosophy).

Format reference: the Apache Avro 1.11 specification (public).
Reference parity: the reference repo reads REST JSON only
(etl_job.py:35-120); Avro is part of this engine's superset source
tier alongside ORC/parquet/jsonl.
"""
from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

OCF_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# binary decode
# --------------------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if n < 0:
            # Zigzag varints can legally decode to negatives, but every
            # length/size/count that reaches take() must be non-negative:
            # a negative n would slice empty AND move pos backward, so a
            # crafted block-size could cycle _read_ocf_records forever
            # (r11 advice — decode-time DoS, same class as _guard_count).
            raise ValueError(f"negative Avro length {n}")
        if self.pos + n > len(self.buf):
            raise ValueError("truncated Avro data")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag varint (Avro int and long share the encoding)."""
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("truncated Avro varint")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("Avro varint too long")
        return (acc >> 1) ^ -(acc & 1)


def _guard_count(r: _Reader, n: int) -> int:
    """Bound a corruption-controlled element count: null elements and
    zero-field records consume NO input bytes, so a corrupt varint
    could otherwise spin/OOM a task from a 50-byte file (r11 review —
    the same decode-time DoS class as the mp4 stsz/trun clamps). The
    bound is payload-derived: a legal container tripping it would be
    a zero-byte-element bomb, and dead-lettering those is correct for
    a pipeline."""
    if n < 0:
        raise ValueError(f"negative Avro element count {n}")
    if n > max(len(r.buf), 1 << 20):
        raise ValueError(
            f"Avro block count {n} exceeds the payload-derived bound")
    return n


def _decode(r: _Reader, schema):
    """Decode one value of ``schema`` (parsed JSON form)."""
    if isinstance(schema, list):                      # union
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError("Avro union branch out of range")
        return _decode(r, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(r, f["type"])
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:          # block with byte-size prefix
                    n = -n
                    r.long()
                for _ in range(_guard_count(r, n)):
                    out.append(_decode(r, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()
                for _ in range(_guard_count(r, n)):
                    k = r.take(r.long()).decode("utf-8")
                    out[k] = _decode(r, schema["values"])
        if t == "enum":
            idx = r.long()
            if not 0 <= idx < len(schema["symbols"]):
                raise ValueError("Avro enum index out of range")
            return schema["symbols"][idx]
        if t == "fixed":
            return r.take(schema["size"])
        return _decode(r, t)                          # {"type": "long", ...}
    if schema == "null":
        return None
    if schema == "boolean":
        return r.take(1) != b"\x00"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.take(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.take(8))[0]
    if schema == "bytes":
        return bytes(r.take(r.long()))
    if schema == "string":
        return r.take(r.long()).decode("utf-8")
    raise ValueError(f"unsupported Avro type {schema!r}")


#: absolute per-block decompressed-output ceiling. Raw deflate's
#: format-inherent amplification tops out near 1032:1, so the ratio
#: bound below never rejects a legal stream; this ceiling additionally
#: bounds the MEMORY one giant legal-but-absurd block could demand
#: (r12 review: the old 64x cap dead-lettered the repo's own writer's
#: legal highly-compressible blocks).
DEFLATE_BLOCK_CAP = 1 << 30


def _bounded_inflate(block: bytes) -> bytes:
    """Inflate one deflate-coded Avro block with the decompression
    bounded (r11 advice, corrected in r12): chunked decompressobj
    reads stop as soon as output exceeds min(1032x + 64 KiB slack,
    DEFLATE_BLOCK_CAP) — the first term is deflate's own maximum
    ratio (never trips on legal data), the second is a hard memory
    ceiling — so a decompression bomb dead-letters without ever
    materializing its output."""
    cap = min(1032 * len(block) + (1 << 16), DEFLATE_BLOCK_CAP)
    try:
        d = zlib.decompressobj(wbits=-15)
        out = bytearray()
        data = block
        while True:
            chunk = d.decompress(data, 1 << 20)
            out += chunk
            if len(out) > cap:
                raise ValueError(
                    f"deflate block exceeds the {cap}-byte "
                    "decompression bound")
            if d.eof:
                return bytes(out)
            # max_length can pause mid-match with every input byte
            # consumed — keep draining on empty input until eof or
            # no progress (the truly-truncated case)
            data = d.unconsumed_tail
            if not data and not chunk:
                raise ValueError("truncated deflate block")
    except zlib.error as exc:
        raise ValueError(f"bad deflate block: {exc}") from exc


def _parse_header(buf: bytes):
    """OCF header → (schema_json, codec, sync_marker, body_offset)."""
    r = _Reader(buf)
    if r.take(4) != OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _decode(r, {"type": "map", "values": "bytes"})
    sync = r.take(16)
    try:
        schema = json.loads(meta["avro.schema"])
    except (KeyError, json.JSONDecodeError, UnicodeDecodeError) as exc:
        raise ValueError(f"bad avro.schema header: {exc}") from exc
    codec = meta.get("avro.codec", b"null").decode("utf-8", "replace")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r} "
                         "(null/deflate only without libs)")
    return schema, codec, sync, r.pos


def read_ocf_records(buf: bytes) -> tuple[dict, list]:
    """Parse one whole OCF payload → (schema, records). Pure python —
    the per-task body of the distributed reader. Any structural
    corruption surfaces as ValueError (the dead-letter contract),
    never a bare IndexError/KeyError from the parsing arithmetic."""
    try:
        return _read_ocf_records(buf)
    except (IndexError, KeyError, TypeError, struct.error,
            OverflowError, UnicodeDecodeError, MemoryError) as exc:
        raise ValueError(
            f"malformed Avro container: {type(exc).__name__}: {exc}"
        ) from exc


def _read_ocf_records(buf: bytes) -> tuple[dict, list]:
    schema, codec, sync, pos = _parse_header(buf)
    r = _Reader(buf, pos)
    records = []
    while r.pos < len(buf):
        count = r.long()
        size = r.long()
        block = r.take(size)
        if codec == "deflate":
            block = _bounded_inflate(block)
        if r.take(16) != sync:
            raise ValueError("Avro sync marker mismatch")
        br = _Reader(block)
        for _ in range(_guard_count(br, count)):
            records.append(_decode(br, schema))
        if br.pos != len(block):
            raise ValueError("Avro block has trailing bytes")
    return schema, records


# --------------------------------------------------------------------------
# Avro schema → Spark schema
# --------------------------------------------------------------------------

_PRIM_TO_SPARK = {
    "null": "void", "boolean": "boolean", "int": "int", "long": "long",
    "float": "float", "double": "double", "bytes": "binary",
    "string": "string",
}


def _spark_type(schema):
    import pyspark.sql.types as T

    if isinstance(schema, list):                      # nullable union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("only 2-branch null unions map to Spark")
        return _spark_type(non_null[0])
    if isinstance(schema, dict):
        t = schema["type"]
        lt = schema.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if t == "record":
            return T.StructType([
                T.StructField(f["name"], _spark_type(f["type"]),
                              _nullable(f["type"]))
                for f in schema["fields"]])
        if t == "array":
            return T.ArrayType(_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), _spark_type(schema["values"]))
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return _spark_type(t)
    from pyspark.sql.types import _parse_datatype_string
    if schema not in _PRIM_TO_SPARK:
        raise ValueError(f"unsupported Avro type {schema!r}")
    return _parse_datatype_string(_PRIM_TO_SPARK[schema])


def _nullable(schema) -> bool:
    return isinstance(schema, list) and "null" in schema


def _logical_converter(schema):
    """Recursive raw-int → date/timestamp converter for a schema, or
    None when nothing under it carries a logicalType. Handles union-
    wrapped logicals and logicals nested in records/arrays/maps — the
    r11 review caught the old top-level-dict-only lookup silently
    shipping raw ints into Arrow (a nullable timestamp-millis read
    1000× too small)."""
    import datetime

    s = schema
    if isinstance(s, list):
        nn = [x for x in s if x != "null"]
        s = nn[0] if len(nn) == 1 else None
    if not isinstance(s, dict):
        return None
    lt = s.get("logicalType")
    if lt == "date":
        epoch = datetime.date(1970, 1, 1)
        return lambda v: (None if v is None
                          else epoch + datetime.timedelta(days=v))
    if lt in ("timestamp-micros", "timestamp-millis"):
        unit = ("microseconds" if lt == "timestamp-micros"
                else "milliseconds")
        epoch = datetime.datetime(1970, 1, 1,
                                  tzinfo=datetime.timezone.utc)
        return lambda v: (None if v is None
                          else epoch + datetime.timedelta(**{unit: v}))
    t = s.get("type")
    if t == "record":
        sub = {f["name"]: c for f in s["fields"]
               if (c := _logical_converter(f["type"])) is not None}
        if not sub:
            return None

        def conv_rec(v):
            if v is None:
                return None
            for k, c in sub.items():
                v[k] = c(v.get(k))
            return v
        return conv_rec
    if t == "array":
        c = _logical_converter(s["items"])
        if c is None:
            return None
        return lambda v: None if v is None else [c(x) for x in v]
    if t == "map":
        c = _logical_converter(s["values"])
        if c is None:
            return None
        return lambda v: (None if v is None
                          else {k: c(x) for k, x in v.items()})
    return None


def read_avro_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro OCF read without the spark-avro jar.

    binaryFile lists/distributes the files; the top-level record
    schema comes from the FIRST file's header — read driver-side with
    plain file IO, HEADER BYTES ONLY (the mapInPandas output type
    must exist at plan time, so this is unavoidable driver work; no
    Spark action runs and no data block is touched). Each task then
    parses its own files' blocks and emits rows via mapInPandas, so
    per-task memory is bounded by one container file and parallelism
    is the file count — the natural unit, matching how Avro landing
    zones are written (one container per producer flush). The
    driver-side probe uses the local/posix filesystem (the fallback's
    deployment shape); on an object store, pass the header bytes'
    schema through a manifest instead."""
    import glob as _glob
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    candidates = (sorted(_glob.glob(os.path.join(path, "**", "*"),
                                    recursive=True))
                  if os.path.isdir(path) else sorted(_glob.glob(path)))
    candidates = [c for c in candidates if os.path.isfile(c)]
    head = None
    for c in candidates:
        with open(c, "rb") as f:
            probe = f.read(1 << 20)  # headers are small; 1 MiB covers
        if probe[:4] == OCF_MAGIC:   # skip _SUCCESS and friends
            head = probe
            break
    if head is None:
        raise ValueError(f"no Avro container files under {path}")
    schema_json, _codec, _sync, _ = _parse_header(head)
    if not (isinstance(schema_json, dict)
            and schema_json.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    spark_schema = _spark_type(schema_json)
    field_names = [f.name for f in spark_schema.fields]
    convert = _logical_converter(schema_json)  # None if no logicals

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import posixpath

        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                base = posixpath.basename(str(fpath))
                if base.startswith(("_", ".")):
                    continue  # _SUCCESS / hidden markers (Hadoop rule)
                _, records = read_ocf_records(bytes(content))
                if convert is not None:
                    records = [convert(rec) for rec in records]
                rows.extend(records)
            yield pd.DataFrame(rows, columns=field_names)

    return files.select("path", "content").mapInPandas(
        process, schema=spark_schema)


# --------------------------------------------------------------------------
# test-grade writer
# --------------------------------------------------------------------------

def _zigzag(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(out: bytearray, schema, value) -> None:
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            if (value is None) == (branch == "null"):
                out += _zigzag(i)
                return _encode(out, branch, value)
        raise ValueError("no matching union branch")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(out, f["type"], value[f["name"]])
            return
        if t == "array":
            if value:
                out += _zigzag(len(value))
                for v in value:
                    _encode(out, schema["items"], v)
            out += _zigzag(0)
            return
        if t == "map":
            if value:
                out += _zigzag(len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    out += _zigzag(len(kb)) + kb
                    _encode(out, schema["values"], v)
            out += _zigzag(0)
            return
        if t == "enum":
            out += _zigzag(schema["symbols"].index(value))
            return
        if t == "fixed":
            out += value
            return
        return _encode(out, t, value)
    if schema == "null":
        return
    if schema == "boolean":
        out += b"\x01" if value else b"\x00"
    elif schema in ("int", "long"):
        out += _zigzag(int(value))
    elif schema == "float":
        out += struct.pack("<f", value)
    elif schema == "double":
        out += struct.pack("<d", value)
    elif schema == "bytes":
        out += _zigzag(len(value)) + value
    elif schema == "string":
        vb = value.encode("utf-8")
        out += _zigzag(len(vb)) + vb
    else:
        raise ValueError(f"unsupported Avro type {schema!r}")


def write_avro_ocf(records: list[dict], schema: dict,
                   codec: str = "null", block_records: int = 64,
                   sync: bytes = b"S" * 16) -> bytes:
    """Minimal OCF writer (null/deflate codec, fixed sync marker for
    determinism) — the write half that proves the reader."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null or deflate")
    out = bytearray(OCF_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    for i in range(0, len(records), block_records):
        chunk = records[i:i + block_records]
        body = bytearray()
        for rec in chunk:
            _encode(body, schema, rec)
        data = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            data = co.compress(data) + co.flush()
        out += _zigzag(len(chunk)) + _zigzag(len(data)) + data + sync
    return bytes(out)
