"""Source/sink format breadth: the engine's tables must survive
round trips through the other columnar/text formats Spark ships
(CSV, JSON-lines, ORC) with schema enforcement, and parquet reads
must tolerate additive schema evolution — the connector surface a
migration off the reference would immediately need."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flight_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def orders(spark):
    # cast the date to string once: CSV/JSON round-trip comparisons
    # then never depend on per-format temporal type inference
    return load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    )


def test_csv_roundtrip_with_explicit_schema(spark, orders, tmp_path):
    """CSV with header + explicit schema (never inference in
    production paths) must reproduce the frame exactly — including
    money values, which ride the 2-decimal grid and therefore
    serialize losslessly."""
    p = str(tmp_path / "orders_csv")
    orders.write.mode("overwrite").option("header", True).csv(p)
    back = spark.read.schema(orders.schema).option("header", True).csv(p)
    assert _canon(back) == _canon(orders)


def test_jsonl_roundtrip_with_explicit_schema(spark, orders, tmp_path):
    p = str(tmp_path / "orders_jsonl")
    orders.write.mode("overwrite").json(p)
    back = spark.read.schema(orders.schema).json(p)
    assert _canon(back) == _canon(orders)


def test_orc_roundtrip(spark, orders, tmp_path):
    p = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == orders.schema
    assert _canon(back) == _canon(orders)


def test_avro_roundtrip_jar_or_fallback(spark, orders, tmp_path):
    """Avro ships as an external Spark module. With the jar present,
    round-trip through it; WITHOUT the jar (this container), the
    engine still reads Avro landing zones through the pure-python
    OCF fallback source (sources/avro_fallback.py) — so either way
    the orders frame must survive an Avro round trip, and the
    environment skip this test carried through r10 is gone."""
    p = str(tmp_path / "orders_avro")
    try:
        orders.write.mode("overwrite").format("avro").save(p)
        back = spark.read.format("avro").load(p)
    except Exception:  # noqa: BLE001 — jar absent in this container
        from flight_data_pipeline_spark.sources.avro_fallback import (
            read_avro_fallback, write_avro_ocf)

        schema = {"type": "record", "name": "Order", "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_custkey", "type": "long"},
            {"name": "o_orderstatus", "type": "string"},
            {"name": "o_totalprice", "type": "double"},
            {"name": "o_orderdate", "type": "string"},
            {"name": "o_orderpriority", "type": "string"},
        ]}
        recs = [r.asDict() for r in orders.collect()]
        import os
        os.makedirs(p, exist_ok=True)
        mid = len(recs) // 2
        with open(os.path.join(p, "part-0.avro"), "wb") as f:
            f.write(write_avro_ocf(recs[:mid], schema, codec="deflate"))
        with open(os.path.join(p, "part-1.avro"), "wb") as f:
            f.write(write_avro_ocf(recs[mid:], schema))
        back = read_avro_fallback(spark, p)
    assert _canon(back) == _canon(orders)


class TestAvroFallback:
    """Pure-python Avro OCF reader (sources/avro_fallback.py): the
    no-jar fallback for Avro landing zones. The in-repo writer is
    the write half (encode_jpeg fixture philosophy); binaryFile +
    mapInPandas distribute with the FILE as the parallelism unit."""

    SCHEMA = {"type": "record", "name": "T", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "price", "type": "double"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "status", "type": {"type": "enum", "name": "St",
                                    "symbols": ["OK", "BAD"]}},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
    ]}

    @classmethod
    def _recs(cls, n=120):
        return [
            {"id": i, "name": f"n{i}", "price": i * 1.5,
             "note": None if i % 2 else f"x{i}",
             "tags": [f"t{j}" for j in range(i % 3)],
             "props": {"a": i, "b": -i},
             "status": "OK" if i % 2 else "BAD", "flag": bool(i % 2),
             "blob": bytes([i % 256, 255]),
             "d": 19000 + i, "ts": 1_700_000_000_000_000 + i}
            for i in range(n)
        ]

    def test_ocf_roundtrip_codecs_blocks_varints(self):
        from flight_data_pipeline_spark.sources.avro_fallback import (
            read_ocf_records, write_avro_ocf)

        recs = self._recs()
        for codec in ("null", "deflate"):
            payload = write_avro_ocf(recs, self.SCHEMA, codec=codec,
                                     block_records=37)
            schema, back = read_ocf_records(payload)
            assert schema == self.SCHEMA
            assert back == recs, codec
        vschema = {"type": "record", "name": "N",
                   "fields": [{"name": "v", "type": "long"}]}
        vals = [{"v": v} for v in (0, -1, 1, -2**62, 2**62, 127, -128)]
        assert read_ocf_records(
            write_avro_ocf(vals, vschema))[1] == vals

    def test_spark_read_multi_file_types_and_logicals(self, spark,
                                                      tmp_path):
        import datetime

        from flight_data_pipeline_spark.sources.avro_fallback import (
            read_avro_fallback, write_avro_ocf)

        recs = self._recs(50)
        (tmp_path / "a.avro").write_bytes(
            write_avro_ocf(recs[:30], self.SCHEMA, codec="deflate"))
        (tmp_path / "b.avro").write_bytes(
            write_avro_ocf(recs[30:], self.SCHEMA))
        df = read_avro_fallback(spark, str(tmp_path))
        assert df.schema["note"].nullable
        assert df.schema["d"].dataType.simpleString() == "date"
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
        rows = sorted(df.collect(), key=lambda r: r.id)
        assert len(rows) == 50
        assert rows[1].note is None and rows[2].note == "x2"
        assert rows[2].tags == ["t0", "t1"]
        assert rows[3].props == {"a": 3, "b": -3}
        assert rows[4].status == "BAD" and rows[5].flag is True
        assert bytes(rows[6].blob) == bytes([6, 255])
        assert rows[0].d == (datetime.date(1970, 1, 1)
                             + datetime.timedelta(days=19000))

    def test_malformed_payloads_raise_value_error(self):
        from flight_data_pipeline_spark.sources.avro_fallback import (
            read_ocf_records, write_avro_ocf)

        good = write_avro_ocf(self._recs(20), self.SCHEMA)
        corrupt_sync = bytearray(good)
        corrupt_sync[-8] ^= 0xFF  # inside the trailing sync marker
        for bad in (b"Objx" + good[4:], good[:50], good[:-5],
                    bytes(corrupt_sync)):
            with pytest.raises(ValueError):
                read_ocf_records(bad)

    @staticmethod
    def _zz(v):
        u = v << 1
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            out.append(b | (0x80 if u else 0))
            if not u:
                return bytes(out)

    def test_corruption_controlled_counts_and_enum_bounds(self):
        """r11 review: zero-byte elements (nulls, empty records) make
        block counts corruption-controlled — a 10^12 count in a tiny
        file must dead-letter in O(1), not spin/OOM; a corrupt enum
        index must raise, never silently wrap to the last symbol."""
        from flight_data_pipeline_spark.sources.avro_fallback import (
            read_ocf_records, write_avro_ocf)

        nullarr = {"type": "record", "name": "A", "fields": [
            {"name": "v", "type": {"type": "array", "items": "null"}}]}
        good = write_avro_ocf([{"v": [None, None]}], nullarr)
        bomb = good.replace(self._zz(2) + self._zz(0),
                            self._zz(10**12) + self._zz(0))
        with pytest.raises(ValueError):
            read_ocf_records(bomb)
        enum_s = {"type": "record", "name": "E", "fields": [
            {"name": "s", "type": {"type": "enum", "name": "X",
                                   "symbols": ["A", "B"]}}]}
        ge = write_avro_ocf([{"s": "B"}], enum_s)
        # the record body is the single enum-index varint: 1 -> 7
        with pytest.raises(ValueError):
            read_ocf_records(bytes(bytearray(ge).replace(
                self._zz(1), self._zz(7), 1)))
        # negative index (corrupt zigzag) must raise, not wrap to [-1]
        with pytest.raises(ValueError):
            read_ocf_records(bytes(bytearray(ge).replace(
                self._zz(1), b"\x03", 1)))  # zigzag 3 = -2

    def test_negative_lengths_dead_letter_not_cycle(self):
        """r12 advice (high): zigzag varints decode to negatives under
        corruption, and a negative take() used to slice EMPTY while
        moving the cursor BACKWARD — a 128-byte payload with block
        size zigzag(-18) re-read the header sync in a cycle forever.
        Every negative length/size reaching take() must raise."""
        from flight_data_pipeline_spark.sources.avro_fallback import (
            _parse_header, read_ocf_records, write_avro_ocf)

        vschema = {"type": "record", "name": "N",
                   "fields": [{"name": "v", "type": "long"}]}
        good = write_avro_ocf([{"v": 1}], vschema)
        _s, _c, sync, body = _parse_header(good)
        # count=0, block byte-size zigzag(-18)=35: rewinds over sync
        bomb = good[:body] + self._zz(0) + b"\x23" + sync
        with pytest.raises(ValueError):
            read_ocf_records(bomb)
        # negative string length inside a record body: zigzag(-4)=7
        sschema = {"type": "record", "name": "S",
                   "fields": [{"name": "s", "type": "string"}]}
        gs = write_avro_ocf([{"s": "abcd"}], sschema)
        with pytest.raises(ValueError):
            read_ocf_records(gs.replace(self._zz(4) + b"abcd",
                                        b"\x07" + b"abcd"))

    def test_deflate_bomb_dead_letters_legal_blocks_decode(self):
        """r12 advice (low) + r12 review correction: decompression is
        chunk-bounded at min(deflate's inherent ~1032x ratio + slack,
        DEFLATE_BLOCK_CAP) — a bomb dead-letters WITHOUT materializing
        its output, while legal highly-compressible blocks (which the
        first 64x cap wrongly rejected, including this repo's own
        writer's output) decode fine."""
        import zlib

        from flight_data_pipeline_spark.sources import avro_fallback
        from flight_data_pipeline_spark.sources.avro_fallback import (
            _parse_header, read_ocf_records, write_avro_ocf)

        # legal: one ~19 KB block decompressing to ~19 MB (>1000x)
        sschema = {"type": "record", "name": "S",
                   "fields": [{"name": "s", "type": "string"}]}
        recs = [{"s": "a" * 300000}] * 64
        payload = write_avro_ocf(recs, sschema, codec="deflate",
                                 block_records=64)
        assert read_ocf_records(payload)[1] == recs

        # bomb: output past the absolute ceiling dead-letters before
        # materializing (ceiling lowered so the test stays small)
        vschema = {"type": "record", "name": "N",
                   "fields": [{"name": "v", "type": "long"}]}
        good = write_avro_ocf([{"v": 1}], vschema, codec="deflate")
        _s, _c, sync, body = _parse_header(good)
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        comp = co.compress(b"\x00" * (1 << 23)) + co.flush()
        bomb = (good[:body] + self._zz(1) + self._zz(len(comp))
                + comp + sync)
        old = avro_fallback.DEFLATE_BLOCK_CAP
        avro_fallback.DEFLATE_BLOCK_CAP = 1 << 20
        try:
            with pytest.raises(ValueError):
                read_ocf_records(bomb)
        finally:
            avro_fallback.DEFLATE_BLOCK_CAP = old

    def test_logical_types_through_unions_and_nesting(self, spark,
                                                      tmp_path):
        """r11 review: a nullable timestamp-millis union used to ship
        the raw millis int into Arrow (read 1000x too small); logicals
        nested under records/arrays were never converted at all."""
        import datetime

        from flight_data_pipeline_spark.sources.avro_fallback import (
            read_avro_fallback, write_avro_ocf)

        schema = {"type": "record", "name": "L", "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": ["null", {
                "type": "long", "logicalType": "timestamp-millis"}]},
            {"name": "ds", "type": {"type": "array", "items": {
                "type": "int", "logicalType": "date"}}},
        ]}
        recs = [{"id": 1, "ts": 1_700_000_000_000, "ds": [0, 19000]},
                {"id": 2, "ts": None, "ds": []}]
        (tmp_path / "l.avro").write_bytes(write_avro_ocf(recs, schema))
        rows = {r.id: r for r in
                read_avro_fallback(spark, str(tmp_path)).collect()}
        assert rows[1].ts == datetime.datetime(2023, 11, 14, 22, 13, 20)
        assert rows[2].ts is None
        assert rows[1].ds == [datetime.date(1970, 1, 1),
                              datetime.date(2022, 1, 8)]


def test_parquet_additive_schema_evolution(spark, tmp_path):
    """mergeSchema read over a directory whose newer files carry an
    added column: old rows surface NULL for it, new rows keep their
    values, and the unified schema contains the superset — the
    additive-evolution contract a long-lived 100 TB table relies on."""
    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, x string")
    v1.write.mode("append").parquet(p)
    v2 = spark.createDataFrame([(3, "c", 30.0)],
                               "id long, x string, score double")
    v2.write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "x", "score"}
    rows = {r.id: (r.x, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0)}


def test_csv_malformed_rows_to_corrupt_column(spark, tmp_path):
    """PERMISSIVE mode with a corrupt-record column: bad lines land
    in the dead-letter column instead of failing the read — the
    batch twin of the stream's dead-letter discipline."""
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part.csv").write_text(
        "id,value\n1,10.5\nnot_a_number,oops,extra\n3,7.25\n")
    schema = "id LONG, value DOUBLE, _corrupt STRING"
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
        .cache()
    )
    good = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert sorted((r.id, r.value) for r in good.collect()) == [
        (1, 10.5), (3, 7.25)]
    assert [r._corrupt for r in bad.collect()] == ["not_a_number,oops,extra"]


class TestTarShards:
    """WebDataset-style tar-shard source (sources/tar_shards.py):
    shards written with stdlib tarfile round-trip through
    read_tar_shards into member rows, and the media adapter feeds the
    REAL decode tier end to end."""

    @staticmethod
    def _write_shards(tmp_path):
        import io
        import tarfile

        import numpy as np

        from flight_data_pipeline_spark.operators.jpeg_codec import (
            encode_jpeg)

        vals = np.repeat(np.arange(16, dtype=np.uint8) * 16 + 8, 12)
        img = np.stack([vals.reshape(16, 12)] * 3, axis=-1)
        ppm = b"P6\n12 16\n255\n" + img.tobytes()
        jpg = encode_jpeg(img)

        def member(tf, name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        with tarfile.open(shard_dir / "shard-000.tar", "w") as tf:
            member(tf, "sample0.ppm", ppm)
            member(tf, "sample0.txt", b"a caption")
        with tarfile.open(shard_dir / "shard-001.tar", "w") as tf:
            member(tf, "sample1.jpeg", jpg)
            member(tf, "sample1.cls", b"7")
        # a non-tar file the glob must skip
        (shard_dir / "README.md").write_text("not a shard")
        return str(shard_dir), ppm, jpg

    def test_members_round_trip(self, spark, tmp_path):
        from flight_data_pipeline_spark.sources.tar_shards import (
            read_tar_shards)

        path, ppm, jpg = self._write_shards(tmp_path)
        rows = {(r.shard, r.key, r.format): r
                for r in read_tar_shards(spark, path).collect()}
        assert set(rows) == {
            ("shard-000.tar", "sample0", "ppm"),
            ("shard-000.tar", "sample0", "txt"),
            ("shard-001.tar", "sample1", "jpeg"),
            ("shard-001.tar", "sample1", "cls"),
        }
        assert bytes(rows[("shard-000.tar", "sample0", "ppm")].payload) == ppm
        assert bytes(rows[("shard-001.tar", "sample1", "jpeg")].payload) == jpg
        assert rows[("shard-000.tar", "sample0", "txt")].n_bytes == 9

    def test_media_adapter_feeds_real_decode(self, spark, tmp_path):
        """The PPM in shard 0 and the JPEG in shard 1 encode the SAME
        bin-centered pixels, so after tar → media adaptation → REAL
        decode, their features must be identical; the caption/label
        members come through as kind='blob' and survive the same
        pipeline with byte-histogram fallback features."""
        from flight_data_pipeline_spark.operators.multimodal import (
            extract_features)
        from flight_data_pipeline_spark.sources.tar_shards import (
            read_tar_shards, tar_members_as_media)

        path, _, _ = self._write_shards(tmp_path)
        media = tar_members_as_media(read_tar_shards(spark, path))
        feats = extract_features(media).collect()
        assert len(feats) == 4
        by_kind = {}
        for r in feats:
            by_kind.setdefault(r.kind, []).append(r)
        assert len(by_kind["image"]) == 2
        f0, f1 = by_kind["image"]
        assert list(f0.feature) == list(f1.feature)  # same decoded pixels
        assert len(by_kind["blob"]) == 2             # captions/labels ride along
        ids = [r.media_id for r in feats]
        assert len(set(ids)) == 4                    # stable distinct hashes

    def test_corrupt_shard_quarantined_not_fatal(self, spark, tmp_path):
        """skip_corrupt=True: a truncated tar yields ONE auditable
        quarantine row (key='__corrupt__', format='error') while good
        shards in the same read come through intact; the default
        stays fail-fast."""
        import pytest as _pytest

        from flight_data_pipeline_spark.sources.tar_shards import (
            read_tar_shards)

        path, _, _ = self._write_shards(tmp_path)
        import pathlib
        good = pathlib.Path(path) / "shard-000.tar"
        bad = pathlib.Path(path) / "shard-zzz.tar"
        bad.write_bytes(good.read_bytes()[:700])  # truncated mid-member

        rows = read_tar_shards(spark, path, skip_corrupt=True).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        q = by_shard["shard-zzz.tar"]
        assert len(q) == 1 and q[0].key == "__corrupt__"
        assert q[0].format == "error" and q[0].n_bytes == 700
        assert len(by_shard["shard-000.tar"]) == 2   # good shards intact
        assert len(by_shard["shard-001.tar"]) == 2

        with _pytest.raises(Exception):
            read_tar_shards(spark, path).collect()   # fail-fast default

    def test_duplicate_member_names_get_distinct_media_ids(
            self, spark, tmp_path):
        """Duplicate member names within one tar are legal (ADVICE
        r9): the per-shard ordinal keeps their rows and media_ids
        distinct instead of hash-colliding."""
        import io
        import tarfile

        from flight_data_pipeline_spark.sources.tar_shards import (
            read_tar_shards, tar_members_as_media)

        shard_dir = tmp_path / "dups"
        shard_dir.mkdir()
        with tarfile.open(shard_dir / "shard-dup.tar", "w") as tf:
            for data in (b"first copy", b"second copy"):
                info = tarfile.TarInfo("sample.txt")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

        members = read_tar_shards(spark, str(shard_dir))
        rows = sorted(members.collect(), key=lambda r: r.ordinal)
        assert [(r.ordinal, r.key, bytes(r.payload)) for r in rows] == [
            (0, "sample", b"first copy"), (1, "sample", b"second copy")]
        ids = [r.media_id for r in tar_members_as_media(members).collect()]
        assert len(set(ids)) == 2

    def test_cross_container_image_dedup_composition(self, spark, tmp_path):
        """The media family composes into the dedup discipline: the
        PPM (shard 0) and JPEG (shard 1) encode the SAME pixels, so
        grouping decoded-pixel moments (n_px, Σv, Σv², min, max) from
        media_quality finds them as one duplicate group even though
        their container bytes (and formats) differ — exact image
        dedup that container re-encoding cannot evade. The caption/
        label blobs are excluded relationally, like any quality gate."""
        import pyspark.sql.functions as F

        from flight_data_pipeline_spark.operators.multimodal import (
            media_quality)
        from flight_data_pipeline_spark.sources.tar_shards import (
            read_tar_shards, tar_members_as_media)

        path, _, _ = self._write_shards(tmp_path)
        media = tar_members_as_media(read_tar_shards(spark, path))
        images = media.where(F.col("meta.kind") == "image")
        groups = (
            media_quality(images)
            .groupBy("n_px", "px_sum", "px_sumsq", "px_min", "px_max")
            .agg(F.count("*").alias("n_copies"))
            .collect())
        assert len(groups) == 1          # one pixel-identical group
        assert groups[0].n_copies == 2   # found across containers


class TestWarcSource:
    """WARC (ISO 28500) front half — sources/warc_source.py: record
    framing, gzip-member layout, HTTP payload decode (chunked +
    content-encoding), the distributed read, and the decode-DoS
    bounds (every length in a crawl file is attacker bytes)."""

    HTML = (b"<html><body><p>hello corpus world of text.</p>"
            b"</body></html>")

    def _records(self):
        from flight_data_pipeline_spark.sources.warc_source import (
            build_http_response)

        return [
            {"block": build_http_response(self.HTML),
             "target_uri": "http://a.example/"},
            {"block": build_http_response(self.HTML, chunked=True),
             "target_uri": "http://b.example/"},
            {"block": build_http_response(self.HTML, gzip_body=True),
             "target_uri": "http://c.example/"},
            {"block": build_http_response(self.HTML, chunked=True,
                                          gzip_body=True),
             "target_uri": "http://d.example/"},
            {"block": b"software: test\r\n", "warc_type": "warcinfo"},
        ]

    def test_roundtrip_plain_and_gz_members(self):
        from flight_data_pipeline_spark.sources.warc_source import (
            parse_http_response, parse_warc, write_warc)

        for gz in (False, True):
            out = parse_warc(write_warc(self._records(),
                                        gzip_members=gz))
            assert len(out) == 5
            assert [r["headers"]["warc-type"] for r in out] == (
                ["response"] * 4 + ["warcinfo"])
            for rec in out[:4]:
                status, hh, payload = parse_http_response(rec["block"])
                assert status == 200
                assert payload == self.HTML
                assert hh["content-type"] == "text/html"
            assert out[4]["block"] == b"software: test\r\n"

    def test_read_warc_distributed(self, spark, tmp_path):
        """binaryFile → mapInPandas: one row per record, response
        payloads decoded, warcinfo rows carried with NULL http
        columns, _SUCCESS markers skipped."""
        import os

        from flight_data_pipeline_spark.sources.warc_source import (
            read_warc, write_warc)

        p = str(tmp_path / "crawl")
        os.makedirs(p)
        recs = self._records()
        with open(os.path.join(p, "seg-0.warc.gz"), "wb") as f:
            f.write(write_warc(recs[:3], gzip_members=True))
        with open(os.path.join(p, "seg-1.warc"), "wb") as f:
            f.write(write_warc(recs[3:], gzip_members=False))
        with open(os.path.join(p, "_SUCCESS"), "wb") as f:
            f.write(b"")
        df = read_warc(spark, p)
        rows = {(r.target_uri, r.warc_type): r for r in df.collect()}
        assert len(rows) == 5
        for uri in ("http://a.example/", "http://b.example/",
                    "http://c.example/", "http://d.example/"):
            r = rows[(uri, "response")]
            assert bytes(r.payload) == self.HTML
            assert r.http_status == 200
            assert r.n_bytes == len(self.HTML)
            assert r.http_content_type == "text/html"
        info = rows[(None, "warcinfo")]
        assert info.http_status is None
        assert bytes(info.payload) == b"software: test\r\n"

    def test_malformed_records_dead_letter(self):
        import zlib

        import pytest

        from flight_data_pipeline_spark.sources.warc_source import (
            build_http_response, parse_http_response, parse_warc,
            write_warc)

        good = write_warc(self._records()[:1], gzip_members=False)
        # Content-Length beyond the file
        bad = good.replace(b"Content-Length: ",
                           b"Content-Length: 9999", 1)
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc(bad)
        # missing terminator
        with pytest.raises(ValueError, match="terminator"):
            parse_warc(good[:-2])
        # not a WARC version line
        with pytest.raises(ValueError, match="version"):
            parse_warc(b"HTTP/1.0 200\r\n\r\n")
        # garbage between gzip members
        gz = write_warc(self._records()[:1], gzip_members=True)
        with pytest.raises(ValueError, match="member boundary"):
            parse_warc(gz + b"JUNK" + gz)
        # truncated chunked body
        blk = build_http_response(self.HTML, chunked=True)
        with pytest.raises(ValueError, match="chunk"):
            parse_http_response(blk[:-12])
        # decompression bomb: a tiny deflate member claiming huge
        # output dead-letters at the bound instead of materializing
        bomb_raw = b"\x00" * (1 << 22)
        comp = zlib.compressobj(wbits=31)
        member = comp.compress(bomb_raw) + comp.flush()
        body = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
                b"Content-Length: %d\r\n\r\n" % len(member)) + member
        # legal 1032x is allowed — this one is ~4 MiB from ~4 KiB,
        # within deflate's ceiling, so it must DECODE fine
        status, _hh, payload = parse_http_response(body)
        assert payload == bomb_raw

    def test_file_total_decompression_cap(self, monkeypatch):
        """N small members each under the per-member bound must not
        dodge the FILE bound (r13 self-review: the many-members bomb
        shape — ~1032x per member, unbounded member count)."""
        import pytest

        from flight_data_pipeline_spark.sources import warc_source
        from flight_data_pipeline_spark.sources.warc_source import (
            build_http_response, parse_warc, write_warc)

        rec = {"block": build_http_response(b"x" * 4096),
               "target_uri": "http://e.com/"}
        gz = write_warc([rec] * 8, gzip_members=True)
        assert len(parse_warc(gz)) == 8
        monkeypatch.setattr(warc_source, "WARC_FILE_CAP", 16 << 10)
        with pytest.raises(ValueError, match="decompresses past"):
            parse_warc(gz)

    def test_http_headers_fold_and_last_wins(self):
        from flight_data_pipeline_spark.sources.warc_source import (
            _parse_headers)

        h = _parse_headers(b"A: one\r\n two\r\nB: x\r\nb: y\r\n")
        assert h["a"] == "one two"
        assert h["b"] == "y"


class TestHtmlTextExtraction:
    """operators/html_text.py — block segmentation, subtree drops,
    the two classifier rules, whitespace normalization, and the
    dead-letter bounds."""

    def test_extraction_rules(self):
        from flight_data_pipeline_spark.operators.html_text import (
            extract_html_text_py)

        html = """<html><head><title>T</title>
        <script>var a = '<p>not text</p>';</script>
        <style>p { color: red }</style></head><body>
        <!-- navigation -->
        <nav><a href="/">home about contact pages</a></nav>
        <p>one two three four five six.</p>
        <div>alpha&amp;beta gamma delta</div>
        <p><a href="#">read more</a></p>
        <p>hi</p>
        <ul><li>first item text here</li><li>x</li></ul>
        </body></html>"""
        r = extract_html_text_py(html)
        # content: the 6-word <p>, the entity div, the 4-word li
        assert r["n_content_blocks"] == 3
        assert "one two three four five six." in r["text"]
        assert "alpha&beta gamma delta" in r["text"]
        assert "first item text here" in r["text"]
        # boilerplate: nav (link density 1), link-only p, short p,
        # short li
        assert r["n_boilerplate_blocks"] == 4
        assert r["n_blocks"] == 7
        assert "read more" not in r["text"]
        assert "not text" not in r["text"]
        assert r["n_words"] == 6 + 3 + 4
        lines = r["text"].split("\n")
        assert len(lines) == 3

    def test_implied_head_close(self):
        """HTML5 makes </head> optional — a <body> or block tag
        implies the head ended; <title> (head-content) must NOT
        (r13 self-review: a missing </head> used to swallow the
        whole document)."""
        from flight_data_pipeline_spark.operators.html_text import (
            extract_html_text_py)

        r = extract_html_text_py(
            '<html><head><title>x</title><meta charset="utf-8">'
            '<body><p>Real content sentence number one here.</p>'
            '</body>')
        assert r["n_content_blocks"] == 1
        assert "Real content" in r["text"]
        assert "x" not in r["text"].split()     # title stays dropped
        # no <body> either: the first block tag closes the head
        r = extract_html_text_py(
            '<head><script>var x=1;</script>'
            '<p>Content paragraph with plenty of words.</p>')
        assert "Content paragraph" in r["text"]
        assert "var" not in r["text"]

    def test_deflate_truncation_and_unknown_encoding_dead_letter(self):
        """r13 self-review: a truncated deflate body must raise, not
        silently return a partial payload; unknown content-encodings
        (br/zstd) must not pass compressed bytes through as text."""
        import zlib

        import pytest

        from flight_data_pipeline_spark.sources.warc_source import (
            parse_http_response)

        body = zlib.compress(b"deflate content " * 64)
        ok = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
              + body)
        _s, _h, payload = parse_http_response(ok)
        assert payload == b"deflate content " * 64
        cut = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
               + body[:len(body) // 2])
        with pytest.raises(ValueError):
            parse_http_response(cut)
        br = (b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n"
              + b"\x1b\x03\x00")
        with pytest.raises(ValueError, match="content-encoding"):
            parse_http_response(br)

    def test_read_warc_quarantine_mode(self, spark, tmp_path):
        """on_error='quarantine' keeps a file's good records when one
        record's HTTP payload is malformed, carrying the failure in
        parse_error (r13 self-review: one bad record of a ~24k-record
        Common Crawl segment must not lose the file)."""
        from flight_data_pipeline_spark.sources.warc_source import (
            build_http_response, read_warc, write_warc)

        good = build_http_response(b"<p>fine content here now.</p>")
        bad = (b"HTTP/1.1 200 OK\r\nNoColonHeaderLine\r\n\r\nx")
        data = write_warc([
            {"block": good, "target_uri": "http://a/1"},
            {"block": bad, "target_uri": "http://a/2"},
            {"block": good, "target_uri": "http://a/3"},
        ])
        p = str(tmp_path / "q.warc.gz")
        with open(p, "wb") as f:
            f.write(data)
        rows = read_warc(spark, p, on_error="quarantine") \
            .orderBy("target_uri").collect()
        assert [r.parse_error is None for r in rows] == [
            True, False, True]
        assert rows[0].http_status == 200
        assert rows[1].http_status is None
        assert bytes(rows[1].payload) == bad   # raw block kept
        # default mode still fails the file
        import pytest
        with pytest.raises(Exception):
            read_warc(spark, p).collect()

    def test_tag_soup_tolerance_and_br_splits(self):
        from flight_data_pipeline_spark.operators.html_text import (
            extract_html_text_py)

        # unclosed tags, stray closers, <br> as block break
        html = ("<div>first real sentence here<br>second real "
                "sentence here</p></style><p>third real sentence "
                "goes here")
        r = extract_html_text_py(html)
        assert r["n_content_blocks"] == 3
        assert r["n_blocks"] == 3

    def test_bytes_input_and_dead_letters(self):
        import pytest

        from flight_data_pipeline_spark.operators import html_text

        r = html_text.extract_html_text_py(
            "<p>élève text here okay</p>".encode())
        assert "élève" in r["text"]
        with pytest.raises(ValueError, match="undecodable"):
            html_text.extract_html_text_py(b"<p>\xff\xfe bad</p>")
        big = b"x" * (html_text.MAX_HTML_BYTES + 1)
        with pytest.raises(ValueError, match="bound"):
            html_text.extract_html_text_py(big)

    def test_dataframe_operator_null_passthrough(self, spark):
        from flight_data_pipeline_spark.operators.html_text import (
            extract_html_text)

        df = spark.createDataFrame(
            [(1, "<p>real content sentence here.</p>"), (2, None)],
            "id long, html string")
        out = {r.id: r.ex for r in
               extract_html_text(df, "html", "ex").collect()}
        assert out[1].n_content_blocks == 1
        assert out[1].text == "real content sentence here."
        assert out[2].text is None and out[2].n_blocks is None
