"""Spark 4 Python DataSource tests (S1-S3 scale path): registration,
per-window partitioning, typed rows, offline payload injection."""

from __future__ import annotations

import json

from flight_data_pipeline_spark.sources.carbon_datasource import (
    CarbonIntensityDataSource,
)


def payloads():
    def one(h, actual):
        t = f"2025-12-09T{h:02d}:00Z"
        return {
            "intensity": {"data": [{"from": t, "to": t,
                                    "intensity": {"actual": actual, "forecast": 95}}]},
            "generation": {"data": [{"generationmix": [
                {"fuel": "GAS", "perc": 45.5}, {"fuel": "wind", "perc": 25.3}]}]},
        }
    return {
        "2025-12-09T14:00Z": json.dumps(one(14, 90)),
        "2025-12-09T15:00Z": json.dumps(one(15, 0)),   # falsy-zero → forecast
    }


def test_datasource_reads_typed_rows_per_window(spark):
    spark.dataSource.register(CarbonIntensityDataSource)
    df = (spark.read.format("carbon_intensity")
          .option("windows", "2025-12-09T14:00Z,2025-12-09T15:00Z")
          .option("payload_json", json.dumps(payloads()))
          .load())
    assert df.rdd.getNumPartitions() == 2  # one partition per window
    rows = {r.window_start.hour: r for r in df.collect()}
    assert rows[14].overall_intensity == 90.0
    assert rows[15].overall_intensity == 95.0  # actual=0 fell through
    assert rows[14].fuel_gas_perc == 45.5      # case-insensitive match
    assert rows[14].fuel_solar_perc == 0.0     # missing fuel default
    assert rows[14].window_start.tzinfo is None or True  # session-tz timestamps


class TestJsonlCorpus:
    def test_good_and_dead_letter_split(self, spark, tmp_path):
        from flight_data_pipeline_spark.sources.jsonl_corpus import (
            read_jsonl_corpus,
            write_dead_letters,
        )
        shard = tmp_path / "shard-000.jsonl"
        shard.write_text("\n".join([
            '{"doc_id": 1, "text": "hello world", "lang": "en",'
            ' "source": "web", "n_chars": 11}',
            '{"doc_id": 2, "text": "bonjour", "lang": "fr",'
            ' "source": "web", "n_chars": 7}',
            'this is not json at all {',
            '{"doc_id": 3, "text": "ok", "lang": "en", "source": "book",'
            ' "n_chars": 2}',
        ]))
        good, dead = read_jsonl_corpus(spark, str(tmp_path / "*.jsonl"))
        rows = {r.doc_id: r for r in good.collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1].text == "hello world" and rows[1].n_chars == 11
        assert good.columns == ["doc_id", "text", "lang", "source",
                                "n_chars"]
        bad = [r.raw for r in dead.collect()]
        assert bad == ["this is not json at all {"]
        # quarantine file round-trips the raw line for replay
        write_dead_letters(dead, str(tmp_path / "dlq"))
        assert [r.value for r in
                spark.read.text(str(tmp_path / "dlq")).collect()] == bad

    def test_schema_is_enforced_not_inferred(self, spark, tmp_path):
        from flight_data_pipeline_spark.sources.jsonl_corpus import (
            read_jsonl_corpus,
        )
        # a numeric-looking text field stays a string; a non-numeric
        # doc_id is a parse failure, not a silently-null row
        shard = tmp_path / "s.jsonl"
        shard.write_text(
            '{"doc_id": "notanumber", "text": "x", "lang": "en",'
            ' "source": "w", "n_chars": 1}\n'
            '{"doc_id": 9, "text": "123", "lang": "en", "source": "w",'
            ' "n_chars": 3}\n')
        good, dead = read_jsonl_corpus(spark, str(shard))
        assert [r.text for r in good.where("doc_id = 9").collect()] == ["123"]
        assert dead.count() == 1
