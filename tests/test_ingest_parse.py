"""COPY-option-parity parsing + dead-letter quarantine (A6, A7, A13)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pipeline_kinesis_spark.ingest.parse import parse_records, split_quarantine
from pipeline_kinesis_spark.sources.records import RECORD_SCHEMA


def _records(spark, payloads):
    rows = [
        (
            p,
            f"49590338271490256608559692538361571095921575989136588898-{i:010d}",
            f"pk{i}",
            datetime(2024, 1, 1, 0, 0, i % 60),
            f"shardId-{i % 4:012d}",
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, RECORD_SCHEMA)


def test_text_format_tab_delimited(spark):
    recs = _records(spark, ["a\t1", "b\t2"])
    parsed = parse_records(recs, "k STRING, v BIGINT", fmt="text")
    good, bad = split_quarantine(parsed)
    assert bad.count() == 0
    rows = {(r.k, r.v) for r in good.collect()}
    assert rows == {("a", 1), ("b", 2)}
    # lineage + injected arrival_timestamp survive the parse (A7)
    cols = set(good.columns)
    assert {"arrival_timestamp", "sequence_number", "shard_id"} <= cols


def test_text_format_no_quote_processing(spark):
    # COPY text format must NOT strip quotes (pipeline_kinesis.c:260-286:
    # quoting applies only to csv).
    recs = _records(spark, ['"hello"\t1'])
    parsed = parse_records(recs, "k STRING, v BIGINT", fmt="text")
    good, _ = split_quarantine(parsed)
    assert good.collect()[0].k == '"hello"'


def test_csv_format_quote_and_delimiter(spark):
    recs = _records(spark, ['"x,y",3', "plain,4"])
    parsed = parse_records(recs, "k STRING, v BIGINT", fmt="csv", delimiter=",")
    good, bad = split_quarantine(parsed)
    assert bad.count() == 0
    assert {(r.k, r.v) for r in good.collect()} == {("x,y", 3), ("plain", 4)}


def test_json_format(spark):
    recs = _records(spark, ['{"k": "a", "v": 7}'])
    parsed = parse_records(recs, "k STRING, v BIGINT", fmt="json")
    good, _ = split_quarantine(parsed)
    assert good.collect()[0].v == 7


def test_malformed_rows_quarantined_not_dropped(spark):
    # Reference drops the whole batch on parse failure
    # (pipeline_kinesis.c:740-758); we quarantine only the bad rows.
    recs = _records(spark, ["a\t1", "not-a-valid-row", "c\t3"])
    parsed = parse_records(recs, "k STRING, v BIGINT", fmt="text")
    good, bad = split_quarantine(parsed)
    assert good.count() == 2
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["_corrupt_record"] == "not-a-valid-row"
    # quarantined row keeps its source lineage for replay
    assert bad_rows[0]["sequence_number"] is not None


def test_bad_type_quarantined(spark):
    recs = _records(spark, ["a\tnot_an_int"])
    parsed = parse_records(recs, "k STRING, v BIGINT", fmt="text")
    good, bad = split_quarantine(parsed)
    assert good.count() == 0
    assert bad.count() == 1


def test_arrival_timestamp_cannot_be_declared(spark):
    recs = _records(spark, ["x"])
    try:
        parse_records(recs, "payload STRING, arrival_timestamp TIMESTAMP")
    except ValueError as e:
        assert "arrival_timestamp" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_arrival_timestamp_uses_source_arrival(spark):
    recs = _records(spark, ["x"])
    parsed = parse_records(recs, "payload STRING", fmt="text")
    row = parsed.select("arrival_timestamp").collect()[0]
    assert row.arrival_timestamp == datetime(2024, 1, 1, 0, 0, 0)


def test_opaque_seqnums_stay_text(spark):
    # Kinesis seqnums exceed 128 bits → must stay strings
    # (README.md:121-126).
    recs = _records(spark, ["x"])
    parsed = parse_records(recs, "payload STRING", fmt="text")
    assert dict(parsed.dtypes)["sequence_number"] == "string"
    assert parsed.select(F.length("sequence_number")).collect()[0][0] > 40
