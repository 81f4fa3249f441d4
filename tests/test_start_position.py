"""A3 offset resolution: trim_horizon | latest | after_sequence_number:X
(pipeline_kinesis.c:587-605, kinesis_consumer.cpp:258-291)."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def test_latest_skips_preexisting_records(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    write_record_file(
        str(src_root / "s"), [{"data": "old1"}, {"data": "old2"}]
    )
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("lt_stream", "payload STRING")
    engine.consume_begin("ep", "s", "lt_stream", start_position="latest")
    write_record_file(str(src_root / "s"), [{"data": "new1"}])
    engine.wait_for_ingest()
    rows = {r.payload for r in engine.stream_table("lt_stream").collect()}
    assert rows == {"new1"}


def test_latest_resolution_is_sticky_across_restart(engine, spark, tmp_path):
    """'latest' resolves once; a restart must NOT re-resolve and skip
    records that arrived while the consumer was stopped."""
    src_root = tmp_path / "kinesis"
    write_record_file(str(src_root / "s"), [{"data": "old"}])
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("st_stream", "payload STRING")
    engine.consume_begin("ep", "s", "st_stream", start_position="latest")
    engine.wait_for_ingest()
    engine.consume_end("ep", "s", "st_stream")
    # arrives while stopped — must still be ingested after restart
    write_record_file(str(src_root / "s"), [{"data": "while_down"}])
    engine.consume_begin("ep", "s", "st_stream", start_position="latest")
    engine.wait_for_ingest()
    rows = {r.payload for r in engine.stream_table("st_stream").collect()}
    assert rows == {"while_down"}


def test_after_sequence_number(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a", "sequence_number": "00000001"},
            {"data": "b", "sequence_number": "00000002"},
            {"data": "c", "sequence_number": "00000003"},
        ],
    )
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("as_stream", "payload STRING")
    engine.consume_begin(
        "ep",
        "s",
        "as_stream",
        start_position="after_sequence_number:00000002",
    )
    engine.wait_for_ingest()
    rows = {r.payload for r in engine.stream_table("as_stream").collect()}
    assert rows == {"c"}


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """A11 flow control: maxFilesPerTrigger admits a bounded number of
    batch files per micro-batch — the reference's bounded-queue analog
    (conc_queue.hpp capacity 100)."""
    from pipeline_kinesis_spark.sources.file_replay import FileReplaySource

    src = str(tmp_path / "src")
    for i in range(4):
        write_record_file(src, [{"data": f"r{i}-{j}"} for j in range(5)])
    source = FileReplaySource(src, max_files_per_trigger=1)
    records = source.read_stream(spark)
    q = (
        records.writeStream.format("memory")
        .queryName("mft_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
        sizes = [p["numInputRows"] for p in progress if p["numInputRows"] > 0]
        # 4 files × 5 records, one file per trigger → every non-empty
        # micro-batch carried exactly 5 rows
        assert sizes and all(s == 5 for s in sizes), sizes
        assert spark.table("mft_t").count() == 20
    finally:
        q.stop()


def test_consumer_can_start_before_first_record(engine, spark, tmp_path):
    """A Kinesis stream exists independently of records — starting the
    consumer first, then producing, must work."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("pre_stream", "payload STRING")
    engine.consume_begin("ep", "s", "pre_stream")
    write_record_file(str(src_root / "s"), [{"data": "first"}])
    engine.wait_for_ingest()
    rows = {r.payload for r in engine.stream_table("pre_stream").collect()}
    assert rows == {"first"}


def test_unknown_start_position_rejected(engine, tmp_path):
    engine.add_endpoint("ep", url=str(tmp_path / "kinesis"))
    engine.create_stream("bad_stream", "payload STRING")
    with pytest.raises(ValueError, match="start_position"):
        engine.consume_begin(
            "ep", "s", "bad_stream", start_position="yesterday"
        )
