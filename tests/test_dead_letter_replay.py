"""Dead-letter replay: quarantined rows recovered with corrected format
options, idempotently (§3.4 upgrade over the reference's batch drop)."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def test_replay_with_corrected_delimiter(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    # consumer expects tab-separated; two rows are comma-separated → DL
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a\t1"},
            {"data": "b,2"},
            {"data": "c,3"},
        ],
    )
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("rp_stream", "k STRING, v BIGINT")
    engine.consume_begin("ep", "s", "rp_stream", fmt="text", delimiter="\t")
    engine.wait_for_ingest()
    assert {r.k for r in engine.stream_table("rp_stream").collect()} == {"a"}
    assert engine.dead_letters("rp_stream").count() == 2

    n = engine.replay_dead_letters("rp_stream", delimiter=",")
    assert n == 2
    rows = {
        (r.k, r.v) for r in engine.stream_table("rp_stream").collect()
    }
    assert rows == {("a", 1), ("b", 2), ("c", 3)}
    assert engine.dead_letters("rp_stream").count() == 0

    # idempotent: nothing left to recover
    assert engine.replay_dead_letters("rp_stream", delimiter=",") == 0
    assert engine.stream_table("rp_stream").count() == 3


def test_replay_keeps_still_bad_rows_quarantined(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    write_record_file(
        str(src_root / "s"),
        [{"data": "x,1"}, {"data": "unparseable-even-with-comma"}],
    )
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("rb_stream", "k STRING, v BIGINT")
    engine.consume_begin("ep", "s", "rb_stream", fmt="text", delimiter="\t")
    engine.wait_for_ingest()
    assert engine.dead_letters("rb_stream").count() == 2

    n = engine.replay_dead_letters("rb_stream", delimiter=",")
    assert n == 1
    assert engine.dead_letters("rb_stream").count() == 1
    assert {r.k for r in engine.stream_table("rb_stream").collect()} == {"x"}
