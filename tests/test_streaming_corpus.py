"""Streaming LLM-corpus pipeline: the corpus_clean shape (quality gate +
content-hash dedup) as a CONTINUOUS VIEW over a document stream — C1/C4
running incrementally on the reference's stream→view architecture."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def test_stream_static_join_view(engine, spark, tmp_path):
    """Continuous view joining the stream to a static dimension table
    (PipelineDB stream-table join; Spark stream-static join — B7 in the
    streaming layer). The dim is a registered temp view the view SQL
    references by name."""
    spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k STRING, label STRING"
    ).createOrReplaceTempView("dim_labels")
    src_root = tmp_path / "kinesis"
    write_record_file(
        str(src_root / "s"), [{"data": p} for p in ["a", "a", "b", "z"]]
    )
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("sj_stream", "payload STRING")
    engine.create_continuous_view(
        "sj_view",
        """
        SELECT d.label, count(*) AS n
        FROM sj_stream s JOIN dim_labels d ON s.payload = d.k
        GROUP BY d.label
        """,
        stream="sj_stream",
    )
    engine.consume_begin("ep", "s", "sj_stream")
    engine.wait_for_ingest()
    rows = {(r.label, r.n) for r in spark.table("sj_view").collect()}
    assert rows == {("alpha", 2), ("beta", 1)}  # 'z' has no dim match


def test_streaming_dedup_quality_view(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    docs = [
        {"doc_id": 1, "text": "the quick brown fox jumps"},
        {"doc_id": 2, "text": "The quick brown fox jumps"},  # dup (case)
        {"doc_id": 3, "text": "tiny"},                       # fails gate
        {"doc_id": 4, "text": "an entirely different document body"},
    ]
    write_record_file(
        str(src_root / "s"),
        [{"data": __import__("json").dumps(d)} for d in docs],
    )
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("doc_stream", "doc_id BIGINT, text STRING")
    engine.create_continuous_view(
        "clean_docs",
        """
        SELECT sha2(lower(trim(text)), 256) AS fingerprint,
               count(*) AS dup_count,
               min(doc_id) AS keep_doc_id
        FROM doc_stream
        WHERE size(split(trim(text), '\\\\s+')) >= 3
        GROUP BY sha2(lower(trim(text)), 256)
        """,
        stream="doc_stream",
    )
    engine.consume_begin("ep", "s", "doc_stream", fmt="json")
    engine.wait_for_ingest()
    rows = {
        (r.keep_doc_id, r.dup_count)
        for r in spark.table("clean_docs").collect()
    }
    assert rows == {(1, 2), (4, 1)}

    # late duplicate of doc 4 + a fresh doc — counts update incrementally
    write_record_file(
        str(src_root / "s"),
        [
            {"data": '{"doc_id": 5, "text": "an entirely different document body"}'},
            {"data": '{"doc_id": 6, "text": "brand new third document"}'},
        ],
    )
    engine.wait_for_ingest()
    rows = {
        (r.keep_doc_id, r.dup_count)
        for r in spark.table("clean_docs").collect()
    }
    assert rows == {(1, 2), (4, 2), (6, 1)}
