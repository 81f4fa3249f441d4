"""Streaming space-saving top-k (applyInPandasWithState) — PipelineDB's
continuously-maintained topk: bounded per-group state across micro-batches,
update-mode re-emission, space-saving error guarantees."""

from __future__ import annotations

import uuid

from pipeline_kinesis_spark.sources.file_replay import (
    FileReplaySource,
    write_record_file,
)
from pipeline_kinesis_spark.streaming.stateful import streaming_topk


def _start(df, name, ckpt):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )


def _put(src, pairs):
    write_record_file(src, [{"data": f"{g},{i}"} for g, i in pairs])


def _records(spark, src):
    from pyspark.sql import functions as F

    raw = FileReplaySource(src).read_stream(spark)
    return raw.select(
        F.split("data", ",")[0].alias("grp"),
        F.split("data", ",")[1].alias("item"),
    )


def test_streaming_topk_exact_within_capacity(spark, tmp_path):
    """Capacity not exceeded → counts are EXACT across batches (err 0),
    state carries between micro-batches."""
    src = str(tmp_path / "src")
    name = f"topk_{uuid.uuid4().hex[:8]}"
    _put(src, [("g1", "a")] * 3 + [("g1", "b")] * 2 + [("g2", "x")])
    q = _start(
        streaming_topk(
            _records(spark, src), "grp", "item", capacity=10, k=2
        ),
        name,
        str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
        _put(src, [("g1", "b")] * 4)  # b overtakes a across batches
        q.processAllAvailable()
        rows = {
            (r.grp, r.item): (r.est_count, r.max_err)
            for r in spark.table(name).collect()
        }
        # update mode: latest emission per (grp, item) wins in the memory
        # sink history; check the final counts
        assert rows[("g1", "b")] == (6, 0)
        assert rows[("g1", "a")] == (3, 0)
        assert rows[("g2", "x")] == (1, 0)
    finally:
        q.stop()


def test_streaming_topk_eviction_guarantees(spark, tmp_path):
    """Capacity 2 with 3 distinct items forces evictions: space-saving
    guarantees est >= true and est - err <= true, and the true heavy
    hitter is retained."""
    src = str(tmp_path / "src")
    name = f"topk_{uuid.uuid4().hex[:8]}"
    _put(src, [("g", "hot")] * 8 + [("g", "warm")] * 3)
    q = _start(
        streaming_topk(
            _records(spark, src), "grp", "item", capacity=2, k=2
        ),
        name,
        str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
        _put(src, [("g", "cold")] * 2 + [("g", "hot")] * 2)
        q.processAllAvailable()
        latest = {}
        for r in spark.table(name).collect():
            latest[(r.grp, r.item)] = (r.est_count, r.max_err)
        true = {"hot": 10, "warm": 3, "cold": 2}
        # the heavy hitter survives with exact-or-over count
        est, err = latest[("g", "hot")]
        assert est >= true["hot"] and est - err <= true["hot"]
        # every reported item obeys the SS bounds
        for (g, item), (est, err) in latest.items():
            assert est >= true[item]
            assert est - err <= true[item]
    finally:
        q.stop()


def test_streaming_topk_state_survives_restart(spark, tmp_path):
    """The space-saving summary lives in the state store: a stopped and
    restarted query (same checkpoint) must resume the counts, not start
    from zero. (foreachBatch sink — the memory sink cannot recover from
    a checkpoint.)"""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    emitted: list[tuple] = []

    def _run():
        df = streaming_topk(_records(spark, src), "grp", "item", 10, 3)
        return (
            df.writeStream.foreachBatch(
                lambda bdf, bid: emitted.extend(
                    (r.grp, r.item, r.est_count) for r in bdf.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    _put(src, [("g", "a")] * 3)
    q = _run()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _put(src, [("g", "a")] * 2 + [("g", "b")])
    q2 = _run()
    try:
        q2.processAllAvailable()
        latest = {}
        for grp, item, est in emitted:
            latest[(grp, item)] = est
        assert latest[("g", "a")] == 5  # 3 before restart + 2 after
        assert latest[("g", "b")] == 1
    finally:
        q2.stop()
