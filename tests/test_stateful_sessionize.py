"""Custom stateful operator: applyInPandasWithState gap sessionization
(B24/B27) — close-triggered per-session payloads, event-time timeout."""

from __future__ import annotations

import uuid

from pipeline_kinesis_spark.sources.file_replay import (
    FileReplaySource,
    write_record_file,
)
from pipeline_kinesis_spark.streaming.stateful import sessionize


def _q(df, name, ckpt):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_sessionize_emits_on_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    # user u1: two events 60s apart (one session); u2: one event
    write_record_file(
        src,
        [
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:00:00"},
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:01:00"},
            {"data": "u2", "approximate_arrival_timestamp": "2024-01-01T10:00:30"},
        ],
    )
    records = FileReplaySource(src).read_stream(spark)
    sessions = sessionize(
        records,
        key_col="data",
        ts_col="approximate_arrival_timestamp",
        gap_secs=300,
        watermark_delay="0 seconds",
    )
    q = _q(sessions, name, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        # advance watermark far past u1/u2's last events + gap
        write_record_file(
            src,
            [{"data": "u3", "approximate_arrival_timestamp": "2024-01-01T13:00:00"}],
        )
        q.processAllAvailable()
        # one more batch so event-time timeouts (evaluated against the
        # watermark set by the previous batch) fire and emit
        write_record_file(
            src,
            [{"data": "u3", "approximate_arrival_timestamp": "2024-01-01T13:01:00"}],
        )
        q.processAllAvailable()
        rows = {
            (r.key, r.session_start.isoformat(), r.n_events, r.duration_secs)
            for r in spark.table(name).collect()
        }
        assert ("u1", "2024-01-01T10:00:00", 2, 60.0) in rows
        assert ("u2", "2024-01-01T10:00:30", 1, 0.0) in rows
        # u3's session is still open — must NOT be emitted yet
        assert not any(k == "u3" for k, *_ in rows)
    finally:
        q.stop()


def test_sessionize_splits_gap_within_single_batch(spark, tmp_path):
    """Two events for one key in the SAME micro-batch, separated by more
    than the gap → the earlier session closes immediately."""
    src = str(tmp_path / "src")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    write_record_file(
        src,
        [
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:00:00"},
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:02:00"},
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T11:00:00"},
        ],
    )
    records = FileReplaySource(src).read_stream(spark)
    sessions = sessionize(
        records,
        key_col="data",
        ts_col="approximate_arrival_timestamp",
        gap_secs=300,
        watermark_delay="0 seconds",
    )
    q = _q(sessions, name, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        rows = {
            (r.key, r.session_start.isoformat(), r.n_events, r.duration_secs)
            for r in spark.table(name).collect()
        }
        assert ("u1", "2024-01-01T10:00:00", 2, 120.0) in rows
        assert len(rows) == 1  # the 11:00 session is still open
    finally:
        q.stop()


def test_native_session_window_streaming(spark, tmp_path):
    """B24's streaming leg with the BUILT-IN session_window (the custom
    sessionizer above exists for close-triggered custom payloads; plain
    aggregates should use this native state machine)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    name = f"nsw_{uuid.uuid4().hex[:8]}"
    write_record_file(
        src,
        [
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:00:00"},
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:02:00"},
            {"data": "u1", "approximate_arrival_timestamp": "2024-01-01T11:00:00"},
        ],
    )
    records = FileReplaySource(src).read_stream(spark)
    agg = (
        records.withWatermark("approximate_arrival_timestamp", "0 seconds")
        .groupBy(
            F.session_window(
                "approximate_arrival_timestamp", "5 minutes"
            ).alias("w"),
            F.col("data").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("key", F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark so the first session finalizes
        write_record_file(
            src,
            [{"data": "u2", "approximate_arrival_timestamp": "2024-01-01T13:00:00"}],
        )
        q.processAllAvailable()
        rows = {
            (r.key, r.ws.isoformat(), r.n)
            for r in spark.table(name).collect()
        }
        assert ("u1", "2024-01-01T10:00:00", 2) in rows
        assert ("u1", "2024-01-01T11:00:00", 1) in rows
    finally:
        q.stop()


def test_sessionize_splits_on_gap_within_key(spark, tmp_path):
    """Events for the same key separated by more than the gap produce two
    sessions; the first closes as soon as the second batch arrives."""
    src = str(tmp_path / "src")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    write_record_file(
        src,
        [{"data": "u1", "approximate_arrival_timestamp": "2024-01-01T10:00:00"}],
    )
    records = FileReplaySource(src).read_stream(spark)
    sessions = sessionize(
        records,
        key_col="data",
        ts_col="approximate_arrival_timestamp",
        gap_secs=300,
        watermark_delay="0 seconds",
    )
    q = _q(sessions, name, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        write_record_file(
            src,
            [{"data": "u1", "approximate_arrival_timestamp": "2024-01-01T11:00:00"}],
        )
        q.processAllAvailable()
        rows = {
            (r.key, r.session_start.isoformat(), r.n_events)
            for r in spark.table(name).collect()
        }
        # first session flushed when the out-of-gap event arrived
        assert ("u1", "2024-01-01T10:00:00", 1) in rows
    finally:
        q.stop()
