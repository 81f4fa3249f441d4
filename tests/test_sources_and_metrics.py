"""Format-parity batch scans (B3), stream-stream join (B11), metrics
listener (A14)."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from pipeline_kinesis_spark.sources.batch_formats import read_table
from pipeline_kinesis_spark.sources.file_replay import (
    FileReplaySource,
    write_record_file,
)
from pipeline_kinesis_spark.streaming.listeners import QueryMetricsListener


def test_csv_json_scan_parity(spark, sf_dir, tmp_path):
    """The same relation scanned as parquet, csv, and json yields the
    same rows."""
    pq = read_table(spark, f"{sf_dir}/nation.parquet", "parquet")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    pq.write.option("header", True).csv(csv_dir)
    pq.write.json(json_dir)

    schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
    got_csv = read_table(spark, csv_dir, "csv", schema=schema)
    got_json = read_table(spark, json_dir, "json", schema=schema)
    expect = {tuple(r) for r in pq.collect()}
    assert {tuple(r) for r in got_csv.collect()} == expect
    assert {tuple(r) for r in got_json.select(pq.columns).collect()} == expect


def test_stream_stream_join(spark, tmp_path):
    """B11: two live streams joined on key within a watermarked time
    bound — the streaming form of the as-of/interval join."""
    left_dir, right_dir = str(tmp_path / "l"), str(tmp_path / "r")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    write_record_file(
        left_dir,
        [
            {"data": "click1", "partition_key": "u1",
             "approximate_arrival_timestamp": "2024-01-01T10:00:00"},
            {"data": "click2", "partition_key": "u2",
             "approximate_arrival_timestamp": "2024-01-01T10:01:00"},
        ],
    )
    write_record_file(
        right_dir,
        [
            {"data": "buy1", "partition_key": "u1",
             "approximate_arrival_timestamp": "2024-01-01T10:02:00"},
            {"data": "buy_far", "partition_key": "u2",
             "approximate_arrival_timestamp": "2024-01-01T11:30:00"},
        ],
    )
    l = (
        FileReplaySource(left_dir)
        .read_stream(spark)
        .selectExpr(
            "partition_key AS user",
            "data AS click",
            "approximate_arrival_timestamp AS click_ts",
        )
        .withWatermark("click_ts", "10 minutes")
    )
    r = (
        FileReplaySource(right_dir)
        .read_stream(spark)
        .selectExpr(
            "partition_key AS buser",
            "data AS buy",
            "approximate_arrival_timestamp AS buy_ts",
        )
        .withWatermark("buy_ts", "10 minutes")
    )
    joined = l.join(
        r,
        F.expr(
            "user = buser AND buy_ts >= click_ts "
            "AND buy_ts <= click_ts + INTERVAL 5 MINUTES"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {(r.user, r.click, r.buy) for r in spark.table(name).collect()}
        # u1's buy is within 5 min of the click; u2's is 89 min away
        assert rows == {("u1", "click1", "buy1")}
    finally:
        q.stop()


def test_metrics_listener_collects_progress(spark, tmp_path):
    src = str(tmp_path / "src")
    name = f"ml_{uuid.uuid4().hex[:8]}"
    write_record_file(src, [{"data": f"r{i}"} for i in range(25)])
    listener = QueryMetricsListener()
    spark.streams.addListener(listener)
    q = (
        FileReplaySource(src)
        .read_stream(spark)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # listener callbacks are delivered asynchronously — poll
        deadline = time.time() + 15
        while listener.total_rows() < 25 and time.time() < deadline:
            time.sleep(0.2)
        assert listener.total_rows() >= 25
        hist = listener.history()
        assert any(h["num_input_rows"] == 25 for h in hist)
        assert all("duration_ms" in h for h in hist)
    finally:
        q.stop()
        spark.streams.removeListener(listener)

def test_pipeline_query_stats_relation(spark, tmp_path):
    """PipelineDB pipeline_query_stats analog: the engine's listener
    accumulates per-standing-query counters, labeled by kind, and the
    relation is queryable through sql()."""
    from pipeline_kinesis_spark.engine import Engine

    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    try:
        src_root = tmp_path / "kinesis"
        write_record_file(
            str(src_root / "s"), [{"data": f"k{i % 2},1"} for i in range(10)]
        )
        eng.add_endpoint("ep", url=str(src_root))
        eng.create_stream("qs_stream", "k STRING, v BIGINT")
        eng.create_continuous_view(
            "qs_view",
            "SELECT k, count(*) AS cnt FROM qs_stream GROUP BY k",
            "qs_stream",
        )
        # collection is demand-driven: first call attaches the listener,
        # so observe BEFORE consume_begin to count from batch zero
        assert eng.pipeline_query_stats().count() == 0
        eng.consume_begin("ep", "s", "qs_stream", fmt="csv", delimiter=",")
        eng.wait_for_ingest()
        # listener callbacks arrive asynchronously — poll for the rows
        deadline = time.time() + 15
        while time.time() < deadline:
            stats = {
                (r.kind, r.name): r
                for r in eng.pipeline_query_stats().collect()
            }
            ing = stats.get(("ingest", "qs_stream_c1"))
            vw = stats.get(("view", "qs_view"))
            if ing and vw and ing.input_rows >= 10 and vw.input_rows >= 10:
                break
            time.sleep(0.2)
        assert ing.input_rows >= 10 and ing.batches >= 1
        assert vw.input_rows >= 10 and vw.errors == 0
        # SQL-surface read
        n = eng.sql(
            "SELECT sum(input_rows) AS n FROM pipeline_query_stats "
            "WHERE kind = 'ingest'"
        ).collect()[0].n
        assert n >= 10
    finally:
        eng.consume_end_all()
