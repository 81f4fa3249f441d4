"""View output streams — PipelineDB's ``output_of('v')`` delta chaining.

Every parquet_upsert continuous view can emit an output stream of
(old, new, arrival_timestamp) change tuples as its matrel merges —
exactly PipelineDB's view output streams, where downstream transforms
and views chain with ``FROM output_of('v')``. Emission is demand-driven
(off with no consumers), exactly-once under foreachBatch retries
(rename-published per-batch subdirs), and the old struct always shows
the PRE-merge row (NULL on first insert).
"""

from __future__ import annotations

import os

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def _put(stream_dir, rows, start=1):
    write_record_file(
        str(stream_dir),
        [
            {
                "data": data,
                "partition_key": data.split(",")[0],
                "shard_id": "shardId-000000000000",
                "sequence_number": f"{i:056d}",
            }
            for i, data in enumerate(rows, start)
        ],
    )


_BASE_SQL = "SELECT k, count(*) AS cnt, sum(v) AS total FROM st GROUP BY k"


def _setup_base(engine, tmp_path):
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("st", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "agg",
        _BASE_SQL,
        "st",
        materialize="parquet_upsert",
        key_cols=["k"],
    )
    return src_root


def test_deltas_old_new_and_chained_view(engine, spark, tmp_path):
    src_root = _setup_base(engine, tmp_path)
    # downstream view counts versions per key as the base view updates
    engine.create_continuous_view(
        "changes",
        "SELECT new.k AS k, count(*) AS versions, max(new.cnt) AS last_cnt "
        "FROM agg_osrel GROUP BY new.k",
        "agg_osrel",
    )
    # file 1 → upsert batch 1 (all inserts: old is NULL)
    _put(src_root / "s1", ["a,1", "a,2", "b,5"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    # file 2 → upsert batch 2 ('a' updates: old shows the pre-merge row)
    _put(src_root / "s1", ["a,10"], start=100)
    engine.wait_for_ingest()

    deltas = engine.output_stream("agg").collect()
    by_batch = {}
    for r in deltas:
        by_batch.setdefault(r.new.k, []).append(r)
    a_rows = sorted(by_batch["a"], key=lambda r: r.new.cnt)
    assert a_rows[0].old is None  # first insert
    assert (a_rows[0].new.cnt, a_rows[0].new.total) == (2, 3)
    assert (a_rows[1].old.cnt, a_rows[1].old.total) == (2, 3)
    assert (a_rows[1].new.cnt, a_rows[1].new.total) == (3, 13)
    (b_row,) = by_batch["b"]
    assert b_row.old is None and (b_row.new.cnt, b_row.new.total) == (1, 5)

    chained = {
        r.k: (r.versions, r.last_cnt)
        for r in engine.view_table("changes").collect()
    }
    assert chained == {"a": (2, 3), "b": (1, 1)}


def test_output_of_sql_surface(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.execute("CREATE STREAM st (k text, v bigint)")
    engine.execute(
        "CREATE CONTINUOUS VIEW agg WITH (materialize='parquet_upsert', "
        f"key_cols='k') AS {_BASE_SQL}"
    )
    engine.execute(
        "CREATE CONTINUOUS VIEW changes AS SELECT new.k AS k, "
        "count(*) AS versions FROM output_of('agg') GROUP BY new.k"
    )
    _put(src_root / "s1", ["a,1", "b,2"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    _put(src_root / "s1", ["b,3"], start=10)
    engine.wait_for_ingest()

    # ad-hoc reads accept the PipelineDB spelling too
    n = engine.sql(
        "SELECT count(*) AS n FROM output_of('agg')"
    ).collect()[0].n
    assert n == 3  # a insert, b insert, b update
    got = {
        r.k: r.versions
        for r in engine.sql("SELECT * FROM changes").collect()
    }
    assert got == {"a": 1, "b": 2}


def test_chained_transform_on_output_stream(engine, spark, tmp_path):
    src_root = _setup_base(engine, tmp_path)
    # transform turns update deltas into an audit relation of cnt jumps
    engine.create_continuous_transform(
        "audit",
        "SELECT new.k AS k, old.cnt AS prev_cnt, new.cnt AS cnt "
        "FROM agg_osrel WHERE old IS NOT NULL",
        stream="agg_osrel",
        sink_relation="agg_audit",
    )
    _put(src_root / "s1", ["a,1"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    _put(src_root / "s1", ["a,2", "a,3"], start=10)
    engine.wait_for_ingest()

    rows = [
        (r.k, r.prev_cnt, r.cnt)
        for r in engine.stream_table("agg_audit").collect()
    ]
    assert rows == [("a", 1, 3)]


def test_no_consumers_no_emission(engine, spark, tmp_path):
    src_root = _setup_base(engine, tmp_path)
    _put(src_root / "s1", ["a,1"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    assert not os.path.isdir(engine.osrel_dir("agg"))


def test_osrel_source_validation(engine, tmp_path):
    engine.create_stream("st", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "mem_view", "SELECT k, count(*) AS cnt FROM st GROUP BY k", "st"
    )
    with pytest.raises(ValueError, match="parquet_upsert"):
        engine.create_continuous_view(
            "bad",
            "SELECT new.k AS k FROM mem_view_osrel",
            "mem_view_osrel",
        )
    with pytest.raises(KeyError, match="no continuous view"):
        engine.create_continuous_view(
            "bad2", "SELECT new.k AS k FROM ghost_osrel", "ghost_osrel"
        )


def test_activate_deactivate_chained_view(engine, spark, tmp_path):
    """Deactivating a chained view pauses it without disturbing the
    base; reactivating resumes it with the deltas that accrued while
    inactive (checkpoint resume, no loss)."""
    src_root = _setup_base(engine, tmp_path)
    engine.create_continuous_view(
        "changes",
        "SELECT new.k AS k, count(*) AS versions "
        "FROM agg_osrel GROUP BY new.k",
        "agg_osrel",
    )
    _put(src_root / "s1", ["a,1"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    engine.deactivate("changes")
    _put(src_root / "s1", ["a,2"], start=10)
    engine.wait_for_ingest()
    engine.activate("changes")
    engine.wait_for_ingest()
    got = {
        r.k: r.versions for r in engine.view_table("changes").collect()
    }
    assert got == {"a": 2}

def test_ttl_reap_emits_delete_tuples(engine, spark, tmp_path):
    """TTL reaping is a matrel change too: rows the merge expires emit
    (old, new=NULL) delete tuples — PipelineDB's old-only delta."""
    import datetime as dt

    now = dt.datetime.utcnow().replace(microsecond=0)
    # 'gone' expires 8 s after `now` (ts = now+6, TTL 2 s) — a wide
    # enough window that even a slow first micro-batch stores it while
    # it is still live (a 2 s window flaked under host load)
    soon_dead = (now + dt.timedelta(seconds=6)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    alive = (now + dt.timedelta(hours=1)).strftime("%Y-%m-%d %H:%M:%S")

    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("st", "k STRING, ts TIMESTAMP")
    engine.create_continuous_view(
        "agg",
        "SELECT k, count(*) AS n, max(ts) AS last_ts FROM st GROUP BY k",
        "st",
        materialize="parquet_upsert",
        key_cols=["k"],
        ttl_seconds=2,
        ttl_column="last_ts",
        upsert_buckets=1,  # one bucket → every batch touches it
    )
    engine.create_continuous_transform(
        "deltas",
        "SELECT old.k AS old_k, new.k AS new_k FROM agg_osrel",
        stream="agg_osrel",
        sink_relation="agg_deltas",
    )
    _put(src_root / "s1", [f"gone,{soon_dead}", f"keep,{alive}"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    # precondition for a meaningful delete tuple: the first batch
    # stored 'gone' while live (fails loudly here rather than flaking
    # on the delta assertion below)
    assert {r.k for r in engine.view_table("agg").collect()} == {
        "gone",
        "keep",
    }
    import time as _t

    # wait out the expiry (now+8) with margin before the next batch
    while dt.datetime.utcnow() < now + dt.timedelta(seconds=9):
        _t.sleep(0.25)
    _put(src_root / "s1", [f"fresh,{alive}"], start=100)
    engine.wait_for_ingest()

    rows = {
        (r.old_k, r.new_k)
        for r in engine.stream_table("agg_deltas").collect()
    }
    assert ("gone", None) in rows  # the delete tuple
    assert (None, "fresh") in rows and (None, "keep") in rows
    # and the matrel agrees: 'gone' is physically absent
    assert {r.k for r in engine.view_table("agg").collect()} == {
        "keep",
        "fresh",
    }


def test_two_level_cascade(engine, spark, tmp_path):
    """view → output stream → view → output stream → view: multi-level
    delta cascades, each level a standing query."""
    src_root = _setup_base(engine, tmp_path)
    engine.create_continuous_view(
        "changes",
        "SELECT new.k AS k, count(*) AS versions FROM agg_osrel "
        "GROUP BY new.k",
        "agg_osrel",
        materialize="parquet_upsert",
        key_cols=["k"],
    )
    engine.create_continuous_view(
        "final",
        "SELECT new.k AS k, max(new.versions) AS v FROM changes_osrel "
        "GROUP BY new.k",
        "changes_osrel",
    )
    _put(src_root / "s1", ["a,1", "b,2"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    _put(src_root / "s1", ["a,9"], start=50)
    engine.wait_for_ingest()
    engine.wait_for_ingest()  # second pass drains the cascade tail

    got = {r.k: r.v for r in engine.view_table("final").collect()}
    assert got == {"a": 2, "b": 1}


def test_drop_refused_with_osrel_dependents(engine, tmp_path):
    """DROP of a view with standing output-stream consumers errors
    (PipelineDB dependent-object semantics); dropping the dependent
    first unblocks it."""
    engine.create_stream("st", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "agg", _BASE_SQL, "st",
        materialize="parquet_upsert", key_cols=["k"],
    )
    engine.create_continuous_view(
        "changes",
        "SELECT new.k AS k, count(*) AS n FROM agg_osrel GROUP BY new.k",
        "agg_osrel",
    )
    with pytest.raises(ValueError, match="output-stream consumers"):
        engine.drop_continuous_view("agg")
    engine.drop_continuous_view("changes")
    engine.drop_continuous_view("agg")
    assert "agg" not in engine.catalog.state.views


def test_osrel_retention_reaps_old_batches(engine, spark, tmp_path):
    """WITH (osrel_keep_batches=N) bounds the delta history: old batch
    subdirs are reaped after emission while standing consumers (which
    processed them already) keep their full aggregate."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("st", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "agg",
        _BASE_SQL,
        "st",
        materialize="parquet_upsert",
        key_cols=["k"],
        osrel_keep_batches=1,
    )
    engine.create_continuous_view(
        "changes",
        "SELECT new.k AS k, count(*) AS versions FROM agg_osrel "
        "GROUP BY new.k",
        "agg_osrel",
    )
    _put(src_root / "s1", ["a,1"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    _put(src_root / "s1", ["a,2"], start=10)
    engine.wait_for_ingest()
    _put(src_root / "s1", ["a,3"], start=20)
    engine.wait_for_ingest()

    batches = sorted(
        n for n in os.listdir(engine.osrel_dir("agg")) if n.startswith("b")
    )
    assert len(batches) <= 2  # history bounded by the retention window
    # the standing consumer saw every delta before any reap
    got = {r.k: r.versions for r in engine.view_table("changes").collect()}
    assert got == {"a": 3}


def test_chained_transform_created_while_running(engine, spark, tmp_path):
    """A transform chained on output_of('v') and created AFTER
    consume_begin starts immediately — delta emission turns on for the
    base without a consumer restart."""
    src_root = _setup_base(engine, tmp_path)
    _put(src_root / "s1", ["a,1"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    engine.create_continuous_transform(
        "late_audit",
        "SELECT new.k AS k, new.cnt AS cnt FROM agg_osrel",
        stream="agg_osrel",
        sink_relation="late_sink",
    )
    _put(src_root / "s1", ["a,2", "b,5"], start=10)
    engine.wait_for_ingest()
    rows = {
        (r.k, r.cnt)
        for r in engine.stream_table("late_sink").collect()
    }
    assert rows == {("a", 2), ("b", 1)}


def test_delete_tuple_when_replacement_expired(engine, spark, tmp_path):
    """A live stored row whose arriving replacement is itself expired
    leaves the matrel — and the stream must say so with a delete
    tuple (the key exits `keep` but never re-enters through the
    TTL-filtered new side)."""
    import datetime as dt

    now = dt.datetime.utcnow().replace(microsecond=0)
    fresh = now.strftime("%Y-%m-%d %H:%M:%S")
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("st", "k STRING, ts TIMESTAMP")
    # min(ts) with TTL on it: one old event drags the whole group
    # under the expiry line
    engine.create_continuous_view(
        "agg",
        "SELECT k, min(ts) AS first_ts, count(*) AS n FROM st GROUP BY k",
        "st",
        materialize="parquet_upsert",
        key_cols=["k"],
        ttl_seconds=3600,
        ttl_column="first_ts",
    )
    engine.create_continuous_transform(
        "deltas",
        "SELECT old.k AS old_k, new.k AS new_k FROM agg_osrel",
        stream="agg_osrel",
        sink_relation="agg_deltas",
    )
    _put(src_root / "s1", [f"a,{fresh}"])
    engine.consume_begin("ep", "s1", "st", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    assert {r.k for r in engine.view_table("agg").collect()} == {"a"}
    # the late OLD event expires a's replacement row
    _put(src_root / "s1", ["a,2000-01-01 00:00:00"], start=10)
    engine.wait_for_ingest()
    assert {r.k for r in engine.view_table("agg").collect()} == set()
    rows = {
        (r.old_k, r.new_k)
        for r in engine.stream_table("agg_deltas").collect()
    }
    assert (None, "a") in rows  # the insert
    assert ("a", None) in rows  # the delete on expired replacement
