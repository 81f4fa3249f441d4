"""Sliding-window continuous views (PipelineDB WITH (sw = '...')):
reads always answer over the trailing window; the standing query keeps
per-(group, step) partial aggregates and view_table recombines the live
steps. Time travels through the records' arrival timestamps (the parse
honors source arrival time), so expiry is tested against real planted
ages without sleeping."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def _iso(age_secs: float) -> str:
    return (
        datetime.now(timezone.utc).replace(tzinfo=None)
        - timedelta(seconds=age_secs)
    ).isoformat()


def test_sw_view_answers_over_trailing_window(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("sw_s", "k STRING, v BIGINT")
    # SQL surface form: WITH (sw='1 hour', sw_step='3 minutes')
    assert engine.execute(
        "CREATE CONTINUOUS VIEW sw_view WITH (sw = '1 hour', "
        "sw_step = '3 minutes') AS "
        "SELECT k, count(*) AS n, sum(v) AS total, max(v) AS mx "
        "FROM sw_s GROUP BY k"
    ) == "success"
    engine.consume_begin("ep", "s", "sw_s", fmt="csv", delimiter=",")
    # two in-window events in DIFFERENT steps (30 s and 10 min old), one
    # expired event (2 h old) that must not count, plus another group
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a,5", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,2", "approximate_arrival_timestamp": _iso(600)},
            {"data": "a,9", "approximate_arrival_timestamp": _iso(7200)},
            {"data": "b,4", "approximate_arrival_timestamp": _iso(60)},
        ],
    )
    engine.wait_for_ingest()

    rows = {
        r.k: (r.n, r.total, r.mx)
        for r in engine.view_table("sw_view").collect()
    }
    # the expired a,9 contributes to neither count, sum, nor max —
    # and the two live 'a' events sit in different steps, proving the
    # read-time recombination across partials
    assert rows == {"a": (2, 7, 5), "b": (1, 4, 4)}

    # the raw partials table holds per-step rows (>= 3 live buckets)
    raw = spark.table("sw_view__sw_raw")
    assert raw.count() >= 3 and "_sw_win" in raw.columns

    # ad-hoc SQL resolves the view to its recombined form
    got = {
        (r.k, r.n)
        for r in engine.sql("SELECT k, n FROM sw_view").collect()
    }
    assert got == {("a", 2), ("b", 1)}

    # second batch updates the standing partials incrementally
    write_record_file(
        str(src_root / "s"),
        [{"data": "b,6", "approximate_arrival_timestamp": _iso(5)}],
    )
    engine.wait_for_ingest()
    rows = {
        r.k: (r.n, r.total, r.mx)
        for r in engine.view_table("sw_view").collect()
    }
    assert rows["b"] == (2, 10, 6)


def test_sw_view_restrictions(engine):
    engine.create_stream("sw_r", "k STRING, v BIGINT")
    with pytest.raises(ValueError, match="combinable"):
        engine.create_continuous_view(
            "bad1", "SELECT k, avg(v) AS a FROM sw_r GROUP BY k",
            stream="sw_r", sw_seconds=3600,
        )
    with pytest.raises(ValueError, match="memory or parquet_upsert"):
        engine.create_continuous_view(
            "bad2", "SELECT k, count(*) AS n FROM sw_r GROUP BY k",
            stream="sw_r", sw_seconds=3600, materialize="delta",
        )
    with pytest.raises(ValueError, match="sw_step requires sw"):
        engine.create_continuous_view(
            "bad3", "SELECT k, count(*) AS n FROM sw_r GROUP BY k",
            stream="sw_r", sw_step_seconds=60,
        )
    # HAVING is applied to the recombined WINDOW at read time, so it may
    # only reference output columns — re-running the aggregate or naming
    # a per-step input column is rejected at CREATE, not at consume_begin
    with pytest.raises(ValueError, match="output alias"):
        engine.create_continuous_view(
            "bad4",
            "SELECT k, count(*) AS n FROM sw_r GROUP BY k HAVING count(*) > 2",
            stream="sw_r", sw_seconds=3600,
        )
    with pytest.raises(ValueError, match="not an output"):
        engine.create_continuous_view(
            "bad4b",
            "SELECT k, count(*) AS n FROM sw_r GROUP BY k HAVING v > 2",
            stream="sw_r", sw_seconds=3600,
        )
    # a subquery's GROUP BY would catch the step-bucket injection meant
    # for the outer query
    with pytest.raises(ValueError, match="subquer"):
        engine.create_continuous_view(
            "bad5",
            "SELECT k, count(*) AS n FROM "
            "(SELECT k FROM sw_r GROUP BY k) t GROUP BY k",
            stream="sw_r", sw_seconds=3600,
        )
    # durable sw keys are derived (group cols + bucket); a caller key
    # omitting the bucket would overwrite partials across steps
    with pytest.raises(ValueError, match="derive key_cols"):
        engine.create_continuous_view(
            "bad6", "SELECT k, count(*) AS n FROM sw_r GROUP BY k",
            stream="sw_r", sw_seconds=3600,
            materialize="parquet_upsert", key_cols=["k"],
        )


def test_sw_view_rejects_distinct(engine):
    """count(DISTINCT x) per-step partials are not combinable — summing
    them double-counts values spanning steps; rejected at CREATE."""
    engine.create_stream("sw_d", "k STRING, v BIGINT")
    with pytest.raises(ValueError, match="combinable"):
        engine.create_continuous_view(
            "bad_d",
            "SELECT k, count(DISTINCT v) AS u FROM sw_d GROUP BY k",
            stream="sw_d", sw_seconds=3600,
        )


def test_deactivate_stops_sw_view_query(engine, spark, tmp_path):
    """DEACTIVATE must stop the sw view's standing query (it runs under
    the raw-suffixed sink name)."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("sw_x", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "swx_view", "SELECT k, count(*) AS n FROM sw_x GROUP BY k",
        stream="sw_x", sw_seconds=3600,
    )
    engine.consume_begin("ep", "s", "sw_x", fmt="csv", delimiter=",")
    write_record_file(str(src_root / "s"), [{"data": "a,1"}])
    engine.wait_for_ingest()
    engine.deactivate("swx_view")
    assert "swx_view__sw_raw" not in {
        q.name for q in spark.streams.active if q.name
    }
    running = {
        r.name: r.running for r in engine.pipeline_queries().collect()
    }
    assert running["swx_view"] is False


def test_sw_view_where_clause_passes_through(engine, spark, tmp_path):
    """WHERE in an sw view filters INPUT rows before the per-step
    partials (row-level predicate — safe per step, unlike HAVING)."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("sw_w", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "sww_view",
        "SELECT k, count(*) AS n FROM sw_w WHERE v >= 10 GROUP BY k",
        stream="sw_w",
        sw_seconds=3600,
    )
    engine.consume_begin("ep", "s", "sw_w", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a,15", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,5", "approximate_arrival_timestamp": _iso(40)},
            {"data": "b,3", "approximate_arrival_timestamp": _iso(50)},
        ],
    )
    engine.wait_for_ingest()
    rows = {r.k: r.n for r in engine.view_table("sww_view").collect()}
    assert rows == {"a": 1}


def test_sw_view_having_filters_recombined_window(engine, spark, tmp_path):
    """HAVING runs over the RECOMBINED window, never per step: a group
    whose per-step partials are each below the threshold but whose
    window total passes must survive — the exact case a per-step HAVING
    would silently drop."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("sw_hv", "k STRING, v BIGINT")
    assert engine.execute(
        "CREATE CONTINUOUS VIEW hv_view WITH (sw = '1 hour', "
        "sw_step = '3 minutes') AS "
        "SELECT k, count(*) AS n, sum(v) AS total FROM sw_hv "
        "GROUP BY k HAVING n >= 3"
    ) == "success"
    engine.consume_begin("ep", "s", "sw_hv", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            # group a: 2 events in one step + 1 in another — NO single
            # step reaches 3, the window does
            {"data": "a,1", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,2", "approximate_arrival_timestamp": _iso(40)},
            {"data": "a,4", "approximate_arrival_timestamp": _iso(600)},
            # group b: window total 2 — filtered out
            {"data": "b,5", "approximate_arrival_timestamp": _iso(50)},
            {"data": "b,6", "approximate_arrival_timestamp": _iso(610)},
            # group c: 3 events but one expired — window total 2, out
            {"data": "c,1", "approximate_arrival_timestamp": _iso(60)},
            {"data": "c,2", "approximate_arrival_timestamp": _iso(620)},
            {"data": "c,3", "approximate_arrival_timestamp": _iso(7200)},
        ],
    )
    engine.wait_for_ingest()
    rows = {
        r.k: (r.n, r.total) for r in engine.view_table("hv_view").collect()
    }
    assert rows == {"a": (3, 7)}
    # ad-hoc SQL sees the filtered view too
    assert {
        (r.k, r.n) for r in engine.sql("SELECT k, n FROM hv_view").collect()
    } == {("a", 3)}


def test_durable_sw_view_having(spark, tmp_path):
    """The durable (parquet_upsert) sw form applies HAVING at read over
    the recombined store as well."""
    src_root = tmp_path / "kinesis"
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    eng.add_endpoint("ep", url=str(src_root))
    eng.create_stream("sw_hd2", "k STRING, v BIGINT")
    eng.create_continuous_view(
        "hvd_view",
        "SELECT k, sum(v) AS total FROM sw_hd2 GROUP BY k "
        "HAVING total > 10",
        stream="sw_hd2",
        materialize="parquet_upsert",
        sw_seconds=3600,
        sw_step_seconds=180,
    )
    eng.consume_begin("ep", "s", "sw_hd2", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a,6", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,7", "approximate_arrival_timestamp": _iso(600)},
            {"data": "b,4", "approximate_arrival_timestamp": _iso(45)},
        ],
    )
    eng.wait_for_ingest()
    assert {
        r.k: r.total for r in eng.view_table("hvd_view").collect()
    } == {"a": 13}
    eng.consume_end_all()


def test_sw_view_approx_count_distinct_hll(engine, spark, tmp_path):
    """sw count(DISTINCT) via mergeable HLL partials (PipelineDB's own
    sw-distinct mechanism): the standing query keeps an hll_sketch_agg
    sketch per (group, step); the read unions the LIVE steps' sketches
    before estimating — a value seen in several steps counts once, an
    expired step's values drop out, and at these cardinalities the HLL
    estimate is exact."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("sw_h", "k STRING, u BIGINT")
    engine.create_continuous_view(
        "swh_view",
        "SELECT k, approx_count_distinct(u) AS uniq, count(*) AS n "
        "FROM sw_h GROUP BY k",
        stream="sw_h",
        sw_seconds=3600,
        sw_step_seconds=180,
    )
    engine.consume_begin("ep", "s", "sw_h", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            # step 1 (~30 s old): users 1,2
            {"data": "a,1", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,2", "approximate_arrival_timestamp": _iso(35)},
            # step 2 (~10 min old): user 2 AGAIN + user 3 — 2 must not
            # double-count across steps
            {"data": "a,2", "approximate_arrival_timestamp": _iso(600)},
            {"data": "a,3", "approximate_arrival_timestamp": _iso(610)},
            # expired (2 h old): users 8,9 must not count at all
            {"data": "a,8", "approximate_arrival_timestamp": _iso(7200)},
            {"data": "a,9", "approximate_arrival_timestamp": _iso(7205)},
            {"data": "b,7", "approximate_arrival_timestamp": _iso(45)},
        ],
    )
    engine.wait_for_ingest()
    rows = {
        r.k: (r.uniq, r.n) for r in engine.view_table("swh_view").collect()
    }
    assert rows == {"a": (3, 4), "b": (1, 1)}
    # ad-hoc SQL resolves the recombined form too
    got = {
        (r.k, r.uniq)
        for r in engine.sql("SELECT k, uniq FROM swh_view").collect()
    }
    assert got == {("a", 3), ("b", 1)}


def test_durable_sw_approx_distinct_survives_restart(spark, tmp_path):
    """The durable form persists per-step HLL sketches as binary parquet
    columns; a NEW engine over the same metadata recombines them — the
    sketch state, not just its estimate, survives restarts."""
    src_root = tmp_path / "kinesis"
    meta = str(tmp_path / "meta")
    eng = Engine(spark, metadata_dir=meta)
    eng.add_endpoint("ep", url=str(src_root))
    eng.create_stream("sw_hd", "k STRING, u BIGINT")
    eng.create_continuous_view(
        "swhd_view",
        "SELECT k, approx_count_distinct(u) AS uniq FROM sw_hd GROUP BY k",
        stream="sw_hd",
        materialize="parquet_upsert",
        sw_seconds=3600,
        sw_step_seconds=180,
    )
    eng.consume_begin("ep", "s", "sw_hd", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a,1", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,2", "approximate_arrival_timestamp": _iso(600)},
            {"data": "a,2", "approximate_arrival_timestamp": _iso(35)},
        ],
    )
    eng.wait_for_ingest()
    assert {
        r.k: r.uniq for r in eng.view_table("swhd_view").collect()
    } == {"a": 2}
    eng.consume_end_all()

    # restart: fresh engine, same metadata — recombine from the store,
    # then ingest more (user 2 again + new user 4) and recombine again
    eng2 = Engine(spark, metadata_dir=meta)
    assert {
        r.k: r.uniq for r in eng2.view_table("swhd_view").collect()
    } == {"a": 2}
    eng2.consume_begin("ep", "s", "sw_hd", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a,2", "approximate_arrival_timestamp": _iso(20)},
            {"data": "a,4", "approximate_arrival_timestamp": _iso(25)},
        ],
    )
    eng2.wait_for_ingest()
    assert {
        r.k: r.uniq for r in eng2.view_table("swhd_view").collect()
    } == {"a": 3}
    eng2.consume_end_all()


def test_durable_sw_view_reaps_expired_steps(engine, spark, tmp_path):
    """The parquet_upsert sw form — PipelineDB's step GC equivalent:
    partials land keyed on (group, bucket) and the merge-time reaper
    DROPS buckets past the retention, so the materialized store (not
    just the read) stays bounded by the window at any runtime."""
    src_root = tmp_path / "kinesis"
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("swd_s", "k STRING, v BIGINT")
    engine.create_continuous_view(
        "swd_view",
        "SELECT k, count(*) AS n, sum(v) AS total FROM swd_s GROUP BY k",
        stream="swd_s",
        materialize="parquet_upsert",
        sw_seconds=3600,
        sw_step_seconds=180,
    )
    engine.consume_begin("ep", "s", "swd_s", fmt="csv", delimiter=",")
    write_record_file(
        str(src_root / "s"),
        [
            {"data": "a,5", "approximate_arrival_timestamp": _iso(30)},
            {"data": "a,2", "approximate_arrival_timestamp": _iso(600)},
            # far beyond retention (sw + 2 steps = 3960 s): must be
            # REAPED from the store by the merge, not merely filtered
            {"data": "a,9", "approximate_arrival_timestamp": _iso(7200)},
        ],
    )
    engine.wait_for_ingest()

    rows = {
        r.k: (r.n, r.total) for r in engine.view_table("swd_view").collect()
    }
    assert rows == {"a": (2, 7)}
    # the STORE itself carries no expired bucket
    raw = spark.read.parquet(engine.view_dir("swd_view"))
    assert raw.count() == 2  # two live steps, expired step reaped
    assert raw.filter("_sw_win.end < current_timestamp() - INTERVAL 3960 SECOND").count() == 0

    # incremental update into an existing bucket's partial
    write_record_file(
        str(src_root / "s"),
        [{"data": "a,1", "approximate_arrival_timestamp": _iso(20)}],
    )
    engine.wait_for_ingest()
    rows = {
        r.k: (r.n, r.total) for r in engine.view_table("swd_view").collect()
    }
    assert rows == {"a": (3, 8)}
    # ad-hoc SQL resolves the durable sw view to its recombined form
    got = engine.sql("SELECT k, n FROM swd_view").collect()
    assert [(r.k, r.n) for r in got] == [("a", 3)]
