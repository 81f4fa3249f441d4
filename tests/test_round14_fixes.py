"""Round-14 regressions: prewarm keying, pledge hygiene, calib
recording, and the KLL sw-percentile row's exact-regime bound."""

from __future__ import annotations

import duckdb
import pytest


def test_prewarm_keyed_per_live_session(monkeypatch):
    """ADVICE r13 #2: the once-only guard must be keyed on the session
    OBJECT (weakly), not id() — alternating between two live sessions
    must reuse each session's own warm thread instead of clearing and
    re-warming (which leaked a running query + HTTP server per
    re-entry)."""
    from pipeline_kinesis_spark.gates import streaming as g

    started = []
    monkeypatch.setattr(
        g, "_prewarm_datasource_work", lambda spark: started.append(spark)
    )

    class FakeSession:  # weakref-able stand-in; prewarm only keys on it
        pass

    s1, s2 = FakeSession(), FakeSession()
    t1 = g.prewarm_datasource(s1)
    t2 = g.prewarm_datasource(s2)
    # alternation: both sessions keep their own thread, nothing re-warms
    assert g.prewarm_datasource(s1) is t1
    assert g.prewarm_datasource(s2) is t2
    assert g.prewarm_datasource(s1) is t1
    t1.join(5), t2.join(5)
    assert len(started) == 2


def test_prewarm_work_never_touches_driver_env(monkeypatch):
    """ADVICE r13 #1: the warm thread must not save/restore
    AWS_SHARED_CREDENTIALS_FILE in the driver process — a late finally
    wrote back a value captured minutes earlier, racing gate rows."""
    import inspect
    import os

    from pipeline_kinesis_spark.gates import streaming as g

    src = inspect.getsource(g._prewarm_datasource_work)
    assert "environ" not in src, (
        "_prewarm_datasource_work must not touch os.environ "
        "(stale-restore race, ADVICE r13 #1)"
    )
    # and running it against a dead-end session leaves env untouched
    sentinel = "/nonexistent/creds-sentinel"
    prior = os.environ.get("AWS_SHARED_CREDENTIALS_FILE")
    os.environ["AWS_SHARED_CREDENTIALS_FILE"] = sentinel
    try:
        g._prewarm_datasource_work(None)  # fails inside, swallowed
        assert os.environ["AWS_SHARED_CREDENTIALS_FILE"] == sentinel
    finally:
        if prior is None:
            os.environ.pop("AWS_SHARED_CREDENTIALS_FILE", None)
        else:
            os.environ["AWS_SHARED_CREDENTIALS_FILE"] = prior


def test_pending_window_pledges_carry_rounds():
    """ADVICE r13 #3: pledges are {name: pledge_round} so gate_history
    can expire them; a pledged name must be a real oracled below-window
    query (registry assembly validates)."""
    from pipeline_kinesis_spark import registry

    assert isinstance(registry._PENDING_NEXT_WINDOW, dict)
    for name, rnd in registry._PENDING_NEXT_WINDOW.items():
        assert isinstance(rnd, int) and rnd >= 14, (name, rnd)
    # r14 rotated the four r13 pledges in and they went driver-green
    # (CORRECTNESS_r14.json); later rotations may retire them again,
    # so the durable invariant is: each is a real ORACLED query AND
    # holds a green row in some correctness artifact (the gate_history
    # coverage rule) — in-window or not.
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("rows_match"):
                    green.add(name)
    qs = registry.all_queries()
    for name in (
        "streaming_json_ingest",
        "streaming_text_ingest",
        "streaming_rebucket_counts",
        "streaming_sw_hll_distinct",
    ):
        assert qs[name].oracle is not None
        assert name in registry._PRIORITY or name in green


def test_calibration_records_determinism_instead_of_asserting():
    """ADVICE r13 #4: a calib digest mismatch must stamp the artifact,
    not abort the bench (and not vanish under -O)."""
    import bench

    calib = bench._cpu_calibration()
    assert set(calib) >= {
        "calib_s",
        "calib_digest",
        "calib_digests_raw",
        "calib_deterministic",
    }
    assert calib["calib_deterministic"] is True
    assert calib["calib_digest"] == calib["calib_digests_raw"][0]
    assert bench.CALIB_REF_S > 0


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]
)
def test_sw_percentile_fixture_stays_in_kll_exact_regime(sf_dir):
    """VERDICT r13 #6: the row is hash-exact ONLY while the merged
    per-group item count stays under the KLL sketch's k=200 (verified
    exact vs quantile_disc up to n=150). The dedup-planted fixture
    bounds it at 17 values x 5 alive slots = 85; assert the REAL data
    never exceeds the verified regime at any driver scale factor."""
    con = duckdb.connect()
    n = con.execute(
        f"""
        WITH planted AS (
            SELECT DISTINCT event_type,
                   user_id % 17 AS v,
                   CASE WHEN event_id % 3 = 1 THEN (event_id % 5) * 180
                        ELSE 540 + (event_id % 2) * 180 END AS slot
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE user_id % 131 = 5 AND event_id % 3 IN (1, 2)
        )
        SELECT coalesce(max(cnt), 0) FROM (
            SELECT event_type, count(*) AS cnt
            FROM planted GROUP BY event_type
        )
        """
    ).fetchone()[0]
    assert n <= 85, n


def test_ckpt_resets_interrupted_batch0_debris(spark, tmp_path):
    """fuzz_lifecycle finding (seed 816140): consume_end can interrupt
    the offset-log write, leaving offsets/ with a .tmp stub and no
    committed batch; Spark 4.1's verifyCheckpointDirectoryEmptyOnStart
    then refuses the resume (STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY).
    _ckpt_for_start must reset such a checkpoint (it never got past
    batch 0) and must NOT touch one with a committed batch. r15: the
    reset moved out of the pure _ckpt path-getter into
    _reset_batch0_debris, invoked only via _ckpt_for_start immediately
    before a query start, and an OSError on the offsets listing is
    fail-safe (keep the checkpoint) — ADVICE r14 #1/#2."""
    import os

    from pipeline_kinesis_spark.engine import Engine

    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))

    # interrupted-stop debris: temp offset file, no committed batch
    debris = os.path.join(
        str(tmp_path / "meta"), "checkpoints", "1", "dead_letter"
    )
    os.makedirs(os.path.join(debris, "offsets"))
    open(os.path.join(debris, "offsets", ".0.tmp.123"), "w").write("x")
    open(os.path.join(debris, "metadata"), "w").write("{}")
    assert eng._ckpt(1, "dead_letter") == debris
    assert os.path.exists(debris)  # the pure path-getter never deletes
    path = eng._ckpt_for_start(1, "dead_letter")
    assert path == debris
    assert not os.path.exists(debris)  # wiped for a clean batch-0 start

    # committed checkpoint: untouched
    resumed = os.path.join(
        str(tmp_path / "meta"), "checkpoints", "2", "ingest"
    )
    os.makedirs(os.path.join(resumed, "offsets"))
    open(os.path.join(resumed, "offsets", "0"), "w").write("v1")
    open(os.path.join(resumed, "offsets", ".1.tmp"), "w").write("x")
    assert eng._ckpt_for_start(2, "ingest") == resumed
    assert os.path.exists(os.path.join(resumed, "offsets", "0"))
    assert os.path.exists(os.path.join(resumed, "offsets", ".1.tmp"))

    # fail-safe: if the offsets listing errors, KEEP the checkpoint
    # (only wipe when the listing positively shows no committed batch)
    import unittest.mock as mock

    with mock.patch(
        "pipeline_kinesis_spark.engine.os.listdir",
        side_effect=OSError("EMFILE"),
    ):
        assert eng._ckpt_for_start(1, "dead_letter")  # debris recreated? no —
    # debris dir 1 was already wiped above; recreate fresh debris and
    # verify the OSError path preserves it
    os.makedirs(os.path.join(debris, "offsets"))
    open(os.path.join(debris, "offsets", ".0.tmp.9"), "w").write("x")
    with mock.patch(
        "pipeline_kinesis_spark.engine.os.listdir",
        side_effect=OSError("EMFILE"),
    ):
        assert eng._ckpt_for_start(1, "dead_letter") == debris
    assert os.path.exists(debris)  # NOT destroyed on a transient error


def test_replay_schema_override_recovers_pre_alter_rows(spark, tmp_path):
    """fuzz_lifecycle finding #2 (seed 140817): rows framed under a
    pre-ALTER schema that were still unconsumed when the ALTER landed
    quarantine as arity-mismatches, and the default replay (current
    schema) can never recover them. replay_dead_letters(schema_ddl=
    <pre-alter schema>) must recover them, reading back NULL for the
    later-added column via stream_table's mergeSchema fill."""
    import os

    from pipeline_kinesis_spark.engine import Engine
    from pipeline_kinesis_spark.sources.file_replay import (
        write_record_file,
    )

    root = str(tmp_path)
    eng = Engine(
        spark,
        metadata_dir=os.path.join(root, "meta"),
        trigger_interval="50 milliseconds",
        shuffle_partitions=4,
    )
    try:
        eng.add_endpoint("ep", url=root)
        eng.create_stream("st", "v BIGINT, k STRING")
        write_record_file(
            os.path.join(root, "records"),
            [
                {"data": f"{i},a", "sequence_number": f"{i:056d}",
                 "shard_id": "shardId-000"}
                for i in range(5)
            ],
        )
        eng.consume_begin("ep", "records", "st", fmt="csv", delimiter=",")
        eng.wait_for_ingest(timeout_s=120)
        eng.consume_end_all()
        # old-format rows land while the pipeline is down...
        write_record_file(
            os.path.join(root, "records"),
            [
                {"data": f"{100 + i},b", "sequence_number":
                 f"{10**9 + i:056d}", "shard_id": "shardId-000"}
                for i in range(4)
            ],
        )
        # ...and the schema evolves before they are consumed
        eng.alter_stream_add_column("st", "w", "bigint")
        eng.consume_begin("ep", "records", "st", fmt="csv", delimiter=",")
        eng.wait_for_ingest(timeout_s=120)
        assert eng.dead_letters("st").count() == 4  # arity-quarantined

        # default replay (post-ALTER schema) cannot recover them
        assert eng.replay_dead_letters("st", delimiter=",") == 0
        # a non-prefix override is rejected
        import pytest as _pytest

        with _pytest.raises(ValueError, match="prefix"):
            eng.replay_dead_letters(
                "st", delimiter=",", schema_ddl="k STRING, v BIGINT"
            )
        # the pre-ALTER schema recovers exactly the stranded four
        assert (
            eng.replay_dead_letters(
                "st", delimiter=",", schema_ddl="v BIGINT, k STRING"
            )
            == 4
        )
        assert eng.dead_letters("st").count() == 0
        tbl = eng.stream_table("st")
        assert tbl.count() == 9
        recovered = tbl.filter("k = 'b'").collect()
        assert len(recovered) == 4
        assert all(r.w is None for r in recovered)  # NULL-filled column
    finally:
        eng.consume_end_all()
