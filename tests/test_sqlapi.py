"""The reference's SQL control surface, end-to-end (sqlapi.py).

Mirrors the README usage script (README.md:52-110): add_endpoint →
CREATE STREAM → CREATE CONTINUOUS VIEW → consume_begin → query the view →
consume_end → seqnums metadata — every statement in the reference's own
syntax, driven through Engine.execute."""

from __future__ import annotations

import uuid

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sqlapi import _map_pg_schema, _parse_call_args
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def test_readme_script_verbatim(engine, spark, tmp_path):
    """The README's whole session, statement for statement (the only
    deviation: the endpoint's url points at the sandbox's file-backed
    stream instead of AWS). consume_begin omits start_seq, which defaults
    to -1 = LATEST (pipeline_kinesis.c:922-925), so the producer pushes
    AFTER consumption starts — exactly the README's live-stream flow."""
    src_root = tmp_path / "kinesis"
    write_record_file(str(src_root / "test"), [])
    assert (
        engine.execute(
            "SELECT pipeline_kinesis.add_endpoint('endpoint', 'us-west-2', "
            f"url := '{src_root}')"
        )
        == "success"
    )
    assert engine.execute("CREATE STREAM foo_stream (payload text);") == (
        "success"
    )
    assert (
        engine.execute(
            "CREATE CONTINUOUS VIEW foo_view AS SELECT payload, count(*) "
            "AS count FROM foo_stream GROUP BY payload"
        )
        == "success"
    )
    assert (
        engine.execute(
            "SELECT pipeline_kinesis.consume_begin("
            "'endpoint', 'test', 'foo_stream')"
        )
        == "success"
    )
    write_record_file(
        str(src_root / "test"),
        [{"data": f"foo{i % 3}"} for i in range(9)],
    )
    engine.wait_for_ingest()
    rows = {
        (r.payload, r["count"])
        for r in engine.execute("SELECT * from foo_view").collect()
    }
    assert rows == {("foo0", 3), ("foo1", 3), ("foo2", 3)}

    seq = engine.execute(
        "SELECT * FROM pipeline_kinesis.seqnums ORDER BY shard_id"
    ).collect()
    assert len(seq) == 1 and seq[0].consumer_id == 1

    assert (
        engine.execute(
            "SELECT pipeline_kinesis.consume_end("
            "'endpoint', 'test', 'foo_stream')"
        )
        == "success"
    )
    # argless forms control every consumer at once (README.md:103-110)
    assert engine.execute("SELECT pipeline_kinesis.consume_begin()") == (
        "success"
    )
    engine.wait_for_ingest()
    assert engine.execute("SELECT pipeline_kinesis.consume_end()") == (
        "success"
    )


def test_consume_begin_named_args_and_start_seq(engine, spark, tmp_path):
    """PostgreSQL named notation + the reference's start_seq encoding
    (pipeline_kinesis.c:588-605: -2 trim_horizon, -1 latest)."""
    src_root = tmp_path / "kinesis"
    write_record_file(
        str(src_root / "s"), [{"data": '{"v": 7}'}, {"data": '{"v": 8}'}]
    )
    engine.execute(
        "SELECT pipeline_kinesis.add_endpoint('ep', "
        f"url := '{src_root}')"
    )
    engine.execute("CREATE STREAM js (v int)")
    engine.execute(
        "SELECT pipeline_kinesis.consume_begin('ep', 's', 'js', "
        "format := 'json', batchsize := 500, start_seq := -2)"
    )
    engine.wait_for_ingest()
    got = {r.v for r in engine.stream_table("js").select("v").collect()}
    assert got == {7, 8}
    with pytest.raises(ValueError, match="start_seq"):
        engine.execute(
            "SELECT pipeline_kinesis.consume_begin('ep', 's', 'js', "
            "start_seq := 5)"
        )


def test_consume_begin_null_start_seq_defaults_to_latest(
    engine, spark, tmp_path
):
    """An omitted start_seq is NULL → -1 = LATEST
    (kinesis_consume_begin_sr, pipeline_kinesis.c:922-925): pre-existing
    records are skipped, only records arriving after begin land."""
    src_root = tmp_path / "kinesis"
    write_record_file(str(src_root / "s"), [{"data": '{"v": 1}'}])
    engine.execute(
        f"SELECT pipeline_kinesis.add_endpoint('ep', url := '{src_root}')"
    )
    engine.execute("CREATE STREAM nl (v int)")
    engine.execute(
        "SELECT pipeline_kinesis.consume_begin('ep', 's', 'nl', "
        "format := 'json')"
    )
    write_record_file(str(src_root / "s"), [{"data": '{"v": 2}'}])
    engine.wait_for_ingest()
    got = {r.v for r in engine.stream_table("nl").select("v").collect()}
    assert got == {2}


def test_create_cv_with_options(engine, spark, tmp_path):
    """WITH (...) options: PipelineDB ttl plus this engine's
    materialization knobs, all through the DDL string."""
    src_root = tmp_path / "kinesis"
    engine.execute(
        f"SELECT pipeline_kinesis.add_endpoint('ep', url := '{src_root}')"
    )
    engine.execute("CREATE STREAM ws (payload text)")
    engine.execute(
        "CREATE CONTINUOUS VIEW wview WITH (materialize = 'parquet_upsert', "
        "key_cols = 'payload', ttl = '1 hour', ttl_column = 'ts') "
        "AS SELECT payload, count(*) AS n, max(arrival_timestamp) AS ts "
        "FROM ws GROUP BY payload"
    )
    vd = engine.catalog.state.views["wview"]
    assert vd["materialize"] == "parquet_upsert"
    assert vd["key_cols"] == ["payload"]
    assert vd["ttl_seconds"] == 3600
    engine.execute(
        "SELECT pipeline_kinesis.consume_begin('ep', 's', 'ws')"
    )
    write_record_file(str(src_root / "s"), [{"data": p} for p in "aab"])
    engine.wait_for_ingest()
    rows = {
        (r.payload, r.n)
        for r in engine.execute("SELECT * FROM wview").collect()
    }
    assert rows == {("a", 2), ("b", 1)}


def test_transform_chain_and_procedure(engine, spark, tmp_path):
    """CREATE CONTINUOUS TRANSFORM: output rows land in the <name>_output
    relation (output-stream chaining) and THEN EXECUTE PROCEDURE fires
    per batch via a registered proc."""
    src_root = tmp_path / "kinesis"
    engine.execute(
        f"SELECT pipeline_kinesis.add_endpoint('ep', url := '{src_root}')"
    )
    engine.execute("CREATE STREAM ts (payload text)")
    seen = []
    engine.register_proc("note_batch", lambda df, bid: seen.append(df.count()))
    engine.execute(
        "CREATE CONTINUOUS TRANSFORM upperize AS "
        "SELECT upper(payload) AS p FROM ts "
        "THEN EXECUTE PROCEDURE note_batch()"
    )
    engine.execute(
        "CREATE CONTINUOUS VIEW upper_counts AS "
        "SELECT p, count(*) AS n FROM upperize_output GROUP BY p"
    )
    engine.execute("SELECT pipeline_kinesis.consume_begin('ep', 's', 'ts')")
    write_record_file(str(src_root / "s"), [{"data": p} for p in "xyz"])
    engine.wait_for_ingest()
    out = {
        r.p for r in engine.execute("SELECT p FROM upperize_output").collect()
    }
    assert out == {"X", "Y", "Z"}
    assert sum(seen) == 3
    rows = {
        (r.p, r.n)
        for r in engine.execute("SELECT * FROM upper_counts").collect()
    }
    assert rows == {("X", 1), ("Y", 1), ("Z", 1)}


def test_activate_deactivate_and_drop_statements(engine, spark, tmp_path):
    src_root = tmp_path / "kinesis"
    write_record_file(str(src_root / "s"), [{"data": "a"}])
    engine.execute(
        f"SELECT pipeline_kinesis.add_endpoint('ep', url := '{src_root}')"
    )
    engine.execute("CREATE STREAM ds (payload text)")
    engine.execute(
        "CREATE CONTINUOUS VIEW dview AS "
        "SELECT payload, count(*) AS n FROM ds GROUP BY payload"
    )
    assert engine.execute("DEACTIVATE dview") == "success"
    active = {
        (r.name, r.active)
        for r in engine.pipeline_queries().collect()
        if r.name == "dview"
    }
    assert active == {("dview", False)}
    assert engine.execute("ACTIVATE dview") == "success"
    # the standing-query inventory is queryable via plain SQL
    cat = {
        (r.name, r.kind)
        for r in engine.execute(
            "SELECT name, kind FROM pipeline_queries"
        ).collect()
    }
    assert ("dview", "view") in cat
    assert engine.execute("DROP CONTINUOUS VIEW dview") == "success"
    assert "dview" not in engine.catalog.state.views
    assert engine.execute("DROP STREAM ds") == "success"


def test_execute_script_whole_session(engine, spark, tmp_path):
    """A psql-style script — comments, multi-line statements, literals
    containing semicolons — runs top to bottom with one call."""
    src_root = tmp_path / "kinesis"
    results = engine.execute_script(
        f"""
        -- provision
        SELECT pipeline_kinesis.add_endpoint('ep', url := '{src_root}');
        CREATE STREAM scr (payload text);
        CREATE CONTINUOUS VIEW scrv AS
          SELECT payload, count(*) AS n
          FROM scr GROUP BY payload;  -- trailing comment
        SELECT pipeline_kinesis.consume_begin('ep', 's', 'scr');
        """
    )
    assert results == ["success"] * 4
    write_record_file(str(src_root / "s"), [{"data": "a;b"}, {"data": "c"}])
    engine.wait_for_ingest()
    rows = {
        (r.payload, r.n)
        for r in engine.execute("SELECT * FROM scrv").collect()
    }
    assert rows == {("a;b", 1), ("c", 1)}


def test_pg_type_mapping():
    assert _map_pg_schema(
        "a text, b int, c bigint, d float8, e boolean, f timestamptz"
    ) == "a STRING, b INT, c BIGINT, d DOUBLE, e BOOLEAN, f TIMESTAMP"


def test_arg_parser_quoting_and_named():
    pos, named = _parse_call_args(
        "'it''s', 42, fmt := 'csv', flag => TRUE, n := NULL"
    )
    assert pos == ["it's", 42]
    assert named == {"fmt": "csv", "flag": True, "n": None}


def test_unknown_function_and_bad_option(engine):
    with pytest.raises(ValueError, match="unknown pipeline_kinesis"):
        engine.execute("SELECT pipeline_kinesis.bogus('x')")
    engine.execute("CREATE STREAM es (payload text)")
    with pytest.raises(ValueError, match="unknown WITH option"):
        engine.execute(
            "CREATE CONTINUOUS VIEW ev WITH (nope = '1') AS "
            "SELECT payload FROM es"
        )
    with pytest.raises(ValueError, match="registered stream"):
        engine.execute(
            "CREATE CONTINUOUS VIEW ev AS SELECT x FROM not_a_stream"
        )


def test_pipeline_version(engine):
    out = engine.execute("SELECT pipeline_version()")
    assert "0.9.0" in out


def test_missing_required_args_raise_value_error(engine):
    """A wrong-arity control-plane call must reject cleanly (PG raises
    "function does not exist"), never KeyError — fuzz_sqlapi find."""
    with pytest.raises(ValueError, match="missing required"):
        engine.execute("SELECT pipeline_kinesis.consume_end('only_ep')")
    with pytest.raises(ValueError, match="missing required"):
        engine.execute(
            "SELECT pipeline_kinesis.consume_begin('ep', 'st')"
        )
    with pytest.raises(ValueError, match="missing required"):
        engine.execute(
            "SELECT pipeline_kinesis.add_endpoint(region := 'r')"
        )
    with pytest.raises(ValueError, match="missing required"):
        engine.execute("SELECT pipeline_kinesis.remove_endpoint()")


def test_osrel_keep_batches_bare_keywords(engine):
    """Both documented retention opt-out spellings parse bare or
    quoted (bare 'none' was a fuzz_sqlapi find)."""
    engine.execute("CREATE STREAM oks (v bigint, g text)")
    for i, kw in enumerate(("unbounded", "none", "'none'", "'unbounded'")):
        engine.execute(
            f"CREATE CONTINUOUS VIEW okv{i} WITH "
            f"(osrel_keep_batches={kw}) AS "
            f"SELECT g, count(*) AS n FROM oks GROUP BY g"
        )
        assert engine.catalog.state.views[f"okv{i}"][
            "osrel_keep_batches"
        ] is None


def test_replay_dead_letters_sql_spelling(engine, spark, tmp_path):
    """VERDICT r14 #4: the r14 schema_ddl replay override gets the same
    statement parity as the rest of the control plane — the full
    pre-ALTER recovery choreography driven ONLY through SQL, including
    the named-notation schema_ddl override with PG column types."""
    src_root = tmp_path / "kinesis"
    engine.execute(
        f"SELECT pipeline_kinesis.add_endpoint('ep', url := '{src_root}')"
    )
    engine.execute("CREATE STREAM st (v bigint, k text)")
    write_record_file(
        str(src_root / "records"),
        [
            {"data": f"{i},a", "sequence_number": f"{i:056d}",
             "shard_id": "shardId-000"}
            for i in range(5)
        ],
    )
    engine.execute(
        "SELECT pipeline_kinesis.consume_begin('ep', 'records', 'st', "
        "format := 'csv', delimiter := ',', start_seq := -2)"
    )
    engine.wait_for_ingest(timeout_s=120)
    engine.execute("SELECT pipeline_kinesis.consume_end()")
    # old-format rows land while the pipeline is down, then ALTER
    write_record_file(
        str(src_root / "records"),
        [
            {"data": f"{100 + i},b", "sequence_number":
             f"{10**9 + i:056d}", "shard_id": "shardId-000"}
            for i in range(4)
        ],
    )
    engine.execute("ALTER STREAM st ADD COLUMN w bigint")
    engine.execute(
        "SELECT pipeline_kinesis.consume_begin('ep', 'records', 'st', "
        "format := 'csv', delimiter := ',', start_seq := -2)"
    )
    engine.wait_for_ingest(timeout_s=120)
    assert engine.dead_letters("st").count() == 4

    # default replay (post-ALTER schema) recovers nothing
    assert engine.execute(
        "SELECT pipeline_kinesis.replay_dead_letters('st', "
        "delimiter := ',')"
    ) == "0"
    # a non-prefix override rejects through the SQL surface too
    with pytest.raises(ValueError, match="prefix"):
        engine.execute(
            "SELECT pipeline_kinesis.replay_dead_letters('st', "
            "delimiter := ',', schema_ddl => 'k text, v bigint')"
        )
    # PG-typed pre-ALTER schema recovers exactly the stranded rows
    assert engine.execute(
        "SELECT pipeline_kinesis.replay_dead_letters('st', "
        "delimiter := ',', schema_ddl => 'v bigint, k text')"
    ) == "4"
    assert engine.dead_letters("st").count() == 0
    tbl = engine.stream_table("st")
    assert tbl.count() == 9
    recovered = tbl.filter("k = 'b'").collect()
    assert len(recovered) == 4
    assert all(r.w is None for r in recovered)
