"""PipelineDB combine(): read-time re-aggregation of a continuous view at
a coarser grouping than the view declares, with exact semantics.

The reference's host engine stores aggregate transition state in the
view's matrel so ``SELECT g, combine(agg) FROM v GROUP BY g`` merges
states instead of wrongly re-aggregating finals (avg-of-avgs). Here the
standing query carries hidden partial-state columns (avg → (Σx, n);
stddev/variance → (n, Σx, Σx²); approx_count_distinct → mergeable HLL
sketch) and combine() re-aggregates them — one hash aggregate over
O(view groups) matrel rows, never a raw-stream rescan.
"""

from __future__ import annotations

import statistics

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


# group sizes are deliberately skewed so avg-of-avgs ≠ true avg:
# a: x→[1,2,3,4], y→[10]  (true avg 4.0; avg-of-avgs 6.25)
# b: x→[5,5],     y→[7,8,9]
_ROWS = [
    "a,x,1", "a,x,2", "a,x,3", "a,x,4", "a,y,10",
    "b,x,5", "b,x,5", "b,y,7", "b,y,8", "b,y,9",
]
_VALS = {"a": [1, 2, 3, 4, 10], "b": [5, 5, 7, 8, 9]}


def _start_view(engine, tmp_path, view_sql, rows=_ROWS, **view_kwargs):
    src_root = tmp_path / "kinesis"
    _put(src_root / "s1", rows)
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("cst", "k STRING, g STRING, v BIGINT")
    engine.create_continuous_view("cv", view_sql, "cst", **view_kwargs)
    engine.consume_begin("ep", "s1", "cst", fmt="csv", delimiter=",")
    engine.wait_for_ingest()


_VIEW_SQL = (
    "SELECT k, g, count(*) AS cnt, sum(v) AS total, avg(v) AS mean "
    "FROM cst GROUP BY k, g"
)


def test_combine_avg_regroup_is_exact_not_avg_of_avgs(engine, tmp_path):
    _start_view(engine, tmp_path, _VIEW_SQL)

    got = {
        r.k: (r.cnt, r.total, r.mean)
        for r in engine.combine("cv", ["k"]).collect()
    }
    for k, vals in _VALS.items():
        cnt, total, mean = got[k]
        assert cnt == len(vals)
        assert total == sum(vals)
        assert mean == pytest.approx(sum(vals) / len(vals))
    # the distinguishing case: naive avg-of-avgs for 'a' would be 6.25
    assert got["a"][2] == pytest.approx(4.0)


def test_combine_sql_spelling(engine, tmp_path):
    _start_view(engine, tmp_path, _VIEW_SQL)
    rows = engine.sql(
        "SELECT k, combine(mean) AS mean, combine(cnt) AS cnt, "
        "combine(total) AS total FROM cv GROUP BY k ORDER BY k"
    ).collect()
    assert [(r.k, r.mean, r.cnt, r.total) for r in rows] == [
        ("a", pytest.approx(4.0), 5, 20),
        ("b", pytest.approx(6.8), 5, 34),
    ]
    # the same surface works through execute() (reference SQL entry point)
    df = engine.execute("SELECT combine(cnt) AS n FROM cv")
    assert df.collect()[0].n == 10


def test_view_table_hides_partial_columns(engine, tmp_path):
    _start_view(engine, tmp_path, _VIEW_SQL)
    assert set(engine.view_table("cv").columns) == {
        "k", "g", "cnt", "total", "mean"
    }
    # plain ad-hoc reads see the declared schema too
    assert set(engine.sql("SELECT * FROM cv").columns) == {
        "k", "g", "cnt", "total", "mean"
    }
    # ...while the matrel exposes the partial state (PipelineDB _mrel)
    mrel_cols = set(engine.matrel("cv").columns)
    assert {"mean__pkpart_s", "mean__pkpart_c"} <= mrel_cols
    # per-group finals themselves are unaffected by the hidden columns
    row = {
        (r.k, r.g): r.mean for r in engine.view_table("cv").collect()
    }
    assert row[("a", "x")] == pytest.approx(2.5)
    assert row[("a", "y")] == pytest.approx(10.0)


def test_combine_stddev_variance(engine, tmp_path):
    _start_view(
        engine,
        tmp_path,
        "SELECT k, g, stddev_samp(v) AS sd, var_samp(v) AS vr "
        "FROM cst GROUP BY k, g",
    )
    got = {r.k: (r.sd, r.vr) for r in engine.combine("cv", ["k"]).collect()}
    for k, vals in _VALS.items():
        assert got[k][0] == pytest.approx(statistics.stdev(vals), rel=1e-9)
        assert got[k][1] == pytest.approx(statistics.variance(vals), rel=1e-9)
    # global combine (no GROUP BY)
    allv = [v for vs in _VALS.values() for v in vs]
    g = engine.combine("cv", []).collect()[0]
    assert g.sd == pytest.approx(statistics.stdev(allv), rel=1e-9)


def test_combine_approx_distinct_unions_sketches(engine, tmp_path):
    # u values OVERLAP across the fine groups: a has {1,2,3}∪{2,3,4}=4
    # distinct. Summing per-group estimates would say ~6; sketch union
    # must say 4 (HLL is exact at this cardinality).
    rows = [
        "a,x,1", "a,x,2", "a,x,3", "a,y,2", "a,y,3", "a,y,4",
        "b,x,7", "b,y,7", "b,y,8",
    ]
    _start_view(
        engine,
        tmp_path,
        "SELECT k, g, approx_count_distinct(v) AS du FROM cst GROUP BY k, g",
        rows=rows,
    )
    got = {r.k: r.du for r in engine.combine("cv", ["k"]).collect()}
    assert got == {"a": 4, "b": 2}
    sql_got = {
        r.k: r.du
        for r in engine.sql(
            "SELECT k, combine(du) AS du FROM cv GROUP BY k"
        ).collect()
    }
    assert sql_got == {"a": 4, "b": 2}


def test_combine_approx_percentile_merges_kll_sketches(engine, tmp_path):
    """approx_percentile survives regrouping: the standing query keeps
    a mergeable KLL quantile sketch per (k, g) and combine() merges the
    sketches per k. With group sizes below the sketch's k=200, the
    sketch is exact, so the merged median is the true median — which
    naive median-of-medians gets wrong for group 'a'."""
    _start_view(
        engine,
        tmp_path,
        "SELECT k, g, approx_percentile(v, 0.5) AS med "
        "FROM cst GROUP BY k, g",
    )
    mrel_cols = set(engine.matrel("cv").columns)
    assert "med__pkpart_k" in mrel_cols  # the hidden KLL sketch
    rows = {r.k: r.med for r in engine.combine("cv", ["k"]).collect()}
    assert rows["a"] == statistics.median(_VALS["a"])  # 3, not 2.5/10 mix
    assert rows["b"] == statistics.median(_VALS["b"])
    # SQL spelling drives the same merge
    got = {
        r.k: r.med
        for r in engine.sql(
            "SELECT k, combine(med) AS med FROM cv GROUP BY k"
        ).collect()
    }
    assert got == rows


def test_combine_percentile_non_literal_p_not_combinable(engine, tmp_path):
    _start_view(
        engine,
        tmp_path,
        # 0.25 + 0.25 is foldable (valid Spark SQL) but not a literal
        # our combine parser accepts — the alias is simply left out of
        # the combinable set
        "SELECT k, g, count(*) AS cnt, "
        "approx_percentile(v, 0.25 + 0.25) AS bad "
        "FROM cst GROUP BY k, g",
    )
    out = engine.combine("cv", ["k"])
    # non-literal percentage cannot merge: excluded from the combinable
    # set, while the combinable subset still works
    assert "bad" not in out.columns
    assert {r.k: r.cnt for r in out.collect()} == {"a": 5, "b": 5}


def test_combine_parquet_upsert_view(engine, tmp_path):
    _start_view(
        engine,
        tmp_path,
        _VIEW_SQL,
        materialize="parquet_upsert",
        key_cols=["k", "g"],
    )
    got = {r.k: (r.cnt, r.mean) for r in engine.combine("cv", ["k"]).collect()}
    assert got["a"] == (5, pytest.approx(4.0))
    assert got["b"] == (5, pytest.approx(6.8))
    # durable store read path hides partials too
    assert set(engine.view_table("cv").columns) == {
        "k", "g", "cnt", "total", "mean"
    }


def test_combine_over_sliding_window_view(engine, tmp_path):
    _start_view(
        engine,
        tmp_path,
        "SELECT k, count(*) AS cnt, sum(v) AS total FROM cst GROUP BY k",
        sw_seconds=3600,
    )
    g = engine.combine("cv", []).collect()[0]
    assert (g.cnt, g.total) == (10, 54)
    row = engine.sql("SELECT combine(cnt) AS n FROM cv").collect()[0]
    assert row.n == 10


def test_combine_errors(engine, tmp_path):
    _start_view(engine, tmp_path, _VIEW_SQL)
    with pytest.raises(ValueError, match="no referenced continuous view"):
        engine.sql("SELECT k, combine(nope) FROM cv GROUP BY k")
    with pytest.raises(ValueError, match="not in view output"):
        engine.combine("cv", ["missing_col"])
    with pytest.raises(KeyError):
        engine.combine("no_such_view", ["k"])


def test_exact_distinct_is_not_combinable(engine, tmp_path):
    # count(DISTINCT x) finals don't merge across groups — the alias is
    # simply absent from the combinable set and combine() on it errors
    # with guidance (approx_count_distinct is the mergeable spelling).
    # (Spark streaming rejects exact DISTINCT aggregation outright, so
    # the view is only declared, never started — the combine() contract
    # is a CREATE-time property.)
    engine.create_stream("cst", "k STRING, g STRING, v BIGINT")
    engine.create_continuous_view(
        "cv",
        "SELECT k, g, count(DISTINCT v) AS dv, count(*) AS cnt "
        "FROM cst GROUP BY k, g",
        "cst",
    )
    specs = engine.catalog.state.views["cv"]["combine_aggs"]
    assert "dv" not in specs and "cnt" in specs
    with pytest.raises(ValueError, match="combinable"):
        engine.sql("SELECT k, combine(dv) FROM cv GROUP BY k")


def test_combine_survives_restart(engine, spark, tmp_path):
    """Partial columns live in the durable store — a fresh Engine over
    the same metadata combines without the original process."""
    _start_view(
        engine,
        tmp_path,
        _VIEW_SQL,
        materialize="parquet_upsert",
        key_cols=["k", "g"],
    )
    engine.consume_end_all()
    eng2 = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    got = {r.k: r.mean for r in eng2.combine("cv", ["k"]).collect()}
    assert got["a"] == pytest.approx(4.0)


def test_combine_sw_approx_distinct_unions_sketches(engine, tmp_path):
    """combine() over an sw view merges the per-(group, step) HLL
    sketch partials: regrouping approx_count_distinct keeps SET
    semantics across both steps and keys — values shared between keys
    count once, never a sum of per-key estimates."""
    rows = ["a,x,1", "a,x,2", "a,y,3", "b,x,2", "b,y,3", "b,y,4"]
    _start_view(
        engine,
        tmp_path,
        "SELECT k, approx_count_distinct(v) AS du, count(*) AS cnt "
        "FROM cst GROUP BY k",
        rows=rows,
        sw_seconds=3600,
    )
    # per-key window answers first (sanity): a has {1,2,3}, b has {2,3,4}
    per_k = {r.k: (r.du, r.cnt) for r in engine.view_table("cv").collect()}
    assert per_k == {"a": (3, 3), "b": (3, 3)}
    # global regroup: distinct across keys is 4, not 3+3
    g = engine.combine("cv", []).collect()[0]
    assert (g.du, g.cnt) == (4, 6)
    row = engine.sql(
        "SELECT combine(du) AS du, combine(cnt) AS cnt FROM cv"
    ).collect()[0]
    assert (row.du, row.cnt) == (4, 6)


def test_sw_approx_percentile_merges_kll_across_steps_and_keys(
    engine, tmp_path
):
    """Sliding-window views keep a per-(group, step) KLL quantile
    sketch for approx_percentile; reads recombine the live steps and
    combine() regroups across keys with true quantile semantics (small
    inputs are below the sketch's exact threshold, so medians are
    exact)."""
    rows = ["a,x,1", "a,x,2", "a,y,3", "b,x,10", "b,y,20", "b,y,30"]
    _start_view(
        engine,
        tmp_path,
        "SELECT k, approx_percentile(v, 0.5) AS med, count(*) AS cnt "
        "FROM cst GROUP BY k",
        rows=rows,
        sw_seconds=3600,
    )
    per_k = {r.k: (r.med, r.cnt) for r in engine.view_table("cv").collect()}
    assert per_k == {"a": (2.0, 3), "b": (20.0, 3)}
    # regroup across keys: true median of {1,2,3,10,20,30}, never a
    # merge of per-key medians
    g = engine.combine("cv", []).collect()[0]
    assert g.cnt == 6 and g.med in (3.0, 10.0)  # either true middle
    row = engine.sql("SELECT combine(med) AS med FROM cv").collect()[0]
    assert row.med == g.med


def test_sw_approx_percentile_requires_literal_percentage(
    engine, tmp_path
):
    with pytest.raises(ValueError, match="literal percentage"):
        _start_view(
            engine,
            tmp_path,
            "SELECT k, approx_percentile(v, v) AS bad FROM cst GROUP BY k",
            sw_seconds=3600,
        )


def test_parse_rejects_expressions_over_aggregates():
    """Expressions OVER aggregates must stay out of the combinable map
    (summing per-group ratios is not the regrouped ratio), and a FROM
    inside parens must not break the partial-column rewrite."""
    from pipeline_kinesis_spark.streaming.continuous_view import (
        combine_rewrite_sql,
        parse_combine_view_sql,
    )

    specs = parse_combine_view_sql(
        "SELECT k, avg(a) - avg(b) AS diff, sum(x)/sum(y) AS ratio, "
        "sum(x) AS sx FROM s GROUP BY k"
    )
    assert set(specs) == {"sx"}  # only the whole-item aggregate

    # extract(hour FROM ts) must not become the FROM split point
    sql = (
        "SELECT extract(hour FROM ts) AS h, avg(v) AS m "
        "FROM s GROUP BY extract(hour FROM ts)"
    )
    specs = parse_combine_view_sql(sql)
    assert set(specs) == {"m"}
    rewritten = combine_rewrite_sql(sql, specs)
    assert "m__pkpart_s" in rewritten
    # the injection lands before the real FROM, not inside extract()
    assert "extract(hour FROM ts) AS h" in rewritten
    assert rewritten.index("m__pkpart_c") < rewritten.index("FROM s")


def test_sw_rejects_aggregate_expressions():
    from pipeline_kinesis_spark.streaming.continuous_view import (
        parse_sw_view_sql,
    )

    with pytest.raises(ValueError, match="combinable aggregates"):
        parse_sw_view_sql(
            "SELECT k, sum(x)/sum(y) AS r FROM s GROUP BY k"
        )


def test_deactivate_stops_mrel_query(engine, spark, tmp_path):
    """Views with hidden combine partials run under the <v>__mrel sink
    name — DEACTIVATE and DROP must stop that query too."""
    _start_view(engine, tmp_path, _VIEW_SQL)
    active = {q.name for q in spark.streams.active if q.name}
    assert "cv__mrel" in active
    engine.deactivate("cv")
    active = {
        q.name
        for qs in engine._queries.values()
        for q in qs
        if q.name and q.isActive
    }
    assert "cv__mrel" not in active
    engine.activate("cv")
    engine.drop_continuous_view("cv")
    active = {
        q.name
        for qs in engine._queries.values()
        for q in qs
        if q.name and q.isActive
    }
    assert "cv__mrel" not in active


def test_combine_honors_ttl_liveness(engine, spark, tmp_path):
    """combine() must agree with the view's own TTL read semantics:
    expired groups are excluded from the merge, exactly as view_table
    hides them."""
    import datetime as dt

    now = dt.datetime.utcnow().replace(microsecond=0)
    old = "2000-01-01 00:00:00"
    fresh = (now + dt.timedelta(hours=1)).strftime("%Y-%m-%d %H:%M:%S")
    rows = [f"a,x,{old}", f"b,x,{fresh}", f"b,y,{fresh}"]
    src_root = tmp_path / "kinesis"
    _put(src_root / "s1", rows)
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("cst", "k STRING, g STRING, ts TIMESTAMP")
    engine.create_continuous_view(
        "cv",
        "SELECT k, g, count(*) AS cnt, max(ts) AS last_ts "
        "FROM cst GROUP BY k, g",
        "cst",
        ttl_seconds=3600,
        ttl_column="last_ts",
    )
    engine.consume_begin("ep", "s1", "cst", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    got = {r.k: r.cnt for r in engine.combine("cv", ["k"]).collect()}
    assert got == {"b": 2}  # expired 'a' group excluded, like view_table
    sql_got = {
        r.k: r.n
        for r in engine.sql(
            "SELECT k, combine(cnt) AS n FROM cv GROUP BY k"
        ).collect()
    }
    assert sql_got == {"b": 2}


def test_combine_over_durable_sw_view(engine, tmp_path):
    """combine() over a parquet_upsert sliding-window view merges the
    DURABLE per-(group, step) partials — through the store's manifest
    read path — with the trailing window still applied."""
    _start_view(
        engine,
        tmp_path,
        "SELECT k, count(*) AS cnt, sum(v) AS total, "
        "approx_count_distinct(v) AS dv FROM cst GROUP BY k",
        sw_seconds=3600,
        materialize="parquet_upsert",
    )
    g = engine.combine("cv", []).collect()[0]
    # _ROWS: 10 events, values {1,2,3,4,10,5,7,8,9} → 9 distinct
    assert (g.cnt, g.total, g.dv) == (10, 54, 9)
    per_k = {r.k: r.cnt for r in engine.combine("cv", ["k"]).collect()}
    assert per_k == {"a": 5, "b": 5}


def test_combine_merge_equals_direct_aggregation_property(spark):
    """Property: for random data, merging fine-grained transition-state
    partials at a coarser grouping must equal aggregating the RAW rows
    directly at that grouping — the defining combine() invariant, for
    every supported aggregate at once. Batch-only (no engine), so the
    merge math itself is the unit under test."""
    import math
    import random

    from pipeline_kinesis_spark.streaming.continuous_view import (
        combine_rewrite_sql,
        combine_view,
        parse_combine_view_sql,
    )

    view_sql = (
        "SELECT g, f, count(*) AS n, sum(v) AS s, min(v) AS lo, "
        "max(v) AS hi, avg(v) AS mean, stddev_samp(v) AS sd, "
        "var_samp(v) AS vr FROM prop_src GROUP BY g, f"
    )
    specs = parse_combine_view_sql(view_sql)
    assert set(specs) == {"n", "s", "lo", "hi", "mean", "sd", "vr"}
    for seed in (7, 23, 1009):
        rng = random.Random(seed)
        rows = [
            (
                f"g{rng.randrange(4)}",
                f"f{rng.randrange(13)}",
                rng.randrange(-1000, 1000),
            )
            for _ in range(rng.randrange(200, 600))
        ]
        spark.createDataFrame(
            rows, "g STRING, f STRING, v LONG"
        ).createOrReplaceTempView("prop_src")
        matrel = spark.sql(combine_rewrite_sql(view_sql, specs))
        merged = {
            r.g: r
            for r in combine_view(matrel, ["g"], specs).collect()
        }
        direct = {
            r.g: r
            for r in spark.sql(
                "SELECT g, count(*) AS n, sum(v) AS s, min(v) AS lo, "
                "max(v) AS hi, avg(v) AS mean, stddev_samp(v) AS sd, "
                "var_samp(v) AS vr FROM prop_src GROUP BY g"
            ).collect()
        }
        assert set(merged) == set(direct)
        for g, d in direct.items():
            m = merged[g]
            assert (m.n, m.s, m.lo, m.hi) == (d.n, d.s, d.lo, d.hi)
            for col in ("mean", "sd", "vr"):
                assert math.isclose(
                    getattr(m, col), getattr(d, col), rel_tol=1e-9
                ), (seed, g, col, m, d)


def test_sw_percentile_output_stream_feeds_chained_combine(
    engine, spark, tmp_path
):
    """VERDICT r07 #6: the KLL percentile machinery composes with the
    delta chain — a DURABLE sliding-window approx_percentile view
    emits per-step upsert deltas on its output stream, a chained view
    aggregates those deltas, and reads of the base view still regroup
    across keys through merged KLL sketches while the chain runs."""
    src_root = tmp_path / "kinesis"
    _put(src_root / "s1", ["a,x,1", "a,x,2", "a,y,3", "b,x,10"])
    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("cst", "k STRING, g STRING, v BIGINT")
    engine.create_continuous_view(
        "cv",
        "SELECT k, approx_percentile(v, 0.5) AS med, count(*) AS cnt "
        "FROM cst GROUP BY k",
        "cst",
        materialize="parquet_upsert",
        sw_seconds=3600,
    )
    engine.create_continuous_view(
        "cv_updates",
        "SELECT new.k AS k, count(*) AS versions FROM cv_osrel "
        "GROUP BY new.k",
        "cv_osrel",
    )
    engine.consume_begin("ep", "s1", "cst", fmt="csv", delimiter=",")
    engine.wait_for_ingest()
    engine.wait_for_ingest()  # second pass drains the chained level
    per_k = {
        r.k: (r.med, r.cnt) for r in engine.view_table("cv").collect()
    }
    assert per_k == {"a": (2.0, 3), "b": (10.0, 1)}
    # regroup across keys: true median of {1,2,3,10} via sketch merge
    g = engine.combine("cv", []).collect()[0]
    assert g.cnt == 4 and g.med in (2.0, 3.0)
    # the chain saw at least one upsert delta per key
    chained = {
        r.k: r.versions
        for r in engine.view_table("cv_updates").collect()
    }
    assert set(chained) == {"a", "b"} and all(
        v >= 1 for v in chained.values()
    )
    # window grows: both levels advance, combine stays true-median
    _put(src_root / "s1", ["b,y,20", "b,y,30"], start=100)
    engine.wait_for_ingest()
    engine.wait_for_ingest()
    g2 = engine.combine("cv", []).collect()[0]
    assert g2.cnt == 6 and g2.med in (3.0, 10.0)
    assert engine.view_table("cv_updates").where(
        "k = 'b'"
    ).collect()[0].versions > chained["b"]
