"""Mergeable sketch properties (count-min, bloom) beyond the oracle gate."""

from __future__ import annotations

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators.sketches import (
    bloom_build,
    bloom_might_contain,
    cms_build,
    cms_estimate,
)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min's one-sided error: estimate ≥ true count, always."""
    e = load(spark, sf_dir, "events")
    sketch = cms_build(e, "event_type")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    for k, n in exact.items():
        assert cms_estimate(sketch, k) >= n


def test_cms_merge_is_partition_invariant(spark, sf_dir):
    """Same data, different partitioning → identical merged sketch."""
    e = load(spark, sf_dir, "events")
    s1 = cms_build(e.repartition(2), "event_type")
    s2 = cms_build(e.repartition(7), "event_type")
    assert (s1 == s2).all()


def test_bloom_no_false_negatives(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    bloom = bloom_build(o, "o_orderpriority")
    for r in o.select("o_orderpriority").distinct().collect():
        assert bloom_might_contain(bloom, r.o_orderpriority)


def test_fss_topk_matches_exact_topk(spark, sf_dir):
    """The summary-merged heavy hitters equal the exact top-k on the
    fixture, and every count lower bound is exact (overcount 0 or the
    bound admits the true count)."""
    from pyspark.sql import functions as F

    from pipeline_kinesis_spark.operators.sketches import (
        FSS_TOPK,
        fss_topk_tokens,
    )

    got = fss_topk_tokens(spark, sf_dir).collect()
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {
        r.tok: r.n
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(FSS_TOPK)
        .collect()
    }
    assert len(got) == FSS_TOPK
    for r in got:
        true_n = exact.get(r.token)
        assert true_n is not None, f"{r.token} not in exact top-k"
        assert r.exact_count == true_n
        assert r.within_bound, f"{r.token}: summary bound violated"


def test_fss_partition_invariant_topset(spark, sf_dir):
    from pipeline_kinesis_spark.operators.sketches import fss_topk_tokens

    a = {r.token for r in fss_topk_tokens(spark, sf_dir).collect()}
    assert len(a) > 0


def test_fss_sketch_only_path_sound(spark, sf_dir):
    """fss_topk_sketch is what bench.py times (QuerySpec.bench_fn) — it
    must itself be correct: k rows, every count_lb a true lower bound
    whose error window admits the exact count, and the summary's top set
    agreeing with the exact top set wherever the bound proves order."""
    from pyspark.sql import functions as F

    from pipeline_kinesis_spark.operators.sketches import (
        FSS_TOPK,
        fss_topk_sketch,
    )

    got = fss_topk_sketch(spark, sf_dir).collect()
    assert len(got) == FSS_TOPK
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {
        r.tok: r.n
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in got:
        true_n = exact.get(r.token, 0)
        assert r.count_lb <= true_n <= r.count_lb + r.max_overcount, (
            f"{r.token}: bound [{r.count_lb}, "
            f"{r.count_lb + r.max_overcount}] misses exact {true_n}"
        )


def test_bloom_rejects_absent_keys_at_low_load(spark, sf_dir):
    """With 5 inserted keys in a 64k-bit filter the FP probability is
    ~(5*5/65536)^5 — absent probes must come back negative."""
    o = load(spark, sf_dir, "orders")
    bloom = bloom_build(o, "o_orderpriority")
    misses = [f"nope-{i}" for i in range(50)]
    assert not any(bloom_might_contain(bloom, m) for m in misses)
