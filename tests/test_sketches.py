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


def test_bloom_rejects_absent_keys_at_low_load(spark, sf_dir):
    """With 5 inserted keys in a 64k-bit filter the FP probability is
    ~(5*5/65536)^5 — absent probes must come back negative."""
    o = load(spark, sf_dir, "orders")
    bloom = bloom_build(o, "o_orderpriority")
    misses = [f"nope-{i}" for i in range(50)]
    assert not any(bloom_might_contain(bloom, m) for m in misses)
