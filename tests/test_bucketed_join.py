"""Bucketing: co-located fact-fact joins without a shuffle (SURVEY §2B
B7 at scale). Writing both sides bucketed on the join key lets the join
read pre-partitioned data — the plan must contain NO Exchange. This is
the technique that makes repeated 100 TB fact joins affordable; locally
we assert the plan shape, which is identical on a cluster."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.plans.inspect import explain_str


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"b_{tbl}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load(spark, sf_dir, tbl)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(name)
        )
    yield spark
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(bucketed, spark, sf_dir):
    l = spark.table("b_lineitem")
    o = spark.table("b_orders")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = explain_str(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_section, join_section

    # and the result matches the shuffled join over the raw tables
    raw = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in joined.collect()} == {
        tuple(r) for r in raw.collect()
    }
