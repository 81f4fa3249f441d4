"""Table loading helpers for the star-schema + stream testdata.

All operators read parquet through here so scan behavior is uniform:
declarative ``spark.read.parquet`` → Catalyst gets predicate pushdown and
column pruning for free (verified via .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough (at any SF — they grow sub-linearly or are bounded)
# that joins against them should broadcast rather than shuffle.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped as TIMESTAMP(NANOS) (rounds 1-3) and
        # as plain timestamp[us]/TIMESTAMP_NTZ (round 4+). Normalize both
        # to TIMESTAMP_NTZ: nanos files read as bigint under nanosAsLong
        # and convert via tz-free interval arithmetic (truncating to
        # micros, the same truncation DuckDB applies to TIMESTAMP_NS);
        # micros files arrive as NTZ already. Operators downstream must
        # derive epoch seconds tz-free (timestampdiff from the NTZ
        # epoch), never cast(ts as long) — NTZ->BIGINT is an illegal
        # cast and NTZ->LTZ->long is session-timezone-dependent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-partition on ``cols`` to the session's default parallelism —
    placed BEFORE an expensive per-row expansion (shingle/n-gram explode,
    wide conditional aggregates) — SKIPPED when the input already yields
    at least that many partitions (r16, VERDICT r15 #4 / guide §2.1).

    Two effects when it fires: (a) parallelism rescue — the local
    testdata tables are single row-group parquet files, so the scan (and
    everything until the first exchange) otherwise runs as ONE task no
    matter how many cores exist; (b) the shuffle moves the SMALL
    pre-explode rows (not the exploded output), and downstream
    aggregates keyed on the same columns reuse the partitioning, so it
    replaces the aggregate's exchange rather than adding one.

    On a real multi-split layout (a 100 TB table scans as thousands of
    input splits) the rescue is unnecessary: the scan parallelizes by
    itself, and the downstream doc-keyed aggregates plan their own
    exchange over map-side-reduced partials instead — so the up-front
    full-table exchange is dropped. The check reads the scan's split
    count from the physical plan (no job runs); partition-count
    equality with ``defaultParallelism`` is the same condition under
    which the repartition would have been pure data movement.

    NOT for join-key materialization points — those exchanges are
    load-bearing for plan shape regardless of layout; use
    ``hash_align``.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        existing = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning hiccup: keep old behavior
        existing = 0
    if existing >= target:
        return df
    return df.repartition(target, *cols)


def hash_align(df: DataFrame, *cols: str) -> DataFrame:
    """UNCONDITIONAL hash-partition on ``cols`` — the materialization
    point both sides of a self-join reuse (ReusedExchange), and the
    exchange a sort-merge self-join needs at scale anyway. Unlike
    ``spread`` this is never skipped: without it, when the planner
    broadcasts one side of the self-join, the broadcast build
    re-executes the entire upstream pipeline a second time (measured
    ~2.4x on the dedup bench rows in r15)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *cols)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
