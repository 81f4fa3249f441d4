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
    wide conditional aggregates).

    Why this is right at every scale: the shuffle moves the SMALL
    pre-explode rows (not the exploded output), and downstream aggregates
    keyed on the same columns reuse the partitioning, so this replaces
    the aggregate's exchange rather than adding one. At fixture scale it
    additionally rescues parallelism — the testdata tables are single
    row-group parquet files, so the scan (and everything until the first
    exchange) otherwise runs as ONE task no matter how many cores exist.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *cols)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
