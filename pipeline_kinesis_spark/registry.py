"""Assembles the named-query registry from the operator modules.

This is the single source of truth consumed by __spark_entry__.py (driver
contract), bench.py (headline set) and tests (oracle differential suite).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_kinesis_spark.operators import QuerySpec
from pipeline_kinesis_spark.shipping import ship_package
from pipeline_kinesis_spark.operators import (
    dedup,
    multimodal,
    pandas_udfs,
    relational,
    similarity,
    sketches,
    textops,
    timeseries,
    tpch,
)

_MODULES = (
    tpch,
    relational,
    timeseries,
    dedup,
    textops,
    similarity,
    sketches,
    multimodal,
    pandas_udfs,
)


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query fn so the package is shipped to Python workers first —
    keeps pandas-UDF operators working when the driver runs from a cwd
    that doesn't contain the repo (see shipping.py)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship_package(spark)
        return fn(spark, sf_dir)

    return run


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(spec.fn) for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_queries().items() if s.bench}
