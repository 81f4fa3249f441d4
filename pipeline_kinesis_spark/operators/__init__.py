"""Operator library: every §2B/§2C operator from SURVEY.md as a named query.

Each module exposes ``QUERIES: dict[str, QuerySpec]`` where a QuerySpec holds
the Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) the equivalent DuckDB oracle SQL. The registry in
``pipeline_kinesis_spark.registry`` assembles them for __spark_entry__.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


# Cached-frame release pool. Operators that persist() intermediate frames
# (prefix-jaccard's shingle table, neardup's edge list, decontamination's
# gram table) register them here via pooled_persist; the NEXT operator
# entry (or the registry's per-query wrapper) calls release_stale_caches,
# so in a long session — the 50-query driver gate, bench, the full oracle
# differential — cached partitions never accumulate beyond one operator.
# Releasing keeps lineage intact (persist never truncates), so a frame
# unpersisted while a concurrent plan still references it simply
# recomputes — correctness is unaffected at any interleaving.
_RELEASE_POOL: list[DataFrame] = []


def pooled_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _RELEASE_POOL.append(df)
    return df


def pool_register(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed frame for release at
    the next operator entry (unpersist on a non-cached frame is a no-op,
    so checkpointed frames are safe to register)."""
    _RELEASE_POOL.append(df)
    return df


# Composition guard (r15): composite operators (curation_report) build
# several cache-pooling constituents into ONE query. Each constituent
# calls release_stale_caches() at its own entry, which inside a
# composite would unpersist a SIBLING's still-needed pool entry — the
# final query then silently recomputes that whole subtree uncached
# (measured: curation_report re-ran decontamination's gram build).
# Inside a shared_cache_scope, constituent-level releases are no-ops;
# the scope releases once at entry, and the composite's own caches are
# released by the next top-level query entry as usual.
_SCOPE_DEPTH = 0


def release_stale_caches() -> None:
    if _SCOPE_DEPTH > 0:
        return
    while _RELEASE_POOL:
        _RELEASE_POOL.pop().unpersist()


class shared_cache_scope:
    """Context manager for composite operators: release once at entry,
    then keep every constituent's pooled cache alive for the composite's
    whole build.

    SINGLE-THREADED by design (ADVICE r15 #4): the depth counter is a
    module global, matching the engine's one-driver / one-query-at-a-time
    execution model (driver gate, bench, differentials). Concurrent
    sessions in one process would corrupt the count — use a
    threading.local if that model ever changes. If a composite raises
    mid-build, __exit__ still restores the depth; the constituents'
    caches stay pooled (not leaked) until the next top-level query entry
    releases them, exactly like a completed query's caches."""

    def __enter__(self) -> None:
        global _SCOPE_DEPTH
        release_stale_caches()
        _SCOPE_DEPTH += 1

    def __exit__(self, *exc: object) -> None:
        global _SCOPE_DEPTH
        _SCOPE_DEPTH -= 1


@dataclass(frozen=True)
class QuerySpec:
    """A named query: Spark impl + optional DuckDB oracle SQL + bench flag.

    ``bench_fn``, when set, is what bench.py times instead of ``fn`` —
    used when the oracle-gated ``fn`` carries verification-only work
    (e.g. an exact-count join validating a sketch) that should not
    inflate the headline number for the operator itself.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False  # include in bench.py headline set
    bench_fn: Callable[[SparkSession, str], DataFrame] | None = None
    # Deliberately-naive exact tier kept as the correctness reference
    # for an approximate scale-safe twin. Cost (Spark's AND the DuckDB
    # oracle's) grows ~n^2 with the corpus, so big-SF differential
    # sweeps exclude these mechanically (compare_oracle --skip-anchors;
    # the r10 full-sf1 sweep wedged >50 min on one such oracle before
    # this flag existed). NOT an excuse tag: every anchor's twin must
    # hold its own green row at every swept SF.
    exact_anchor: bool = False
