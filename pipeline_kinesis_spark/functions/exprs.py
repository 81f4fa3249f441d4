"""Deterministic expression helpers.

Floating-point discipline: SUM over money-scale doubles is order-dependent —
two engines (or two shuffle layouts of the same engine) can differ in the
last ~1e-5 of a 1e9-magnitude sum, which breaks hash-compared results and,
worse, makes ORDER BY ... LIMIT nondeterministic across runs. The engine's
convention for money aggregates is therefore *integer cents*: round each
row-level value to cents (deterministic per-row IEEE ops), then SUM exact
64-bit integers. Associativity restored; results reproducible at any
parallelism — which also means a 1000-executor run returns bit-identical
results to local[1].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Row-level money double → exact integer cents (long)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(100), 0).cast("long")


def sum_cents(col: Column | str) -> Column:
    """Order-independent exact SUM of a money column, in cents."""
    return F.sum(cents(col))


def revenue_cents() -> Column:
    """TPC-H revenue `l_extendedprice * (1 - l_discount)` as exact cents."""
    return F.sum(
        cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, trim-normalized (matches the DuckDB oracle's
    ``string_split_regex(trim(text), '\\s+')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def ngrams(col: Column, n: int) -> Column:
    """Token array → overlapping n-gram strings, pure JVM (slice over a
    generated index sequence; empty when the doc has < n tokens).

    The short-doc guard must produce a genuinely EMPTY index array:
    sequence(1, 0) is NOT empty (Spark descends when start > stop,
    yielding [1, 0], and slice(col, 0, n) then throws
    INVALID_PARAMETER_VALUE.START), so documents shorter than n tokens
    take an explicit empty-array branch.
    """
    upper = F.size(col) - (n - 1)
    idx = F.when(upper >= 1, F.sequence(F.lit(1), upper)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(col, i, n)))
