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

from pyspark.sql import Column, DataFrame
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


def ngram_rows(
    df: DataFrame,
    tok_col: str,
    n: int,
    keep: tuple[str, ...],
    gram_col: str = "gram",
    pos_col: str | None = None,
) -> DataFrame:
    """Overlapping n-grams as ROWS — the whole-stage-codegen twin of
    ``ngrams()`` for hot paths (r15, guide §4.1 "prefer built-ins").

    ``ngrams()`` is a ``transform()`` lambda; higher-order functions are
    CodegenFallback, so the WHOLE projection containing one drops out of
    codegen into the interpreted tree-walking evaluator. Measured on the
    shingle paths at sf0.1: the interpreter's megamorphic call sites take
    several executions to JIT-warm (first run 9-14 s wall / ~184 CPU-s
    with every task thread inside ConcatWs.eval — thread dumps in
    OPTIMIZATION_r15.md) and stay 2-20x slower than codegen'd bytecode.
    This form — explode_outer over a position sequence, then plain
    slice/concat_ws — uses only expressions with doGenCode, so the n-gram
    pipeline compiles into the stage's generated loop.

    Callers SHOULD filter ``size(tok_col) >= n`` upstream (it keeps the
    short docs out of the tokenize pipeline entirely), but the function
    no longer crashes without it (r16, VERDICT r15 #5 / ADVICE r15 #1):
    the position sequence is when-guarded to NULL for short rows —
    ``sequence(1, upper)`` with upper <= 0 DESCENDS in Spark ([1, 0]),
    which first emits a silent short gram at pos 1 and then raises
    INVALID_PARAMETER_VALUE.START from slice(col, 0, n) — and
    explode_outer turns that NULL into a single NULL-position row that
    the trailing null filter drops. A violating row now yields zero
    gram rows (explode semantics) instead of a mid-query crash.

    explode_outer (not explode) stays load-bearing: outer-ness keeps
    InferFiltersFromGenerate from substituting the position-sequence
    expression into the scan-side filter (the r15 dedup 3-4x regression
    signature — the guard expression here would be evaluated twice per
    input row inside the scan Filter). For guarded callers the
    when-branch always takes the sequence arm and the null filter drops
    nothing, so plans gain only one codegen'd null check per gram row
    and output is row-for-row identical.
    """
    upper = F.size(tok_col) - (n - 1)
    pos = "_gpos" if pos_col is None else pos_col
    seq = F.when(upper >= 1, F.sequence(F.lit(1), upper))
    exploded = df.select(
        *keep,
        tok_col,
        F.explode_outer(seq).alias(pos),
    ).filter(F.col(pos).isNotNull())
    gram = F.concat_ws(" ", F.slice(tok_col, F.col(pos), n)).alias(gram_col)
    cols = [*keep, gram] if pos_col is None else [*keep, pos_col, gram]
    return exploded.select(*cols)


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
