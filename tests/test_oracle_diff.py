"""Differential correctness: every SQL-expressible operator vs DuckDB.

The per-operator mirror of the driver's t2 gate, at sf0.001 for speed
(tools/compare_oracle.py runs the same suite at sf0.01).
"""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.registry import all_queries
from pipeline_kinesis_spark.testing import compare_to_oracle

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, s in _QUERIES.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in _QUERIES.items() if not s.oracle)


def test_driver_window_fully_oracled():
    """The driver's gate checks the FIRST 50 entries of queries() — a
    rows-only name inside that window records a permanent `no_oracle`
    red. Every windowed entry must therefore carry an oracle."""
    first = list(_QUERIES)[:50]
    missing = [n for n in first if _QUERIES[n].oracle is None]
    assert not missing, f"window rows without oracle: {missing}"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_oracle(spark, sf_dir, oracle, name):
    spec = _QUERIES[name]
    problems = compare_to_oracle(spec.fn(spark, sf_dir), oracle, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = _QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns  # stable, non-empty schema
