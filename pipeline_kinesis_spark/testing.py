"""Differential-testing helpers: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate: row count + column names + order-insensitive
value comparison (columns sorted by name, rows sorted, per-cell
canonicalization). Used by tests/ and tools/compare_oracle.py.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from pyspark.sql import DataFrame

from pipeline_kinesis_spark.io import TABLES, table_path


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def canon(v: object) -> object:
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def frame_key(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_to_oracle(
    sdf: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
) -> list[str]:
    """Return list of problem descriptions (empty = exact match)."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(
            f"columns differ: spark={sorted(scols)} duck={sorted(ocols)}"
        )
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} duck={len(orows)}")
    if problems:
        return problems
    sk, ok = frame_key(scols, srows), frame_key(ocols, orows)
    bad = [(a, b) for a, b in zip(sk, ok) if a != b]
    if bad:
        problems.append(
            f"{len(bad)}/{len(sk)} rows differ; first: "
            f"spark={bad[0][0]!r} duck={bad[0][1]!r}"
        )
    return problems
