"""Physical-plan inspection helpers.

Used by tests to assert scale-readiness properties that row-level results
can't show: filters reached the parquet scan (PushedFilters), column
pruning happened (ReadSchema), small dims broadcast, whole-stage codegen
covers the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears inside some PushedFilters: [...]."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    return all(frag in pushed for frag in fragments)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema), for pruning
    assertions."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)
