"""Plan auditor: one line of physical-plan red/green flags per query.

Usage: python tools/audit_plans.py [sf_dir] [query ...]

Flags: bcast (BroadcastHashJoin), SMJ (SortMergeJoin), BNLJ
(BroadcastNestedLoopJoin — expected for broadcast cross/theta joins),
CARTESIAN! and ROW_PY_UDF! (both banned — test_plans.py enforces),
pandas_udf (ArrowEvalPython/ArrowPython), codegen (WholeStageCodegen
present), pushdown (non-empty PushedFilters on some scan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_kinesis_spark.plans.inspect import explain_str  # noqa: E402
from pipeline_kinesis_spark.registry import all_queries  # noqa: E402
from pipeline_kinesis_spark.session import get_spark  # noqa: E402


def flags_for(plan: str) -> list[str]:
    out = []
    if "BroadcastHashJoin" in plan:
        out.append("bcast")
    if "SortMergeJoin" in plan:
        out.append("SMJ")
    if "BroadcastNestedLoopJoin" in plan:
        out.append("BNLJ")
    if "CartesianProduct" in plan:
        out.append("CARTESIAN!")
    if "BatchEvalPython" in plan:
        out.append("ROW_PY_UDF!")
    if "ArrowEvalPython" in plan or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan:
        out.append("pandas_udf")
    if "WholeStageCodegen" in plan:
        out.append("codegen")
    if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
        out.append("pushdown")
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark()
    qs = all_queries()
    bad = 0
    for name, spec in sorted(qs.items()):
        if names and name not in names:
            continue
        try:
            plan = explain_str(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"{name:30s} ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        fl = flags_for(plan)
        if any(f.endswith("!") for f in fl):
            bad += 1
        print(f"{name:30s} {' '.join(fl)}")
    print(f"\n{bad} queries with red flags")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
