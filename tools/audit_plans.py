"""Plan auditor: one line of physical-plan red/green flags per query.

Usage: python tools/audit_plans.py [sf_dir] [query ...]

Flags: bcast (BroadcastHashJoin), SMJ (SortMergeJoin), BNLJ
(BroadcastNestedLoopJoin — expected for broadcast cross/theta joins),
CARTESIAN! and ROW_PY_UDF! (both banned — test_plans.py enforces),
pandas_udf (ArrowEvalPython/ArrowPython), codegen (WholeStageCodegen
present), pushdown (non-empty PushedFilters on some scan),
HOF_FILTER! (banned — an interpreted higher-order function inside a
Filter Condition; the r15 InferFiltersFromGenerate signature, where
exploding a NAMED array column lets predicate pushdown substitute the
whole lambda pipeline into the scan filter and re-evaluate it per row —
measured 3-4x on the dedup bench rows and ~20x on
decontaminate_overlap's cache build).
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
    if any(
        line.lstrip().startswith("Condition") and "lambdafunction(" in line
        for line in plan.splitlines()
    ):
        out.append("HOF_FILTER!")
    return out


# Queries whose Filter legitimately contains a higher-order function:
# the HOF predicate IS the operator's declared gate (the oracle runs the
# same expression), it is evaluated once per row at the scan, and the
# alternative placements (post-projection filter gets substituted right
# back by pushdown; pre-aggregating per-token rows adds a shuffle) are
# strictly worse. Everything else that trips HOF_FILTER! is the
# InferFiltersFromGenerate substitution bug — fix with explode_outer or
# an inline generator expression (see operators/dedup.py r15 notes).
HOF_FILTER_INTRINSIC = frozenset({"corpus_clean"})


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
        if name in HOF_FILTER_INTRINSIC and "HOF_FILTER!" in fl:
            fl[fl.index("HOF_FILTER!")] = "hof_filter_intrinsic"
        if any(f.endswith("!") for f in fl):
            bad += 1
        print(f"{name:30s} {' '.join(fl)}")
    print(f"\n{bad} queries with red flags")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
