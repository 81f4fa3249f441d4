"""Local mirror of the driver's t2 duckdb-oracle correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables and reports per-query PASS/FAIL.

Usage: python tools/compare_oracle.py [--skip-anchors] [sf_dir] [query ...]

--skip-anchors excludes queries flagged exact_anchor=True (deliberately
naive exact tiers whose Spark AND oracle cost grows ~n^2) — use it for
big-SF sweeps (sf1+), where one anchor's DuckDB oracle can burn an hour.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.registry import all_queries
from pipeline_kinesis_spark.testing import compare_to_oracle, oracle_connection


def main() -> int:
    args = sys.argv[1:]
    skip_anchors = "--skip-anchors" in args
    args = [a for a in args if a != "--skip-anchors"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("compare-oracle")
    con = oracle_connection(sf_dir)

    failures = []
    skipped = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        if skip_anchors and spec.exact_anchor:
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                print(
                    f"rows  {name}: {n} rows (no oracle) "
                    f"[{time.time() - t0:.1f}s]"
                )
                continue
            problems = compare_to_oracle(sdf, con, spec.oracle)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: error: {exc}")
            failures.append(name)
            continue
        status = "FAIL" if problems else "ok  "
        if problems:
            failures.append(name)
        print(
            f"{status}  {name} [{time.time() - t0:.1f}s]"
            + ("".join("\n      " + p for p in problems))
        )
    qs = all_queries()
    oracled = sum(1 for s in qs.values() if s.oracle is not None)
    # registry-derived battery counts (VERDICT r07 #5): quote THIS
    # line in BENCH_NOTES instead of hand-written totals, so prose
    # can't drift from the registry
    print(
        f"\nregistry: {len(qs)} queries ({oracled} oracled, "
        f"{len(qs) - oracled} rows-only)"
    )
    if skipped:
        print(f"skipped {len(skipped)} exact anchors: {sorted(skipped)}")
    print(
        f"{len(failures)} failures"
        + (f": {sorted(failures)}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
