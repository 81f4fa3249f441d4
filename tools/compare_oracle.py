"""Local mirror of the driver's t2 duckdb-oracle correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables and reports per-query PASS/FAIL.

Usage: python tools/compare_oracle.py [--skip-anchors]
       [--json-out PATH] [sf_dir] [query ...]

--json-out writes a compact machine-readable artifact (per-query
status + wall seconds + totals) alongside the console report — used at
round close to emit SF1_r{N}.json so the sf1 sweep survives as a
driver-archivable artifact instead of a BENCH_NOTES prose line
(VERDICT r14 #6).

--skip-anchors excludes queries flagged exact_anchor=True (deliberately
naive exact tiers whose Spark AND oracle cost grows ~n^2) — use it for
big-SF sweeps (sf1+), where one anchor's DuckDB oracle can burn an hour.
"""

from __future__ import annotations

import json
import os
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
    json_out = None
    if "--json-out" in args:
        i = args.index("--json-out")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("compare-oracle")
    con = oracle_connection(sf_dir)

    failures = []
    skipped = []
    results: dict[str, dict] = {}
    t_start = time.time()
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
                results[name] = {
                    "status": "rows_only",
                    "rows": n,
                    "wall_s": round(time.time() - t0, 1),
                }
                print(
                    f"rows  {name}: {n} rows (no oracle) "
                    f"[{time.time() - t0:.1f}s]"
                )
                continue
            problems = compare_to_oracle(sdf, con, spec.oracle)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: error: {exc}")
            failures.append(name)
            results[name] = {
                "status": "error",
                "error": str(exc)[:300],
                "wall_s": round(time.time() - t0, 1),
            }
            continue
        status = "FAIL" if problems else "ok  "
        if problems:
            failures.append(name)
        results[name] = {
            "status": "fail" if problems else "pass",
            "wall_s": round(time.time() - t0, 1),
            **({"problems": problems[:3]} if problems else {}),
        }
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "metric": "oracle_differential",
                    "sf_dir": sf_dir,
                    "skip_anchors": skip_anchors,
                    "n_queries": len(results),
                    "n_failures": len(failures),
                    "failures": sorted(failures),
                    "skipped_anchors": sorted(skipped),
                    "total_wall_s": round(time.time() - t_start, 1),
                    "queries": results,
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"wrote {os.path.abspath(json_out)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
