"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": <float>}

The driver runs this per-round and records BENCH_r{N}.json against
BASELINE.md. Each query is timed end-to-end (plan + execute + collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.registry import bench_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # Warm the JVM (JIT, codegen caches, parquet reader init) by running
    # the same query shapes at the smallest SF — measured numbers then
    # reflect steady-state engine cost, not first-touch class loading.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for _, spec in sorted(bench_queries().items()):
            try:
                spec.fn(spark, warm_dir).collect()
            except Exception:  # noqa: BLE001 — warmup only
                pass

    timings: dict[str, float] = {}
    total_rows = 0
    for name, spec in sorted(bench_queries().items()):
        t0 = time.time()
        rows = spec.fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
        total_rows += len(rows)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "total_result_rows": total_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
