"""Per-query optimization profiler (r15, guide §1).

For each bench query (or an explicit list): capture the formatted
physical plan to plans/<tag>/<name>_<suffix>.txt, then time the
computation with the NOOP SINK (guide §1.4 — eagerly computes every
column of every row without paying for collect/driver transfer) and
with .collect() (what bench.py times), min-of-N each, jobs labeled
(guide §1.5). Prints one JSON line.

Usage: python tools/profile_bench.py --suffix before [--reps 3]
           [--sf-dir /root/testdata/sf0.1] [--plans-dir plans/r15]
           [--no-plans] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.plans.inspect import explain_str
from pipeline_kinesis_spark.registry import all_queries, bench_queries


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str | None = None) -> str | None:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    suffix = opt("--suffix", "before")
    reps = int(opt("--reps", "3"))
    sf_dir = opt("--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    plans_dir = opt("--plans-dir", "plans/r15")
    write_plans = "--no-plans" not in args
    args = [a for a in args if a != "--no-plans"]
    only = set(args)

    specs = {
        n: s
        for n, s in (all_queries() if only else bench_queries()).items()
        if not only or n in only
    }
    spark = get_spark("profile-bench")
    os.makedirs(plans_dir, exist_ok=True)

    # Warm the JVM on the smallest SF, same as bench.py.
    warm_dir = "/root/testdata/sf0.001"
    for name, spec in sorted(specs.items()):
        try:
            (spec.bench_fn or spec.fn)(spark, warm_dir).collect()
        except Exception:  # noqa: BLE001 — warmup only
            pass

    out: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        fn = spec.bench_fn or spec.fn
        if write_plans:
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(explain_str(df, "formatted"))
        noop_s, collect_s = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_s.append(time.time() - t0)
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: collect")
            t0 = time.time()
            fn(spark, sf_dir).collect()
            collect_s.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "noop_s": round(min(noop_s), 3),
            "collect_s": round(min(collect_s), 3),
            "noop_spread": round(max(noop_s) / max(min(noop_s), 1e-9), 2),
            "collect_spread": round(
                max(collect_s) / max(min(collect_s), 1e-9), 2
            ),
        }
        print(
            f"{name}: noop {out[name]['noop_s']}s collect "
            f"{out[name]['collect_s']}s",
            file=sys.stderr,
        )
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    print(
        json.dumps(
            {
                "suffix": suffix,
                "sf_dir": sf_dir,
                "reps": reps,
                "loadavg_end": loadavg,
                "total_noop_s": round(sum(v["noop_s"] for v in out.values()), 3),
                "total_collect_s": round(
                    sum(v["collect_s"] for v in out.values()), 3
                ),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
