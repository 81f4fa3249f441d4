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

    # JVM process CPU clock (r15): on a box with co-tenant core steal,
    # wall time of a 32-way stage is dominated by how many cores the
    # scheduler actually granted; the JVM's own process CPU time is the
    # work the query burned and is robust to that. Read utime+stime of
    # ALL the JVM's threads from /proc/<pid>/stat (Linux; 0.0 elsewhere).
    try:
        jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
        clk = os.sysconf("SC_CLK_TCK")
    except Exception:  # noqa: BLE001 — metric is best-effort
        jvm_pid = None

    def jvm_cpu_s() -> float:
        if jvm_pid is None:
            return 0.0
        try:
            with open(f"/proc/{jvm_pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields 14/15 (1-based utime/stime) land at 11/12 here
            return (int(parts[11]) + int(parts[12])) / clk
        except Exception:  # noqa: BLE001 — metric is best-effort
            return 0.0

    out: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        fn = spec.bench_fn or spec.fn
        if write_plans:
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(explain_str(df, "formatted"))
        noop_s, collect_s, noop_cpu, collect_cpu = [], [], [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: noop")
            c0, t0 = jvm_cpu_s(), time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_s.append(time.time() - t0)
            noop_cpu.append(jvm_cpu_s() - c0)
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: collect")
            c0, t0 = jvm_cpu_s(), time.time()
            fn(spark, sf_dir).collect()
            collect_s.append(time.time() - t0)
            collect_cpu.append(jvm_cpu_s() - c0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "noop_s": round(min(noop_s), 3),
            "collect_s": round(min(collect_s), 3),
            "noop_cpu_s": round(min(noop_cpu), 3),
            "collect_cpu_s": round(min(collect_cpu), 3),
            "noop_spread": round(max(noop_s) / max(min(noop_s), 1e-9), 2),
            "collect_spread": round(
                max(collect_s) / max(min(collect_s), 1e-9), 2
            ),
        }
        print(
            f"{name}: noop {out[name]['noop_s']}s collect "
            f"{out[name]['collect_s']}s cpu "
            f"{out[name]['noop_cpu_s']}/{out[name]['collect_cpu_s']}s",
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
