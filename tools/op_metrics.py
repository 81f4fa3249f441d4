"""Per-operator SQL-metric profiler (r15, guide §7.1/§7.2 without a UI).

Runs a registered query once (after an sf0.001 warmup) and prints the
executed AQE plan tree with each operator's time-ish metrics and output
row counts — the SQL-tab view of "which operator burns the task time",
readable in a terminal. Times are as Spark reports them (pipelineTime /
aggTime / sortTime in ms, shuffle write time in ns).

Usage: python tools/op_metrics.py <query> [--sf-dir DIR] [--min-ms N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.registry import all_queries


def dump(plan, min_ms: int = 100) -> None:
    seen: set[str] = set()

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        m = {}
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
        except Exception:  # noqa: BLE001 — some wrappers expose none
            pass
        tm = {
            k.split(" ")[0]: v
            for k, v in m.items()
            if ("time" in k or "Time" in k) and v
            and (v > min_ms * 1e6 if "shuffle" in k else v > min_ms)
        }
        nr = m.get("number of output rows")
        line = "  " * depth + name
        if nr is not None:
            line += f" rows={nr}"
        if tm:
            line += "  " + str(tm)
        print(line)
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), depth + 1)
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan(), depth + 1)
            return
        if cls == "InMemoryTableScanExec":
            # Dedup cached-plan printing by RELATION IDENTITY, not
            # tableName() — every unnamed pooled_persist cache stringifies
            # as 'None', which collapsed two distinct caches into one
            # "(cached plan shown above)" line (ADVICE r15 #2).
            key = str(
                node.relation()
                .cacheBuilder()
                .cachedPlan()
                .semanticHash()
            )
            if key not in seen:
                seen.add(key)
                walk(node.relation().cachedPlan(), depth + 1)
            else:
                print("  " * (depth + 1) + "(cached plan shown above)")
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1)

    walk(plan, 0)


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str | None = None) -> str | None:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf-dir", "/root/testdata/sf0.1")
    min_ms = int(opt("--min-ms", "100"))
    if not args:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    name = args[0]
    spec = all_queries()[name]
    fn = spec.bench_fn or spec.fn
    spark = get_spark("op-metrics")
    # Warm on the SMALLEST sibling fixture of --sf-dir (ADVICE r15 #3:
    # the warmup dir was hardcoded to /root/testdata even when profiling
    # a /tmp sf1 fixture — still correct, but derive it so a relocated
    # testdata root keeps working).
    warm_dir = os.path.join(
        os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warm_dir):
        warm_dir = "/root/testdata/sf0.001"
    try:
        fn(spark, warm_dir).collect()
    except Exception:  # noqa: BLE001 — warmup only
        pass
    df = fn(spark, sf_dir)
    df.collect()
    dump(df._jdf.queryExecution().executedPlan(), min_ms)


if __name__ == "__main__":
    main()
