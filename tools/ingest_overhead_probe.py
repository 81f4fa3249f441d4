"""Ingest warm-shot cost attribution (r16, VERDICT r15 #7 — measurement
only, no engine change).

Reproduces bench.py's ingest shot (100k records -> consume -> queryable)
in several micro-batch shapes and attributes the wall to components via
StreamingQuery progress metrics (durationMs: addBatch = the data path
incl. the exactly-once parquet archive; getBatch/latestOffset/
queryPlanning/walCommit/commitOffsets = per-batch framework overhead;
the remainder is trigger idle + driver glue). Variants:

  bench_shape   10 files x 10k, parallelism 8, trigger 50 ms (what
                bench.py times)
  trigger_500   same files, trigger 500 ms — isolates trigger pacing
  big_batches   4 files x 25k, parallelism 8, trigger 50 ms — larger
                micro-batches at identical record count

Each variant: one warm-up shot then one measured shot in the same
engine/session (matching the bench's warm-shot semantics). One JSON
line per variant.

Usage: python tools/ingest_overhead_probe.py [n_records]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


def one_shot(
    spark,
    n_records: int,
    per_file: int,
    trigger: str,
    parallelism: int,
    tag: str,
) -> dict:
    wd = tempfile.mkdtemp(prefix=f"ingest_probe_{tag}_")
    try:
        for i in range(n_records // per_file):
            write_record_file(
                os.path.join(wd, "src", "s"),
                [
                    {"data": f"k{j % 97}\t{j}"}
                    for j in range(i * per_file, (i + 1) * per_file)
                ],
            )
        eng = Engine(
            spark,
            metadata_dir=os.path.join(wd, "meta"),
            trigger_interval=trigger,
        )
        eng.add_endpoint("probe_ep", url=os.path.join(wd, "src"))
        eng.create_stream("probe_stream", "k STRING, v BIGINT")
        t0 = time.time()
        eng.consume_begin(
            "probe_ep", "s", "probe_stream", parallelism=parallelism
        )
        eng.wait_for_ingest(timeout_s=300)
        n = eng.stream_table("probe_stream").count()
        wall = time.time() - t0
        comp: dict[str, float] = {}
        n_batches = 0
        rows_in = 0
        for queries in eng._queries.values():
            for q in queries:
                for p in q.recentProgress:
                    dur = p.get("durationMs") or {}
                    if (p.get("numInputRows") or 0) == 0 and not dur:
                        continue
                    n_batches += 1
                    rows_in += p.get("numInputRows") or 0
                    for k, v in dur.items():
                        comp[k] = comp.get(k, 0.0) + v / 1000.0
        eng.consume_end_all()
        accounted = sum(comp.values())
        return {
            "tag": tag,
            "records": n,
            "complete": n == n_records,
            "wall_s": round(wall, 3),
            "rps": round(n / wall, 1),
            "n_progress_batches": n_batches,
            "rows_in_progress": rows_in,
            "durationMs_sums_s": {
                k: round(v, 3) for k, v in sorted(comp.items())
            },
            "accounted_s": round(accounted, 3),
            "unaccounted_s": round(wall - accounted, 3),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("ingest-overhead-probe")
    variants = (
        ("bench_shape", 10_000, "50 milliseconds", 8),
        ("trigger_500", 10_000, "500 milliseconds", 8),
        ("big_batches", 25_000, "50 milliseconds", 8),
    )
    # one throwaway warm shot (JVM + streaming machinery)
    one_shot(spark, n_records, 10_000, "50 milliseconds", 8, "warmup")
    for tag, per_file, trigger, par in variants:
        print(json.dumps(one_shot(spark, n_records, per_file, trigger, par, tag)))


if __name__ == "__main__":
    main()
