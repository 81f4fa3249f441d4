"""Scaling probe: time representative queries at sf0.001/0.01/0.1 and
report the growth ratio per 10x data step — evidence that the plans'
costs grow (sub)linearly with input, i.e. that the same plan survives
scale-up. A linear operator shows a 0.01→0.1 wall-clock ratio ≤ ~10
(usually far less while fixed overheads dominate); a superlinear plan
(accidental cross join, unpartitioned sort) shows ratios exploding
toward 100.

Usage: python tools/scaling_probe.py [query ...]   (default: probe set)
Prints one JSON line per query with per-SF min-of-2 timings and ratios.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.registry import all_queries

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# one per major plan family: scan-agg, broadcast join tree, window,
# inverted-index self-join, banded LSH join, ANN scan, span rewrite,
# LM two-pass, event funnel, grouped top-N (WindowGroupLimit),
# map-side chunk explode, bounded-vocab broadcast membership
PROBE = (
    "q1_pricing_summary",
    "q9_product_profit",
    "window_range_frame",
    "ngram_jaccard_prefix",
    "minhash_lsh_pairs",
    "cosine_topk",
    "crossdoc_span_dup",
    "lm_perplexity",
    "funnel_conversion",
    "domain_balance",
    "doc_chunk_overlap",
    "oov_rate_filter",
)


def main() -> None:
    names = sys.argv[1:] or list(PROBE)
    spark = get_spark("scaling-probe")
    qs = all_queries()
    for sf in SFS:  # warm the JVM/readers on every SF first
        qs["q1_pricing_summary"].fn(spark, sf).collect()
    for name in names:
        spec = qs[name]
        times = []
        for sf in SFS:
            samples = []
            for _ in range(2):
                t0 = time.time()
                (spec.bench_fn or spec.fn)(spark, sf).collect()
                samples.append(time.time() - t0)
            times.append(round(min(samples), 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf": [0.001, 0.01, 0.1],
                    "sec": times,
                    "ratio_10x_small": round(times[1] / times[0], 2),
                    "ratio_10x_big": round(times[2] / times[1], 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
