"""Scaling probe: time representative queries at sf0.001/0.01/0.1 and
report the growth ratio per 10x data step — evidence that the plans'
costs grow (sub)linearly with input, i.e. that the same plan survives
scale-up. A linear operator shows a 0.01→0.1 wall-clock ratio ≤ ~10
(usually far less while fixed overheads dominate); a superlinear plan
(accidental cross join, unpartitioned sort) shows ratios exploding
toward 100.

Usage: python tools/scaling_probe.py [query ...]   (default: probe set)
       python tools/scaling_probe.py --streaming   (osrel chain + combine
                                                    read growth probes)
       python tools/scaling_probe.py --ingest      (pump vs datasource
                                                    A/B at 4/16/64/128
                                                    shards)
       python tools/scaling_probe.py --codec-bench (MB/s/core decode
                                                    rate per from-spec
                                                    codec kernel)
Prints one JSON line per query with per-SF min-of-2 timings and ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pipeline_kinesis_spark import get_spark
from pipeline_kinesis_spark.registry import all_queries

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# A fourth decade when the self-made sf1 fixture exists (tools/
# make_sf1.py writes it; SPARK_GRAFT_SF1_DIR overrides the location).
# Since r10 the fixture includes embeddings (per-copy orthogonal
# rotations), so every PROBE family spans the extra decades.
# An sf10-equivalent (make_sf1.py <dir> 100) joins as a fifth decade
# when present.
_SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sparkgraft_sf1")
if os.path.isdir(_SF1_DIR):
    SFS = SFS + (_SF1_DIR,)
_SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sparkgraft_sf10")
if os.path.isdir(_SF10_DIR):
    SFS = SFS + (_SF10_DIR,)

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
    # r07 codec/extraction rows (heaviest of the five new mapInPandas
    # gates + the C4 HTML path) — decode/parse cost is linear in docs
    # and executor-confined by construction; keep the evidence standing
    "multimodal_audio_stats",
    "html_extract_main",
)


def probe_osrel_chain(spark) -> None:
    """Growth of the full standing-view dataflow per 10x records:
    ingest → parquet_upsert merge → delta emission → chained osrel
    consumer. Wall-clock from consume_begin to both levels drained.
    Fixed micro-batch overhead dominates the small sizes; the 10x
    ratios are the signal."""
    from pipeline_kinesis_spark.engine import Engine
    from pipeline_kinesis_spark.sources.file_replay import write_record_file

    sizes = (2_000, 20_000, 200_000)
    times = []
    for n in sizes:
        base = tempfile.mkdtemp(prefix="probe_osrel_")
        eng = Engine(spark, metadata_dir=os.path.join(base, "meta"))
        eng.add_endpoint("ep", url=os.path.join(base, "kin"))
        eng.create_stream("st", "k STRING, v BIGINT")
        eng.create_continuous_view(
            "agg",
            "SELECT k, count(*) AS cnt, sum(v) AS total FROM st GROUP BY k",
            "st",
            materialize="parquet_upsert",
            key_cols=["k"],
        )
        eng.create_continuous_view(
            "chain",
            "SELECT new.k AS k, count(*) AS versions, max(new.cnt) AS c "
            "FROM agg_osrel GROUP BY new.k",
            "agg_osrel",
        )
        keys = max(n // 10, 1)
        rows = [
            {
                "data": f"k{i % keys},{i}",
                "partition_key": f"k{i % keys}",
                "shard_id": "shardId-000000000000",
                "sequence_number": f"{i:056d}",
            }
            for i in range(n)
        ]
        # four record files → several micro-batches per level
        for j in range(4):
            write_record_file(os.path.join(base, "kin", "s"), rows[j::4])
        t0 = time.time()
        eng.consume_begin(
            "ep", "s", "st", fmt="csv", delimiter=",", parallelism=4
        )
        eng.wait_for_ingest()
        eng.wait_for_ingest()  # second pass drains the chained level
        dt = time.time() - t0
        n_chain = eng.view_table("chain").count()
        eng.consume_end_all()
        shutil.rmtree(base, ignore_errors=True)
        assert n_chain == keys, (n_chain, keys)
        times.append(round(dt, 3))
    print(
        json.dumps(
            {
                "query": "osrel_chain_e2e",
                "records": list(sizes),
                "sec": times,
                "ratio_10x_small": round(times[1] / times[0], 2),
                "ratio_10x_big": round(times[2] / times[1], 2),
            }
        ),
        flush=True,
    )


def probe_combine_read(spark) -> None:
    """Growth of a combine() read per 10x matrel groups: merge hidden
    (s, c, q) partials at a coarser grouping — one hash aggregate over
    O(groups) rows, so the ratio should track the input linearly."""
    from pipeline_kinesis_spark.streaming.continuous_view import (
        combine_view,
    )

    specs = {
        "n_docs": {"fn": "count", "arg": "*"},
        "avg_v": {"fn": "avg", "arg": "v"},
        "sd_v": {"fn": "stddev_samp", "arg": "v"},
    }
    sizes = (10_000, 100_000, 1_000_000)
    times = []
    for g in sizes:
        matrel = spark.range(g).selectExpr(
            "CAST(id % 64 AS STRING) AS coarse",
            "CAST(id AS STRING) AS fine",
            "id + 1 AS n_docs",
            "CAST(id AS DOUBLE) * (id + 1) AS avg_v__pkpart_s",
            "id + 1 AS avg_v__pkpart_c",
            "CAST(id AS DOUBLE) * (id + 1) AS sd_v__pkpart_s",
            "id + 1 AS sd_v__pkpart_c",
            "CAST(id AS DOUBLE) * CAST(id AS DOUBLE) * (id + 1)"
            " AS sd_v__pkpart_q",
        )
        samples = []
        for _ in range(2):
            t0 = time.time()
            combine_view(matrel, ["coarse"], specs).collect()
            samples.append(time.time() - t0)
        times.append(round(min(samples), 3))
    print(
        json.dumps(
            {
                "query": "combine_read",
                "groups": list(sizes),
                "sec": times,
                "ratio_10x_small": round(times[1] / times[0], 2),
                "ratio_10x_big": round(times[2] / times[1], 2),
            }
        ),
        flush=True,
    )


def probe_ingest_ab(spark) -> None:
    """Pump-vs-datasource ingest A/B at growing shard counts, over the
    real boto3 SigV4 HTTP wire for both. Reports records/s and DRIVER
    Python CPU seconds — the pump polls and spools on driver threads
    (its scale ceiling), while the datasource path polls on executor
    workers, so driver CPU should stay ~flat as shards grow."""
    import threading
    from http.server import ThreadingHTTPServer

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_kinesis_protocol import FakeKinesisClient
    from tests.test_kinesis_wire import _KinesisHandler

    from pipeline_kinesis_spark.engine import Engine

    for n_shards in (4, 16, 64, 128):
        # 128 shards probes the drain backstop (now derived from the
        # live shard count — engine.consume_begin); fewer records per
        # shard keep the A/B's wall clock bounded at that width
        per_shard = 2000 if n_shards <= 64 else 1000
        for mode in ("pump", "datasource"):
            fake = FakeKinesisClient(
                {
                    f"shardId-{i:03d}": [
                        f"k{j % 97},{j}".encode()
                        for j in range(per_shard)
                    ]
                    for i in range(n_shards)
                }
            )
            handler = type("H", (_KinesisHandler,), {"fake": fake})
            srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
            threading.Thread(
                target=srv.serve_forever, daemon=True
            ).start()
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            wd = tempfile.mkdtemp(prefix="ingest_ab_")
            cred = os.path.join(wd, "creds")
            with open(cred, "w") as f:
                f.write(
                    "[default]\naws_access_key_id = probe\n"
                    "aws_secret_access_key = probe\n"
                )
            total = n_shards * per_shard
            try:
                eng = Engine(
                    spark,
                    metadata_dir=os.path.join(wd, "meta"),
                    trigger_interval="100 milliseconds",
                )
                eng.add_endpoint(
                    "ep", region="us-east-1", url=url, credfile=cred
                )
                eng.create_stream("probe_in", "k STRING, v BIGINT")
                t0 = time.time()
                cpu0 = time.process_time()
                eng.consume_begin(
                    "ep",
                    "events",
                    "probe_in",
                    fmt="csv",
                    delimiter=",",
                    parallelism=8,
                    rate_limit_rps=1000.0,  # unpaced: measure the path
                    source=mode,
                )
                deadline = time.time() + 600
                n = 0
                while time.time() < deadline:
                    try:
                        n = eng.stream_table("probe_in").count()
                    except Exception:  # noqa: BLE001 — not landed yet
                        n = 0
                    if n >= total:
                        break
                    time.sleep(0.25)
                dt = time.time() - t0
                driver_cpu = time.process_time() - cpu0
                eng.consume_end_all()
                print(
                    json.dumps(
                        {
                            "probe": "ingest_ab",
                            "mode": mode,
                            "shards": n_shards,
                            "records": n,
                            "complete": n >= total,
                            "wall_s": round(dt, 2),
                            "records_per_s": round(n / dt, 1),
                            "driver_python_cpu_s": round(driver_cpu, 2),
                        }
                    ),
                    flush=True,
                )
            finally:
                srv.shutdown()
                srv.server_close()
                shutil.rmtree(wd, ignore_errors=True)


def probe_codec_bench() -> None:
    """Decode throughput (MB/s/core, single-threaded) per from-spec
    codec over deterministic synthetic payloads — the absolute cost of
    the pure-Python kernels on the 100 TB multimodal path (VERDICT r07
    #1: measure, then vectorize). No Spark: the kernels run inside
    Arrow batches on executors, so single-core decode rate is the
    scale-relevant number."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pipeline_kinesis_spark.operators import multimodal as mm
    from pipeline_kinesis_spark.operators.avi import (
        decode_avi,
        encode_avi_mjpeg,
    )
    from pipeline_kinesis_spark.operators.flac import (
        decode_flac,
        encode_flac,
    )
    from pipeline_kinesis_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(8)
    # smooth gradient + mild noise: compresses like a photo, not like
    # white noise (which would overweight the entropy coder)
    yy, xx = np.mgrid[0:192, 0:256]
    base = (
        96
        + 64 * np.sin(xx / 23.0)
        + 48 * np.cos(yy / 17.0)
    )
    img = np.clip(
        base[:, :, None]
        + rng.normal(0, 12, (192, 256, 3)),
        0,
        255,
    ).astype(np.uint8)
    t = np.arange(48000)
    audio = np.clip(
        (
            9000 * np.sin(2 * np.pi * 440 * t / 8000)
            + 3000 * np.sin(2 * np.pi * 97 * t / 8000)
            + rng.normal(0, 400, t.shape)
        ),
        -32768,
        32767,
    ).astype(np.int16)
    stereo = np.stack([audio, (audio // 2).astype(np.int16)], axis=1)
    frames = [
        np.roll(img, 8 * i, axis=1) for i in range(4)
    ]

    cases = {
        "png": (mm.encode_png(img, filter_type=4), mm._decode_png),
        "jpeg_baseline": (mm.encode_jpeg(img), mm._decode_jpeg),
        "jpeg_progressive": (
            mm.encode_jpeg_progressive(img),
            mm._decode_jpeg,
        ),
        "gif": (
            mm.encode_gif(
                rng.integers(0, 256, (256, 3)).astype(np.uint8),
                (img[:, :, 0] // 1).astype(np.uint8),
            ),
            mm._decode_gif,
        ),
        # uncompressed TIFF decode is strip reassembly (memory moves,
        # GB/s — not interesting); the priced paths are the pure-Python
        # LZW and PackBits strip decoders
        "tiff_lzw": (
            encode_tiff(img, compression="lzw", predictor=2),
            decode_tiff,
        ),
        "tiff_packbits": (
            encode_tiff(img, compression="packbits"),
            decode_tiff,
        ),
        "flac": (encode_flac(8000, stereo), decode_flac),
        "adpcm": (mm.encode_wav_ima(8000, stereo), mm._decode_wav),
        "avi_mjpeg": (encode_avi_mjpeg(10.0, frames), decode_avi),
    }
    for name, (payload, decode) in cases.items():
        decode(payload)  # warm imports/JITless caches
        reps = 0
        t0 = time.perf_counter()
        while True:
            decode(payload)
            reps += 1
            dt = time.perf_counter() - t0
            if dt >= 1.0 or reps >= 50:
                break
        mb = len(payload) / 1e6
        print(
            json.dumps(
                {
                    "probe": "codec_bench",
                    "codec": name,
                    "payload_mb": round(mb, 4),
                    "reps": reps,
                    "mb_per_s_core": round(mb * reps / dt, 3),
                    "s_per_payload": round(dt / reps, 4),
                }
            ),
            flush=True,
        )


def main() -> None:
    if "--codec-bench" in sys.argv[1:]:
        probe_codec_bench()
        return
    if "--streaming" in sys.argv[1:]:
        spark = get_spark("scaling-probe-streaming", shuffle_partitions=8)
        probe_osrel_chain(spark)
        probe_combine_read(spark)
        return
    if "--ingest" in sys.argv[1:]:
        spark = get_spark("scaling-probe-ingest", shuffle_partitions=8)
        probe_ingest_ab(spark)
        return
    names = sys.argv[1:] or list(PROBE)
    spark = get_spark("scaling-probe")
    qs = all_queries()
    sf_labels = [
        float(d.rsplit("sf", 1)[-1]) if "sf" in d else 1.0 for d in SFS
    ]
    for sf in SFS:  # warm the JVM/readers on every SF first
        qs["q1_pricing_summary"].fn(spark, sf).collect()
    for name in names:
        spec = qs[name]
        times: list = []
        for sf in SFS:
            samples = []
            try:
                for _ in range(2):
                    t0 = time.time()
                    # compute-to-sink, NOT .collect(): per-row results
                    # (e.g. window_range_frame emits one row per event)
                    # made the old collect()-based timing superlinear in
                    # the result size — 10M rows funneling into the
                    # single-threaded Python driver read as an 18x
                    # last-decade "regression" at sf10 while the actual
                    # window compute was flat (BENCH_NOTES r10). The
                    # noop sink executes the full plan with zero
                    # driver/serialization cost, which is what a real
                    # deployment's write does.
                    (spec.bench_fn or spec.fn)(spark, sf).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    samples.append(time.time() - t0)
                times.append(round(min(samples), 3))
            except Exception as exc:  # noqa: BLE001
                # Expected only for fixtures lacking a table (the sf1/
                # sf10 generators omit some); any OTHER failure is a
                # real regression — surface it on stderr instead of
                # silently recording a missing data point (ADVICE r10
                # #3). AnalysisException covers unknown tables/paths.
                from pyspark.errors import AnalysisException

                if not isinstance(exc, AnalysisException):
                    print(
                        f"PROBE ERROR {name} @ {sf}: "
                        f"{type(exc).__name__}: {exc}",
                        file=sys.stderr,
                        flush=True,
                    )
                times.append(None)
        ratios = [
            round(b / a, 2)
            if (a is not None and b is not None and a > 0)
            else None
            for a, b in zip(times, times[1:])
        ]
        print(
            json.dumps(
                {
                    "query": name,
                    "sf": sf_labels,
                    "sec": times,
                    "ratio_per_10x": ratios,
                    # kept for readers of older rounds' artifacts
                    "ratio_10x_small": ratios[0],
                    "ratio_10x_big": ratios[1],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
