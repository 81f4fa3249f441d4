"""Foreign-file robustness fuzz for the media decoders.

The decode contract (tests/test_avi.py, test_flac.py, test_tiff.py,
test_multimodal_decode.py) is: a decoder either returns a decoded
result or raises ValueError (corrupt/truncated input) /
NotImplementedError (declared-unsupported feature).  Anything else —
IndexError, KeyError, struct.error, zlib.error, ZeroDivisionError,
OverflowError, numpy shape errors, MemoryError, a hang, or a
process-killing allocation — is a bug: a hostile or merely foreign
file would crash an executor task instead of landing in the
dead-letter path.

This is the offline *finder*; deterministic regression cases distilled
from its findings live in tests/test_decoder_fuzz.py.

Strategies per codec seed (all deterministic from --seed):
  * truncation at N uniformly-random cut points
  * K-byte mutations at uniformly-random offsets (K in {1, 2, 8})
  * random garbage appended after a valid payload
  * valid magic + random bytes (header fuzz)

Each case runs in a child process (address-space rlimit + alarm), so
OOM-kills and hangs are recorded, not fatal.

Usage: python tools/fuzz_decoders.py [--codec NAME] [--n 2000] [--seed 9]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import resource
import signal
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ACCEPTABLE = (ValueError, NotImplementedError)
TIME_LIMIT_S = 10
AS_LIMIT_BYTES = 6 << 30


def _codec_key(codec: str) -> int:
    """Stable per-codec RNG stream key. Python's built-in hash() is
    salted per-process (PYTHONHASHSEED), which silently broke the
    "reproducible from (seed, codec, pass, case)" contract: a finding's
    pass_seed could not be regenerated in a later process (found when a
    r10 GIF MemoryError finding failed to replay)."""
    import zlib

    return zlib.crc32(codec.encode()) & 0x7FFFFFFF


# -- seed corpus: one or two small valid payloads per codec -----------------


def _pixels(rng: np.random.Generator, h: int = 24, w: int = 16) -> np.ndarray:
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _samples(rng: np.random.Generator, n: int = 1600, ch: int = 2) -> np.ndarray:
    t = np.arange(n)[:, None]
    base = (3000 * np.sin(t / 7.0) + 800 * np.sin(t / 3.1)).astype(np.int16)
    return np.repeat(base, ch, axis=1) + rng.integers(-64, 64, (n, ch)).astype(
        np.int16
    )


def build_seeds(rng: np.random.Generator) -> dict[str, list[bytes]]:
    from pipeline_kinesis_spark.operators import multimodal as mm
    from pipeline_kinesis_spark.operators.avi import encode_avi_mjpeg
    from pipeline_kinesis_spark.operators.flac import encode_flac
    from pipeline_kinesis_spark.operators.tiff import encode_tiff

    px = _pixels(rng)
    smp = _samples(rng)
    seeds: dict[str, list[bytes]] = {
        "ppm": [mm.encode_ppm(px)],
        "bmp": [mm.encode_bmp(px)],
        "png": [
            mm.encode_png(px, filter_type=4),
            mm.encode_png_variant(px[:, :, 0] >> 4, depth=4, color=0),
            mm.encode_png_variant(
                (px >> 4).astype(np.uint16) * 0x1111, depth=16, color=2,
                interlaced=True,
            ),
        ],
        "gif": [
            mm.encode_gif(
                np.arange(768, dtype=np.uint8).reshape(256, 3),
                (px[:, :, 0]).astype(np.uint8),
            )
        ],
        "jpeg": [
            mm.encode_jpeg(px),
            mm.encode_jpeg(px, restart_interval=2),
            mm.encode_jpeg_progressive(px),
        ],
        "wav": [
            mm.encode_wav(8000, smp),
            mm.encode_wav_ima(8000, smp, block_align=256),
            mm.encode_wav_g711(8000, smp[:, :1], law="ulaw"),
            mm.encode_wav_g711(8000, smp[:, :1], law="alaw"),
        ],
        "flac": [
            encode_flac(8000, smp),
            encode_flac(8000, smp[:, :1], subframe="lpc", partition_order=2),
        ],
        "tiff": [
            encode_tiff(px, compression="lzw"),
            encode_tiff(px, compression="packbits"),
            encode_tiff(np.repeat(px[:, :, :1], 3, axis=2), compression="deflate", predictor=2, photometric="gray"),
        ],
        "avi": [
            encode_avi_mjpeg(5.0, np.stack([px, 255 - px])),
        ],
    }
    return seeds


MAGICS = {
    "ppm": b"P6",
    "bmp": b"BM",
    "png": b"\x89PNG\r\n\x1a\n",
    "gif": b"GIF89a",
    "jpeg": b"\xff\xd8",
    "wav": b"RIFF\xff\x00\x00\x00WAVE",
    "avi": b"RIFF\xff\x00\x00\x00AVI ",
    "flac": b"fLaC",
    "tiff": b"II*\x00",
}


def make_case(codec: str, seeds: list[bytes], rng: np.random.Generator) -> bytes:
    """One deterministic fuzz payload for ``codec``."""
    strat = rng.integers(0, 4)
    base = bytearray(seeds[rng.integers(0, len(seeds))])
    if strat == 0:  # truncation
        cut = int(rng.integers(0, len(base)))
        return bytes(base[:cut])
    if strat == 1:  # K-byte mutation
        k = int(rng.choice([1, 2, 8]))
        for _ in range(k):
            off = int(rng.integers(0, len(base)))
            base[off] = int(rng.integers(0, 256))
        return bytes(base)
    if strat == 2:  # garbage tail
        tail = rng.integers(0, 256, int(rng.integers(1, 64))).astype(np.uint8)
        return bytes(base) + tail.tobytes()
    # strat == 3: magic + random bytes
    body = rng.integers(0, 256, int(rng.integers(0, 512))).astype(np.uint8)
    return MAGICS[codec] + body.tobytes()


# -- child runner -----------------------------------------------------------


def _child(conn, payloads: list[bytes]) -> None:
    resource.setrlimit(resource.RLIMIT_AS, (AS_LIMIT_BYTES, AS_LIMIT_BYTES))

    def _on_alarm(signum, frame):
        raise TimeoutError(f"decode exceeded {TIME_LIMIT_S}s CPU")

    # ITIMER_VIRTUAL counts CPU time, so a saturated host can't turn
    # an honest decode into a false HANG finding
    signal.signal(signal.SIGVTALRM, _on_alarm)
    from pipeline_kinesis_spark.operators.multimodal import decode_media

    for i, payload in enumerate(payloads):
        outcome = "ok"
        detail = ""
        signal.setitimer(signal.ITIMER_VIRTUAL, TIME_LIMIT_S)
        try:
            decode_media(payload)
        except ACCEPTABLE:
            outcome = "rejected"
        except TimeoutError as e:
            outcome = "BUG"
            detail = f"{type(e).__name__}: {e}"[:200]
        except BaseException as e:  # noqa: BLE001 - the finder's whole point
            outcome = "BUG"
            detail = f"{type(e).__name__}: {e}"[:200]
        finally:
            signal.setitimer(signal.ITIMER_VIRTUAL, 0)
        conn.send((i, outcome, detail))
    conn.close()


def _child_cpu_s(pid: int) -> float:
    """utime+stime of a child from /proc (Linux): lets the parent tell
    a STARVED child (wall passed, little CPU granted — co-tenant load)
    from a genuinely stuck one before declaring HANG."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        hz = os.sysconf("SC_CLK_TCK")
        return (int(parts[11]) + int(parts[12])) / hz
    except (OSError, IndexError, ValueError):
        return float("inf")  # can't tell — fall back to the wall verdict


def run_codec(codec: str, seeds: list[bytes], n: int, seed: int) -> list[tuple]:
    rng = np.random.default_rng([seed, _codec_key(codec)])
    payloads = [make_case(codec, seeds, rng) for _ in range(n)]
    findings: list[tuple] = []
    start = 0
    while start < n:
        parent, child = mp.Pipe()
        proc = mp.Process(target=_child, args=(child, payloads[start:]))
        proc.start()
        child.close()
        last = -1  # index (within this batch) of the last completed case
        aborted = False
        try:
            while last + 1 < n - start:
                if not parent.poll(TIME_LIMIT_S * 6):
                    # wall deadline passed without a result. Three
                    # explanations (r13: the avi DHT bomb was found on
                    # a host 32-threads-deep in an sf1 sweep — the
                    # child got so little CPU its ITIMER_VIRTUAL alarm
                    # couldn't fire inside the wall window):
                    #   cpu >= limit  -> CPU bomb the alarm failed to
                    #                    interrupt (stuck in one C
                    #                    call): a real finding;
                    #   cpu growing   -> starved, not stuck: extend the
                    #                    wait (bounded);
                    #   cpu flat      -> genuinely blocked: HANG.
                    cpu = _child_cpu_s(proc.pid)
                    deadline = time.monotonic() + TIME_LIMIT_S * 54
                    while (
                        cpu < TIME_LIMIT_S * 1.5
                        and time.monotonic() < deadline
                    ):
                        if parent.poll(TIME_LIMIT_S):
                            break
                        cpu2 = _child_cpu_s(proc.pid)
                        if cpu2 <= cpu + 0.05:
                            break  # flat CPU: truly blocked
                        cpu = cpu2
                    if parent.poll(0):
                        i, outcome, detail = parent.recv()
                        last = i
                        if outcome == "BUG":
                            findings.append(
                                (codec, start + i, outcome, detail)
                            )
                        continue
                    findings.append(
                        (
                            codec,
                            start + last + 1,
                            "HANG",
                            f"child cpu {cpu:.1f}s",
                        )
                    )
                    aborted = True
                    break
                i, outcome, detail = parent.recv()
                last = i
                if outcome == "BUG":
                    findings.append((codec, start + i, outcome, detail))
        except EOFError:
            # child died mid-case (OOM-kill / interpreter abort)
            proc.join()
            findings.append(
                (codec, start + last + 1, "DIED", f"exitcode={proc.exitcode}")
            )
            aborted = True
        proc.kill()
        proc.join()
        if not aborted:
            break
        start = start + last + 2  # resume past the killer case
    return findings


def run_budget(seed: int, budget_s: float, chunk: int = 100) -> int:
    """Round-close battery mode (VERDICT r09 "next round" #4): spend a
    fixed wall-clock budget fuzzing ALL codecs on a fresh seed and emit
    ONE summary JSON line for BENCH_NOTES. Codecs rotate in chunks so
    the budget spreads across formats instead of exhausting on the
    first; each chunk advances the per-codec case stream
    deterministically (pass k re-seeds with [seed, codec, k]), so a
    finding is reproducible from (seed, codec, pass, case)."""
    import json
    import time

    t0 = time.monotonic()
    rng = np.random.default_rng(seed)
    seeds = build_seeds(rng)
    codecs = sorted(seeds)
    counts: dict[str, int] = dict.fromkeys(codecs, 0)
    all_findings: list[tuple] = []
    k = 0
    while time.monotonic() - t0 < budget_s:
        codec = codecs[k % len(codecs)]
        pass_seed = int(
            np.random.default_rng(
                [seed, _codec_key(codec), k]
            ).integers(1, 2**31)
        )
        f = run_codec(codec, seeds[codec], chunk, pass_seed)
        counts[codec] += chunk
        for row in f:
            print(f"    {codec} pass {k} case {row[1]} {row[2]} {row[3]}")
        all_findings.extend(f)
        k += 1
    print(
        json.dumps(
            {
                "metric": "decoder_fuzz_budget",
                "mutations": sum(counts.values()),
                "violations": len(all_findings),
                "seed": seed,
                "budget_s": budget_s,
                "wall_s": round(time.monotonic() - t0, 1),
                "per_codec": counts,
            }
        )
    )
    return 1 if all_findings else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default=None)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument(
        "--budget-s",
        type=float,
        default=None,
        help="wall-clock budget mode: fuzz all codecs on a fresh seed "
        "until the budget runs out, then print one summary JSON line",
    )
    args = ap.parse_args()

    if args.budget_s is not None:
        return run_budget(args.seed, args.budget_s)

    rng = np.random.default_rng(args.seed)
    seeds = build_seeds(rng)
    codecs = [args.codec] if args.codec else sorted(seeds)
    all_findings: list[tuple] = []
    for codec in codecs:
        f = run_codec(codec, seeds[codec], args.n, args.seed)
        status = f"{len(f)} findings" if f else "clean"
        print(f"{codec:6s} n={args.n}: {status}", flush=True)
        for row in f[:40]:
            print(f"    case {row[1]:6d} {row[2]:5s} {row[3]}")
        all_findings.extend(f)
    print(f"TOTAL findings: {len(all_findings)}")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main())
