"""Budgeted randomized ENGINE-LIFECYCLE fuzz (r14).

The gate rows each pin ONE lifecycle choreography (restart, pause/
resume, rebucket, alter, TTL reap...). This tool fuzzes the
INTERLEAVINGS: a seeded random schedule of lifecycle operations runs
against one standing parquet_upsert view while deterministic records
feed in, and at the end the contract must hold exactly:

  - view_table == the exact python-side aggregate of everything fed
    (count / sum / min / max per key),
  - the durable archive holds every record exactly once,
  - no operation ever raises.

Ops drawn per step (seeded):
  feed           write another record file (monotonic seqnums; may
                 land while the pipeline is down — must be picked up)
  feed_malformed a feed where ~1/5 rows use the wrong delimiter —
                 they must quarantine exactly (first column BIGINT,
                 so a mis-delimited row always fails the cast)
  drain          wait_for_ingest
  pause_resume   consume_end_all + consume_begin on the SAME engine
  restart        consume_end_all + a NEW Engine over the same
                 metadata dir + consume_begin (process-death analog)
  flap_view      deactivate(view) + activate(view) (consumers keep
                 archiving; view resumes from its checkpoint)
  rebucket       live store resize to a new bucket count
  replay         replay_dead_letters with the corrected delimiter
                 (idempotent; recovered rows append to the ARCHIVE —
                 standing views do not consume them, by contract)
  alter          consume_end_all + ALTER STREAM ADD COLUMN via the
                 SQL surface + resume; later feeds carry the extra
                 column (view untouched; once per scenario)

End-of-scenario ledger (after a final drain):
  view == exact aggregate of WELL-FORMED rows fed,
  archive == well-formed + replay-recovered,
  dead_letters == malformed - recovered.

--mode wire fuzzes the MANAGED KINESIS PUMP path instead (the
reference's core protocol, A1-A4/A9-A12): a boto3-shaped canned wire
(sources/fake_kinesis.py) takes seeded interleavings of append /
shard SPLIT / shard MERGE / injected throttle+expire faults /
pause-resume / full engine restart, and the same exactness ledger
must hold (every appended record lands in the view and archive
exactly once, across reshard boundaries, fault retries and
restarts). --mode mixed alternates per scenario.

Scenario i draws from default_rng([seed, i]) so any single scenario
replays standalone: --only-scenario N reruns exactly scenario N of
the same seed.

Usage:
  python tools/fuzz_lifecycle.py [--budget-s 300] [--seed N]
                                 [--only-scenario N]
                                 [--mode file|wire|mixed]

Emits one JSON summary line; exit 1 on any contract violation.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
import traceback
import uuid

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

OPS = (
    "feed", "drain", "pause_resume", "restart", "flap_view",
    "rebucket", "feed_malformed", "replay", "alter",
)
# feeds and drains dominate so most scenarios move real data between
# lifecycle punches
WEIGHTS = (0.24, 0.20, 0.10, 0.10, 0.10, 0.10, 0.08, 0.05, 0.03)
KEYS = tuple(f"k{i}" for i in range(8))


def _scenario(spark, rng: np.random.Generator, ops_run: list) -> dict:
    """Run one seeded scenario; appends each op to ops_run as it goes
    (so a raising op leaves its trace for the caller's report)."""
    from pipeline_kinesis_spark.engine import Engine
    from pipeline_kinesis_spark.sources.file_replay import (
        write_record_file,
    )

    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"lcf_{tag}_")
    ep, stream, view = f"lcf_ep_{tag}", f"lcf_st_{tag}", f"lcf_v_{tag}"

    def new_engine() -> "Engine":
        return Engine(
            spark,
            metadata_dir=f"{root}/meta",
            trigger_interval="50 milliseconds",
            shuffle_partitions=4,
        )

    expected: dict[str, list] = {}  # k -> [n, sum, min, max] (good rows)
    state = {
        "good": 0,       # well-formed rows fed
        "malformed": 0,  # mis-delimited rows fed (must quarantine)
        "recovered": 0,  # rows replay_dead_letters brought back
        "feed_no": 0,
        "altered": False,
    }

    def feed(malformed_frac: float = 0.0):
        n = int(rng.integers(20, 120))
        recs = []
        for i in range(n):
            k = KEYS[int(rng.integers(0, len(KEYS)))]
            v = int(rng.integers(-1000, 1000))
            if rng.random() < malformed_frac:
                # wrong delimiter: "v;k" is ONE field and fails the
                # BIGINT cast on column 1 -> quarantined exactly
                data = f"{v};{k}"
                state["malformed"] += 1
            else:
                data = f"{v},{k}"
                if state["altered"]:
                    data += f",{int(rng.integers(0, 100))}"
                agg = expected.setdefault(k, [0, 0, v, v])
                agg[0] += 1
                agg[1] += v
                agg[2] = min(agg[2], v)
                agg[3] = max(agg[3], v)
                state["good"] += 1
            recs.append(
                {
                    "data": data,
                    "partition_key": k,
                    "shard_id": f"shardId-{i % 4:012d}",
                    "sequence_number": (
                        f"{state['feed_no'] * 10**9 + i:056d}"
                    ),
                }
            )
        write_record_file(f"{root}/records", recs)
        state["feed_no"] += 1

    eng = new_engine()
    consuming = False
    view_active = True
    try:
        eng.add_endpoint(ep, url=root)
        eng.create_stream(stream, "v BIGINT, k STRING")
        eng.create_continuous_view(
            view,
            f"SELECT k, count(*) AS n, sum(v) AS total, "
            f"min(v) AS vmin, max(v) AS vmax FROM {stream} GROUP BY k",
            stream=stream,
            materialize="parquet_upsert",
            key_cols=["k"],
            upsert_buckets=2,
        )
        feed()

        def begin():
            nonlocal consuming
            eng.consume_begin(
                ep, "records", stream, fmt="csv", delimiter=",",
            )
            consuming = True

        begin()
        n_ops = int(rng.integers(5, 11))
        for _ in range(n_ops):
            op = str(rng.choice(OPS, p=WEIGHTS))
            ops_run.append(op)
            if op == "feed":
                feed()
            elif op == "feed_malformed":
                feed(malformed_frac=0.2)
            elif op == "drain":
                if consuming:
                    eng.wait_for_ingest(timeout_s=180)
            elif op == "pause_resume":
                eng.consume_end_all()
                consuming = False
                if rng.random() < 0.5:
                    feed()  # lands while the pipeline is down
                begin()
            elif op == "restart":
                eng.consume_end_all()
                consuming = False
                if rng.random() < 0.5:
                    feed()
                eng = new_engine()
                begin()
                view_active = True
            elif op == "flap_view":
                if view_active and consuming:
                    eng.deactivate(view)
                    if rng.random() < 0.5:
                        feed()  # archived while the view is down
                    eng.activate(view)
            elif op == "rebucket":
                if consuming:
                    eng.rebucket(view, int(rng.choice([1, 2, 4, 8])))
            elif op == "replay":
                # only quarantined-and-drained rows are recoverable;
                # drain first so the ledger stays exact
                if consuming:
                    eng.wait_for_ingest(timeout_s=180)
                state["recovered"] += int(
                    eng.replay_dead_letters(stream, delimiter=";")
                )
            elif op == "alter":
                if not state["altered"]:
                    # documented precondition: drain, THEN stop, THEN
                    # alter — old-format rows still unconsumed at ALTER
                    # time quarantine as arity-mismatches (recoverable
                    # only via replay_dead_letters(schema_ddl=...);
                    # that path has its own deterministic test)
                    if consuming:
                        eng.wait_for_ingest(timeout_s=180)
                    eng.consume_end_all()
                    consuming = False
                    from pipeline_kinesis_spark import sqlapi

                    sqlapi.execute(
                        eng,
                        f"ALTER STREAM {stream} ADD COLUMN w bigint",
                    )
                    state["altered"] = True
                    begin()
        if not consuming:
            begin()
        eng.wait_for_ingest(timeout_s=300)

        problems = []
        got = {
            r.k: (int(r.n), int(r.total), int(r.vmin), int(r.vmax))
            for r in eng.view_table(view).collect()
        }
        want = {k: tuple(v) for k, v in expected.items()}
        if got != want:
            extra = {k: got[k] for k in got if want.get(k) != got[k]}
            missing = {k: want[k] for k in want if got.get(k) != want[k]}
            problems.append(
                f"view mismatch: got!={extra} want!={missing}"
            )
        archived = eng.stream_table(stream).count()
        want_archive = state["good"] + state["recovered"]
        if archived != want_archive:
            problems.append(
                f"archive {archived} != good+recovered {want_archive}"
            )
        try:
            dl = eng.dead_letters(stream).count()
        except Exception:
            dl = 0  # no dead-letter dir yet: nothing ever quarantined
        want_dl = state["malformed"] - state["recovered"]
        if dl != want_dl:
            problems.append(
                f"dead_letters {dl} != malformed-recovered {want_dl}"
            )
        return {
            "fed": state["good"] + state["malformed"],
            "feeds": state["feed_no"],
            "problems": problems,
        }
    finally:
        eng.consume_end_all()
        shutil.rmtree(root, ignore_errors=True)


WIRE_OPS = (
    "append", "drain", "split", "merge", "fault",
    "pause_resume", "restart",
)
WIRE_WEIGHTS = (0.34, 0.18, 0.12, 0.10, 0.10, 0.08, 0.08)


def _scenario_wire(spark, rng: np.random.Generator, ops_run: list) -> dict:
    """Wire-path scenario: seeded lifecycle ops against the managed
    pump over a canned boto3-shaped Kinesis. The pump must deliver
    every appended record exactly once through splits, merges,
    injected faults, pauses and engine restarts."""
    import time as _time

    from pipeline_kinesis_spark.engine import Engine
    from pipeline_kinesis_spark.sources.fake_kinesis import (
        FakeKinesisClient,
    )

    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"lcw_{tag}_")
    ep, stream, view = f"lcw_ep_{tag}", f"lcw_st_{tag}", f"lcw_v_{tag}"

    fake = FakeKinesisClient({"shardId-000": [], "shardId-001": []})
    open_shards = ["shardId-000", "shardId-001"]
    next_shard = [2]
    expected: dict[str, list] = {}
    state = {"fed": 0}

    def shard_name() -> str:
        n = f"shardId-{next_shard[0]:03d}"
        next_shard[0] += 1
        return n

    def append():
        n = int(rng.integers(10, 60))
        for _ in range(n):
            k = KEYS[int(rng.integers(0, len(KEYS)))]
            v = int(rng.integers(-1000, 1000))
            agg = expected.setdefault(k, [0, 0, v, v])
            agg[0] += 1
            agg[1] += v
            agg[2] = min(agg[2], v)
            agg[3] = max(agg[3], v)
            s = open_shards[int(rng.integers(0, len(open_shards)))]
            fake.append(s, f"{v},{k}".encode())
        state["fed"] += n

    def new_engine() -> "Engine":
        eng = Engine(
            spark,
            metadata_dir=f"{root}/meta",
            trigger_interval="50 milliseconds",
            shuffle_partitions=4,
        )
        # clients are process-local by design: re-register after any
        # restart (production rebuilds one via make_boto3_client)
        eng.register_kinesis_client(ep, fake)
        return eng

    def drain(eng, timeout_s=240.0):
        """Pump fetch is async to the landing queries: poll until the
        archive holds everything appended so far, then drain views."""
        deadline = _time.monotonic() + timeout_s
        while _time.monotonic() < deadline:
            eng.wait_for_ingest(timeout_s=timeout_s)
            try:
                n = eng.stream_table(stream).count()
            except Exception:
                n = 0  # nothing archived yet
            if n >= state["fed"]:
                return
            _time.sleep(0.1)
        raise TimeoutError(
            f"archive stuck below fed={state['fed']}"
        )

    eng = None
    try:
        eng = Engine(
            spark,
            metadata_dir=f"{root}/meta",
            trigger_interval="50 milliseconds",
            shuffle_partitions=4,
        )
        eng.add_endpoint(ep)  # kinesis-typed endpoint, injected client
        eng.register_kinesis_client(ep, fake)
        eng.create_stream(stream, "v BIGINT, k STRING")
        eng.create_continuous_view(
            view,
            f"SELECT k, count(*) AS n, sum(v) AS total, "
            f"min(v) AS vmin, max(v) AS vmax FROM {stream} GROUP BY k",
            stream=stream,
            materialize="parquet_upsert",
            key_cols=["k"],
            upsert_buckets=2,
        )
        append()

        def begin():
            eng.consume_begin(
                ep, "events_replay", stream, fmt="csv", delimiter=",",
                source="pump", rate_limit_rps=40,
            )

        begin()
        n_ops = int(rng.integers(5, 10))
        for _ in range(n_ops):
            op = str(rng.choice(WIRE_OPS, p=WIRE_WEIGHTS))
            ops_run.append(op)
            if op == "append":
                append()
            elif op == "drain":
                drain(eng)
            elif op == "split":
                if len(open_shards) <= 10:
                    parent = open_shards.pop(
                        int(rng.integers(0, len(open_shards)))
                    )
                    kids = [shard_name(), shard_name()]
                    fake.reshard(parent, kids)
                    open_shards.extend(kids)
            elif op == "merge":
                if len(open_shards) >= 3:
                    i = int(rng.integers(0, len(open_shards)))
                    a = open_shards.pop(i)
                    j = int(rng.integers(0, len(open_shards)))
                    b = open_shards.pop(j)
                    child = shard_name()
                    fake.merge([a, b], child)
                    open_shards.append(child)
            elif op == "fault":
                s = open_shards[int(rng.integers(0, len(open_shards)))]
                kind = "throttle" if rng.random() < 0.5 else "expire"
                fake.fault_plan.setdefault(s, []).append(kind)
            elif op == "pause_resume":
                eng.consume_end_all()
                if rng.random() < 0.5:
                    append()  # lands while the pump is down
                begin()
            elif op == "restart":
                eng.consume_end_all()
                if rng.random() < 0.5:
                    append()
                eng = new_engine()
                begin()
        drain(eng)

        problems = []
        got = {
            r.k: (int(r.n), int(r.total), int(r.vmin), int(r.vmax))
            for r in eng.view_table(view).collect()
        }
        want = {k: tuple(v) for k, v in expected.items()}
        if got != want:
            extra = {k: got[k] for k in got if want.get(k) != got[k]}
            missing = {k: want[k] for k in want if got.get(k) != want[k]}
            problems.append(
                f"view mismatch: got!={extra} want!={missing}"
            )
        archived = eng.stream_table(stream).count()
        if archived != state["fed"]:
            problems.append(
                f"archive {archived} != fed {state['fed']}"
            )
        return {"fed": state["fed"], "feeds": -1, "problems": problems}
    finally:
        if eng is not None:
            eng.consume_end_all()
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=300.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only-scenario", type=int, default=None)
    ap.add_argument(
        "--mode", choices=("file", "wire", "mixed"), default="file"
    )
    args = ap.parse_args()

    from pipeline_kinesis_spark import get_spark

    spark = get_spark("fuzz-lifecycle")
    t0 = time.monotonic()
    scenarios = 0
    total_ops = 0
    total_fed = 0
    violations = []

    def run_one(idx: int):
        nonlocal scenarios, total_ops, total_fed
        rng = np.random.default_rng([args.seed, idx])
        ops_run: list = []
        wire = args.mode == "wire" or (
            args.mode == "mixed" and idx % 2 == 1
        )
        fn = _scenario_wire if wire else _scenario
        if wire:
            ops_run.append("[wire]")
        try:
            res = fn(spark, rng, ops_run)
        except Exception as e:  # an op raising IS a violation
            violations.append(
                {
                    "scenario": idx,
                    "ops": ops_run,
                    "error": f"{type(e).__name__}: {e}"[:500],
                    "trace_tail": traceback.format_exc()[-800:],
                }
            )
        else:
            total_ops += len(ops_run)
            total_fed += res["fed"]
            for p in res["problems"]:
                violations.append(
                    {"scenario": idx, "ops": ops_run, "problem": p}
                )
        scenarios += 1

    if args.only_scenario is not None:
        run_one(args.only_scenario)
    else:
        idx = 0
        while time.monotonic() - t0 < args.budget_s:
            run_one(idx)
            idx += 1
    print(
        json.dumps(
            {
                "metric": "lifecycle_fuzz_budget",
                "scenarios": scenarios,
                "lifecycle_ops": total_ops,
                "records_fed": total_fed,
                "violations": len(violations),
                "seed": args.seed,
                "budget_s": args.budget_s,
                "wall_s": round(time.monotonic() - t0, 1),
                "detail": violations[:4],
            }
        )
    )
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
