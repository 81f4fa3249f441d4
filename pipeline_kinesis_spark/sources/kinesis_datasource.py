"""Executor-parallel Kinesis source on PySpark's Python DataSource API.

The managed pump (sources/kinesis.py) is the direct analog of the
reference's <=8 driver-side bgworkers (pipeline_kinesis.c:54,774-823) and
is fine at reference scale — but every ingested byte crosses the driver.
This module removes that ceiling: a `pyspark.sql.datasource.DataSource`
whose stream reader plans ONE INPUT PARTITION PER LIVE SHARD (the
reference's shard list, kinesis_consumer.cpp:200-234) and whose
per-partition `read()` runs the GetRecords consumer protocol
(kinesis_consumer.cpp:364-434 parity: iterator resolution, pacing,
NextShardIterator follow, closed-shard drain) ON EXECUTORS — GetRecords
responses land in executor Python workers and flow straight into the
micro-batch, never through the driver. Ingest bandwidth then scales with
the cluster: 1000 shards on a 1000-executor cluster poll concurrently.

Offset & exactly-once model
---------------------------
Kinesis, unlike Kafka, has no "tail offset" API: the only way to learn a
shard's latest sequence number is to read records. Ends can therefore
not be pinned at planning time. The design used here:

- The Spark offset WAL stores, per batch, ``{"epoch": n, "shards":
  {shard_id: last_consumed_seqnum}}`` — the COMMITTED start positions of
  that batch (frozen at planning time, so a replayed batch always starts
  from the same seqnums).
- Each executor task polls from its shard's start seqnum up to
  ``maxRecordsPerShardPerBatch`` (or until caught up / shard closed) and
  atomically records the position it reached in a tiny per-shard
  "attained" file under ``stateDir`` (metadata only — a few bytes, not
  data).
- ``latestOffset()`` (driver) folds the attained files into the next
  batch's offset dict. The batch END is not known at planning time, but
  replays are still DETERMINISTIC: the attained file records which
  (epoch, start) produced its reach, and a replayed attempt of the same
  batch treats that reach as a hard end bound — it emits exactly the
  records the first attempt emitted, never the longer tail the stream
  grew in between. Sinks that skip an already-committed batch id and
  sinks that rewrite it are therefore BOTH correct, and the pipeline is
  exactly-once end to end — the upgrade over the reference's
  at-least-once wire + transactional landing
  (pipeline_kinesis.c:543-579,742).
- ``stateDir`` pairs 1:1 with the query's checkpointLocation and, on a
  real cluster, must live on the same shared storage (it is written by
  executors and read by the driver). Wipe both together or neither.

Resharding: a task that drains a closed shard (GetRecords returns no
NextShardIterator) marks it closed in its attained file; planning skips
fully-drained closed shards and gates child shards until every parent is
drained (records between parent end and child start are never skipped —
children start at TRIM_HORIZON, kinesis_consumer.cpp:258-325 parity).

Sticky latest: a shard started at LATEST that reads nothing persists its
shard iterator (valid ~5 min) in the attained file; the next batch
resumes from it, so records arriving between polls are not skipped. If
the iterator expires during an idle gap, LATEST is re-acquired (same
semantics as a reference consumer restart).
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from pipeline_kinesis_spark.sources.records import RECORD_SCHEMA

FORMAT_NAME = "pipeline_kinesis"

# SELF-CONTAINMENT CONTRACT: Spark runs the driver-side reader methods
# (initialOffset/latestOffset/partitions/commit) in a separate Python
# planner process, and read() in executor workers — neither of which
# necessarily has this repo on sys.path. register() therefore tells
# cloudpickle to serialize this MODULE by value (the class ships inside
# the pickle, like a --py-files wheel but self-carried), which works
# only because nothing executed after planning imports the package:
# every helper the reader calls is defined in THIS module, and only
# stdlib/boto3/pyspark are imported at call time. Do not add package
# imports to reader methods or their helpers.

# GetRecords pacing within one read() call — reference 4 req/s/shard
# (kinesis_consumer.cpp:415-421). Across batches the trigger interval
# paces; within a batch consecutive calls sleep this floor.
DEFAULT_RATE_PER_SHARD = 4.0
DEFAULT_LIMIT = 1000  # reference batchsize default
DEFAULT_MAX_PER_SHARD_PER_BATCH = 10_000


def _load_factory(spec: str):
    """'pkg.mod:attr' → the callable it names (test seam: lets suites
    swap boto3 for an in-process fake client without any network)."""
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


# per-process client cache: the planner process calls partitions()
# every trigger and executor workers are reused across tasks — a fresh
# boto3 client each time would pay client construction + a TLS
# handshake per micro-batch per shard. Keyed by the full connection
# config; boto3 clients are thread-safe for our call set.
_CLIENT_CACHE: dict[tuple, object] = {}


def _make_client(opts: dict):
    """boto3 Kinesis client from reader options (the per-endpoint
    client construction of pipeline_kinesis.c:120-188), cached per
    process and config — clients are never stored on the pickled
    reader."""
    key = (
        opts.get("clientfactory"),
        opts.get("region"),
        opts.get("endpointurl"),
        opts.get("credfile"),
    )
    client = _CLIENT_CACHE.get(key)
    if client is not None:
        return client
    factory = opts.get("clientfactory")
    if factory:
        client = _load_factory(factory)()
    else:
        import boto3

        if opts.get("credfile"):
            # reference credfile: shared-credentials-file style; also
            # how executor workers (whose env Spark controls) get
            # SigV4 material. Assignment, not setdefault: this
            # reader's credfile must win over whatever a previous
            # task left in the worker's env
            os.environ["AWS_SHARED_CREDENTIALS_FILE"] = opts["credfile"]
        session = boto3.session.Session()
        client = session.client(
            "kinesis",
            region_name=opts.get("region", "us-east-1"),
            endpoint_url=opts.get("endpointurl") or None,
        )
    _CLIENT_CACHE[key] = client
    return client


def describe_all_shards(client, stream_name: str) -> list[dict]:
    """DescribeStream following HasMoreShards pagination
    (kinesis_consumer.cpp:200-234) — canonical copy; the poller path
    (sources/kinesis.py) reuses it."""
    shards: list[dict] = []
    start_id = None
    while True:
        kwargs = {"StreamName": stream_name}
        if start_id is not None:
            kwargs["ExclusiveStartShardId"] = start_id
        resp = client.describe_stream(**kwargs)
        desc = resp["StreamDescription"]
        shards.extend(desc["Shards"])
        if not desc.get("HasMoreShards"):
            return shards
        start_id = shards[-1]["ShardId"]


def _aws_error_code(exc: Exception) -> str:
    """AWS error code of an exception: botocore ClientError carries it
    in .response, fakes in .code or the type name (kept local — see
    SELF-CONTAINMENT CONTRACT)."""
    name = getattr(exc, "code", None) or type(exc).__name__
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        name = resp.get("Error", {}).get("Code") or name
    return name


# -- attained-position side channel -----------------------------------------
# One tiny JSON file per shard under <stateDir>/attained/. Written
# atomically (tmp + os.replace) by the executor task that read the
# shard; read by the driver in latestOffset(). Content:
#   {"seq": str|None, "it": str|None, "closed": bool}
# seq   — last consumed sequence number (None until the first record)
# it    — cached NextShardIterator (saves one GetShardIterator per
#         batch; also carries sticky-latest across empty polls)
# closed — shard fully drained after a reshard
#
# CONCURRENT-ATTEMPT SAFETY (speculative execution / zombie tasks): the
# file for epoch N is named `{shard}.e{N}.json` and created with
# os.link (fails if it exists), so the FIRST attempt to finish reading
# a given (epoch, start) pins its reach atomically-with-content; a
# concurrent or later attempt of the same epoch — or a zombie from an
# older epoch — can never overwrite it. Readers take the max-epoch
# entry per shard; commit() reaps older epochs. This closes the
# last-writer-wins loss window (a non-committed attempt that read
# further no longer advances the next batch's start past records the
# committed batch never emitted). A legacy un-suffixed `{shard}.json`
# from an older state dir is still read (its content carries epoch).


def _attained_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "attained")


def _split_attained_name(name: str) -> tuple[str, int | None]:
    """`{shard}.e{N}.json` → (shard, N); legacy `{shard}.json` →
    (shard, None)."""
    stem = name[:-5]  # drop .json
    base, dot, suffix = stem.rpartition(".")
    if dot and suffix[:1] == "e" and suffix[1:].isdigit():
        return base, int(suffix[1:])
    return stem, None


def _read_attained(state_dir: str) -> dict[str, dict]:
    d = _attained_dir(state_dir)
    out: dict[str, dict] = {}
    best: dict[str, int] = {}
    try:
        names = os.listdir(d)
    except OSError:
        return out
    for name in names:
        if not name.endswith(".json"):
            continue
        shard, epoch = _split_attained_name(name)
        try:
            with open(os.path.join(d, name)) as f:
                st = json.load(f)
        except (OSError, ValueError):
            continue  # torn legacy write / reaped mid-read: next round heals
        e = int(st.get("epoch") or 0)
        # max-epoch entry wins; ties (legacy + new file for the same
        # epoch) prefer the pinned per-epoch file
        if shard not in best or e > best[shard] or (
            e == best[shard] and epoch is not None
        ):
            best[shard] = e
            out[shard] = st
    return out


def _read_attained_shard(state_dir: str, shard_id: str) -> dict:
    """One shard's winning attained entry (same winner rule as
    _read_attained: max epoch, per-epoch pin beats legacy on a tie)
    without parsing the whole directory — the executor poll loop calls
    this once per shard per batch, and a full-dir parse there is
    O(shards) opens per call, O(shards²) per micro-batch at scale."""
    d = _attained_dir(state_dir)
    try:
        names = os.listdir(d)
    except OSError:
        return {}
    out: dict = {}
    best = -1
    for name in names:
        if not name.endswith(".json") or not name.startswith(shard_id):
            continue
        shard, epoch = _split_attained_name(name)
        if shard != shard_id:
            continue  # another shard id sharing this one as a prefix
        try:
            with open(os.path.join(d, name)) as f:
                st = json.load(f)
        except (OSError, ValueError):
            continue  # torn legacy write / reaped mid-read
        e = int(st.get("epoch") or 0)
        if e > best or (e == best and epoch is not None):
            best = e
            out = st
    return out


def _write_attained(state_dir: str, shard_id: str, state: dict) -> None:
    """Record a shard's reach for `state['epoch']`, first-writer-wins.

    The content is written to a tmp file and published via os.link to
    `{shard}.e{epoch}.json` — link fails with FileExistsError if any
    attempt of this epoch already pinned its reach, so the pin is
    atomic WITH the content (no window where a crashed attempt leaves
    a pin that blocks its own retry from recording anything)."""
    d = _attained_dir(state_dir)
    os.makedirs(d, exist_ok=True)
    epoch = int(state.get("epoch") or 0)
    path = os.path.join(d, f"{shard_id}.e{epoch}.json")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f)
    try:
        os.link(tmp, path)
    except FileExistsError:
        pass  # a concurrent/earlier attempt already pinned this epoch
    except OSError:
        # filesystem without hard links: fall back to exclusive create
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            pass
        else:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _reap_attained(state_dir: str) -> None:
    """Driver-side (commit()) cleanup: drop per-epoch attained files
    older than each shard's max epoch, and legacy files superseded by
    any per-epoch file. Readers tolerate files vanishing mid-scan."""
    d = _attained_dir(state_dir)
    try:
        names = [n for n in os.listdir(d) if n.endswith(".json")]
    except OSError:
        return
    newest: dict[str, int] = {}
    for name in names:
        shard, epoch = _split_attained_name(name)
        if epoch is None:
            continue
        newest[shard] = max(newest.get(shard, -1), epoch)
    for name in names:
        shard, epoch = _split_attained_name(name)
        if shard not in newest:
            continue  # legacy-only shard: keep
        if epoch is None or epoch < newest[shard]:
            try:
                os.unlink(os.path.join(d, name))
            except OSError:
                pass


@dataclass
class KinesisShardPartition(InputPartition):
    """One live shard = one Spark input partition (A1/A4 parity: the
    reference's shard→bgworker assignment becomes Spark task
    scheduling over input partitions)."""

    shard_id: str
    start_seq: str | None  # committed position from the offset WAL
    from_reshard: bool  # child shard: start TRIM_HORIZON, not config
    epoch: int

    def __init__(self, shard_id, start_seq, from_reshard, epoch):
        # InputPartition.__init__ wants a single value; bypass it
        self.shard_id = shard_id
        self.start_seq = start_seq
        self.from_reshard = from_reshard
        self.epoch = epoch


class KinesisShardGroupPartition(InputPartition):
    """Several shards polled by ONE task, interleaved. When the live
    shard count exceeds the cluster's task slots, one-task-per-shard
    stops scaling: every micro-batch pays multiple scheduling waves
    (128 shards on 32 cores = 4 waves per 100 ms trigger). Packing
    shards round-robin into at most `maxPartitions` tasks keeps each
    batch a single wave — the same move as the Kafka source's
    partition packing. The task round-robins GetRecords calls ACROSS
    its shards (one call per ready shard per pass) because the
    reference's 4 req/s pacing is PER SHARD (pipeline_kinesis.c
    consumer pacing): while shard A's 250 ms window cools, shards
    B/C/D poll — a serial shard-by-shard drain would stack the
    pacing gaps and make a 4-shard group ~4x slower than one shard
    in catch-up. Per-shard semantics are untouched: pacing, per-batch
    record caps, and the attained-position replay pins all live
    inside the per-shard cursor."""

    shards: list  # [(shard_id, start_seq, from_reshard), ...]
    epoch: int

    def __init__(self, shards, epoch):
        self.shards = shards
        self.epoch = epoch


class KinesisStreamReader(DataSourceStreamReader):
    """Driver side: offset bookkeeping + per-shard partition planning.
    Executor side (`read`): the GetRecords polling protocol.

    The reader object is pickled to executors — it holds only plain
    option strings (clients are built lazily per call and cached
    module-side, never on self).
    """

    def __init__(self, options: dict) -> None:
        opts = {k.lower(): v for k, v in options.items()}
        self.opts = opts
        if not opts.get("streamname"):
            raise ValueError("streamName option is required")
        if not opts.get("statedir"):
            raise ValueError(
                "stateDir option is required (shared-storage dir for "
                "attained-position metadata; pair it 1:1 with the "
                "query's checkpointLocation)"
            )
        self.stream = opts["streamname"]
        self.state_dir = opts["statedir"]
        self.start_position = opts.get("startingposition", "latest").lower()
        if self.start_position not in (
            "trim_horizon",
            "latest",
        ) and not self.start_position.startswith("after_sequence_number:"):
            raise ValueError(
                f"unknown startingPosition {self.start_position!r}"
            )
        self.limit = int(opts.get("maxrecordsperfetch", DEFAULT_LIMIT))
        self.max_per_batch = int(
            opts.get(
                "maxrecordspershardperbatch",
                DEFAULT_MAX_PER_SHARD_PER_BATCH,
            )
        )
        self.rate = float(
            opts.get("maxfetchratepershard", DEFAULT_RATE_PER_SHARD)
        )
        # 0 = one partition per shard (exact A1/A4 parity); > 0 caps
        # the partitions per micro-batch, packing shards round-robin
        # into group partitions (KinesisShardGroupPartition)
        self.max_partitions = int(opts.get("maxpartitions", 0))
        self._epoch = 0

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:  # noqa: N802 — Spark API
        return {"epoch": 0, "shards": json.dumps({})}

    def latestOffset(self) -> dict:  # noqa: N802 — Spark API
        # epoch always advances so every trigger plans a batch (the
        # poll cadence IS the trigger cadence, like the rate source);
        # monotonic across restarts via the epoch file. The shards map
        # = positions attained through the last COMPLETED batch — i.e.
        # the start positions of the batch that will end at this
        # offset (frozen into the WAL so replays are
        # start-deterministic).
        #
        # The epoch file is persisted at PLAN time, not just commit
        # (r15, found by tools/fuzz_lifecycle.py --mode datasource):
        # persisting only in commit() leaves a one-batch window where
        # the checkpoint's commit log is ahead of the epoch file — a
        # stop landing between them made a restarted reader REUSE the
        # last epoch for a new batch with different start positions.
        # The attained pins are first-writer-wins PER EPOCH, so the
        # reused batch's reach could never be pinned, the next plan
        # regressed to the stale pin's position, and one batch's
        # records were fetched and published twice (exactly-once
        # breach). Planning itself now advances the high-water mark,
        # so no later incarnation can ever reuse a planned epoch.
        self._epoch = max(self._epoch, self._read_epoch()) + 1
        self._persist_epoch(self._epoch)
        attained = _read_attained(self.state_dir)
        shards = {
            sid: st["seq"]
            for sid, st in attained.items()
            if st.get("seq") is not None
        }
        return {"epoch": self._epoch, "shards": json.dumps(shards)}

    def _epoch_path(self) -> str:
        return os.path.join(self.state_dir, "epoch")

    def _read_epoch(self) -> int:
        try:
            with open(self._epoch_path()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return 0

    def _persist_epoch(self, epoch: int) -> None:
        """Advance the durable epoch high-water mark (never regress:
        plan-time and commit-time writers may interleave across query
        incarnations)."""
        if epoch <= self._read_epoch():
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = f"{self._epoch_path()}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(int(epoch)))
        os.replace(tmp, self._epoch_path())

    def commit(self, end: dict) -> None:
        # the batch ending at `end` is fully committed downstream.
        # The epoch high-water mark already advanced at plan time;
        # max-merge it here too (a restarted reader replaying a WAL
        # batch may commit an epoch the new incarnation never planned)
        self._persist_epoch(int(end.get("epoch", 0)))
        # committed → older epochs' attained pins can never bound a
        # replay again; reap them (driver-side, single process)
        _reap_attained(self.state_dir)

    # -- planning ----------------------------------------------------------

    def partitions(self, start: dict, end: dict):
        if start == end:
            return []
        starts = json.loads(end.get("shards") or "{}")
        # WAL `end.shards` carries this batch's frozen start positions
        # (see latestOffset); `start.shards` is one batch staler — fold
        # it in only for shards the newer map lacks (first batch after
        # a restart where attained files were wiped but the WAL wasn't)
        for sid, seq in json.loads(start.get("shards") or "{}").items():
            starts.setdefault(sid, seq)
        epoch = int(end.get("epoch", 0))
        client = _make_client(self.opts)
        shards = describe_all_shards(client, self.stream)
        meta = {s["ShardId"]: s for s in shards}
        attained = _read_attained(self.state_dir)

        def drained(sid: str) -> bool:
            st = attained.get(sid)
            return bool(
                st
                and st.get("closed")
                and st.get("seq") == starts.get(sid)
            )

        parts: list[KinesisShardPartition] = []
        for sid, sh in meta.items():
            if drained(sid):
                continue  # closed shard fully consumed: nothing left
            parents = [
                p
                for p in (
                    sh.get("ParentShardId"),
                    sh.get("AdjacentParentShardId"),
                )
                if p and p in meta
            ]
            if any(not drained(p) for p in parents):
                # reshard ordering: children wait for every parent to
                # drain (records keep per-key order across the split)
                continue
            parts.append(
                KinesisShardPartition(
                    shard_id=sid,
                    start_seq=starts.get(sid),
                    from_reshard=bool(parents),
                    epoch=epoch,
                )
            )
        if self.max_partitions and len(parts) > self.max_partitions:
            # more shards than allowed tasks: pack round-robin over a
            # stable (sorted) shard order so a shard maps to the same
            # group index while the live set is unchanged — iterator
            # caching in the attained files stays warm per shard
            groups: list[list] = [[] for _ in range(self.max_partitions)]
            for i, p in enumerate(
                sorted(parts, key=lambda p: p.shard_id)
            ):
                groups[i % self.max_partitions].append(
                    (p.shard_id, p.start_seq, p.from_reshard)
                )
            return [
                KinesisShardGroupPartition(g, epoch)
                for g in groups
                if g
            ]
        return parts

    # -- executor-side read ------------------------------------------------

    def read(self, partition):
        """One micro-batch's poll work for one TASK, on an executor:
        a single shard (KinesisShardPartition) or a packed group
        (KinesisShardGroupPartition) with one shared client. A group
        round-robins ONE GetRecords call per ready shard per pass, so
        per-shard pacing windows overlap across the group's shards
        instead of stacking serially (see KinesisShardGroupPartition).
        Emits RECORD_SCHEMA tuples; per-shard order is preserved
        (cross-shard interleaving carries no ordering contract)."""
        client = _make_client(self.opts)
        if isinstance(partition, KinesisShardGroupPartition):
            shards = [
                (sid, start_seq, fr, partition.epoch)
                for sid, start_seq, fr in partition.shards
            ]
        else:
            shards = [
                (
                    partition.shard_id,
                    partition.start_seq,
                    partition.from_reshard,
                    partition.epoch,
                )
            ]
        pending = [
            c
            for c in (_ShardCursor(self, *s) for s in shards)
            if not c.done
        ]
        while pending:
            progressed = False
            now = time.monotonic()
            for c in pending:
                if c.ready_at > now:
                    continue
                yield from c.step(client)
                progressed = True
                now = time.monotonic()
            nxt = []
            for c in pending:
                if c.done:
                    # write this shard's attained reach the moment its
                    # batch work completes (same timing as the old
                    # serial loop): first-writer-wins pins must exist
                    # before a speculative twin can finish
                    c.write_attained()
                else:
                    nxt.append(c)
            pending = nxt
            if pending and not progressed:
                wait = min(c.ready_at for c in pending) - time.monotonic()
                if wait > 0:
                    time.sleep(wait)


class _ShardCursor:
    """Resumable per-shard poll state for one micro-batch, ON AN
    EXECUTOR. ``step()`` makes at most ONE GetRecords call, so a packed
    group can interleave calls across its shards while each shard's
    pacing window (``ready_at``) cools. Stops (``done``) at the
    per-batch record cap, when caught up (empty response), or when the
    shard closes — exactly the old serial loop's exits, state-machined.
    """

    def __init__(self, reader, sid, start_seq, from_reshard, epoch):
        self.reader = reader
        self.sid = sid
        self.start_seq = start_seq
        self.from_reshard = from_reshard
        self.epoch = epoch
        self.last_seq = start_seq
        self.closed = False
        self.emitted = 0
        self.backoff = 0.0
        self.empty_polls = 0
        self.done = False
        self.skip_write = False
        self.ready_at = 0.0  # monotonic instant the next call may fire
        self.min_gap = 1.0 / reader.rate if reader.rate > 0 else 0.0

        attained = _read_attained_shard(reader.state_dir, sid)
        # Deterministic replay: if a previous ATTEMPT of this same
        # (epoch, start) already ran — its attained file records this
        # epoch and start — its reach becomes a hard END BOUND, so the
        # replay emits exactly the records the first attempt emitted
        # (never a longer tail the stream grew in between). Downstream
        # sinks that key on batch id may then either skip or rewrite
        # the batch; both are correct because the content is identical.
        self.bound = None
        if (
            attained.get("epoch") == epoch
            and attained.get("start") == start_seq
        ):
            self.bound = attained.get("seq")
            if self.bound == start_seq:
                # first attempt emitted nothing — the replay must too,
                # and the pin must survive untouched
                self.done = True
                self.skip_write = True
        self.iterator = None
        if attained.get("it") and attained.get("seq") == start_seq:
            # cached NextShardIterator from the previous batch — valid
            # only if it continues exactly from our committed start
            # (also carries sticky-latest across empty polls)
            self.iterator = attained["it"]

    def _acquire(self, client, seq: str | None) -> str:
        if seq is not None:
            kwargs = {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": seq,
            }
        elif self.from_reshard:
            kwargs = {"ShardIteratorType": "TRIM_HORIZON"}
        elif self.reader.start_position.startswith(
            "after_sequence_number:"
        ):
            kwargs = {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": self.reader.start_position.split(
                    ":", 1
                )[1],
            }
        else:
            kwargs = {
                "ShardIteratorType": self.reader.start_position.upper()
            }
        return client.get_shard_iterator(
            StreamName=self.reader.stream, ShardId=self.sid, **kwargs
        )["ShardIterator"]

    def step(self, client):
        """At most one GetRecords call; yields this call's RECORD_SCHEMA
        tuples. Start-to-start pacing: ready_at advances by min_gap per
        call, matching the old sleep-before-call spacing."""
        reader = self.reader
        if self.iterator is None:
            self.iterator = self._acquire(client, self.last_seq)
        self.ready_at = time.monotonic() + self.min_gap
        try:
            resp = client.get_records(
                ShardIterator=self.iterator,
                Limit=min(
                    reader.limit, reader.max_per_batch - self.emitted
                ),
            )
        except Exception as exc:  # noqa: BLE001 — classify by code
            code = _aws_error_code(exc)
            if "ProvisionedThroughputExceeded" in code:
                # bounded in-batch backoff; the next batch retries
                self.backoff += 1.0
                if self.backoff > 5.0:
                    self.done = True
                    return
                self.ready_at = time.monotonic() + self.backoff
                return
            if "ExpiredIterator" in code:
                self.iterator = None  # re-acquire from last_seq
                return
            raise
        self.backoff = 0.0
        recs = resp["Records"]
        for rec in recs:
            self.last_seq = rec["SequenceNumber"]
            data = rec["Data"]
            self.emitted += 1
            yield (
                data.decode("utf-8", "replace")
                if isinstance(data, (bytes, bytearray))
                else data,
                rec["SequenceNumber"],
                rec.get("PartitionKey"),
                rec.get("ApproximateArrivalTimestamp"),
                self.sid,
            )
            if self.bound is not None and self.last_seq == self.bound:
                # replay reached the pinned end, possibly MID-
                # response: the response's NextShardIterator points
                # past records not emitted — discard it so the next
                # batch re-acquires AFTER the bound and reads them
                self.done = True
                self.iterator = None
                return
        nxt = resp.get("NextShardIterator")
        if nxt is None:
            self.closed = True
            self.iterator = None
            self.done = True
            return
        self.iterator = nxt
        if not recs:
            if self.bound is not None and self.empty_polls < 100:
                # pinned replay: the bound's records were read once
                # already, so they exist — keep polling (bounded,
                # in case retention expired them meanwhile)
                self.empty_polls += 1
                return
            # caught up; keep the iterator for the next batch
            self.done = True
            return
        if self.emitted >= reader.max_per_batch:
            self.done = True

    def write_attained(self) -> None:
        if self.skip_write:
            return
        _write_attained(
            self.reader.state_dir,
            self.sid,
            {
                "seq": self.last_seq,
                "it": self.iterator,
                "closed": self.closed,
                # replay pinning (see `bound` above): which (epoch,
                # start) produced this reach
                "epoch": self.epoch,
                "start": self.start_seq,
            },
        )


class KinesisDataSource(DataSource):
    """``spark.readStream.format("pipeline_kinesis")`` — executor-
    parallel Kinesis ingestion. Register with
    ``spark.dataSource.register(KinesisDataSource)``.

    Options (case-insensitive):
      streamName (required), stateDir (required, shared storage),
      region, endpointUrl, credfile, startingPosition
      (trim_horizon | latest | after_sequence_number:X),
      maxRecordsPerFetch (GetRecords limit, default 1000),
      maxRecordsPerShardPerBatch (default 10000),
      maxFetchRatePerShard (req/s, default 4 — reference pacing),
      clientFactory ("module:attr" test seam returning a boto3-shaped
      client).
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return RECORD_SCHEMA

    def streamReader(self, schema: StructType) -> KinesisStreamReader:  # noqa: N802
        return KinesisStreamReader(self.options)


def register(spark) -> None:
    """Register the format with this SparkSession AND switch this
    module to pickle-by-value, so the planner process and executor
    workers receive the classes inside the pickle instead of needing
    ``pipeline_kinesis_spark`` on their sys.path (see SELF-CONTAINMENT
    CONTRACT above). Idempotent."""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(KinesisDataSource)
