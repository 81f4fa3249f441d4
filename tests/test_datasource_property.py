"""Property test over the executor-side shard read path (A1/A9/A12).

The round-9 interleaved group cursor (`_ShardCursor`) replaced the
serial per-shard loop at the heart of the exactly-once contract, so
this randomizes what the unit tests pin individually: shard count,
per-shard record counts (including empty shards), GetRecords page
size, group packing factor, and throttle/expired-iterator fault
injection — and asserts the three invariants that define the path:

1. completeness+order: one planned batch emits every record once, in
   per-shard order (cross-shard interleaving carries no contract);
2. pinned replay: re-reading the same (start, end) offsets after LATE
   records arrived re-emits exactly the first attempt's rows;
3. no loss across batches: the late records all arrive in the next
   planned batch, exactly once.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_kinesis_datasource import _reader
from tests.test_kinesis_protocol import FakeKinesisClient


def _by_shard(rows):
    out: dict[str, list[str]] = {}
    for t in rows:
        out.setdefault(t[4], []).append(t[0])
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(0, 12), min_size=1, max_size=6),
    page=st.integers(1, 7),
    maxp=st.integers(0, 4),
    throttle=st.integers(0, 1),
    expire=st.integers(0, 1),
)
def test_read_path_invariants(counts, page, maxp, throttle, expire):
    shards = {
        f"shardId-{i:03d}": [
            f"{i}-{j:03d}".encode() for j in range(n)
        ]
        for i, n in enumerate(counts)
    }
    expected = {
        s: [d.decode() for d in recs] for s, recs in shards.items()
    }
    fake = FakeKinesisClient(shards, page_size=page)
    wd = tempfile.mkdtemp(prefix="kdsprop_")

    class _P:  # duck-typed tmp_path for _reader
        def __truediv__(self, name):
            return f"{wd}/{name}"

    try:
        r = _reader(_P(), fake, maxPartitions=str(maxp))
        fake.throttle_next = throttle
        fake.expire_next = expire

        o0 = r.initialOffset()
        o1 = r.latestOffset()
        parts = r.partitions(o0, o1)
        first = [t for p in parts for t in r.read(p)]
        assert _by_shard(first) == {
            s: v for s, v in expected.items() if v
        }
        # every shard appends a LATE record between attempts; the
        # replay of the SAME offsets must not widen
        for s in shards:
            fake.append(s, f"{s}-late".encode())
        replay = [t for p in r.partitions(o0, o1) for t in r.read(p)]
        assert sorted((t[4], t[1]) for t in replay) == sorted(
            (t[4], t[1]) for t in first
        )
        r.commit(o1)

        o2 = r.latestOffset()
        second = [
            t for p in r.partitions(o1, o2) for t in r.read(p)
        ]
        assert _by_shard(second) == {
            s: [f"{s}-late"] for s in shards
        }
        # exactly-once across both batches: all seqs distinct
        seqs = [t[1] for t in first + second]
        assert len(seqs) == len(set(seqs))
    finally:
        shutil.rmtree(wd, ignore_errors=True)
