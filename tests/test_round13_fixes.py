"""Regressions for the round-13 fix batch (VERDICT r12 "what's wrong"
#3 + the four ADVICE r12 items):

- FakeKinesisClient.fault_plan pins wire faults to a (shard, call
  ordinal) instead of "whichever shard polls next", so the reshard
  rows' documented injection points are per-run facts;
- reshard()/merge() publish child metadata BEFORE the child shard
  itself, closing the describe_stream window where a child could be
  seen parentless (the poller registers a shard once);
- streaming_datasource_counts saves/restores a pre-existing
  AWS_SHARED_CREDENTIALS_FILE instead of popping it, and acquires the
  HTTP server / engine inside its try so a setup failure cannot leak
  them.
"""

from __future__ import annotations

import os

import pytest

from pipeline_kinesis_spark.sources.fake_kinesis import (
    ExpiredIteratorException,
    FakeKinesisClient,
    ProvisionedThroughputExceededException,
)


def test_fault_plan_pins_faults_to_shard_and_call():
    fake = FakeKinesisClient(
        {"shardId-000": [b"a", b"b"], "shardId-001": [b"c"]}
    )
    fake.fault_plan["shardId-000"] = ["throttle"]
    fake.fault_plan["shardId-001"] = [None, "expire"]

    # 001's first call passes (pops the None) and delivers
    out = fake.get_records("shardId-001@0", 100)
    assert [r["Data"] for r in out["Records"]] == [b"c"]

    # 000's first call throttles; the retry (same iterator) delivers
    with pytest.raises(ProvisionedThroughputExceededException):
        fake.get_records("shardId-000@0", 100)
    out = fake.get_records("shardId-000@0", 100)
    assert [r["Data"] for r in out["Records"]] == [b"a", b"b"]

    # 001's second call expires — AFTER it delivered a last_seq, which
    # is exactly the ordering the pump tests assert on
    with pytest.raises(ExpiredIteratorException):
        fake.get_records("shardId-001@1", 100)
    # plan exhausted: subsequent calls pass
    assert fake.get_records("shardId-001@1", 100)["Records"] == []


def test_fault_plan_unskippable_before_closed_drain():
    """A closed shard cannot be marked drained (NextShardIterator=None)
    without a successful read — so a planned fault is consumed even if
    the shard closes before its next poll."""
    fake = FakeKinesisClient({"shardId-000": [b"a"]})
    assert (
        fake.get_records("shardId-000@0", 100)["NextShardIterator"]
        is not None
    )
    fake.fault_plan["shardId-000"] = ["expire"]
    fake.closed.add("shardId-000")
    with pytest.raises(ExpiredIteratorException):
        fake.get_records("shardId-000@1", 100)
    out = fake.get_records("shardId-000@1", 100)
    assert out["Records"] == [] and out["NextShardIterator"] is None


def test_reshard_publishes_meta_before_child_shard():
    """describe_stream joins self.shards against self.meta; a child
    visible without its ParentShardId would be registered parentless by
    the (once-only) poller. Guard the insert order by intercepting the
    shards dict: at the moment the child key appears, its meta row must
    already exist."""

    class OrderCheckingDict(dict):
        def __init__(self, owner_meta_getter):
            super().__init__()
            self._meta = owner_meta_getter

        def __setitem__(self, key, value):
            meta = self._meta()
            if key not in self:
                assert key in meta, (
                    f"child {key} published before its metadata"
                )
            super().__setitem__(key, value)

    fake = FakeKinesisClient({"shardId-000": [b"a"]})
    checked = OrderCheckingDict(lambda: fake.meta)
    checked.update(fake.shards)
    fake.shards = checked

    fake.reshard("shardId-000", ["shardId-002", "shardId-003"])
    assert fake.meta["shardId-002"] == {"ParentShardId": "shardId-000"}

    fake.merge(["shardId-002", "shardId-003"], "shardId-004")
    assert fake.meta["shardId-004"] == {
        "ParentShardId": "shardId-002",
        "AdjacentParentShardId": "shardId-003",
    }
    # and the merged child is listed with full lineage
    desc = fake.describe_stream("events")["StreamDescription"]["Shards"]
    by_id = {s["ShardId"]: s for s in desc}
    assert by_id["shardId-004"]["AdjacentParentShardId"] == "shardId-003"


def test_datasource_row_preserves_preexisting_credfile_env(
    spark, sf_dir, tmp_path
):
    """VERDICT r12 #3 / ADVICE #4: a host-level
    AWS_SHARED_CREDENTIALS_FILE must survive the datasource gate row
    (the old finally popped it unconditionally)."""
    from pipeline_kinesis_spark.gates.streaming import (
        streaming_datasource_counts,
    )

    sentinel = str(tmp_path / "host_creds")
    prior = os.environ.get("AWS_SHARED_CREDENTIALS_FILE")
    os.environ["AWS_SHARED_CREDENTIALS_FILE"] = sentinel
    try:
        df = streaming_datasource_counts(spark, sf_dir)
        assert df.count() >= 0
        assert os.environ.get("AWS_SHARED_CREDENTIALS_FILE") == sentinel
    finally:
        if prior is None:
            os.environ.pop("AWS_SHARED_CREDENTIALS_FILE", None)
        else:
            os.environ["AWS_SHARED_CREDENTIALS_FILE"] = prior


def test_hostile_dht_rejected_fast():
    """Decoder-fuzz r13 finding (seed 130816, avi pass 36 case 40): a
    DHT whose BITS overflow the canonical 16-bit code space must be
    rejected up front — building its tables used to resize the 64 KiB
    lookup bytearray on every straddling slice-assign (O(n^2) memmove,
    ~53 s CPU for one 2.5 KB payload)."""
    import time

    import pytest

    from pipeline_kinesis_spark.operators.multimodal import (
        _build_huff_decoder,
    )

    t0 = time.process_time()
    with pytest.raises(ValueError, match="code space"):
        _build_huff_decoder([255] * 16, list(range(256)) * 16, is_dc=False)
    with pytest.raises(ValueError, match="BITS declares more"):
        _build_huff_decoder(
            [2] + [0] * 15, [0], is_dc=True
        )
    assert time.process_time() - t0 < 1.0
    # a valid K.3-style tiny table still builds
    sym, ln, tot, val = _build_huff_decoder(
        [0, 1, 1] + [0] * 13, [3, 7], is_dc=True
    )
    assert len(sym) == 1 << 16
