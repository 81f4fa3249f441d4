"""Catalog CRUD semantics (reference catalog tables + locking, A15-A19)."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.catalog import (
    Catalog,
    Consumer,
    Endpoint,
    StreamDef,
    ViewDef,
)


@pytest.fixture
def cat(tmp_path):
    return Catalog(str(tmp_path / "meta"))


def test_endpoint_crud(cat):
    cat.add_endpoint(Endpoint("ep1", region="us-east-1", url="/tmp/x"))
    assert cat.endpoint("ep1").region == "us-east-1"
    cat.remove_endpoint("ep1")
    with pytest.raises(KeyError):
        cat.endpoint("ep1")


def test_endpoint_remove_blocked_by_consumer(cat):
    cat.add_endpoint(Endpoint("ep1", url="/tmp/x"))
    cat.upsert_consumer(Consumer(0, "ep1", "s", "rel"))
    with pytest.raises(ValueError, match="active consumers"):
        cat.remove_endpoint("ep1")


def test_consumer_upsert_is_idempotent(cat):
    # reference upserts on (endpoint, stream, relation)
    # (pipeline_kinesis.c:861-865)
    cat.add_endpoint(Endpoint("ep1", url="/tmp/x"))
    c1 = cat.upsert_consumer(Consumer(0, "ep1", "s", "rel", batchsize=100))
    c2 = cat.upsert_consumer(Consumer(0, "ep1", "s", "rel", batchsize=500))
    assert c1.id == c2.id
    assert cat.find_consumer("ep1", "s", "rel").batchsize == 500


def test_stream_drop_blocked_by_view(cat):
    cat.create_stream(StreamDef("st", "payload STRING"))
    cat.create_view(ViewDef("v", "SELECT 1", stream="st"))
    with pytest.raises(ValueError, match="continuous views"):
        cat.drop_stream("st")
    cat.drop_view("v")
    cat.drop_stream("st")


def test_view_requires_stream(cat):
    with pytest.raises(KeyError):
        cat.create_view(ViewDef("v", "SELECT 1", stream="missing"))


def test_persistence_across_instances(cat, tmp_path):
    cat.add_endpoint(Endpoint("ep1", url="/tmp/x"))
    cat.create_stream(StreamDef("st", "payload STRING"))
    reloaded = Catalog(str(tmp_path / "meta"))
    assert reloaded.endpoint("ep1").url == "/tmp/x"
    assert reloaded.stream("st").schema_ddl == "payload STRING"
