"""Kinesis adapter config surface (network path is environment-gated)."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.sources.kinesis import (
    KinesisSource,
    iterator_type,
)


def test_iterator_type_mapping():
    assert iterator_type("trim_horizon") == ("TRIM_HORIZON", None)
    assert iterator_type("latest") == ("LATEST", None)
    assert iterator_type("after_sequence_number:495731") == (
        "AFTER_SEQUENCE_NUMBER",
        "495731",
    )
    with pytest.raises(ValueError):
        iterator_type("yesterday")


def test_reader_options_assembly():
    src = KinesisSource(
        stream_name="test",
        region="us-east-1",
        endpoint_url="http://localhost:4566",
        credfile="/tmp/creds",
        start_position="after_sequence_number:42",
        batch_size=500,
    )
    opts = src.reader_options()
    assert opts["streamName"] == "test"
    assert opts["startingPosition"] == "AFTER_SEQUENCE_NUMBER"
    assert opts["startingSequenceNumber"] == "42"
    assert opts["endpointUrl"] == "http://localhost:4566"
    assert opts["maxRecordsPerFetch"] == "500"
    assert float(opts["maxFetchRatePerShard"]) == 4.0  # reference pacing


def test_config_validation():
    with pytest.raises(ValueError, match="stream_name"):
        KinesisSource(stream_name="", region="us-east-1")
    with pytest.raises(ValueError, match="region"):
        KinesisSource(stream_name="s", region="")
    with pytest.raises(ValueError, match="batch_size"):
        KinesisSource(stream_name="s", region="r", batch_size=100_000)
    with pytest.raises(ValueError, match="start_position"):
        KinesisSource(stream_name="s", region="r", start_position="nope")


def test_read_stream_builds_datasource_stream(spark, tmp_path):
    """read_stream (executor-parallel DataSource path) needs no network
    to PLAN: it registers the format and returns a streaming DataFrame
    in RECORD_SCHEMA; polling happens only once a query starts."""
    from pipeline_kinesis_spark.sources.records import RECORD_SCHEMA

    src = KinesisSource(stream_name="s", region="us-east-1")
    with pytest.raises(TypeError):
        src.read_stream(spark)  # state_dir is required
    df = src.read_stream(spark, state_dir=str(tmp_path / "state"))
    assert df.isStreaming
    assert df.schema == RECORD_SCHEMA
