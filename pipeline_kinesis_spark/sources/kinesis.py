"""Kinesis source adapter — the production counterpart of FileReplaySource.

Maps the reference's endpoint/consumer surface (pipeline_kinesis--0.9.0.sql:
4-25; kinesis_add_endpoint args region/credfile/url, pipeline_kinesis.c:
120-188) onto a Structured Streaming source configuration. The actual wire
protocol needs a Kinesis connector on the Spark classpath (or boto3 for a
driver-side shard lister); neither ships in this environment, so the
network path is import-gated — everything testable without AWS (config
validation, start-position → ShardIteratorType resolution, option
assembly) is real and tested.

Reference flow parity:
- shard discovery (DescribeStream, kinesis_consumer.cpp:200-234)
  → connector `describeShardInterval` / planInputPartitions
- iterator resolution (GetShardIterator, kinesis_consumer.cpp:258-325)
  → `startingPosition` option, resolved per shard from checkpoints
- GetRecords pacing/backoff (kinesis_consumer.cpp:364-434)
  → connector fetch-interval/maxFetchRate options
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_ITERATOR_TYPES = {
    "trim_horizon": "TRIM_HORIZON",
    "latest": "LATEST",
}


def iterator_type(start_position: str) -> tuple[str, str | None]:
    """start_position → (ShardIteratorType, seqnum or None) — the analog
    of parse_seqnum/format_seqnum (pipeline_kinesis.c:587-605)."""
    if start_position in _ITERATOR_TYPES:
        return _ITERATOR_TYPES[start_position], None
    if start_position.startswith("after_sequence_number:"):
        return "AFTER_SEQUENCE_NUMBER", start_position.split(":", 1)[1]
    raise ValueError(f"unknown start_position {start_position!r}")


@dataclass
class KinesisSource:
    """Config for one Kinesis stream consumer (endpoints row analog)."""

    stream_name: str
    region: str
    endpoint_url: str | None = None  # LocalStack/VPC endpoints
    credfile: str | None = None
    start_position: str = "latest"
    max_fetch_rate_per_shard: float = 4.0  # reqs/s — reference pacing
    batch_size: int = 1000  # GetRecords limit — reference batchsize

    def __post_init__(self) -> None:
        if not self.stream_name:
            raise ValueError("stream_name is required")
        if not self.region:
            raise ValueError("region is required")
        iterator_type(self.start_position)  # validate eagerly
        if self.batch_size < 1 or self.batch_size > 10_000:
            raise ValueError("batch_size must be in [1, 10000]")  # AWS limit

    def reader_options(self) -> dict[str, str]:
        """Options a Kinesis Structured Streaming connector consumes."""
        it, seq = iterator_type(self.start_position)
        opts = {
            "streamName": self.stream_name,
            "region": self.region,
            "startingPosition": it,
            "maxFetchRatePerShard": str(self.max_fetch_rate_per_shard),
            "maxRecordsPerFetch": str(self.batch_size),
        }
        if seq is not None:
            opts["startingSequenceNumber"] = seq
        if self.endpoint_url:
            opts["endpointUrl"] = self.endpoint_url
        if self.credfile:
            opts["awsCredentialsFile"] = self.credfile
        return opts

    def read_stream(self, spark: SparkSession) -> DataFrame:
        try:
            import boto3  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "Kinesis connectivity needs boto3 (driver-side shard "
                "listing) or a Kinesis Structured Streaming connector on "
                "the Spark classpath; neither is available in this "
                "environment. Assemble the reader with reader_options() "
                "against your connector: spark.readStream.format('"
                "aws-kinesis').options(**src.reader_options()).load()"
            ) from exc
        raise NotImplementedError(
            "driver-side boto3 polling source is not implemented; use a "
            "JVM Kinesis connector with reader_options()"
        )
