"""Canonical source-record schema.

Mirrors the reference's record accessors (kinesis_consumer.cpp:473-501):
data blob, opaque sequence number (text — Kinesis seqnums exceed 128 bits,
README.md:121-126), partition key, approximate arrival timestamp; plus the
shard id the record came from (README.md:119-126).
"""

from __future__ import annotations

from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("data", StringType(), True),
        StructField("sequence_number", StringType(), False),
        StructField("partition_key", StringType(), True),
        StructField(
            "approximate_arrival_timestamp", TimestampType(), True
        ),
        StructField("shard_id", StringType(), False),
    ]
)
