"""Streaming multimodal integration (C5 × B2): media payloads ingested
through the engine's stream path and DECODED inside a continuous view —
the codec layer composing with the streaming micro-batch architecture
via an Arrow-batched pandas UDF over the binary column."""

from __future__ import annotations

import base64
import json

import numpy as np
import pandas as pd
import pytest

from pyspark.sql.functions import pandas_udf

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.operators.multimodal import (
    encode_bmp,
    encode_png,
)
from pipeline_kinesis_spark.operators.tiff import encode_tiff
from pipeline_kinesis_spark.sources.file_replay import write_record_file


@pytest.fixture
def engine(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    yield eng
    eng.consume_end_all()


def test_media_decode_inside_continuous_view(engine, spark, tmp_path):
    @pandas_udf("long")
    def media_level(payloads: pd.Series) -> pd.Series:
        # import inside the UDF: runs on Python workers
        from pipeline_kinesis_spark.operators.multimodal import decode_media

        return payloads.map(lambda p: int(decode_media(bytes(p)).min()))

    spark.udf.register("media_level", media_level)

    # solid images with known levels across three containers
    clips = [
        ("png", 17, encode_png),
        ("bmp", 101, encode_bmp),
        ("tiff", 200, encode_tiff),
        ("png", 17, encode_png),  # dup level to exercise the group-by
    ]
    records = []
    for kind, level, enc in clips:
        px = np.full((6, 4, 3), level, dtype=np.uint8)
        records.append(
            {
                "data": json.dumps(
                    {
                        "kind": kind,
                        "payload_b64": base64.b64encode(enc(px)).decode(),
                    }
                )
            }
        )
    src_root = tmp_path / "kinesis"
    write_record_file(str(src_root / "media"), records)

    engine.add_endpoint("ep", url=str(src_root))
    engine.create_stream("media_stream", "kind STRING, payload_b64 STRING")
    engine.create_continuous_view(
        "media_levels",
        """
        SELECT kind,
               count(*) AS n,
               sum(media_level(unbase64(payload_b64))) AS level_sum
        FROM media_stream
        GROUP BY kind
        """,
        stream="media_stream",
    )
    engine.consume_begin("ep", "media", "media_stream", fmt="json")
    engine.wait_for_ingest()
    rows = {
        r.kind: (r.n, r.level_sum)
        for r in spark.table("media_levels").collect()
    }
    assert rows == {"png": (2, 34), "bmp": (1, 101), "tiff": (1, 200)}
