"""Batch scan parity across storage formats (SURVEY.md B3).

The engine's canonical storage is parquet; CSV and JSON scans take the
same declarative path (schema + reader options mirroring the COPY options,
pipeline_kinesis.c:260-286) so Catalyst retains pushdown/pruning where the
format allows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = True,
) -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        reader = (
            spark.read.option("sep", delimiter)
            .option("quote", quote)
            .option("escape", escape)
            .option("header", header)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        )
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return reader.csv(path)
    if fmt == "json":
        reader = spark.read.option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    raise ValueError(f"unsupported format {fmt!r}")
