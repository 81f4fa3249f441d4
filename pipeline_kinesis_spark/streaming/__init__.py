from pipeline_kinesis_spark.streaming.continuous_view import (
    compile_view,
    upsert_to_parquet,
)

__all__ = ["compile_view", "upsert_to_parquet"]
