from pipeline_kinesis_spark.sources.records import RECORD_SCHEMA
from pipeline_kinesis_spark.sources.file_replay import (
    FileReplaySource,
    write_record_file,
)

__all__ = ["RECORD_SCHEMA", "FileReplaySource", "write_record_file"]
