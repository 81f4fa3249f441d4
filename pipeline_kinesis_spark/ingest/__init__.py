from pipeline_kinesis_spark.ingest.parse import parse_records, split_quarantine

__all__ = ["parse_records", "split_quarantine"]
