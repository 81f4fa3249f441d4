from pipeline_kinesis_spark.plans.inspect import (
    explain_str,
    has_pushed_filters,
    scan_columns,
)

__all__ = ["explain_str", "has_pushed_filters", "scan_columns"]
