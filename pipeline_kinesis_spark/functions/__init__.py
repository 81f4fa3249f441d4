"""Scalar/aggregate expression helpers shared by the operator library."""

from pipeline_kinesis_spark.functions.exprs import (
    cents,
    sum_cents,
    revenue_cents,
    tokens,
)

__all__ = ["cents", "sum_cents", "revenue_cents", "tokens"]
