"""Row-at-a-time Python UDF surface (B27).

Present for API completeness — the reference's extension mechanism is
per-call C UDFs (pipeline_kinesis--0.9.0.sql:33-83). Row UDFs serialize
row-by-row through Python and are ~10-100× slower than the Arrow-batched
pandas UDFs in operators/pandas_udfs.py; keep them OUT of hot paths.
"""

from __future__ import annotations

from pyspark.sql.functions import udf
from pyspark.sql.types import StringType


@udf(returnType=StringType())
def classify_priority(priority: str | None) -> str | None:
    """Example scalar row UDF: bucket order priorities."""
    if priority is None:
        return None
    return "expedite" if priority.split("-")[0] in ("1", "2") else "normal"
