"""Record-payload parsing with COPY-option parity.

The reference hands record bytes to Postgres ``COPY ... FROM`` in text or
csv format with configurable delimiter/quote/escape
(pipeline_kinesis.c:224-334; defaults format='text', delimiter=E'\\t',
pipeline_kinesis--0.9.0.sql:54-57) and drops the whole batch on a parse
error (pipeline_kinesis.c:740-758). Here:

- text   → from_csv with the delimiter and quoting disabled (COPY text
           has no quote processing);
- csv    → from_csv with sep/quote/escape options;
- json   → from_json (superset of the reference);
- errors → per-ROW dead-letter quarantine instead of batch drop: the
           corrupt payload is preserved with its source metadata, good rows
           flow on — strictly better than the reference's semantics (§3.4).

The engine injects ``arrival_timestamp`` (source arrival time if present,
else processing time), excluded from the user-declared columns exactly as
the reference excludes it from the COPY attr list
(pipeline_kinesis.c:247-257).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"
_FORMATS = ("text", "csv", "json")


def _schema_with_corrupt(schema_ddl: str) -> str:
    return f"{schema_ddl}, {CORRUPT_COL} STRING"


def parse_records(
    records: DataFrame,
    schema_ddl: str,
    fmt: str = "text",
    delimiter: str = "\t",
    quote: str | None = None,
    escape: str | None = None,
) -> DataFrame:
    """records (RECORD_SCHEMA) → typed rows + arrival_timestamp + lineage.

    Output columns: declared stream columns, arrival_timestamp, plus
    lineage (sequence_number, shard_id) and CORRUPT_COL (null for good
    rows). Works identically on batch and streaming DataFrames.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt!r}")
    declared = StructType.fromDDL(schema_ddl)
    if "arrival_timestamp" in [f.name for f in declared.fields]:
        # Reference behavior: user cannot supply arrival_timestamp
        # (pipeline_kinesis.c:247-257).
        raise ValueError("arrival_timestamp is engine-injected; do not declare it")

    if fmt == "json":
        parsed = F.from_json(
            F.col("data"),
            _schema_with_corrupt(schema_ddl),
            {"columnNameOfCorruptRecord": CORRUPT_COL, "mode": "PERMISSIVE"},
        )
    else:
        options = {
            "sep": delimiter,
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": CORRUPT_COL,
        }
        if fmt == "csv":
            options["quote"] = quote or '"'
            options["escape"] = escape or "\\"
        else:  # COPY text format: no quote/escape processing
            options["quote"] = ""
        parsed = F.from_csv(
            F.col("data"), _schema_with_corrupt(schema_ddl), options
        )

    out = records.withColumn("_parsed", parsed).select(
        "data",
        *[F.col(f"_parsed.{f.name}") for f in declared.fields],
        F.col(f"_parsed.{CORRUPT_COL}"),
        F.coalesce(
            F.col("approximate_arrival_timestamp"),
            F.current_timestamp(),
        ).alias("arrival_timestamp"),
        "sequence_number",
        "shard_id",
    )
    # from_csv PERMISSIVE quirk: rows with too FEW fields yield nulls, not
    # a corrupt record. Flag all-null parses of non-null data as corrupt —
    # but only when the raw line can't even have carried the declared
    # field count (fewer than n-1 delimiters), so a legitimately all-empty
    # row ('"",""' → null,null) is NOT quarantined.
    all_null = F.lit(True)
    for f in declared.fields:
        all_null = all_null & F.col(f.name).isNull()
    if fmt == "json":
        too_short = F.lit(True)
    else:
        too_short = (
            F.size(F.split(F.col("data"), re.escape(delimiter), -1)) - 1
            < len(declared.fields) - 1
        )
    return out.withColumn(
        CORRUPT_COL,
        F.when(
            F.col(CORRUPT_COL).isNotNull(), F.col(CORRUPT_COL)
        ).when(
            all_null & F.col("data").isNotNull() & too_short,
            F.col("data"),
        ),
    ).drop("data")


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without CORRUPT_COL, dead-letter rows)."""
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad
