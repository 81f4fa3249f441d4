"""Property test: CSV parse round-trip through parse_records — any field
content the csv writer can encode (delimiters, quotes, newlines-free
text) must come back intact (A6 COPY-format parity)."""

from __future__ import annotations

import csv
import io

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_kinesis_spark.ingest.parse import parse_records, split_quarantine

# printable, no newlines (the framing is line-based, as in the reference's
# \n-joined COPY buffer, pipeline_kinesis.c:725-726)
_field = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126
    ),
    min_size=0,
    max_size=40,
)


def _csv_line(fields: list[str], delim: str) -> str:
    buf = io.StringIO()
    csv.writer(
        buf,
        delimiter=delim,
        quotechar='"',
        escapechar="\\",
        quoting=csv.QUOTE_ALL,
        lineterminator="",
        doublequote=False,
    ).writerow(fields)
    return buf.getvalue()


@pytest.mark.parametrize("delim", [",", "\t", "|"])
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(_field, _field), min_size=1, max_size=8))
def test_csv_roundtrip(spark, delim, rows):
    payloads = [_csv_line(list(r), delim) for r in rows]
    records = spark.createDataFrame(
        [(p, str(i), None, None, "shard-0") for i, p in enumerate(payloads)],
        "data STRING, sequence_number STRING, partition_key STRING, "
        "approximate_arrival_timestamp TIMESTAMP, shard_id STRING",
    )
    parsed = parse_records(
        records, "a STRING, b STRING", fmt="csv", delimiter=delim
    )
    good, bad = split_quarantine(parsed)
    assert bad.count() == 0, bad.collect()
    got = {
        (r.sequence_number, r.a or "", r.b or "")
        for r in good.collect()
    }
    want = {(str(i), r[0], r[1]) for i, r in enumerate(rows)}
    # QUOTE_ALL writes empty fields as "" which parse as empty string or
    # null depending on engine — both normalize to "" above
    assert got == want
