"""A standing corpus-curation pipeline, end to end: the C6 operators run
not as batch queries but as the engine's own continuous surface —

    raw_docs stream
      → CONTINUOUS TRANSFORM doc_scrub   (PII redaction + quality gate,
                                          row-wise, append mode)
      → corpus_clean relation            (the curated training corpus)
      → CONTINUOUS VIEW clean_stats      (per-source doc/redaction counts)

across multiple micro-batches with a process restart in the middle —
exactly-once all the way through (no lost, no duplicated curated docs).
Documented in COVERAGE.md §standing-curation.
"""

from __future__ import annotations

import json

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.operators.quality import PII_EMAIL, PII_PHONE
from pipeline_kinesis_spark.sources.file_replay import write_record_file

# Row-wise curation SQL: redact emails/phones, drop junk docs (empty or
# one-word). Same regexes as the batch pii_redact operator — the point of
# the test is that the SAME curation logic runs as a standing query.
# Backslashes double because Spark SQL single-quoted literals treat \ as
# an escape (escapedStringLiterals=false default).
_EMAIL = PII_EMAIL.replace("\\", "\\\\")
_PHONE = PII_PHONE.replace("\\", "\\\\")
_SCRUB_SQL = f"""
SELECT
  doc_id,
  source,
  regexp_replace(
    regexp_replace(text, '{_PHONE}', '<PHONE>'),
    '{_EMAIL}', '<EMAIL>') AS text,
  (text RLIKE '{_EMAIL}') OR (text RLIKE '{_PHONE}') AS was_redacted
FROM raw_docs
WHERE length(trim(text)) > 0 AND size(split(trim(text), '\\\\s+')) >= 2
"""

_STATS_SQL = """
SELECT source,
       count(*) AS n_docs,
       sum(CASE WHEN was_redacted THEN 1 ELSE 0 END) AS n_redacted
FROM corpus_clean
GROUP BY source
"""


def _docs(rows, start):
    return [
        {
            "data": json.dumps(r),
            "sequence_number": f"{i:056d}",
            "shard_id": "shardId-000000000000",
        }
        for i, r in enumerate(rows, start)
    ]


def _provision(spark, meta_dir, src_root):
    eng = Engine(spark, metadata_dir=meta_dir)
    eng.add_endpoint("ep", url=str(src_root))
    return eng


def test_standing_curation_pipeline_restart_exactly_once(spark, tmp_path):
    meta = str(tmp_path / "meta")
    src_root = tmp_path / "kinesis"

    batch1 = [
        {"doc_id": 1, "source": "web", "text": "hello world write bob@x.io"},
        {"doc_id": 2, "source": "web", "text": "   "},  # junk: empty
        {"doc_id": 3, "source": "books", "text": "call +1 (555) 123-4567 now"},
        {"doc_id": 4, "source": "books", "text": "single"},  # junk: 1 word
        {"doc_id": 5, "source": "web", "text": "clean document two"},
    ]
    batch2 = [
        {"doc_id": 6, "source": "web", "text": "more text a@b.co here"},
        {"doc_id": 7, "source": "books", "text": "plain prose continues"},
    ]

    eng = _provision(spark, meta, src_root)
    try:
        eng.create_stream(
            "raw_docs", "doc_id BIGINT, source STRING, text STRING"
        )
        eng.create_continuous_transform(
            "doc_scrub", _SCRUB_SQL, stream="raw_docs",
            sink_relation="corpus_clean",
        )
        eng.create_continuous_view(
            "clean_stats", _STATS_SQL, stream="corpus_clean"
        )
        eng.consume_begin("ep", "s", "raw_docs", fmt="json")
        write_record_file(str(src_root / "s"), _docs(batch1, 1))
        eng.wait_for_ingest()

        clean = {
            r.doc_id: (r.text, r.was_redacted)
            for r in eng.stream_table("corpus_clean").collect()
        }
        assert set(clean) == {1, 3, 5}  # junk docs 2 and 4 dropped
        assert clean[1][0] == "hello world write <EMAIL>"
        assert clean[3][0] == "call <PHONE> now"
        assert clean[5] == ("clean document two", False)
        stats = {
            r.source: (r.n_docs, r.n_redacted)
            for r in spark.table("clean_stats").collect()
        }
        assert stats == {"web": (2, 1), "books": (1, 1)}
    finally:
        eng.consume_end_all()

    # ---- process restart: fresh Engine over the same metadata dir ----
    # batch 2 arrives while the pipeline is down; on resume the curated
    # corpus must contain batch1 exactly once plus batch2 exactly once.
    write_record_file(str(src_root / "s"), _docs(batch2, len(batch1) + 1))
    eng2 = _provision(spark, meta, src_root)
    try:
        eng2.consume_begin("ep", "s", "raw_docs", fmt="json")
        eng2.wait_for_ingest()

        clean = {
            r.doc_id: r.text
            for r in eng2.stream_table("corpus_clean").collect()
        }
        assert set(clean) == {1, 3, 5, 6, 7}, "lost or duplicated docs"
        assert clean[6] == "more text <EMAIL> here"
        # duplicate-free also at the row level, not just the key level
        assert eng2.stream_table("corpus_clean").count() == 5
        stats = {
            r.source: (r.n_docs, r.n_redacted)
            for r in spark.table("clean_stats").collect()
        }
        assert stats == {"web": (3, 2), "books": (2, 1)}
    finally:
        eng2.consume_end_all()
