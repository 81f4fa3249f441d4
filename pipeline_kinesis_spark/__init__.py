"""pipeline_kinesis_spark — a PySpark-native streaming-ingest + continuous-query engine.

A brand-new engine with the query and data-processing capabilities of
pipelinedb/pipeline_kinesis (reference surveyed in SURVEY.md), re-expressed
Spark-first:

- layer 1 (ingestion): Structured Streaming sources + micro-batch ingest with
  COPY-option-parity parsing (text/csv/json), dead-letter quarantine,
  checkpoint-based resume (reference: pipeline_kinesis.c:612-767).
- layer 2 (continuous queries): streaming DataFrame aggregations materialized
  to queryable sinks (reference demo: README.md:65-88).
- layer 3 (north-star): LLM-data-pipeline operators — dedup (exact/minhash/
  simhash), vector similarity search, text analysis, multimodal plumbing —
  designed for 100 TB scale (partition-aware, shuffle-minimal, JVM-side).
"""

from pipeline_kinesis_spark.session import get_spark
from pipeline_kinesis_spark.engine import Engine

__version__ = "0.1.0"

__all__ = ["get_spark", "Engine", "__version__"]
