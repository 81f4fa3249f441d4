"""Continuous-view compilation and materialization.

The reference's continuous view (README.md:66) is a standing SQL aggregate
over a stream whose result stays queryable as it updates. Spark-native
equivalent: compile the view SQL against a streaming temp view of the
parsed stream → streaming aggregation → materialize to a queryable sink.

Sink strategy:
- 'complete'/'update' (default here): in-memory sink named after the view —
  ``spark.table(view_name)`` is the exact analog of
  ``SELECT * FROM foo_view`` (README.md:78-88). Right for
  bounded-cardinality aggregates (the continuous-view contract).
- keyed upsert to parquet (``upsert_to_parquet``): durable MERGE-style
  materialization for unbounded keyspaces; on a cluster with a
  transactional table format this becomes a real MERGE INTO — the
  reference's ON CONFLICT DO UPDATE (pipeline_kinesis.c:543-579) analog.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def compile_view(
    spark: SparkSession,
    stream_df: DataFrame,
    stream_name: str,
    view_sql: str,
) -> DataFrame:
    """Register the (streaming) stream DataFrame under its declared name and
    compile the view SQL against it — Catalyst analyzes/optimizes the plan
    exactly as for a batch query, then runs it incrementally."""
    stream_df.createOrReplaceTempView(stream_name)
    return spark.sql(view_sql)


def materialize_memory(
    view_df: DataFrame,
    view_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
    trigger_interval: str = "500 milliseconds",
) -> StreamingQuery:
    return (
        view_df.writeStream.format("memory")
        .queryName(view_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger_interval)
        .start()
    )


def upsert_to_parquet(
    batch_df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    ttl_seconds: int | None = None,
    ttl_column: str | None = None,
) -> None:
    """MERGE-style keyed upsert into a parquet dir (foreachBatch body).

    Reads current state, anti-joins out replaced keys, appends the new
    rows, atomically swaps. Plain parquet stand-in for Delta MERGE — at
    cluster scale, partition the table by a key prefix and rewrite only
    touched partitions.

    With ttl_seconds/ttl_column set (PipelineDB TTL views), rows whose
    ttl_column trails the wall clock by more than the TTL are dropped
    during the rewrite — the reaper rides the merge, so materialized
    state stays bounded with no extra pass.
    """
    spark = batch_df.sparkSession
    new = batch_df.dropDuplicates(key_cols)
    try:
        current = spark.read.parquet(table_dir)
        exists = True
    except Exception:  # first batch: nothing materialized yet
        exists = False
    if exists:
        keep = current.join(
            F.broadcast(new.select(*key_cols)), key_cols, "left_anti"
        )
        merged = keep.unionByName(new)
    else:
        merged = new
    if ttl_seconds is not None and ttl_column is not None:
        merged = merged.filter(
            F.col(ttl_column)
            >= F.current_timestamp()
            - F.expr(f"INTERVAL {int(ttl_seconds)} SECOND")
        )
    tmp = f"{table_dir}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(table_dir)
    spark._jvm.org.apache.hadoop.fs.FileSystem.get(  # noqa: SLF001
        spark._jsc.hadoopConfiguration()
    ).delete(
        spark._jvm.org.apache.hadoop.fs.Path(tmp), True
    )
