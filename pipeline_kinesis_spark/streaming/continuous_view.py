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


# --------------------------------------------------------------------------
# Sliding-window continuous views (PipelineDB WITH (sw = '...'))
#
# PipelineDB's flagship view type: the view always answers over the
# trailing window. Its design — and this one — keeps per-time-step
# PARTIAL aggregates in the materialization and recombines the steps
# inside the window at read time, so maintenance stays incremental and
# read cost is O(groups × steps). The same restriction applies:
# aggregates must be combinable (count/sum/min/max here).

import re as _re

SW_BUCKET_COL = "_sw_win"

# DISTINCT is rejected (negative lookahead): per-step distinct partials
# are NOT combinable — summing them double-counts values that appear in
# several steps. PipelineDB rejects DISTINCT in sw views for the same
# reason.
_SW_ITEM = _re.compile(
    r"^(count|sum|min|max)\s*\(\s*(?!distinct\b).+\)\s+AS\s+(\w+)$",
    _re.IGNORECASE | _re.DOTALL,
)
_SW_ALIAS = _re.compile(r"\s+AS\s+(\w+)\s*$", _re.IGNORECASE)
_SW_COMBINE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _split_select_items(select_list: str) -> list[str]:
    items, depth, cur, in_str = [], 0, [], False
    for c in select_list:
        if c == "'":
            in_str = not in_str
        elif not in_str:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                items.append("".join(cur).strip())
                cur = []
                continue
        cur.append(c)
    if "".join(cur).strip():
        items.append("".join(cur).strip())
    return items


def parse_sw_view_sql(sql: str) -> tuple[list[str], dict[str, str]]:
    """SELECT-list analysis for a sliding-window view: returns
    (group-item output names, alias → combinable-aggregate map).
    Every aggregate must be aliased count/sum/min/max (the PipelineDB
    sw restriction); every non-aggregate item needs a resolvable output
    name (bare column or ``expr AS name``)."""
    m = _re.match(r"^\s*SELECT\s+(.*?)\s+FROM\s", sql, _re.I | _re.S)
    if not m:
        raise ValueError("sw view SQL must be a single SELECT ... FROM ...")
    group_names, aggs = [], {}
    for item in _split_select_items(m.group(1)):
        am = _SW_ITEM.match(item)
        if am:
            aggs[am.group(2)] = am.group(1).lower()
            continue
        if _re.match(r"^\w+\s*\(", item):
            # function call that is not a combinable aggregate — reject
            # instead of silently treating it as a group column (avg,
            # expressions, nested calls): pre-compute it on the stream
            # or in a transform, or use count/sum/min/max.
            raise ValueError(
                f"sw views support only combinable aggregates "
                f"(count/sum/min/max) and plain group columns; got {item!r}"
            )
        alias = _SW_ALIAS.search(item)
        if alias:
            group_names.append(alias.group(1))
        elif _re.fullmatch(r"\w+", item):
            group_names.append(item)
        else:
            raise ValueError(
                f"sw view group expression needs an alias: {item!r}"
            )
    if not aggs:
        raise ValueError(
            "sw views need at least one combinable aggregate "
            "(count/sum/min/max ... AS alias)"
        )
    return group_names, aggs


def sw_rewrite_sql(sql: str, step_seconds: int) -> str:
    """Inject the time-step bucket into the view SQL: the standing query
    groups by (user groups, window(arrival_timestamp, step)) and its
    aggregates become per-step partials."""
    bucket = f"window(arrival_timestamp, '{int(step_seconds)} seconds')"
    m = _re.match(r"^(\s*SELECT\s+)(.*?)(\s+FROM\s.*)$", sql, _re.I | _re.S)
    if not m:
        raise ValueError("sw view SQL must be a single SELECT ... FROM ...")
    head, select_list, rest = m.groups()
    rewritten = f"{head}{select_list}, {bucket} AS {SW_BUCKET_COL}{rest}"
    gm = _re.search(r"\bGROUP\s+BY\b", rewritten, _re.I)
    if gm:
        # append the bucket to the existing GROUP BY list
        return _re.sub(
            r"(\bGROUP\s+BY\b)", r"\1 " + bucket + ",", rewritten,
            count=1, flags=_re.I,
        )
    return rewritten + f" GROUP BY {bucket}"


def sw_combine(
    df: DataFrame,
    sw_seconds: int,
    sw_aggs: dict[str, str],
    sw_group_cols: list[str],
) -> DataFrame:
    """Read-time recombination: keep the steps whose bucket end falls
    inside the trailing window, re-aggregate partials per group."""
    cutoff = F.current_timestamp() - F.expr(
        f"INTERVAL {int(sw_seconds)} SECOND"
    )
    live = df.filter(F.col(f"{SW_BUCKET_COL}.end") > cutoff)
    aggs = [
        _SW_COMBINE[fn](F.col(alias)).alias(alias)
        for alias, fn in sw_aggs.items()
    ]
    if sw_group_cols:
        return live.groupBy(*sw_group_cols).agg(*aggs)
    return live.agg(*aggs)
