"""Time-window + as-of operators over the events stream table (B11, B23-B25).

Batch-expressible forms of the streaming window operators: the same
``F.window`` / ``F.session_window`` expressions are what the streaming layer
(pipeline_kinesis_spark.streaming) uses on an unbounded DataFrame; here they
run on the bounded events table so the DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec


def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts (B23). Shuffle key = (window, type):
    at 100 TB the per-window cardinality is bounded, partial agg does the
    heavy lifting map-side."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact integer-cent average: value carries 2 decimals, so
            # Σcents and n are exact integers and one IEEE division is
            # bit-identical across engines — round(avg(double), 4) is
            # not (a group mean at a .xxxx5 boundary rounds half-up in
            # Spark, half-even on DuckDB's binary double; hit at sf0.1)
            (
                F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                / (F.count(F.lit(1)) * 100.0)
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


TUMBLING_SQL = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  count(*) AS n,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
    / (count(*) * 100.0) AS avg_value
FROM events
GROUP BY 1, 2
"""


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour (B23): each event lands in two
    windows. Spark enumerates slide buckets natively."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


SLIDING_SQL = """
SELECT window_start, count(*) AS n
FROM (
  SELECT date_trunc('hour', ts) AS window_start FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start FROM events
) t
GROUP BY 1
"""


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap (B24).

    Oracle is the classic gaps-and-islands SQL; Spark uses the native
    session_window expression (same state machine the streaming layer runs).
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "5 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


# NB: the running sum's ORDER BY must match lag's (ts, event_id)
# exactly — with duplicate timestamps, two windows ordering ties
# independently can misattribute a tied row to the previous session
# (the bug the r11 sessionize-gate oracle hit at sf0.1).
SESSION_SQL = """
WITH flagged AS (
  SELECT
    user_id,
    ts,
    event_id,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 5 MINUTE OR
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT
    user_id,
    ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (B11): for each click, the most recent purchase by the
    same user at-or-before the click time.

    Spark-first implementation: union-tag + running `last(..., ignorenulls)`
    over a (user_id) window — ONE shuffle on user_id, linear state, no
    correlated subquery, no skew-prone range cross join. This is the
    standard scalable as-of pattern (also how the streaming variant works).
    """
    # r15 (guide §2.3/§6): ONE events scan instead of two filtered scans
    # glued by a union — the click/purchase branches become row-local
    # conditionals over a single pass. Same rows, same window, same
    # output (p_ts keeps the union form's TIMESTAMP type via the
    # explicit cast the null branch used to carry).
    is_click = F.col("event_type") == "click"
    merged_in = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "ts",
            F.when(is_click, F.col("event_id")).alias("event_id"),
            is_click.cast("int").alias("is_click"),
            F.when(~is_click, F.col("ts"))
            .cast("timestamp")
            .alias("p_ts"),
        )
    )
    # Order purchases before clicks at identical ts so "at-or-before" holds.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged_in.withColumn(
        "last_purchase_ts", F.last("p_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_click") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "last_purchase_ts",
    )


ASOF_SQL = """
SELECT
  e.event_id,
  e.user_id,
  e.ts,
  (SELECT max(p.ts) FROM events p
   WHERE p.user_id = e.user_id
     AND p.event_type = 'purchase'
     AND p.ts <= e.ts) AS last_purchase_ts
FROM events e
WHERE e.event_type = 'click'
"""


QUERIES: dict[str, QuerySpec] = {
    "tumbling_window_agg": QuerySpec(tumbling_window_agg, TUMBLING_SQL, bench=True),
    "sliding_window_agg": QuerySpec(sliding_window_agg, SLIDING_SQL),
    "session_window_agg": QuerySpec(session_window_agg, SESSION_SQL),
    "asof_join": QuerySpec(asof_join, ASOF_SQL, bench=True),
}
