"""Event-stream analytics over the events table — the classic product
analytics every streaming warehouse pairs with its ingest: ordered funnel
conversion and weekly cohort retention. Both are pure keyed aggregates +
small joins, oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec

# Ordered funnel: a user converts step N only with an event strictly
# after their step-N-1 conversion time (first-touch semantics).
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over FUNNEL_STEPS with first-touch timestamps:
    step 1 = first 'view' per user; step N = first step-N event strictly
    after the user's step-N-1 time. Emits per-step user counts and the
    conversion rate from step 1.

    Scale shape: one user-keyed conditional aggregate per step (partial
    map-side min), each joined user-keyed to the previous step's result
    — shuffles carry one row per user, never raw events, and every join
    reuses the user_id partitioning. A 100 TB event log reduces to
    O(users) intermediate rows after the first aggregate.
    """
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stage = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    prev_col = "t1"
    for i, step in enumerate(FUNNEL_STEPS[1:], start=2):
        # min ts strictly after the previous stage time: user-keyed left
        # join against that step's events, then re-aggregate per user
        stage = (
            stage.join(
                e.filter(F.col("event_type") == step), "user_id", "left"
            )
            .withColumn(
                "_cand",
                F.when(F.col("ts") > F.col(prev_col), F.col("ts")),
            )
            .groupBy("user_id", *[f"t{j}" for j in range(1, i)])
            .agg(F.min("_cand").alias(f"t{i}"))
        )
        prev_col = f"t{i}"
    counts = stage.agg(
        F.count(F.lit(1)).alias("n_step1"),
        *[
            F.count(F.col(f"t{i}")).alias(f"n_step{i}")
            for i in range(2, len(FUNNEL_STEPS) + 1)
        ],
    )
    rows = None
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        r = counts.select(
            F.lit(i).alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"n_step{i}").cast("long").alias("n_users"),
            F.round(F.col(f"n_step{i}") / F.col("n_step1"), 6).alias(
                "conv_from_step1"
            ),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT s1.user_id, t1, min(e.ts) AS t2
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id
   AND e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
  GROUP BY s1.user_id, t1
), s3 AS (
  SELECT s2.user_id, t1, t2, min(e.ts) AS t3
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id
   AND e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
  GROUP BY s2.user_id, t1, t2
), c AS (
  SELECT count(*) AS n1, count(t2) AS n2, count(t3) AS n3 FROM s3
)
SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type,
       CAST(n1 AS BIGINT) AS n_users, round(n1 * 1.0 / n1, 6) AS conv_from_step1 FROM c
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', CAST(n2 AS BIGINT), round(n2 * 1.0 / n1, 6) FROM c
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', CAST(n3 AS BIGINT), round(n3 * 1.0 / n1, 6) FROM c
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week; for
    each (cohort_week, week_offset) the count and fraction of the cohort
    active that week. date_trunc('week') is ISO-Monday in both engines.

    Scale shape: one user-keyed min aggregate (cohort assignment), one
    distinct over (user, week) — both map-side-combinable — then a
    broadcast-size join (rows = users × active weeks, already tiny
    relative to raw events) and a cohort-keyed aggregate.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    active = e.distinct()
    sizes = first.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        active.join(first, "user_id")
        .withColumn(
            "week_offset",
            F.datediff(F.col("wk"), F.col("cohort_wk")) / 7,
        )
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort_wk")
        .select(
            F.col("cohort_wk").cast("date").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "n_active",
            F.col("n_cohort").cast("long").alias("n_cohort"),
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
                "retention"
            ),
        )
    )


COHORT_RETENTION_SQL = """
WITH e AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
), first AS (
  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, wk FROM e
), sizes AS (
  SELECT cohort_wk, count(*) AS n_cohort FROM first GROUP BY cohort_wk
)
SELECT CAST(f.cohort_wk AS DATE) AS cohort_week,
       CAST(date_diff('day', f.cohort_wk, a.wk) / 7 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(max(s.n_cohort) AS BIGINT) AS n_cohort,
       round(count(*) * 1.0 / max(s.n_cohort), 6) AS retention
FROM active a
JOIN first f USING (user_id)
JOIN sizes s ON s.cohort_wk = f.cohort_wk
GROUP BY f.cohort_wk, date_diff('day', f.cohort_wk, a.wk) / 7
"""


QUERIES: dict[str, QuerySpec] = {
    "funnel_conversion": QuerySpec(funnel_conversion, FUNNEL_SQL),
    "cohort_retention": QuerySpec(cohort_retention, COHORT_RETENTION_SQL),
}
