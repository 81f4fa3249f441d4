"""Relational operator surface (SURVEY.md §2B: B6-B21).

Joins of every flavor, predicate combinations, distinct/statistical
aggregates, grouping sets, window functions, top-k, set operations, scalar
function coverage. Each query pairs with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_kinesis_spark.functions.exprs import (
    cents,
    revenue_cents,
    tokens,
)
from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec


# --- B6: predicate coverage ------------------------------------------------

def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / IS NOT NULL / NOT / AND / OR, all scan-pushed."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            F.col("l_quantity").between(10, 30)
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_shipdate").isNotNull()
            & ~(F.col("l_discount") > 0.08)
            & ((F.col("l_linestatus") == "F") | (F.col("l_tax") < 0.05))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


FILTER_PREDICATES_SQL = """
SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 4) AS sum_qty
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 30
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate IS NOT NULL
  AND NOT (l_discount > 0.08)
  AND (l_linestatus = 'F' OR l_tax < 0.05)
GROUP BY l_returnflag
"""


# --- B8: outer joins -------------------------------------------------------

def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN (filtered orders): null-preserving aggregation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_f_orders"),
            F.sum(cents("o_totalprice")).alias("spent_cents"),
        )
    )


JOIN_LEFT_OUTER_SQL = """
SELECT
  c_custkey,
  c_mktsegment,
  count(o_orderkey) AS n_f_orders,
  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS spent_cents
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
  ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders RIGHT JOIN customer with a compound join condition."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(
            c,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority == "1-URGENT"),
            "right",
        )
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_urgent"))
    )


JOIN_RIGHT_OUTER_SQL = """
SELECT c_mktsegment, count(o_orderkey) AS n_urgent
FROM orders
RIGHT JOIN customer
  ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
GROUP BY c_mktsegment
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER of two disjoint-ish keyed sets; nulls on both sides."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("big_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey"),
        "c_acctbal",
        "big_orders",
    )


JOIN_FULL_OUTER_SQL = """
WITH c AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
), o AS (
  SELECT o_custkey, count(*) AS big_orders
  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
)
SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, big_orders
FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
"""


# --- B9: semi / anti joins -------------------------------------------------

def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers with ≥1 urgent order (left_semi ≡ EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


JOIN_SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers with no 'P'-status order (left_anti ≡ NOT EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


JOIN_ANTI_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
)
GROUP BY c_mktsegment
"""


# --- B10: theta / range joins ---------------------------------------------

def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+range join: lineitem ⋈ part on key AND quantity > size.

    The equi component keeps this a hash join (part broadcast); the range
    predicate is evaluated as a post-join filter — the scalable shape for
    mixed conditions (pure theta would be a nested-loop).
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        l.join(
            F.broadcast(p),
            (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
    )


JOIN_RANGE_SQL = """
SELECT p_brand, count(*) AS cnt, round(avg(l_quantity), 6) AS avg_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
"""


def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure inequality self-join (broadcast nested loop): nation pairs
    within a region, ordered pair dedup via strict < on the key."""
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            F.broadcast(n2),
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
            F.col("n1.n_regionkey").cast("long").alias("regionkey"),
        )
    )


JOIN_THETA_PAIRS_SQL = """
SELECT
  n1.n_name AS nation_a,
  n2.n_name AS nation_b,
  CAST(n1.n_regionkey AS BIGINT) AS regionkey
FROM nation n1
JOIN nation n2
  ON n1.n_regionkey = n2.n_regionkey
 AND n1.n_nationkey < n2.n_nationkey
"""


# --- B12/B13: distinct + statistical aggregates ----------------------------

def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev/variance on small-magnitude columns (stable)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
    )


AGG_STATS_SQL = """
SELECT
  l_returnflag,
  min(l_quantity) AS min_qty,
  max(l_quantity) AS max_qty,
  round(avg(l_quantity), 6) AS avg_qty,
  round(stddev_samp(l_quantity), 6) AS sd_qty,
  round(var_samp(l_discount), 8) AS var_disc
FROM lineitem
GROUP BY l_returnflag
"""


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (B14's exact cousin; approx variant
    is a separate rows-only query since sketches differ per engine)."""
    l = load(spark, sf_dir, "lineitem")
    # one percentile buffer per column, not per quantile (r15 — see
    # agg_exact_percentiles): the three l_quantity quartiles come out of
    # a single array-percentage aggregate, values identical.
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.expr(
                "percentile(l_quantity, array(0.25D, 0.5D, 0.75D))"
            ).alias("pq"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias(
                "p90_price"
            ),
        )
        .select(
            "l_linestatus",
            F.round(F.col("pq")[0], 6).alias("p25_qty"),
            F.round(F.col("pq")[1], 6).alias("p50_qty"),
            F.round(F.col("pq")[2], 6).alias("p75_qty"),
            "p90_price",
        )
    )


AGG_PERCENTILE_SQL = """
SELECT
  l_linestatus,
  round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
  round(quantile_cont(l_quantity, 0.75), 6) AS p75_qty,
  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem
GROUP BY l_linestatus
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx-distinct (B14), oracle-able: alongside the HLL estimate
    we emit the exact distinct count (computable in both engines) and a
    boolean asserting the estimate lands within 5× the requested rsd of
    it; the oracle emits the exact count and literal TRUE. PipelineDB's
    continuous count(DISTINCT) is HLL-backed — this is its Spark analog."""
    o = load(spark, sf_dir, "orders")
    # r16 (guide §2.4): countDistinct + approx_count_distinct in ONE
    # aggregate triggers the distinct-aggregate Expand rewrite — the
    # imperative HLL then runs inside two non-codegen HashAggregates
    # over the expanded (group, custkey, gid) rows (measured 85.8 of
    # this row's 89 warm CPU-s at sf1). Computed as two independent
    # aggregations joined on the 5-value group key, the HLL pass is a
    # plain partial/final merge (5 buffers per partition, no Expand)
    # and the exact pass is the standard two-phase distinct. Identical
    # output: HLL register-max merging is order- and
    # partitioning-independent, so the estimate is bit-identical.
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_cust")
    )
    approx = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx")
    )
    return exact.join(approx, "o_orderpriority").select(
        "o_orderpriority",
        "exact_cust",
        (
            F.abs(F.col("approx") - F.col("exact_cust"))
            <= F.lit(0.05) * F.col("exact_cust")
        ).alias("within_bound"),
    )


AGG_APPROX_DISTINCT_SQL = """
SELECT
  o_orderpriority,
  count(DISTINCT o_custkey) AS exact_cust,
  TRUE AS within_bound
FROM orders
GROUP BY o_orderpriority
"""


# --- B15: rollup / cube / grouping sets -----------------------------------

def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("order_year", F.year("o_orderdate").cast("long"))
    )
    return joined.rollup("n_name", "order_year").agg(
        F.sum(cents("o_totalprice")).alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.grouping("order_year").cast("long").alias("g_year"),
    )


ROLLUP_REVENUE_SQL = """
SELECT
  n_name,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
  count(*) AS n_orders,
  CAST(grouping(n_name) AS BIGINT) AS g_nation,
  CAST(grouping(CAST(year(o_orderdate) AS BIGINT)) AS BIGINT) AS g_year
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, CAST(year(o_orderdate) AS BIGINT))
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("rev_cents"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
    )


CUBE_ORDERS_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- B17: window functions -------------------------------------------------

def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank with a deterministic tie-break."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT
    c_custkey,
    c_mktsegment,
    c_acctbal,
    CAST(row_number() OVER w AS BIGINT) AS rn,
    CAST(rank() OVER w AS BIGINT) AS rnk,
    CAST(dense_rank() OVER w AS BIGINT) AS drnk
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
) t WHERE rn <= 5
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running frame aggregate per user event timeline."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.lag("value", 1).over(w), 6).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 6).alias("next_value"),
        F.round(F.sum("value").over(wrun), 4).alias("running_value"),
        F.count(F.lit(1)).over(wrun).alias("running_n"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT
  user_id,
  event_id,
  ts,
  round(lag(value, 1) OVER w, 6) AS prev_value,
  round(lead(value, 1) OVER w, 6) AS next_value,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per priority class (B19 scalable top-k:
    window row_number + filter — one shuffle, no global sort)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "price_cents", cents("o_totalprice")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("price_cents"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "price_cents",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


TOPK_PER_GROUP_SQL = """
SELECT * FROM (
  SELECT
    o_orderpriority,
    o_orderkey,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
    CAST(row_number() OVER (
      PARTITION BY o_orderpriority
      ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC, o_orderkey ASC
    ) AS BIGINT) AS rn
  FROM orders
) t WHERE rn <= 3
"""


def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic top-25 (B18/B19) — TakeOrderedAndProject."""
    o = load(spark, sf_dir, "orders").withColumn(
        "price_cents", cents("o_totalprice")
    )
    return (
        o.select("o_orderkey", "o_orderdate", "price_cents")
        .orderBy(F.desc("price_cents"), F.asc("o_orderkey"))
        .limit(25)
    )


ORDER_LIMIT_SQL = """
SELECT o_orderkey, o_orderdate, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
FROM orders
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT 25
"""


# --- B20: set operations ---------------------------------------------------

def _building_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


def _urgent_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _urgent_custkeys(spark, sf_dir)
    return a.union(b).distinct()


SET_UNION_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _urgent_custkeys(spark, sf_dir)
    return a.intersect(b)


SET_INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _urgent_custkeys(spark, sf_dir)
    return a.exceptAll(b.distinct())  # EXCEPT ALL vs distinct right side


SET_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
(SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


# --- B21: scalar functions -------------------------------------------------

def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        (F.col("p_name").like("%green%")).alias("is_green"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias(
            "type_snake"
        ),
    )


SCALAR_STRING_SQL = r"""
SELECT
  p_partkey,
  lower(p_name) AS name_lower,
  upper(p_brand) AS brand_upper,
  substring(p_type, 1, 5) AS type_prefix,
  p_brand || '#' || p_type AS brand_type,
  CAST(length(p_name) AS BIGINT) AS name_len,
  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
  p_name LIKE '%green%' AS is_green,
  replace(p_type, ' ', '_') AS type_snake
FROM part
"""


def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "due_date"
        ),
        F.datediff(
            F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")
        ).cast("long").alias("days_to_2002"),
    )


SCALAR_DATETIME_SQL = """
SELECT
  o_orderkey,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(month(o_orderdate) AS BIGINT) AS order_mon,
  CAST(day(o_orderdate) AS BIGINT) AS order_day,
  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
  o_orderdate + INTERVAL 90 DAY AS due_date,
  CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002
FROM orders
"""


def case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
    )
    return (
        c.select(
            "c_custkey",
            tier.alias("tier"),
            F.coalesce(
                F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")),
                F.lit(0.0),
            ).alias("positive_bal"),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("positive_bal")).alias("bal_cents"),
        )
    )


CASE_COALESCE_SQL = """
SELECT
  CASE WHEN c_acctbal < 0 THEN 'debtor'
       WHEN c_acctbal < 5000 THEN 'standard'
       ELSE 'premium' END AS tier,
  count(*) AS n,
  CAST(sum(CAST(round(coalesce(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 0.0) * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer
GROUP BY 1
"""


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_quantity").cast("long").alias("ceil_qty"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias(
            "price_k"
        ),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_d"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


SCALAR_MATH_SQL = """
SELECT
  l_orderkey,
  l_linenumber,
  abs(l_discount - 0.05) AS abs_d,
  CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
  round(sqrt(l_quantity), 6) AS sqrt_qty,
  round(ln(l_extendedprice), 6) AS ln_price,
  round(log10(l_extendedprice), 6) AS log10_price,
  round(pow(l_quantity, 2), 4) AS qty_sq,
  CAST(mod(l_orderkey, 7) AS BIGINT) AS mod7,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
  greatest(l_tax, l_discount) AS max_rate,
  least(l_tax, l_discount) AS min_rate
FROM lineitem
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 via the engine's SQL surface: GROUPING SETS compiled by
    spark.sql over registered views — exercising the same entry path a
    continuous-view SQL string takes."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
          o_orderstatus,
          o_orderpriority,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: sketch-based percentile, oracle-able and scalar-only (array
    output columns crash the driver's pandas canon). We emit the exact
    interpolated percentiles (same linear-interpolation definition as
    DuckDB quantile_cont) plus booleans asserting each t-digest-style
    estimate lands within 1% of its exact twin; the oracle emits the exact
    values and literal TRUE."""
    l = load(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx(
            "l_quantity", F.array(F.lit(0.1), F.lit(0.9)), 10000
        ).alias("aq"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("ep50"),
        # one buffer for both exact l_quantity quantiles (r15 — see
        # agg_exact_percentiles); values identical.
        F.expr("percentile(l_quantity, array(0.1D, 0.9D))").alias("eq"),
    )
    def within(approx, exact):
        return F.abs(approx - exact) <= F.lit(0.01) * F.abs(exact)
    return g.select(
        "l_returnflag",
        F.round("ep50", 4).alias("exact_p50_price"),
        F.round(F.col("eq")[0], 6).alias("exact_p10_qty"),
        F.round(F.col("eq")[1], 6).alias("exact_p90_qty"),
        within(F.col("ap50"), F.col("ep50")).alias("p50_within_bound"),
        within(F.element_at("aq", 1), F.col("eq")[0]).alias(
            "p10_within_bound"
        ),
        within(F.element_at("aq", 2), F.col("eq")[1]).alias(
            "p90_within_bound"
        ),
    )


AGG_APPROX_PERCENTILE_SQL = """
SELECT
  l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50_price,
  round(quantile_cont(l_quantity, 0.1), 6) AS exact_p10_qty,
  round(quantile_cont(l_quantity, 0.9), 6) AS exact_p90_qty,
  TRUE AS p50_within_bound,
  TRUE AS p10_within_bound,
  TRUE AS p90_within_bound
FROM lineitem
GROUP BY l_returnflag
"""


# --- B22: JSON access ------------------------------------------------------

def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_k"),
        )
    )


JSON_EXTRACT_SQL = """
SELECT
  event_type,
  count(*) AS n,
  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
FROM events
GROUP BY event_type
"""


def pivot_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (B12/B15 cousin; PG crosstab analog): order counts per year,
    one column per priority. Spark's pivot with explicit values compiles
    to a single hash aggregate — no per-column scans."""
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pv = (
        o.groupBy("o_year")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_year",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
            for i, p in enumerate(prios)
        ],
    )


PIVOT_PRIORITY_SQL = """
SELECT
  year(o_orderdate) AS o_year,
  count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
  count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
  count(*) FILTER (o_orderpriority = '5-LOW') AS p5
FROM orders
GROUP BY year(o_orderdate)
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (B17): per user, the event count and value
    sum within the trailing 30 minutes of each event — rangeBetween over
    epoch seconds, the time-decayed-feature workhorse."""
    # epoch seconds tz-free: ts is TIMESTAMP_NTZ (io.load normalizes),
    # and timestampdiff from the NTZ epoch is pure arithmetic — no
    # session-timezone dependence, matching DuckDB's epoch() on naive
    # timestamps regardless of the driver session's timezone.
    e = load(spark, sf_dir, "events").withColumn(
        "ts_sec",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-1800, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_30m"),
        F.round(F.sum("value").over(w), 6).alias("sum_30m"),
    )


WINDOW_RANGE_FRAME_SQL = """
SELECT
  event_id,
  user_id,
  count(*) OVER w AS n_30m,
  round(sum(value) OVER w, 6) AS sum_30m
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
  RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW
)
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (B17): ntile, percent_rank,
    cume_dist, first/last value over an explicit frame — per nation,
    customers ranked by account balance."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        # raw ratios, no round(): percent_rank/cume_dist are exact
        # integer divisions ((r-1)/(n-1), k/n) and IEEE division is
        # bit-identical across engines — round() is NOT (a value at a
        # .xxxxx5 boundary rounds half-up in Spark's decimal path and
        # half-even on DuckDB's binary double; surfaced at sf0.1)
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(wf).alias("poorest"),
        F.last("c_custkey").over(wf).alias("richest"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT
  c_custkey,
  c_nationkey,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  first_value(c_custkey) OVER wf AS poorest,
  last_value(c_custkey) OVER wf AS richest
FROM customer
WINDOW
  w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
  wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (pivot's inverse): lineitem money measures to long
    form (key, measure, amount) — narrow per-row transform, no shuffle."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("amount", 6).alias("amount"),
    )


UNPIVOT_LINEITEM_SQL = """
SELECT l_orderkey, l_linenumber, measure, round(amount, 6) AS amount
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
         l_quantity AS amount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
)
WHERE l_orderkey < 1000
"""


# --- skew mitigation: explicit salting ------------------------------------
#
# AQE's skew-join splitting handles most hot keys automatically; these two
# operators are the MANUAL pattern for when state must stay bounded per
# task no matter what (e.g. one key holding 1% of 100 TB): distributive
# aggregates and joins rewritten over a salted key. Both are
# result-identical to their unsalted forms — which is exactly what the
# oracle asserts.

N_SALTS = 8


def agg_keyed_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PipelineDB's keyed_min/keyed_max special aggregates (B12/B14
    family): the order key carried by the extreme-priced order per
    priority class — Spark max_by/min_by, one partial-aggregating
    shuffle, no window or self-join.

    Determinism: ranking goes through a UNIQUE composite long
    (price_cents scaled, orderkey as tiebreak), so argmax/argmin are
    well-defined and engine-independent even on tied prices.
    """
    o = load(spark, sf_dir, "orders").withColumn(
        "price_cents", cents("o_totalprice")
    )
    o = o.withColumn(
        "price_key",
        F.col("price_cents") * F.lit(10_000_000).cast("long")
        + F.col("o_orderkey"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.expr("max_by(o_orderkey, price_key)").alias("top_order"),
        F.expr("min_by(o_orderkey, price_key)").alias("bottom_order"),
        F.max("price_cents").alias("max_price_cents"),
        F.min("price_cents").alias("min_price_cents"),
    )


AGG_KEYED_MINMAX_SQL = """
WITH o AS (
  SELECT
    o_orderpriority, o_orderkey,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 10000000 + o_orderkey
      AS price_key
  FROM orders
)
SELECT
  o_orderpriority,
  max_by(o_orderkey, price_key) AS top_order,
  min_by(o_orderkey, price_key) AS bottom_order,
  max(price_cents) AS max_price_cents,
  min(price_cents) AS min_price_cents
FROM o
GROUP BY o_orderpriority
"""


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: groupBy(key, salt) partial →
    groupBy(key) final. A hot key's rows spread over N_SALTS reducers in
    phase 1; phase 2 merges N_SALTS tiny partials. count/sum recombine
    exactly (distributive); avg is derived from sum/count at the end —
    never averaged across partials."""
    l = load(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.rand(seed=7) * N_SALTS).cast("int")
    )
    partial = l.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("l_extendedprice"))).alias("price_cents"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum("price_cents").alias("sum_price_cents"),
        )
        .withColumn(
            "avg_price_cents",
            F.round(F.col("sum_price_cents") / F.col("n_rows"), 2),
        )
    )


AGG_SALTED_SKEW_SQL = """
SELECT
  l_returnflag,
  count(*) AS n_rows,
  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / count(*), 2)
    AS avg_price_cents
FROM lineitem
GROUP BY l_returnflag
"""


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join without broadcast: the fact side gets a
    random salt, the dim side is replicated N_SALTS times (explode over a
    literal range), and the join key becomes (key, salt) — a hot orderkey
    now lands on N_SALTS different reducers. Used when the dim is too big
    to broadcast AND a key is hot; result-identical to the plain join."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).withColumn("salt", (F.rand(seed=11) * N_SALTS).cast("int"))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
        )
    )
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey) & (l.salt == o.salt),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            revenue_cents().alias("revenue_cents"),
        )
    )


JOIN_SALTED_SKEW_SQL = """
SELECT
  year(o_orderdate) AS o_year,
  count(*) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY year(o_orderdate)
"""


def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (B12 completeness): per-lang correlation,
    sample covariance/stddev, and the least-squares fit of n_chars on
    token count over the documents table — one map-side-combinable
    aggregate (all of corr/covar/regr_* are algebraic: they reduce to
    sums/products, so partial aggregation holds at any scale).
    """
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(tokens("text")).cast("double").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr("x", "y"), 6).alias("corr_xy"),
        F.round(F.covar_samp("x", "y"), 6).alias("covar_xy"),
        F.round(F.stddev_samp("y"), 6).alias("stddev_y"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
    )


AGG_CORR_REGRESSION_SQL = r"""
WITH d AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS x,
         CAST(n_chars AS DOUBLE) AS y
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(x, y), 6) AS corr_xy,
       round(covar_samp(x, y), 6) AS covar_xy,
       round(stddev_samp(y), 6) AS stddev_y,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM d GROUP BY lang
"""


def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (B14's exact counterpart — the
    approx twin is agg_approx_percentile): p50/p90/p99 of extended
    price per return flag via percentile_cont interpolation.

    Scale note: exact percentiles require a per-group sort — the
    deliberate heavy tier, used when the group count is modest and
    auditability matters; approx_percentile is the 100 TB default.
    """
    li = load(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of percentages (r15): three
    # scalar percentile() aggs each buffered and sorted the whole group
    # independently — 3× the aggregation state and three sorts for one
    # answer. The array form evaluates all three quantiles against one
    # sorted buffer; values identical (same interpolation, same data).
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.percentile(
                F.col("l_extendedprice"),
                F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            ).alias("ps"),
        )
        .select(
            "l_returnflag",
            "n",
            *[
                F.round(F.col("ps")[i], 6).alias(f"p{int(q * 100)}")
                for i, q in enumerate((0.5, 0.9, 0.99))
            ],
        )
    )


AGG_EXACT_PERCENTILES_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag
"""


HIST_BUCKETS = 10
HIST_LO, HIST_HI = 0.0, 100.0


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-range value histogram per event type (width_bucket
    semantics): one scan, one (type, bucket)-keyed count — the shuffle
    carries O(types × buckets) rows at any event volume.
    """
    e = load(spark, sf_dir, "events")
    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.when(F.col("value") < HIST_LO, 0).when(
        F.col("value") >= HIST_HI, HIST_BUCKETS + 1
    ).otherwise(
        F.floor((F.col("value") - HIST_LO) / width).cast("int") + 1
    )
    return (
        e.select("event_type", bucket.cast("long").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


VALUE_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(CASE WHEN value < {HIST_LO} THEN 0
                 WHEN value >= {HIST_HI} THEN {HIST_BUCKETS + 1}
                 ELSE floor((value - {HIST_LO})
                      / {(HIST_HI - HIST_LO) / HIST_BUCKETS}) + 1
            END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
"""


# --- B2: combine() transition-state merge, batch-expressible twin ----------

# the continuous view's declared SQL (fine grouping); the standing query
# carries hidden (s, c, q) partials for avg/stddev via combine_rewrite_sql
_COMBINE_REGROUP_VIEW_SQL = (
    "SELECT lang, source, count(*) AS n_docs, "
    "sum(n_chars) AS total_chars, max(n_chars) AS max_chars, "
    "avg(n_chars) AS avg_chars, stddev_samp(n_chars) AS sd_chars "
    "FROM combine_regroup_src GROUP BY lang, source"
)


def combine_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of PipelineDB ``combine()`` (B2): materialize a
    continuous view's matrel at a FINE grouping — hidden transition
    -state partial columns included, via the engine's own
    parse/rewrite machinery — then re-aggregate at a COARSER grouping
    by merging the partials. avg merges as Σs/Σc (never avg-of-avgs),
    stddev from its (n, Σx, Σx²) state. This is the exact arithmetic
    the standing combine() path runs (continuous_view.py
    combine_select_expr), driven over parquet so DuckDB can oracle the
    merge bit-for-bit: n_chars partials are integer-valued doubles, so
    every sum is exact and the final division/sqrt is deterministic
    IEEE. Scale shape: the merge is one hash aggregate over O(view
    groups) matrel rows — the raw table is scanned once for the matrel
    and never again for the regroup."""
    from pipeline_kinesis_spark.streaming.continuous_view import (
        combine_rewrite_sql,
        combine_view,
        parse_combine_view_sql,
    )

    specs = parse_combine_view_sql(_COMBINE_REGROUP_VIEW_SQL)
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "combine_regroup_src"
    )
    matrel = spark.sql(
        combine_rewrite_sql(_COMBINE_REGROUP_VIEW_SQL, specs)
    )
    return combine_view(matrel, ["lang"], specs).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("max_chars").cast("long").alias("max_chars"),
        "avg_chars",
        "sd_chars",
    )


# the oracle spells the two-level merge explicitly — fine-grouped
# partials, then EXACTLY combine_select_expr's arithmetic at the coarse
# grouping (sum/count division for avg; (Σq − (Σs)²/Σc)/(Σc−1) under a
# sqrt for stddev)
COMBINE_REGROUP_SQL = r"""
WITH fine AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars,
         sum(CAST(n_chars AS DOUBLE)) AS s,
         CAST(count(n_chars) AS BIGINT) AS c,
         sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS q
  FROM documents GROUP BY lang, source
)
SELECT lang,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(total_chars) AS BIGINT) AS total_chars,
       CAST(max(max_chars) AS BIGINT) AS max_chars,
       (sum(s) / CAST(sum(c) AS DOUBLE)) AS avg_chars,
       sqrt((sum(q) - pow(sum(s), 2) / CAST(sum(c) AS DOUBLE))
            / (CAST(sum(c) AS DOUBLE) - 1)) AS sd_chars
FROM fine GROUP BY lang
"""


# the continuous view's declared SQL: percentiles at a FINE grouping;
# the standing query carries hidden mergeable KLL sketch partials
_COMBINE_PCT_VIEW_SQL = (
    "SELECT lang, source, count(*) AS n_docs, "
    "approx_percentile(n_chars, 0.5) AS p50_chars, "
    "approx_percentile(n_chars, 0.9) AS p90_chars "
    "FROM combine_pct_src GROUP BY lang, source"
)


def combine_percentile_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine() over PERCENTILE transition states (B2/B14 — the round-6
    verdict's missing combinable): the standing query carries a
    mergeable KLL quantile sketch (Apache DataSketches, native Spark
    4.1) as the hidden partial for each approx_percentile item, and
    regrouping merges sketches with kll_merge_agg_double — never
    re-scanning rows, O(k)=O(200) state per group. PipelineDB does the
    same with tdigest transition states. Gate form is the sketch
    envelope pattern (see hll_mergeable_distinct): exact percentiles
    (DuckDB-computable) plus booleans that each merged-sketch estimate
    lies within the KLL rank-error envelope — between the exact
    quantiles at p∓0.05 (k=200 guarantees ~1.65% rank error, so 5% is
    generous)."""
    from pipeline_kinesis_spark.streaming.continuous_view import (
        combine_rewrite_sql,
        combine_view,
        parse_combine_view_sql,
    )

    specs = parse_combine_view_sql(_COMBINE_PCT_VIEW_SQL)
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("combine_pct_src")
    matrel = spark.sql(
        combine_rewrite_sql(_COMBINE_PCT_VIEW_SQL, specs)
    )
    merged = combine_view(matrel, ["lang"], specs).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("p50_chars").alias("p50_est"),
        F.col("p90_chars").alias("p90_est"),
    )
    exact = docs.groupBy("lang").agg(
        *[
            F.round(
                F.percentile(F.col("n_chars").cast("double"), F.lit(q)),
                6,
            ).alias(name)
            for q, name in (
                (0.5, "p50_exact"),
                (0.9, "p90_exact"),
                (0.45, "_p50_lo"),
                (0.55, "_p50_hi"),
                (0.85, "_p90_lo"),
                (0.95, "_p90_hi"),
            )
        ]
    )
    return (
        merged.join(exact, "lang")
        .select(
            "lang",
            "n_docs",
            "p50_exact",
            "p90_exact",
            F.col("p50_est").between(
                F.col("_p50_lo"), F.col("_p50_hi")
            ).alias("p50_in_bound"),
            F.col("p90_est").between(
                F.col("_p90_lo"), F.col("_p90_hi")
            ).alias("p90_in_bound"),
        )
    )


COMBINE_PCT_REGROUP_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_exact,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90_exact,
       TRUE AS p50_in_bound,
       TRUE AS p90_in_bound
FROM documents GROUP BY lang
"""


QUERIES: dict[str, QuerySpec] = {
    "combine_regroup": QuerySpec(combine_regroup, COMBINE_REGROUP_SQL),
    "combine_percentile_regroup": QuerySpec(
        combine_percentile_regroup, COMBINE_PCT_REGROUP_SQL
    ),
    "agg_corr_regression": QuerySpec(
        agg_corr_regression, AGG_CORR_REGRESSION_SQL
    ),
    "agg_exact_percentiles": QuerySpec(
        agg_exact_percentiles, AGG_EXACT_PERCENTILES_SQL
    ),
    "value_histogram": QuerySpec(value_histogram, VALUE_HISTOGRAM_SQL),
    "filter_predicates": QuerySpec(filter_predicates, FILTER_PREDICATES_SQL),
    "join_left_outer": QuerySpec(join_left_outer, JOIN_LEFT_OUTER_SQL),
    "join_right_outer": QuerySpec(join_right_outer, JOIN_RIGHT_OUTER_SQL),
    "join_full_outer": QuerySpec(join_full_outer, JOIN_FULL_OUTER_SQL),
    "join_semi": QuerySpec(join_semi, JOIN_SEMI_SQL),
    "join_anti": QuerySpec(join_anti, JOIN_ANTI_SQL),
    "join_range": QuerySpec(join_range, JOIN_RANGE_SQL, bench=True),
    "join_theta_pairs": QuerySpec(join_theta_pairs, JOIN_THETA_PAIRS_SQL),
    "agg_distinct": QuerySpec(agg_distinct, AGG_DISTINCT_SQL),
    "agg_stats": QuerySpec(agg_stats, AGG_STATS_SQL),
    "agg_percentile": QuerySpec(agg_percentile, AGG_PERCENTILE_SQL),
    "agg_approx_distinct": QuerySpec(
        agg_approx_distinct, AGG_APPROX_DISTINCT_SQL
    ),
    "rollup_revenue": QuerySpec(rollup_revenue, ROLLUP_REVENUE_SQL),
    "cube_orders": QuerySpec(cube_orders, CUBE_ORDERS_SQL),
    "window_rank": QuerySpec(window_rank, WINDOW_RANK_SQL),
    "window_lag_lead": QuerySpec(window_lag_lead, WINDOW_LAG_LEAD_SQL, bench=True),
    "topk_per_group": QuerySpec(topk_per_group, TOPK_PER_GROUP_SQL),
    "order_limit": QuerySpec(order_limit, ORDER_LIMIT_SQL),
    "set_union_distinct": QuerySpec(set_union_distinct, SET_UNION_SQL),
    "set_intersect": QuerySpec(set_intersect, SET_INTERSECT_SQL),
    "set_except": QuerySpec(set_except, SET_EXCEPT_SQL),
    "scalar_string_funcs": QuerySpec(scalar_string_funcs, SCALAR_STRING_SQL),
    "scalar_math_funcs": QuerySpec(scalar_math_funcs, SCALAR_MATH_SQL),
    "grouping_sets_revenue": QuerySpec(
        grouping_sets_revenue, GROUPING_SETS_SQL
    ),
    "agg_approx_percentile": QuerySpec(
        agg_approx_percentile, AGG_APPROX_PERCENTILE_SQL
    ),
    "scalar_datetime_funcs": QuerySpec(
        scalar_datetime_funcs, SCALAR_DATETIME_SQL
    ),
    "case_coalesce": QuerySpec(case_coalesce, CASE_COALESCE_SQL),
    "json_extract": QuerySpec(json_extract, JSON_EXTRACT_SQL),
    "agg_keyed_minmax": QuerySpec(agg_keyed_minmax, AGG_KEYED_MINMAX_SQL),
    "agg_salted_skew": QuerySpec(agg_salted_skew, AGG_SALTED_SKEW_SQL),
    "join_salted_skew": QuerySpec(join_salted_skew, JOIN_SALTED_SKEW_SQL),
    "pivot_priority_by_year": QuerySpec(
        pivot_priority_by_year, PIVOT_PRIORITY_SQL
    ),
    "window_range_frame": QuerySpec(
        window_range_frame, WINDOW_RANGE_FRAME_SQL
    ),
    "unpivot_lineitem_measures": QuerySpec(
        unpivot_lineitem_measures, UNPIVOT_LINEITEM_SQL
    ),
    "window_distribution": QuerySpec(
        window_distribution, WINDOW_DISTRIBUTION_SQL
    ),
}
