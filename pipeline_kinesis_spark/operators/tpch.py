"""TPC-H-derived analytic queries over the star-schema testdata.

These are the headline bench queries (SURVEY.md §2B: B5-B7, B12, B18, B19).
Scale notes per query are in docstrings; the common discipline:

- dimension joins (region/nation/supplier/part) are broadcast — no shuffle;
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key once, and
  group-by keys are chosen to reuse that partitioning where possible;
- money sums use exact integer cents (see functions.exprs) so results are
  reproducible at any parallelism;
- filters are plain Catalyst predicates → pushed into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_kinesis_spark.functions.exprs import cents, revenue_cents
from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy group-by aggregation (B12).

    One parquet scan, map-side partial agg into 6 final groups — the shuffle
    moves only num_partitions × 6 rows regardless of input size, so this
    scales linearly to 100 TB. Filter is pushed to the scan.
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_base_price_cents"),
            F.sum(cents(disc_price)).alias("sum_disc_price_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 4) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
  CAST(sum(CAST(round(((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective joins + group + top-k (B7, B12, B18, B19).

    customer is filtered then broadcast; orders ⋈ lineitem shuffles on
    orderkey; final top-10 is a global sort of the (small) aggregated set —
    Spark's TakeOrderedAndProject, no full sort at scale.
    """
    cutoff = F.lit("1996-03-15").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_cents().alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT
  o_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table join (B7) with broadcast dims, agg by nation.

    region/nation/supplier broadcast; the only shuffles are
    orders ⋈ lineitem (orderkey) and the final 25-group agg.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue_cents().alias("revenue_cents"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg (B5, B6, B12).

    Every predicate is scan-pushed; no shuffle at all beyond the single
    global sum (partial per partition → one row).
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * F.col("l_discount"))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT
  CAST(sum(CAST(round((l_extendedprice * l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: join + agg + top-20 (B7, B12, B19); nation broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_cents().alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT
  c_custkey,
  c_name,
  c_acctbal,
  n_name,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS-style semi join + group (B9, B12)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    # commit-date column doesn't exist in this fixture; Q4's semantic core
    # is EXISTS(lineitem for the order with a property) — use late-shipped
    # lines (shipped > 30 days after order date) as the property.
    l = load(spark, sf_dir, "lineitem")
    late = l.join(
        o, l.l_orderkey == o.o_orderkey
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation (B12, B21)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT
  l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: broadcast join + ratio of conditional sums (B7, B21)."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).alias("promo_cents"),
            F.sum(rev).alias("total_cents"),
            F.round(
                F.lit(100.0) * F.sum(promo) / F.sum(rev), 6
            ).alias("promo_pct"),
        )
    )


Q14_SQL = """
SELECT
  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)
           ELSE 0 END) AS BIGINT) AS promo_cents,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
  round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)
           ELSE 0 END) / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)), 6) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: anti-join (NOT IN subquery) + distinct agg (B9, B13)."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (~F.col("p_type").like("PROMO%"))
    )
    l = load(spark, sf_dir, "lineitem")
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pl = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).join(
        F.broadcast(bad_supp),
        l.l_suppkey == bad_supp.s_suppkey,
        "left_anti",
    )
    return (
        pl.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND NOT EXISTS (
    SELECT 1 FROM supplier
    WHERE s_suppkey = l_suppkey AND s_acctbal < 0
  )
GROUP BY p_brand, p_size
"""


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered aggregation subquery driving a join
    (B12, B19). The HAVING agg shuffles once on orderkey; the reuse of
    that partitioning for the outer join is Catalyst's to exploit."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "total_qty",
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 4) > 150
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR'd) multi-clause predicates over a
    broadcast join — the planner must still push the shared l_partkey
    equi-key and evaluate the OR post-join (B6, B7)."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 35))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                cents(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                )
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
  count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery (B7, B12). The fixture has no
    partsupp table, so "cost" is the supplier's account balance and the
    part-supplier relation is DISTINCT (l_partkey, l_suppkey) from lineitem.

    Scale: the pairs dedup shuffles once on the compound key; supplier ⋈
    nation ⋈ region is broadcast; the per-part min is a window over the
    already-shuffled partkey partitioning (no extra shuffle)."""
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "STANDARD")
    )
    eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(eu), pairs.l_suppkey == eu.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
    )


Q2_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name
  FROM pairs
  JOIN part ON l_partkey = p_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
),
m AS (SELECT p_partkey, min(s_acctbal) AS min_bal FROM cand GROUP BY p_partkey)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_name
FROM cand c JOIN m ON c.p_partkey = m.p_partkey AND c.s_acctbal = m.min_bal
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair revenue by ship year (B7, B12,
    B21). Both nation dims broadcast; the only big shuffles are the two
    fact joins on orderkey/custkey."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    # NATION_20/NATION_11 chosen so the oracle is data-bearing at every
    # fixture SF (sf0.001 included) — vacuous-lint safe.
    pair = (
        (F.col("supp_nation") == "NATION_20")
        & (F.col("cust_nation") == "NATION_11")
    ) | (
        (F.col("supp_nation") == "NATION_11")
        & (F.col("cust_nation") == "NATION_20")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(revenue_cents().alias("revenue_cents"))
    )


Q7_SQL = """
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
  AND l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — ratio of conditional exact-cents
    sums per order year (B7, B12, B21). Numerator and denominator are both
    exact integer sums, so the single final division is deterministic at
    any parallelism."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = load(spark, sf_dir, "nation")  # customer-side nation (region gate)
    ns = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    vol = cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    target = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(target).alias("nation_cents"),
            F.sum(vol).alias("total_cents"),
            F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"),
        )
    )


Q8_SQL = """
SELECT
  year(o_orderdate) AS o_year,
  CAST(sum(CASE WHEN ns.n_name = 'NATION_7'
           THEN CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)
           ELSE 0 END) AS BIGINT) AS nation_cents,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
  round(sum(CASE WHEN ns.n_name = 'NATION_7'
           THEN CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)
           ELSE 0 END) * 1.0
        / sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'ASIA'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year (B7, B12).
    No partsupp in the fixture, so supply cost is modeled as 10% of
    p_retailprice per unit; profit is rounded to cents per row then summed
    exactly."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    amount = cents(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.sum(amount).alias("profit_cents"))
    )


Q9_SQL = """
SELECT
  n_name AS nation,
  year(o_orderdate) AS o_year,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                  - p_retailprice * 0.1 * l_quantity) * 100, 0) AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value vs a global-total scalar
    subquery (B12, B19). No partsupp, so value = Σ cents(p_retailprice ×
    l_quantity) per part. The global total is derived from the SAME per-part
    aggregate (one shuffle) and broadcast back as a 1-row cross join —
    the 100 TB plan is two stages, not a re-scan."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    per_part = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(cents(F.col("p_retailprice") * F.col("l_quantity"))).alias(
                "value_cents"
            )
        )
    )
    total = per_part.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.lit(2) * F.col("n_parts")
            > F.lit(3) * F.col("total_cents")
        )
        .select("l_partkey", "value_cents")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(p_retailprice * l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM per_part
WHERE 2 * value_cents * (SELECT count(*) FROM per_part)
      > 3 * (SELECT sum(value_cents) FROM per_part)
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram via left outer join with a join-time
    predicate (B8, B12). Two aggregations: per-customer (shuffles on
    custkey, reusing the join partitioning) then the tiny histogram."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top revenue supplier via a scalar-max subquery (B12, B19).
    The per-supplier aggregate is one shuffle; the global max is a 1-row
    broadcast cross join against it (no window over a single partition —
    that would serialize |suppliers| rows through one task at scale)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        l.groupBy("l_suppkey")
        .agg(revenue_cents().alias("total_revenue_cents"))
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("max_cents"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_cents
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-half-average-quantity lines, i.e. a
    correlated per-part AVG subquery (B7, B12). l_quantity is integral so
    the avg (exact integer sum ÷ count) is bit-identical in any engine and
    the strict < comparison is deterministic. The per-part avg shuffles on
    partkey; the fact side reuses that key for its join."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = l.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.sum(cents("l_extendedprice")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
WITH pa AS (
  SELECT l_partkey AS pa_key, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
  count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa ON l_partkey = pa_key
WHERE p_brand = 'Brand#3' AND l_quantity < half_avg
"""


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of matching parts —
    a nested IN chain compiled to semi joins (B9, B12). No partsupp, so the
    volume threshold is Σ l_quantity per (part, supplier) in 1996 > 100."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    qty = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sq"))
        .filter(F.col("sq") > 30)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        s.join(qty, s.s_suppkey == qty.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


Q20_SQL = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_partkey, l_suppkey
    HAVING round(sum(l_quantity), 4) > 30
  )
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS over sibling lineitems (B9).
    No commit/receipt dates in the fixture, so "late" = shipped more than
    60 days after the order date. A supplier "kept a multi-supplier order
    waiting" if it was the ONLY late supplier on a finished order.

    Plan shape at scale: the late set and the sibling sets are keyed by
    orderkey, so all three joins (inner, semi, anti) share one shuffle key;
    supplier/nation broadcast."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).distinct()
    late_pairs = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(
            all_pairs,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late_pairs,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, n_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name, n_name
"""


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average idle customers by country code (B9,
    B12). No phone column, so cntrycode = c_nationkey mod 10; every
    synthetic customer has at least one order, so "idle" = no order since
    2000-01-01 (keeps the anti join non-vacuous at every SF). The average
    is computed in exact cents (integer sum ÷ count, one deterministic
    division) and broadcast; the no-recent-orders test is an anti join."""
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10
    ).filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(cents("c_acctbal")) / F.count(F.lit(1))
        ).alias("avg_cents")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(cents("c_acctbal") > F.col("avg_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents("c_acctbal")).alias("totacctbal_cents"),
        )
    )


Q22_SQL = """
WITH cc AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
  FROM customer
  WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
),
avg_bal AS (
  SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) * 1.0 / count(*) AS avg_cents
  FROM cc WHERE c_acctbal > 0
)
SELECT cntrycode,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM cc, avg_bal
WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
"""


QUERIES: dict[str, QuerySpec] = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL, bench=True),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_SQL, bench=True),
    "q5_local_supplier_volume": QuerySpec(
        q5_local_supplier_volume, Q5_SQL, bench=True
    ),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_SQL, bench=True),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL, bench=True),
    "q4_order_priority": QuerySpec(q4_order_priority, Q4_SQL),
    "q12_shipmode_priority": QuerySpec(q12_shipmode_priority, Q12_SQL, bench=True),
    "q14_promo_revenue": QuerySpec(q14_promo_revenue, Q14_SQL),
    "q16_supplier_cnt": QuerySpec(q16_supplier_cnt, Q16_SQL),
    "q18_large_volume_customer": QuerySpec(q18_large_volume_customer, Q18_SQL, bench=True),
    "q19_discounted_revenue": QuerySpec(q19_discounted_revenue, Q19_SQL),
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL),
    "q7_volume_shipping": QuerySpec(q7_volume_shipping, Q7_SQL),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_SQL, bench=True),
    "q11_important_stock": QuerySpec(q11_important_stock, Q11_SQL),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL),
    "q20_part_promotion": QuerySpec(q20_part_promotion, Q20_SQL),
    "q21_waiting_suppliers": QuerySpec(q21_waiting_suppliers, Q21_SQL),
    "q22_global_sales": QuerySpec(q22_global_sales, Q22_SQL),
}
