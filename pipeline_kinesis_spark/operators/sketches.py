"""Mergeable-sketch aggregates: count-min and bloom filter (B14 family).

PipelineDB's continuous aggregates lean on mergeable sketches (its public
docs: hll, bloom, count-min, top-k); Spark ships HLL
(``approx_count_distinct``) and t-digest-style percentiles
(``percentile_approx``) natively — this module adds the other two in the
shape that scales: each partition builds a PARTIAL sketch over its rows
(vectorized pandas inside ``mapInPandas``), and partials merge
associatively (count-min: matrix +, bloom: bitmap OR). That is map-side
combine made explicit — shuffle traffic is O(partitions × sketch bytes)
regardless of row count, so the same code runs at 100 TB: a few KB per
partition flow to the driver, never the data.

Determinism: hash seeds are fixed (blake2b with per-row salt), so results
are reproducible and oracle-comparable. With sketch width far above the
key cardinality used in the fixtures, count-min estimates are collision
free and equal EXACT counts — which is what the DuckDB oracle asserts;
the sketch still degrades gracefully (pure overestimate) at adversarial
cardinalities.

Reference analog: the continuous-view aggregate state that PipelineDB
updates per batch (README.md:66 count-per-key is the degenerate exact
case).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec

CMS_DEPTH = 4
CMS_WIDTH = 8192
BLOOM_BITS = 1 << 16
BLOOM_HASHES = 5


def _hash(key: str, salt: int) -> int:
    h = hashlib.blake2b(
        f"{salt}:{key}".encode(), digest_size=8
    ).digest()
    return int.from_bytes(h, "big")


def _cms_partials(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    table = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    keys: set[str] = set()
    for pdf in pdfs:
        counts = pdf.iloc[:, 0].value_counts()
        for key, cnt in counts.items():
            keys.add(str(key))
            for d in range(CMS_DEPTH):
                table[d, _hash(str(key), d) % CMS_WIDTH] += int(cnt)
    yield pd.DataFrame({"sketch": [table.tobytes()], "keys": [sorted(keys)]})


def _bloom_partials(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    keys: set[str] = set()
    for pdf in pdfs:
        for key in pdf.iloc[:, 0].drop_duplicates():
            keys.add(str(key))
            for d in range(BLOOM_HASHES):
                i = _hash(str(key), d) % BLOOM_BITS
                bits[i >> 3] |= 1 << (i & 7)
    yield pd.DataFrame({"sketch": [bits.tobytes()], "keys": [sorted(keys)]})


_PARTIAL_SCHEMA = "sketch BINARY, keys ARRAY<STRING>"


def cms_build_with_keys(df: DataFrame, col: str) -> tuple[np.ndarray, list[str]]:
    """Merged count-min sketch of ``col`` plus the distinct keys seen,
    both carried out of the SAME per-partition pass — one scan total.
    Partials are one small row per partition; the driver-side merge is
    O(partitions), not O(rows). (Key sets stay tiny for the dimension-like
    columns sketched here; for unbounded key spaces use the fss summary.)"""
    parts = df.select(col).mapInPandas(_cms_partials, _PARTIAL_SCHEMA)
    merged = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    keys: set[str] = set()
    for row in parts.collect():
        merged += np.frombuffer(row.sketch, dtype=np.int64).reshape(
            CMS_DEPTH, CMS_WIDTH
        )
        keys.update(row["keys"])
    return merged, sorted(keys)


def cms_build(df: DataFrame, col: str) -> np.ndarray:
    return cms_build_with_keys(df, col)[0]


def cms_estimate(sketch: np.ndarray, key: str) -> int:
    return int(
        min(
            sketch[d, _hash(key, d) % CMS_WIDTH]
            for d in range(CMS_DEPTH)
        )
    )


def bloom_build_with_keys(df: DataFrame, col: str) -> tuple[bytes, list[str]]:
    """Merged bloom filter plus the distinct keys seen — one scan (see
    cms_build_with_keys)."""
    parts = df.select(col).mapInPandas(_bloom_partials, _PARTIAL_SCHEMA)
    merged = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    keys: set[str] = set()
    for row in parts.collect():
        merged |= np.frombuffer(row.sketch, dtype=np.uint8)
        keys.update(row["keys"])
    return merged.tobytes(), sorted(keys)


def bloom_build(df: DataFrame, col: str) -> bytes:
    return bloom_build_with_keys(df, col)[0]


def bloom_might_contain(bloom: bytes, key: str) -> bool:
    bits = np.frombuffer(bloom, dtype=np.uint8)
    for d in range(BLOOM_HASHES):
        i = _hash(str(key), d) % BLOOM_BITS
        if not (bits[i >> 3] >> (i & 7)) & 1:
            return False
    return True


def cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type counts answered FROM THE SKETCH (never a second scan
    of the data). Event-type cardinality ≪ width ⇒ estimates are exact and
    the plain GROUP BY oracle applies."""
    e = load(spark, sf_dir, "events")
    sketch, keys = cms_build_with_keys(e, "event_type")
    rows = [(k, cms_estimate(sketch, k)) for k in keys]
    return spark.createDataFrame(rows, "event_type STRING, est_count BIGINT")


CMS_EVENT_COUNTS_SQL = """
SELECT event_type, count(*) AS est_count
FROM events
GROUP BY event_type
"""


def bloom_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join: which of a probe list of priority labels
    occur in orders. Probe set is tiny and the filter key-space (5 labels)
    is far below capacity ⇒ no false positives here, so the EXISTS oracle
    applies; tests assert the no-false-negative guarantee separately."""
    o = load(spark, sf_dir, "orders")
    bloom, probes = bloom_build_with_keys(o, "o_orderpriority")
    probes = probes + ["9-NONEXISTENT"]
    rows = [(p, bloom_might_contain(bloom, p)) for p in probes]
    return spark.createDataFrame(rows, "priority STRING, present BOOLEAN")


BLOOM_ORDER_PRIORITIES_SQL = """
WITH probes AS (
  SELECT DISTINCT o_orderpriority AS priority FROM orders
  UNION ALL SELECT '9-NONEXISTENT'
)
SELECT priority,
       EXISTS (SELECT 1 FROM orders WHERE o_orderpriority = priority)
         AS present
FROM probes
"""


FSS_CAPACITY = 256
FSS_TOPK = 20


def _fss_partials(pdfs: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """Per-partition heavy-hitter summary: exact partition-local counts,
    truncated to the top FSS_CAPACITY keys; the truncated tail's max count
    is the summary's error bound (any UNLISTED key occurs ≤ err times in
    this partition). ``pid`` identifies the partition so the merge can
    bound each key's overcount by the errs of partitions that did NOT
    report it."""
    import uuid

    counts: pd.Series | None = None
    for pdf in pdfs:
        c = pdf.iloc[:, 0].value_counts()
        counts = c if counts is None else counts.add(c, fill_value=0)
    if counts is None:
        counts = pd.Series(dtype="int64")
    counts = counts.sort_values(ascending=False)
    kept = counts.iloc[:FSS_CAPACITY]
    err = int(counts.iloc[FSS_CAPACITY:].max()) if len(counts) > FSS_CAPACITY else 0
    yield pd.DataFrame(
        {
            "pid": [uuid.uuid4().hex] * len(kept),
            "key": kept.index.astype(str),
            "cnt": kept.to_numpy(dtype="int64"),
            "err": np.full(len(kept), err, dtype="int64"),
        }
    )


def _fss_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )


def _fss_summary_top(toks: DataFrame, n: int) -> DataFrame:
    """The sketch path: per-partition summaries merged to the global top-n
    by summary lower bound, each with its max_overcount error bound."""
    partials = toks.mapInPandas(
        _fss_partials, "pid STRING, key STRING, cnt BIGINT, err BIGINT"
    )
    # total err over all partitions; a key's overcount is bounded by the
    # errs of the partitions that did NOT report it.
    tot = (
        partials.select("pid", "err")
        .distinct()
        .agg(F.coalesce(F.sum("err"), F.lit(0)).alias("tot_err"))
    )
    merged = partials.groupBy("key").agg(
        F.sum("cnt").alias("count_lb"),
        F.sum("err").alias("rep_err"),
    )
    return (
        merged.crossJoin(F.broadcast(tot))
        .withColumn("max_overcount", F.col("tot_err") - F.col("rep_err"))
        .orderBy(F.desc("count_lb"), F.asc("key"))
        .limit(n)
    )


def fss_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure sketch operator (this is what bench.py times): top-k
    heavy-hitter tokens by summary lower bound. ONE scan of the token
    stream; shuffle is O(partitions × capacity) rows — never the stream
    itself; the final merge is a small groupBy."""
    top = _fss_summary_top(_fss_toks(spark, sf_dir), FSS_TOPK)
    return top.select(
        F.col("key").alias("token"), "count_lb", "max_overcount"
    )


def fss_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k heavy-hitter tokens across documents via mergeable summaries
    (PipelineDB fss_agg/topk analog) — the ORACLE-GATED form: the sketch
    nominates 2×k candidates by lower bound (over-fetch absorbs summary
    lossiness near rank k), an exact aggregation over those candidates
    only settles the final ranking, and a boolean asserts the summary's
    guarantee count_lb ≤ exact ≤ count_lb + max_overcount held. The
    oracle emits the exact top-k and literal TRUE. The exact join is
    verification harness, not the sketch path — bench.py times
    fss_topk_sketch instead (QuerySpec.bench_fn)."""
    toks = _fss_toks(spark, sf_dir)
    cand = _fss_summary_top(toks, 2 * FSS_TOPK)
    exact = (
        toks.join(F.broadcast(cand.select("key")), toks.tok == F.col("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        cand.join(exact, "key")
        .orderBy(F.desc("exact_count"), F.asc("key"))
        .limit(FSS_TOPK)
        .select(
            F.col("key").alias("token"),
            F.col("exact_count"),
            (
                (F.col("exact_count") >= F.col("count_lb"))
                & (
                    F.col("exact_count")
                    <= F.col("count_lb") + F.col("max_overcount")
                )
            ).alias("within_bound"),
        )
    )


FSS_TOPK_TOKENS_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
cnt AS (
  SELECT tok AS token, count(*) AS exact_count
  FROM toks WHERE tok <> '' GROUP BY tok
)
SELECT token, exact_count, TRUE AS within_bound
FROM cnt
ORDER BY exact_count DESC, token ASC
LIMIT 20
"""


def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PipelineDB-style mergeable HLL state (its hll_agg + combine): build
    one HLL sketch per (priority, order-year) PARTIAL with
    hll_sketch_agg, then MERGE the per-year partials per priority with
    hll_union_agg — exactly the combine a continuous view performs across
    micro-batches; the estimate is read from the merged sketch, never by
    re-scanning rows. Gate form follows the exact+within-bound pattern:
    exact distinct (DuckDB-computable) + a boolean that the merged-sketch
    estimate landed within the HLL error envelope (default lgConfigK=12
    → ~1.6% rsd; 5% bound is generous)."""
    o = load(spark, sf_dir, "orders")
    partials = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("o_year")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = partials.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    return (
        exact.join(merged, "o_orderpriority")
        .select(
            F.col("o_orderpriority").alias("priority"),
            "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_bound"),
        )
    )


HLL_MERGEABLE_SQL = """
SELECT
  o_orderpriority AS priority,
  count(DISTINCT o_custkey) AS exact_distinct,
  TRUE AS within_bound
FROM orders
GROUP BY o_orderpriority
"""


def theta_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA across segments (B14's set-operation
    tier, Apache DataSketches native in Spark 4.1): per event type,
    one theta sketch of its distinct users; for every type pair the
    audience union / intersection / difference come from sketch
    algebra (theta_union / theta_intersection / theta_difference) —
    the operation HLL cannot do (HLL unions only; intersections via
    inclusion-exclusion explode in error). This is the scale shape for
    cross-segment overlap (decontamination across corpus slices,
    audience overlap): O(types) sketches of O(k) bytes each, pairwise
    algebra over O(types²) TINY operands — the raw table is scanned
    once, never self-joined, at any volume.

    Gate form is the sketch envelope pattern (hll_mergeable_distinct):
    the exact pairwise counts (one distinct + one user-keyed self-join
    — the labeled exact ANCHOR tier, DuckDB-computable) ride along
    with booleans that each sketch estimate lands within 5%; at
    fixture cardinalities the sketches are in exact mode, so the
    bound is loose."""
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = e.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").alias("nd"),
    )
    pairs = (
        per_type.alias("a")
        .join(
            per_type.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.nd").alias("n_a"),
            F.col("b.nd").alias("n_b"),
            F.expr(
                "theta_sketch_estimate(theta_union(a.sk, b.sk))"
            ).alias("u_est"),
            F.expr(
                "theta_sketch_estimate(theta_intersection(a.sk, b.sk))"
            ).alias("i_est"),
            F.expr(
                "theta_sketch_estimate(theta_difference(a.sk, b.sk))"
            ).alias("d_est"),
        )
    )
    du = e.distinct()
    inter = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = pairs.join(inter, ["type_a", "type_b"], "left").fillna(
        0, subset=["n_inter"]
    )

    def bound(est, exact):
        return (
            F.abs(est - exact) <= 0.05 * F.greatest(exact, F.lit(1))
        )

    return out.select(
        "type_a",
        "type_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_inter").cast("long").alias("n_inter"),
        (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .cast("long")
        .alias("n_union"),
        bound(F.col("u_est"), F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias(
            "union_in_bound"
        ),
        bound(F.col("i_est"), F.col("n_inter")).alias(
            "intersect_in_bound"
        ),
        bound(F.col("d_est"), F.col("n_a") - F.col("n_inter")).alias(
            "diff_in_bound"
        ),
    )


THETA_SET_OVERLAP_SQL = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
nd AS (SELECT event_type, count(*) AS n FROM du GROUP BY event_type),
inter AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         count(*) AS n_inter
  FROM du x JOIN du y
    ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(a.n AS BIGINT) AS n_a,
       CAST(b.n AS BIGINT) AS n_b,
       CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(a.n + b.n - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
       TRUE AS union_in_bound,
       TRUE AS intersect_in_bound,
       TRUE AS diff_in_bound
FROM nd a
JOIN nd b ON a.event_type < b.event_type
LEFT JOIN inter i
  ON i.type_a = a.event_type AND i.type_b = b.event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "theta_set_overlap": QuerySpec(
        theta_set_overlap, THETA_SET_OVERLAP_SQL
    ),
    "cms_event_counts": QuerySpec(cms_event_counts, CMS_EVENT_COUNTS_SQL),
    "hll_mergeable_distinct": QuerySpec(
        hll_mergeable_distinct, HLL_MERGEABLE_SQL
    ),
    "bloom_order_priorities": QuerySpec(
        bloom_order_priorities, BLOOM_ORDER_PRIORITIES_SQL
    ),
    "fss_topk_tokens": QuerySpec(
        fss_topk_tokens, FSS_TOPK_TOKENS_SQL, bench=True,
        bench_fn=fss_topk_sketch,
    ),
}
