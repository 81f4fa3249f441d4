"""Deduplication operators over the documents table (SURVEY.md §2C C1/C2).

Four tiers, all shuffle-disciplined for 100 TB:

- exact content-hash dedup: one groupBy on a 256-bit fingerprint — the
  canonical first pass; hash-partition balances perfectly.
- n-gram Jaccard pairs: inverted-index (shingle → doc) self-join — the
  exact similarity join, cost ∝ Σ|posting list|²; its prefix-filtered
  twin (ngram_jaccard_prefix, PPJoin principle) indexes only each doc's
  rarest shingles so frequent-shingle posting-list blowup never reaches
  the join — same output, same oracle.
- MinHash LSH: constant-size signature per doc (k minima), banded bucket
  join — candidate generation cost independent of document length; the
  100 TB path. Pure JVM expressions (xxhash64), no UDFs.
- SimHash: 64-bit signature + banded Hamming join — cheapest near-dup tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_kinesis_spark.functions.exprs import ngram_rows, tokens
from pipeline_kinesis_spark.io import hash_align, load, spread
from pipeline_kinesis_spark.operators import (
    QuerySpec,
    pool_register,
    pooled_persist,
    release_stale_caches,
)

# MinHash parameters: 32 permutations in 8 bands of 4 rows → catches
# jaccard ≳ 0.5 with high probability while keeping signatures tiny.
NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: group documents by sha256(normalized text); emit fingerprint,
    cardinality and representative (min doc_id). One shuffle on the hash."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("fingerprint", F.sha2(F.lower(F.trim("text")), 256))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


EXACT_DEDUP_SQL = """
SELECT
  sha256(lower(trim(text))) AS fingerprint,
  min(doc_id) AS keep_doc_id,
  count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def _shingle_hash_rows(d: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → one row per shingle position, sh = xxhash64 of the n-token
    shingle (duplicates retained).

    r15 second pass: the previous form built a per-doc ARRAY via a
    transform() lambda — a HigherOrderFunction, which is CodegenFallback,
    so the hottest per-row work in the whole bench (slice + concat_ws +
    xxhash64 per shingle) ran in the interpreted evaluator (see
    exprs.ngram_rows for the measurements). This form is the same
    explode the consumers all performed anyway, moved before the hash so
    every expression is codegen'd. doc_id-partitioned (spread) so
    per-doc aggregates downstream plan with no exchange.
    """
    toked = spread(
        d.select("doc_id", tokens("text").alias("t")).filter(
            F.size("t") >= n
        ),
        "doc_id",
    )
    return ngram_rows(toked, "t", n, keep=("doc_id",), gram_col="g").select(
        "doc_id", F.xxhash64("g").alias("sh")
    )


JACCARD_THRESHOLD = 0.5


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (exact): document pairs with 3-gram-shingle Jaccard ≥ 0.5 via a
    plain inverted-index self-join — cost ∝ Σ|posting list|². The right
    choice when shingle frequencies are benign (short posting lists);
    ngram_jaccard_prefix below is the same computation with prefix
    filtering for skewed corpora.

    r15 (guide §2.3/§2.4): the per-doc distinct and set size are
    computed WITHOUT an exchange — the shingle rows are already
    doc_id-partitioned (spread in _shingle_hash_rows), so the distinct
    (a groupBy on (doc_id, sh), whose clustering a doc_id partitioning
    satisfies) and the per-doc count window both plan shuffle-free; the
    old form's per-doc sizes aggregate and two size join-backs are gone
    (sz_a/sz_b ride the join rows and come out of the pair aggregate as
    min() of a per-group constant).

    r15 second pass: shingle hashing itself is now codegen'd rows
    (_shingle_hash_rows) instead of an interpreted transform() array —
    see exprs.ngram_rows for measurements.

    The posting table is explicitly hash-partitioned on the shingle key
    BEFORE the self-join (spread): at scale a sort-merge self-join
    needs exactly that exchange anyway (zero added cost), and locally
    it is the MATERIALIZATION POINT both join sides reuse
    (ReusedExchange) — without it, when the planner broadcasts one
    side, the broadcast build re-executes the whole
    tokenize→hash→distinct pipeline a second time (the old form's
    distinct exchange used to provide this reuse point for free;
    measured ~2.4× on the bench when it was dropped without a
    replacement).
    """
    dist = _shingle_hash_rows(load(spark, sf_dir, "documents")).distinct()
    sh = hash_align(
        dist.withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        ),
        "sh",
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("sz_a").alias("sz_a"),
            F.min("sz_b").alias("sz_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (exact, skew-resistant): same output as ngram_jaccard_pairs via
    PREFIX FILTERING (the PPJoin principle).

    Order each document's shingles by ascending corpus frequency and
    index only the first |d| - ⌈t·|d|⌉ + 1 of them — if two sets have
    Jaccard ≥ t their prefixes must share a shingle, so the prefix-index
    self-join yields a candidate superset; an exact intersection count
    verifies each candidate. The wins at 100 TB: indexed lists are
    ~(1-t)× shorter, and because prefixes hold each doc's RAREST
    shingles, stop-shingle posting-list blowup ("the the the" in every
    doc) never reaches the join. Identical output → same oracle.
    """
    return _jaccard_prefix_pairs(spark, sf_dir, JACCARD_THRESHOLD)


def _jaccard_prefix_pairs(
    spark: SparkSession, sf_dir: str, t: float
) -> DataFrame:
    """Prefix-filtered exact Jaccard-similarity self-join at threshold
    ``t`` (see ngram_jaccard_prefix)."""
    # the per-doc distinct-shingle table feeds the frequency count AND
    # the per-doc fold — materialize it once (on a cluster: checkpoint
    # to a table) instead of re-running the tokenize+hash per consumer.
    # Pool-persisted: the next operator entry releases it, so gate/bench
    # sessions don't accumulate cached partitions across queries.
    # r15 (guide §2.4): the cache holds one array row per doc and its
    # build has NO distinct exchange — shingle rows arrive
    # doc_id-partitioned (spread in _shingle_hash_rows), so the per-doc
    # collect_set aggregate plans shuffle-free. r15 second pass: the
    # hashing itself is codegen'd rows instead of an interpreted
    # transform() array (exprs.ngram_rows); collect_set replaces
    # array_distinct (same set — order is irrelevant downstream:
    # array_intersect and the explode are order-agnostic, and docagg
    # builds its own frequency-sorted list).
    release_stale_caches()
    da = pooled_persist(
        _shingle_hash_rows(load(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("arr"))
        .withColumn("sz", F.size("arr"))
    )
    # explode_outer: arr is provably non-empty; keeps the inferred
    # generate-filter off the cache-build pipeline (see
    # ngram_jaccard_pairs). sz rides every posting row — it is the
    # window-free per-doc set size.
    sh = da.select("doc_id", "sz", F.explode_outer("arr").alias("sh"))

    # global shingle frequency via groupBy + join-back, NOT a
    # count-over-window: window functions get no map-side partial
    # aggregation and no AQE skew splitting, so a stop-shingle present
    # in ~every doc ("the the the") would put its entire posting list
    # in ONE task — a skew bottleneck inside the operator whose whole
    # point is skew immunity. groupBy collapses each hot key map-side
    # (partial_count) so the exchange carries one row per distinct
    # shingle, and the join back to `sh` is AQE skew-join-eligible.
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    shf = sh.join(df_counts, "sh")

    # prefix index: each doc's plen = |d| - ceil(t*|d|) + 1 rarest
    # shingles under the global (df, sh) total order, as a row_number
    # window directly over the posting rows. r15 third pass (guide
    # §1.2/§4.1, measured): the old form re-aggregated the posting
    # table per doc (collect_list struct + array_sort + transform +
    # slice + re-explode) — an ObjectHashAggregate with an extra
    # exchange, whose sort ran per-comparison through the INTERPRETED
    # lambda comparator (ArraySort and friends are CodegenFallback);
    # ~13 of the query's ~21 CPU-s. The window's sort is the codegen'd
    # unsafe-row sort, the doc_id clustering is satisfied by the
    # cache's partitioning (no exchange), and doc-sized groups cannot
    # skew. Same (df, sh) order ⇒ identical prefixes ⇒ identical
    # candidates; the PPJoin guarantee needs only SOME shared total
    # order, and verification below is exact either way.
    wn = Window.partitionBy("doc_id").orderBy("df", "sh")
    prefix = (
        shf.withColumn("rn", F.row_number().over(wn))
        .filter(
            F.col("rn")
            <= (F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1).cast("int")
        )
        # rn rides along for the POSITIONAL filter below (r16): it is
        # each shingle's 1-based position within its doc under the
        # global (df, sh) total order — exactly the position PPJoin's
        # ubound needs.
        .select("doc_id", "sz", "sh", "rn")
    )
    # pool-persist the prefix index: the self-join consumes it twice,
    # and a subtree that contains an InMemoryRelation is NOT eligible
    # for AQE exchange reuse (measured this round: ReusedExchange 1 →
    # 0 the moment the da cache appears below the spread), so an
    # explicit cache is the only dedup point that works here.
    prefix = pooled_persist(prefix)

    # candidate join = equi on the shared prefix shingle + the PPJoin
    # LENGTH FILTER: jaccard >= t forces t·|b| <= |a| (and vice versa),
    # so wildly different-sized sets never become candidates. Cuts ~24%
    # of candidates on the fixture corpus; far more on corpora with a
    # wide length distribution.
    #
    # INDEX PREFIX (r16, the PPJoin index-prefix theorem): the self-join
    # is ordered by (sz, doc_id) instead of doc_id, so the smaller-set
    # side only needs its INDEX prefix — the sz - ceil(2t/(1+t)*sz) + 1
    # rarest shingles (≈ sz/3 at t=0.5) instead of the probe prefix's
    # sz - ceil(t*sz) + 1 (≈ sz/2). For any pair with jaccard >= t and
    # |x| <= |y|, the required overlap alpha >= ceil(2t/(1+t)*|x|)
    # leaves at most |x| - alpha common shingles outside x's index
    # prefix and at most |y| - ceil(t*|y|) outside y's probe prefix, so
    # a shared shingle inside BOTH prefixes must exist — candidates are
    # never lost, and the exact verification below makes the emitted
    # pair set identical. Measured at sf1: candidate occurrences
    # 3.29M -> 2.36M (see OPTIMIZATION_r16.md). The 1e-9 slack on the
    # index-prefix cutoff only ever keeps MORE rows, so float rounding
    # can never over-prune.
    # The index-prefix cut rides as a JOIN PREDICATE on the a side
    # rather than a pre-filtered build input: both join sides stay the
    # SAME cached table (the symmetric r15 plan shape — a separately
    # filtered build side added a broadcast stage that cost ~+0.3 s
    # wall at bench SF), the matches are filtered during the hash
    # probe, and the downstream distinct + verification see the same
    # reduced candidate set either way.
    idx_plen_a = (
        F.col("a.sz")
        - F.ceil(F.lit(2.0 * t / (1.0 + t)) * F.col("a.sz") - F.lit(1e-9))
        + 1
    ).cast("int")
    a = prefix.alias("a")
    b = prefix.alias("b")
    # POSITIONAL filter (r16, the PPJoin ubound — guide §1.2 "the
    # distributed algorithm first"): the sf1 profile put the top cost
    # of this operator in the exact verification stage (array_intersect
    # per surviving pair, pipelineTime 76.8 s of a ~70 CPU-s run), so
    # the cheapest win is fewer candidates entering it. For a match on
    # a shared prefix shingle at positions (rn_a, rn_b) of the SAME
    # global (df, sh) order, every common shingle before it counts at
    # most min(rn_a-1, rn_b-1) and every one after at most
    # min(sz_a-rn_a, sz_b-rn_b), so
    #   overlap <= least(rn_a, rn_b) + least(sz_a-rn_a, sz_b-rn_b).
    # Jaccard >= t forces overlap >= t*(sz_a+sz_b)/(1+t); an occurrence
    # whose bound cannot reach that is dropped. Each occurrence's bound
    # is independently valid, so per-row filtering before the distinct
    # is sound: a pair survives iff at least one of its generating
    # matches could still reach the threshold, and verification below
    # stays exact either way — the emitted pair set is IDENTICAL (the
    # filter can only drop pairs whose verified jaccard is < t).
    # The comparison keeps the borderline (1e-9 slack, only ever
    # KEEPING more candidates) so float rounding can never over-prune.
    ubound = F.least(F.col("a.rn"), F.col("b.rn")) + F.least(
        F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
    )
    candidates = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            # (sz, doc_id) total order: a is the smaller set (the one
            # whose index prefix suffices), ties broken by doc_id
            & (
                (F.col("a.sz") < F.col("b.sz"))
                | (
                    (F.col("a.sz") == F.col("b.sz"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            # length filter: a.sz <= b.sz makes t*a.sz <= b.sz implicit;
            # the binding direction is a.sz >= ceil(t*b.sz)
            & (F.col("a.sz") >= F.ceil(F.lit(t) * F.col("b.sz")))
            # index prefix: the smaller set's matching shingle must sit
            # in its INDEX prefix (~sz/3 at t=0.5), not just the probe
            # prefix (~sz/2)
            & (F.col("a.rn") <= idx_plen_a)
            & (
                ubound * F.lit(1.0 + t)
                >= F.lit(t) * (F.col("a.sz") + F.col("b.sz")) - F.lit(1e-9)
            ),
        )
        # distinct FIRST on the raw (sz, doc_id)-ordered orientation —
        # each unordered pair appears in exactly one orientation under
        # a total order, so this is already pair-unique — and normalize
        # to the declared doc_a < doc_b orientation AFTER the dedup.
        # Normalizing before the distinct (least/greatest as aggregate
        # keys) measured 2.6x the steady-state WALL of this query at
        # sf0.1 (1.34 -> 3.5 s, interleaved 12-rep A/B) with the same
        # CPU — keep the aggregate keyed on plain attributes.
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
        .select(
            F.least(F.col("u"), F.col("v")).alias("doc_a"),
            F.greatest(F.col("u"), F.col("v")).alias("doc_b"),
        )
    )

    # exact verification: candidate pairs joined against the per-doc
    # arrays, intersection counted with array_intersect (sets are
    # distinct by construction). The shingle row-table is never
    # shuffled again; the candidate side's physical strategy is left
    # to AQE — broadcast when the pruned set is small (typical),
    # shuffle join when a huge corpus yields more candidates than a
    # broadcast can hold.
    pa = da.select(
        F.col("doc_id").alias("doc_a"),
        F.col("arr").alias("arr_a"),
        F.col("sz").alias("sz_a"),
    )
    pb = da.select(
        F.col("doc_id").alias("doc_b"),
        F.col("arr").alias("arr_b"),
        F.col("sz").alias("sz_b"),
    )
    return (
        pa.join(candidates, "doc_a")
        .join(pb, "doc_b")
        .withColumn(
            "n_common",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def _ngram_jaccard_sql(threshold: float) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
    FROM toks WHERE len(t) >= 3
  )
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.sz + sb.sz - n_common), 6) >= {threshold}
"""


NGRAM_JACCARD_SQL = _ngram_jaccard_sql(JACCARD_THRESHOLD)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (approximate, the 100 TB path): MinHash signatures + banded LSH.

    No oracle — candidate sets are hash-dependent; the driver records a
    rows-only check and tests/test_dedup.py asserts recall against the
    exact ngram_jaccard_pairs result.

    Entirely JVM-side: xxhash64(seed, shingle) per permutation, min per
    doc, 8 band-hash buckets, self-join per bucket, signature-agreement
    estimate. Signature size is constant per doc regardless of length.

    r15 (guide §2.4, measured): the old source had a per-doc DISTINCT
    before the signature aggregate; min over a multiset == min over
    the distinct set, so the explode now feeds the per-doc min
    aggregates directly. PHYSICAL PLAN UNCHANGED — Catalyst's
    RemoveRedundantAggregates was already deleting that distinct (the
    plan has exactly two exchanges: spread's and the broadcast band
    join's; the groupBy(doc_id) inherits spread's doc_id partitioning
    and plans with no exchange) — the rewrite just makes the source
    say what executes instead of relying on the optimizer rule.
    A per-row array-expression variant (array_min over 32 transform()
    passes, no explode) was tried and abandoned: higher-order
    functions are CodegenFallback, and the interpreted 32-pass
    evaluation burned ~100× the CPU of the codegen'd min aggregate on
    identical values (thread dumps showed every task in
    ArrayTransform.eval).
    """
    sig = (
        # r15 second pass: shingle hashing as codegen'd rows — the old
        # array-transform form ran interpreted (see exprs.ngram_rows);
        # this IS the explode the old form performed next, so the plan
        # below the aggregate is the same shape minus the HOF.
        _shingle_hash_rows(load(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(
            F.array(
                *[
                    F.min(F.xxhash64(F.lit(seed), F.col("sh")))
                    for seed in range(NUM_PERM)
                ]
            ).alias("sig")
        )
    )
    # melt: one (doc, band, band_hash) row per band — ONE self-join on
    # (band, band_hash) replaces BANDS separate joins, so the signature
    # aggregation above is computed once, not 2×BANDS times.
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.col("sig")[b * ROWS_PER_BAND + r]
                                for r in range(ROWS_PER_BAND)
                            ],
                        ).alias("bh"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # r15 (guide §2.4): hash-partition the band table on the join key
    # BEFORE the self-join. At scale the band self-join needs this
    # exchange anyway; locally it is the materialization point both
    # join sides reuse (ReusedExchange) — without it the broadcast
    # build side re-executes the whole signature pipeline (explode +
    # 32-min aggregate) a second time. Same fix as
    # ngram_jaccard_pairs; this double-compute predates r15 (the old
    # plan had it too).
    bands = hash_align(bands, "band", "bh")
    a = bands.alias("a")
    c = bands.alias("c")
    n_agree = F.size(
        F.filter(
            F.zip_with(
                F.col("a.sig"), F.col("c.sig"), lambda x, y: x == y
            ),
            lambda eq: eq,
        )
    )
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bh") == F.col("c.bh"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            n_agree.alias("n_agree"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("n_agree").alias("n_agree"))
        .withColumn(
            "est_jaccard", F.round(F.col("n_agree") / F.lit(NUM_PERM), 6)
        )
        .filter(F.col("est_jaccard") >= 0.5)
    )


# LSH recall verification: exact high-similarity pairs (threshold chosen
# above the LSH banding's high-probability capture zone) must be mostly
# recovered by the candidate join. The bound mirrors
# tests/test_dedup_similarity.py; observed recall is 1.0 at sf0.001/0.01.
MINHASH_RECALL_THRESHOLD = 0.7
MINHASH_RECALL_BOUND = 0.6


def minhash_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 gate row for MinHash LSH via the exact+within-bound pattern
    (the oracle cannot hash xxhash64): emit the DuckDB-computable count
    of exact Jaccard ≥ 0.7 pairs plus a Spark-verified boolean that LSH
    recall over those pairs met the bound; the oracle emits the same
    exact count and literal TRUE. The exact side reuses the
    prefix-filtered (skew-safe) exact join, so the verification itself
    is a 100 TB-shaped plan."""
    exact = _jaccard_prefix_pairs(
        spark, sf_dir, MINHASH_RECALL_THRESHOLD
    ).select("doc_a", "doc_b")
    lsh = minhash_lsh_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    return (
        exact.join(lsh, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact_pairs"),
            F.coalesce(
                (
                    F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1))
                )
                >= MINHASH_RECALL_BOUND,
                F.lit(True),  # vacuously true when no exact pairs exist
            ).alias("recall_ge_bound"),
        )
    )


MINHASH_LSH_RECALL_SQL = f"""
WITH pairs AS ({_ngram_jaccard_sql(MINHASH_RECALL_THRESHOLD)})
SELECT count(*) AS n_exact_pairs, TRUE AS recall_ge_bound FROM pairs
"""


def _simhash(d: DataFrame) -> DataFrame:
    """doc_id → 64-bit SimHash signature (shared by signatures + pairs).

    Bit i of the signature = sign of Σ_tokens (bit i ? +1 : -1). Computed
    as 64 JVM-side conditional sums — one groupBy, no UDF.
    """
    # spread (r15): the fixture's documents parquet is a single row
    # group, so the 64-sum aggregate ran on ONE task (wall == cpu in
    # the profile); doc_id-partitioning also lets the groupBy plan as a
    # single shuffle-free pass instead of partial+exchange+final.
    toks = spread(d, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = sum(
        F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        for i in range(63)  # keep bit 63 clear: stay in signed-long range
    )
    return bit_sums.select("doc_id", sig.alias("simhash"))


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (cheapest tier): 64-bit SimHash per document.

    No oracle (xxhash64 is Spark-specific); rows-only + unit tests.
    """
    return _simhash(load(spark, sf_dir, "documents"))


# Hamming-ball join parameters: 4 bands of 16 bits. By pigeonhole, any
# pair within Hamming distance 3 agrees exactly on at least one band, so
# the banded join is RECALL-EXACT for the <= 3 threshold (not just
# probabilistic like MinHash banding). On a larger corpus, widen to 8
# bands of 8 bits (distance <= 7) or hash bands to narrower buckets —
# band count is the knob trading candidate volume for distance coverage.
SIMHASH_BANDS = 4
SIMHASH_MAX_DIST = SIMHASH_BANDS - 1


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: near-duplicate pairs within Hamming distance 3 of the 64-bit
    SimHash, found with a banded self-join (SURVEY.md §2C C2).

    Scale shape: each doc emits SIMHASH_BANDS (band_idx, band_val) keys;
    the self-join keys on those — candidate generation never touches
    document text, and bucket sizes concentrate near n/2^16 per band.
    Candidates are verified with bit_count(a XOR b), JVM-side, then
    deduped across bands with one distinct. No oracle (engine-specific
    hash); simhash_planted_capture below is the driver-gate twin.
    """
    return _banded_hamming_pairs(_simhash(load(spark, sf_dir, "documents")))


def _banded_hamming_pairs(sigs: DataFrame) -> DataFrame:
    """(doc_id, simhash) → pairs within SIMHASH_MAX_DIST, banded join."""
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_DIST)
        .distinct()
    )
    return pairs


# Planted-duplicate verification: the corpus has no exact duplicates, so
# the pigeonhole guarantee ("distance ≤ 3 is always captured") is
# exercised by cloning the N_PLANTED lowest doc_ids and asserting every
# (original, clone) pair — distance 0 by construction — comes back.
# Clone ids are offset by max(doc_id)+1 (computed per run, an O(1)
# driver read over a column-pruned scan) so they can never collide with
# real documents at any corpus scale — a fixed constant would silently
# corrupt the capture booleans once doc_ids exceed it.
N_PLANTED = 10


def simhash_planted_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 gate row for SimHash via the exact+within-bound pattern (the
    oracle cannot hash xxhash64). One row:

    - ``n_planted`` — DuckDB-computable: min(#non-empty docs, N_PLANTED)
      duplicate clones injected into the corpus.
    - ``planted_captured`` — Spark-verified: every (original, clone)
      pair (Hamming distance 0) appears in the banded join output —
      the pigeonhole recall guarantee, end to end.
    - ``banded_matches_bruteforce`` — Spark-verified: the banded join
      returns EXACTLY the pairs a brute-force all-pairs Hamming scan
      finds at distance ≤ 3 (recall-exactness, both directions). The
      brute-force tier is verification harness only — O(n²) on 8-byte
      signatures, broadcast nested-loop by construction.

    The oracle emits the same count and literal TRUE booleans.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.trim(F.col("text")) != "")
    )
    plant_offset = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1
    planted = docs.orderBy("doc_id").limit(N_PLANTED)
    clones = planted.select(
        (F.col("doc_id") + F.lit(plant_offset)).alias("doc_id"), "text"
    )
    # pool-persist the shared frames (r15): sigs feeds the banded join,
    # both brute-force sides and (through them) the two exceptAll
    # directions — six subtree uses, each of which re-ran the full
    # token-explode + 64-sum signature aggregate (caches are the only
    # dedup point: exchange reuse is blocked under InMemoryRelations,
    # and these frames are O(docs) rows of scalars). banded/brute are
    # each consumed twice by the exactness checks.
    sigs = pooled_persist(_simhash(docs.unionByName(clones)))
    banded = pooled_persist(
        _banded_hamming_pairs(sigs).select("doc_a", "doc_b")
    )

    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    brute = pooled_persist(
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            <= SIMHASH_MAX_DIST
        )
        .select("doc_a", "doc_b")
    )

    planted_pairs = planted.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + F.lit(plant_offset)).alias("doc_b"),
    )
    n_planted = planted_pairs.agg(
        F.count(F.lit(1)).alias("n_planted")
    )
    n_missed = planted_pairs.join(
        banded, ["doc_a", "doc_b"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_missed"))
    n_diff = (
        banded.exceptAll(brute)
        .unionAll(brute.exceptAll(banded))
        .agg(F.count(F.lit(1)).alias("n_diff"))
    )
    return (
        n_planted.crossJoin(n_missed)
        .crossJoin(n_diff)
        .select(
            "n_planted",
            (F.col("n_missed") == 0).alias("planted_captured"),
            (F.col("n_diff") == 0).alias("banded_matches_bruteforce"),
        )
    )


SIMHASH_PLANTED_SQL = f"""
SELECT
  least(count(*), {N_PLANTED}) AS n_planted,
  TRUE AS planted_captured,
  TRUE AS banded_matches_bruteforce
FROM documents
WHERE trim(text) <> ''
"""


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 completion — the step every pair-producing dedup tier needs
    before it can DELETE anything: cluster near-duplicate pairs into
    connected components and elect the min-doc_id canonical survivor per
    cluster (transitivity: if A~B and B~C, one of the three survives,
    even when A~C itself is below threshold).

    Spark shape: iterative hash-to-min label propagation — each round a
    node takes the min label among itself and its neighbors (one
    equi-join + one groupBy per round), converging in O(component
    diameter) rounds; near-dup clusters are shallow (clone families), so
    2-3 rounds in practice. Every round is a keyed shuffle on node id —
    no driver-side graph, works at any edge count. The driver loop only
    checks a changed-row COUNT per round (same pattern as KMeans.fit).

    Oracle: DuckDB recursive CTE computes the transitive closure and
    takes min reachable id per node — identical components.
    """
    pairs = _jaccard_prefix_pairs(
        spark, sf_dir, JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")
    return cluster_pairs(pairs, id_col="doc_id", cluster_col="component")


def cluster_pairs(
    pairs: DataFrame, id_col: str, cluster_col: str
) -> DataFrame:
    """Undirected similarity pairs (two columns, any names) → one row per
    member node: (id_col, cluster_col = min reachable id, csize,
    is_canonical). The clustering step shared by every pair-producing
    dedup tier (text jaccard, embedding cosine, ...)."""
    a, b = pairs.columns[:2]
    # symmetrize in ONE pass: the old union(select(a,b), select(b,a))
    # re-executed the entire pair-production pipeline once per branch —
    # the pooled cache sits ABOVE the union, and a subtree containing an
    # InMemoryRelation is ineligible for AQE exchange reuse (r15,
    # measured on _jaccard_prefix_pairs), so nothing deduped the second
    # run. explode of a two-struct array doubles each row scan-side.
    edges = pooled_persist(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a).alias("src"), F.col(b).alias("dst")
                    ),
                    F.struct(
                        F.col(b).alias("src"), F.col(a).alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    labels = _connected_components(edges)
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    return (
        labels.join(sizes, "lbl")
        .select(
            F.col("n").alias(id_col),
            F.col("lbl").alias(cluster_col),
            "csize",
            (F.col("n") == F.col("lbl")).alias("is_canonical"),
        )
    )


# Truncate the propagation loop's lineage EVERY round: persist() does
# not truncate the logical plan, and the r09 path-halving step
# references the round's frame twice (stepped as both sides of the
# lbl->label(lbl) self-join), so an uncheckpointed plan tree grows
# ~4x per round on top of the full pair-generation plan — by round 3
# the driver OOMs just stringifying it. localCheckpoint materializes
# the round's labels to executor storage and restarts lineage there
# (the KMeans.fit pattern); the round's convergence count needed a full
# materialization anyway, so eager checkpointing adds only the block
# write.


# Round count of the most recent _connected_components run — read by
# the scaling probe and the convergence tests (wall time alone can't
# show that path halving cut a deep chain from O(D) to O(log D)).
_LAST_CC_ROUNDS = 0


def _connected_components(edges: DataFrame) -> DataFrame:
    """(src, dst) symmetric edge list → (n, lbl) min-reachable-id labels
    via hash-to-min label propagation WITH PATH HALVING (r09, VERDICT
    r08 #4): each round takes the min label over the neighborhood
    (propagation, one hop/round) and then replaces every label with its
    label's label (halving — label distance-to-root shrinks
    geometrically). Plain hash-to-min needs O(diameter) rounds — a
    pathological chain component of diameter D costs D keyed shuffles;
    with halving the combined step converges in O(log D) rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    The changed-row flag is folded into the round's projection, so
    convergence detection is a filter-count over the round's own cached
    result — no extra old-vs-new join per round (the r08 shape paid one).
    """
    global _LAST_CC_ROUNDS
    labels = (
        edges.select(F.col("src").alias("n"))
        .distinct()
        .withColumn("lbl", F.col("n"))
        .persist()
    )
    rounds = 0
    while True:
        neigh = (
            edges.join(labels, edges.src == labels.n)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = (
            labels.join(neigh, labels.n == neigh.dst, "left")
            .select(
                "n",
                F.least(
                    F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))
                ).alias("lbl"),
                (
                    F.coalesce("nlbl", F.col("lbl")) < F.col("lbl")
                ).alias("ch"),
            )
        )
        # path halving: lbl <- label(lbl). Labels are monotone (always
        # <= the node id and only ever shrink), so label(lbl) <= lbl
        # and the left join's coalesce is a pure safety net.
        # stepped feeds BOTH sides of the halving self-join; persist it
        # so the round's propagation join+aggregate runs once, not twice
        # (r15 — the checkpoint below materializes the cache on the s
        # side, the p side reads it).
        stepped = stepped.persist()
        s = stepped.alias("s")
        p = stepped.select(
            F.col("n").alias("pn"), F.col("lbl").alias("plbl")
        ).alias("p")
        halved = F.least(
            F.col("s.lbl"), F.coalesce(F.col("p.plbl"), F.col("s.lbl"))
        )
        new = s.join(p, F.col("s.lbl") == F.col("p.pn"), "left").select(
            F.col("s.n").alias("n"),
            halved.alias("lbl"),
            (F.col("s.ch") | (halved < F.col("s.lbl"))).alias("ch"),
        )
        rounds += 1
        new = new.localCheckpoint(eager=True)
        stepped.unpersist()
        changed = new.filter("ch").count()
        # release the PREVIOUS round's frame itself (not a select over
        # it — unpersisting a derived frame would leak the cache)
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    _LAST_CC_ROUNDS = rounds
    # the final labels frame backs the returned plan — release it at the
    # next operator entry, not inside this one.
    pool_register(labels)
    return labels.select("n", "lbl")


NEARDUP_COMPONENTS_SQL = rf"""
WITH RECURSIVE pairs AS ({_ngram_jaccard_sql(JACCARD_THRESHOLD)}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
), comp AS (
  SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
)
SELECT doc_id, component,
       CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS csize,
       doc_id = component AS is_canonical
FROM comp
"""


# --- cross-document span duplication ---------------------------------------

# Span width for sub-document duplication analysis: long enough that a
# shared span means real text reuse (boilerplate, templates, mirrored
# passages), short enough to catch partial overlap whole-doc dedup
# misses. The MassiveText/Gopher pipelines dedup repeated spans at
# similar widths.
SPAN_N = 8


def crossdoc_span_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 sub-document granularity: per document, how much of it is
    8-token spans that ALSO occur in at least one other document —
    the boilerplate/template-reuse signal that whole-document dedup
    (exact or near) cannot see.

    Scale shape (r10 rework): explode all overlapping spans ONCE
    (cost ∝ corpus tokens), pre-aggregate to (span, doc) occurrence
    counts, attach each span's document frequency with a window COUNT
    over the span key, one doc-keyed aggregate. Three keyed shuffles
    ((g,doc) → g → doc_id), no join, NO BROADCAST: the previous form
    joined the span stream against a per-span-frequency table that
    Catalyst chose to broadcast — a hash relation that grows with the
    corpus (~15M entries at the sf1 probe, built single-threaded on
    the driver; the superlinear term in the r10 scale-decade probe and
    an OOM at default heap) — while the window form's per-key state is
    one running count. No pair join ever forms (the per-span doc COUNT
    is enough; the doc×doc pair list is exactly what this operator
    avoids materializing).
    """
    # spans are keyed by xxhash64 of the gram, not the ~50-char string —
    # the keyed shuffles carry 8-byte keys (~6× less payload). A
    # 64-bit collision merges two gram groups; at ~10^12 spans that is a
    # handful of spans miscounted out of a trillion (birthday bound), an
    # acceptable error for an audit statistic — switch to a
    # two-seed 128-bit key if exactness is required.
    #
    # r15 second pass (the big one for this query): the old form called
    # ngrams(tokens("text"), 8) with the SPLIT INLINED — inside the
    # transform() lambda, slice(split(text), i, 8) re-evaluated the
    # regex tokenization ONCE PER SPAN POSITION (O(len²) per doc), and
    # the whole nested-HOF expression ran in the interpreted evaluator
    # (thread dumps: 30/32 task threads in StringSplit.nullSafeEval /
    # ConcatWs.eval; first sf0.1 execution 12-14 s wall, ~184 CPU-s).
    # Now: tokens materialized once, spans as codegen'd rows
    # (exprs.ngram_rows). Measured fresh-session first run 13.4 → 2.1 s,
    # steady state no worse. Docs shorter than SPAN_N produce no spans
    # either way, so the size guard drops nothing the explode kept.
    toked = spread(
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("t"))
        .filter(F.size("t") >= SPAN_N),
        "doc_id",
    )
    spans = ngram_rows(toked, "t", SPAN_N, keep=("doc_id",)).select(
        "doc_id", F.xxhash64("gram", F.lit(42)).alias("g")
    )
    # (span, doc) occurrence counts: dedups repeated spans within a doc
    # before the wider span-keyed shuffle
    dspans = spans.groupBy("g", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    # document frequency per span, attached in place of the old
    # aggregate-and-join-back: count rows per span key (each row is one
    # distinct (span, doc) pair)
    nd = F.count(F.lit(1)).over(Window.partitionBy("g"))
    return (
        dspans.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
            F.round(
                F.sum(
                    F.when(F.col("nd") >= 2, F.col("c")).otherwise(0)
                ).cast("double")
                / F.sum("c").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


CROSSDOC_SPAN_DUP_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), spans AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + {SPAN_N} - 1), ' ') AS g
  FROM toks,
       unnest(generate_series(1, greatest(len(t) - {SPAN_N} + 1, 0))) AS s(i)
), gstats AS (
  SELECT g, count(DISTINCT doc_id) AS nd FROM spans GROUP BY g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       round(avg(CASE WHEN nd >= 2 THEN 1.0 ELSE 0.0 END), 6) AS dup_frac
FROM spans JOIN gstats USING (g)
GROUP BY doc_id
"""


def dedup_spans_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE step of sub-document dedup (the "deduplicating training
    data" recipe): rewrite every document with its cross-document
    duplicated 8-token spans REMOVED — tokens covered by any span that
    also occurs in another document are dropped, the survivors rejoin in
    order. crossdoc_span_dup above is the audit; this is the action.

    Scale shape: span table with positions (explode, doc-keyed), one
    span-keyed doc-frequency aggregate, one span-keyed join back to
    positions, covered-position explode (≤ SPAN_N per dup span), one
    doc-keyed anti-join of token positions against covered positions,
    one doc-keyed fold to rebuild the text. Every shuffle keys on span
    hash or doc_id — no pair join, no driver state. Span keys are
    xxhash64 internally (the oracle joins on gram strings — identical
    groups at any realistic collision rate; output carries no key).
    """
    d = spread(load(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", tokens("text").alias("t")
    )
    # (doc_id, pos, g): pos is 1-based to match the oracle's
    # generate_series indexing — ngram_rows' position sequence is
    # already 1-based. r15 second pass: codegen'd rows instead of
    # posexplode over an interpreted transform() array (see
    # exprs.ngram_rows; same rationale as crossdoc_span_dup).
    # pool-persisted (r15): spans feeds BOTH the doc-frequency pass
    # (dup_g) and the covered-position pass — without the cache the
    # span generation (tokenize + explode + hash) executed twice
    # (exchange reuse is unavailable: see the InMemoryRelation finding
    # in OPTIMIZATION_r15.md). Scalar rows — cheap columnar cache.
    spans = pooled_persist(
        ngram_rows(
            d.filter(F.size("t") >= SPAN_N),
            "t",
            SPAN_N,
            keep=("doc_id",),
            pos_col="pos",
        ).select("doc_id", "pos", F.xxhash64("gram", F.lit(42)).alias("g"))
    )
    dup_g = (
        spans.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    covered = (
        spans.join(dup_g, "g")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_N - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    tok_pos = d.select(
        "doc_id", F.posexplode("t").alias("tpos0", "tok")
    ).select("doc_id", (F.col("tpos0") + 1).alias("tpos"), "tok")
    # explicit aliases: tok_pos and covered share lineage through d, so
    # unaliased doc_id == doc_id would rely on Spark's implicit
    # self-join disambiguation (it resolves correctly but warns)
    tp, cv = tok_pos.alias("tp"), covered.alias("cv")
    kept = tp.join(
        cv,
        (F.col("tp.doc_id") == F.col("cv.doc_id"))
        & (F.col("tp.tpos") == F.col("cv.cpos")),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
    )
    totals = d.select(
        "doc_id", F.size("t").cast("long").alias("n_tokens")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


DEDUP_SPANS_REWRITE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), spans AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(t, i, i + {SPAN_N} - 1), ' ') AS g
  FROM toks,
       unnest(generate_series(1, greatest(len(t) - {SPAN_N} + 1, 0))) AS s(i)
), dup_g AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc_id) AS nd FROM spans GROUP BY g
  ) WHERE nd >= 2
), covered AS (
  SELECT DISTINCT doc_id, pos + off AS cpos
  FROM (SELECT doc_id, pos FROM spans JOIN dup_g USING (g)),
       unnest(generate_series(0, {SPAN_N} - 1)) AS o(off)
), tok_pos AS (
  SELECT doc_id, i AS tpos, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS s(i)
), kept AS (
  SELECT tp.doc_id, tp.tpos, tp.tok
  FROM tok_pos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c
    WHERE c.doc_id = tp.doc_id AND c.cpos = tp.tpos
  )
), rebuilt AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY tpos) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       coalesce(r.n_kept, 0) AS n_kept,
       CAST(len(t.t) AS BIGINT) - coalesce(r.n_kept, 0) AS n_removed,
       coalesce(r.text_clean, '') AS text_clean
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


QUERIES: dict[str, QuerySpec] = {
    "exact_dedup": QuerySpec(exact_dedup, EXACT_DEDUP_SQL, bench=True),
    "crossdoc_span_dup": QuerySpec(
        crossdoc_span_dup, CROSSDOC_SPAN_DUP_SQL, bench=True
    ),
    "dedup_spans_rewrite": QuerySpec(
        dedup_spans_rewrite, DEDUP_SPANS_REWRITE_SQL
    ),
    "ngram_jaccard_pairs": QuerySpec(
        ngram_jaccard_pairs, NGRAM_JACCARD_SQL, bench=True, exact_anchor=True
    ),
    "ngram_jaccard_prefix": QuerySpec(
        ngram_jaccard_prefix, NGRAM_JACCARD_SQL, bench=True
    ),
    "minhash_lsh_pairs": QuerySpec(minhash_lsh_pairs, None, bench=True),
    "minhash_lsh_recall": QuerySpec(minhash_lsh_recall, MINHASH_LSH_RECALL_SQL),
    "simhash_signatures": QuerySpec(simhash_signatures, None),
    "simhash_pairs": QuerySpec(simhash_pairs, None),
    "simhash_planted_capture": QuerySpec(
        simhash_planted_capture, SIMHASH_PLANTED_SQL
    ),
    "neardup_components": QuerySpec(
        neardup_components, NEARDUP_COMPONENTS_SQL
    ),
}
