"""Corpus-quality / safety operators for training-data curation (§2C C4+).

Three first-class curation stages a 100 TB pretraining pipeline runs
between raw ingest and tokenization:

- benchmark decontamination: flag training docs whose n-grams overlap a
  held-out evaluation set (the standard n-gram-collision decontamination
  from the GPT-3/PaLM appendices). The eval set is tiny at any corpus
  scale, so its n-gram dictionary is broadcast; the train side is one
  scan + one doc_id-keyed aggregate with map-side partials.
- repetition metrics (Gopher-style): per-document top-bigram coverage and
  duplicate-trigram fraction — the "repetitious text" signals of Rae et
  al.'s quality rules — reported for the worst offenders.
- PII redaction: regex scrub of emails / phone numbers / IPv4 addresses
  with per-source audit counts. Patterns are RE2-compatible so the same
  expressions run JVM-side here and in the DuckDB oracle.

All hot paths are JVM expressions (split/slice/concat_ws/regexp_*) —
no Python UDFs; whole-stage codegen covers every stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_kinesis_spark.functions.exprs import ngram_rows, tokens
from pipeline_kinesis_spark.io import load, spread
from pipeline_kinesis_spark.operators import (
    QuerySpec,
    pooled_persist,
    release_stale_caches,
)

# --- decontamination -------------------------------------------------------

# 4-token shingles: proportionate to this corpus's 10-99-token docs (the
# 8-13-gram literature settings assume kilotoken documents — the n-gram
# order is the knob, the plan is unchanged).
CONTAM_NGRAM = 4
# Deterministic held-out "benchmark": every 50th doc_id (10 docs at every
# fixture SF — data-bearing at sf0.001 and sf0.01 alike).
CONTAM_BENCH_MOD = 50
# A doc is contaminated when ≥5% of its n-gram occurrences hit the
# benchmark dictionary.
CONTAM_THRESHOLD = 0.05


def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for each training doc that shares at
    least one CONTAM_NGRAM-gram with the held-out benchmark docs, report
    its overlap fraction and contamination flag.

    Scale shape: the benchmark n-gram dictionary is O(eval-suite size) —
    thousands of docs even at 100 TB training scale — so it broadcasts;
    the training side is a single scan, the explode collapses back to one
    row per doc via a doc_id-keyed aggregate (map-side combine), and the
    broadcast hash join never shuffles the corpus.
    """
    # n-grams as codegen'd ROWS (r15 second pass — exprs.ngram_rows):
    # the earlier array form kept the interpreted transform() lambda on
    # the hottest per-row work (HOFs are CodegenFallback); ngram_rows is
    # the same explode with every expression codegen'd, and its size
    # guard drops only docs that produced zero grams anyway.
    d = (
        load(spark, sf_dir, "documents")
        .withColumn("toks", tokens("text"))
        .filter(F.size("toks") >= CONTAM_NGRAM)
    )
    is_bench = (F.col("doc_id") % CONTAM_BENCH_MOD == 0).alias("is_b")
    # one gram-construction pass feeds both sides (persist, since the
    # dictionary branch and the train branch would otherwise each rescan;
    # in production the benchmark dictionary comes from a separate small
    # eval table, making this split — and the persist — moot). Pooled so
    # the next operator entry releases it (see operators.pooled_persist).
    release_stale_caches()
    g = pooled_persist(
        ngram_rows(
            spread(d, "doc_id").select("doc_id", is_bench, "toks"),
            "toks",
            CONTAM_NGRAM,
            keep=("doc_id", "is_b"),
            gram_col="g",
        )
    )
    bench = (
        g.filter(F.col("is_b"))
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = g.filter(~F.col("is_b")).select("doc_id", "g")
    frac = F.col("n_matched") / F.col("n_ngrams")
    return (
        train.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
        .select(
            "doc_id",
            "n_ngrams",
            "n_matched",
            F.round(frac, 6).alias("contam_frac"),
            (frac >= CONTAM_THRESHOLD).alias("is_contaminated"),
        )
    )


DECONTAMINATE_SQL = rf"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(toks) - {CONTAM_NGRAM - 1}),
           i -> array_to_string(toks[i:i + {CONTAM_NGRAM - 1}], ' '))) AS g
  FROM docs
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} = 0
), train AS (
  SELECT doc_id, g FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
), per_doc AS (
  SELECT t.doc_id,
         count(*) AS n_ngrams,
         count(b.g) AS n_matched
  FROM train t LEFT JOIN bench b USING (g)
  GROUP BY t.doc_id
)
SELECT doc_id, n_ngrams, n_matched,
       round(n_matched / n_ngrams, 6) AS contam_frac,
       n_matched / n_ngrams >= {CONTAM_THRESHOLD} AS is_contaminated
FROM per_doc
WHERE n_matched > 0
"""


# --- Gopher-style repetition metrics ---------------------------------------

REPETITION_TOP_N = 20


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (Gopher quality rules): fraction of
    bigram occurrences taken by the most frequent bigram, and fraction of
    trigram occurrences that are duplicates. Reports the REPETITION_TOP_N
    most repetitive documents (score = sum of both signals).

    Scale shape: the bigram mode needs a per-(doc, gram) count — explode
    + two doc_id-keyed aggregates with map-side combine (never an
    in-memory per-doc dictionary, so a 10k-token doc costs the same per
    token as a 10-token doc). The trigram dup fraction is
    count/countDistinct over the same exploded rows. Both sides are
    keyed by doc_id, so the join is co-partitioned; only
    REPETITION_TOP_N rows survive to the driver-side sort.
    """
    d = spread(
        load(spark, sf_dir, "documents").withColumn("toks", tokens("text")),
        "doc_id",
    )
    # r15: n-grams as codegen'd ROWS (exprs.ngram_rows) instead of
    # interpreted transform() arrays — same rationale and measurements
    # as the dedup shingle paths (HOFs are CodegenFallback). Values
    # identical: the bigram side exploded anyway; the trigram fraction
    # 1 - |distinct|/|all| is count/countDistinct over the same rows,
    # with the left join below keeping 2-token docs' NULL dt_raw
    # exactly as the old 0/0 division produced.
    bi = (
        ngram_rows(d.filter(F.size("toks") >= 2), "toks", 2, keep=("doc_id",))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c") / F.sum("c")).alias("tb_raw"),
        )
    )
    tri_agg = (
        ngram_rows(d.filter(F.size("toks") >= 3), "toks", 3, keep=("doc_id",))
        .groupBy("doc_id")
        .agg(
            (
                F.lit(1.0)
                - F.countDistinct("gram") / F.count(F.lit(1))
            ).alias("dt_raw"),
        )
    )
    # LEFT join keeps 2-token docs (one bigram, zero trigrams) with a
    # NULL dt_raw — exactly the old 0/0 division's NULL.
    tri = d.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    ).join(tri_agg, "doc_id", "left")
    return (
        bi.join(tri, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round("tb_raw", 6).alias("top_bigram_frac"),
            F.round("dt_raw", 6).alias("dup_trigram_frac"),
            F.round(F.col("tb_raw") + F.col("dt_raw"), 6).alias("rep_score"),
        )
        .orderBy(F.desc("rep_score"), F.asc("doc_id"))
        .limit(REPETITION_TOP_N)
    )


GOPHER_REPETITION_SQL = rf"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), bi AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> array_to_string(toks[i:i + 1], ' '))) AS g
  FROM docs
), bistats AS (
  SELECT doc_id, max(c) / sum(c) AS tb_raw
  FROM (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g)
  GROUP BY doc_id
), tristats AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         1.0 - len(list_distinct(tris)) / len(tris) AS dt_raw
  FROM (
    SELECT doc_id, toks,
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i:i + 2], ' ')) AS tris
    FROM docs
  )
)
SELECT doc_id, n_tokens,
       round(tb_raw, 6) AS top_bigram_frac,
       round(dt_raw, 6) AS dup_trigram_frac,
       round(tb_raw + dt_raw, 6) AS rep_score
FROM bistats JOIN tristats USING (doc_id)
ORDER BY rep_score DESC, doc_id ASC
LIMIT {REPETITION_TOP_N}
"""


# --- PII redaction ---------------------------------------------------------

# RE2-compatible patterns (no lookaround/backrefs) so the identical regex
# runs in Spark's Java engine and DuckDB's RE2.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,2} \(\d{3}\) \d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _planted_text():
    """The synthetic corpus carries no PII, so the operator deterministically
    plants some (same trick as the dedup clone-planting): every 5th doc an
    email, every 7th a phone number, every 11th an IPv4 — overlaps give
    multi-PII docs. Both engines reproduce the identical planted text."""
    did = F.col("doc_id")
    email = F.when(
        did % 5 == 0,
        F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
    ).otherwise("")
    phone = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" call +1 (555) "),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-0199"),
        ),
    ).otherwise("")
    ip = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" host 10.0."),
            (did % 256).cast("string"),
            F.lit("."),
            (did % 100 + 1).cast("string"),
        ),
    ).otherwise("")
    return F.concat(F.col("text"), email, phone, ip)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub with audit: replace emails / phones / IPv4s with typed
    placeholders and report per-source match counts plus total characters
    removed.

    Scale shape: pure row-local regexp_count/regexp_replace inside one
    scan (codegen), then a groupBy on the low-cardinality source key with
    map-side partials — the shuffle carries O(sources) rows.

    r16: spread before the regexp passes — the sf1 profile showed the
    whole query serialized on ONE task (wall 3.96 s == CPU 3.98 s at
    sf1: the fixture is a single input split, and with a 5-value
    groupBy key the partial aggregation gave no parallelism to recover
    it). The shuffle moves the raw text once (small next to 7 regexp
    passes per row); on a real multi-split layout spread() skips
    itself and the scan parallelizes natively. groupBy(source) sums are
    exact integer aggregates — order-independent, output unchanged.
    """
    d = spread(load(spark, sf_dir, "documents"), "doc_id").withColumn(
        "raw", _planted_text()
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("raw", PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )
    return (
        d.withColumn("redacted", redacted)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.regexp_count("raw", F.lit(PII_EMAIL))).alias("n_emails"),
            F.sum(F.regexp_count("raw", F.lit(PII_PHONE))).alias("n_phones"),
            F.sum(F.regexp_count("raw", F.lit(PII_IPV4))).alias("n_ips"),
            F.sum(F.length("raw") - F.length("redacted")).alias(
                "chars_redacted"
            ),
        )
    )


PII_REDACT_SQL = rf"""
WITH planted AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +1 (555) ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 100 + 1)
                 ELSE '' END AS raw
  FROM documents
), scrubbed AS (
  SELECT source, raw,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IPV4}', '<IP>', 'g') AS redacted
  FROM planted
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(raw, '{PII_EMAIL}'))) AS BIGINT) AS n_emails,
       CAST(sum(len(regexp_extract_all(raw, '{PII_PHONE}'))) AS BIGINT) AS n_phones,
       CAST(sum(len(regexp_extract_all(raw, '{PII_IPV4}'))) AS BIGINT) AS n_ips,
       CAST(sum(length(raw) - length(redacted)) AS BIGINT) AS chars_redacted
FROM scrubbed
GROUP BY source
"""


# --- sequence packing ------------------------------------------------------

# Token budget per packed training sequence. Small relative to real
# pretraining (2k-8k) because fixture docs are 10-99 tokens; the budget is
# a constant knob, the plan is unchanged.
SEQ_PACK_LEN = 512


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences
    (concat-and-split, the standard pretraining batcher): documents are
    concatenated in doc_id order within their source shard and the stream
    is cut every SEQ_PACK_LEN tokens; a doc belongs to the sequence its
    first token lands in. Emits per-sequence occupancy stats.

    Scale shape: the running token sum is a window PARTITIONED BY source
    — never a global single-partition window, so 1000 executors each pack
    their own shards; the groupBy re-uses the same (source) keying.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        d.withColumn(
            "seq_id", F.floor(start / SEQ_PACK_LEN).cast("long")
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_packed"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


SEQUENCE_PACK_SQL = rf"""
WITH d AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS strt
  FROM d
)
SELECT source,
       CAST(floor(strt / {SEQ_PACK_LEN}) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_packed,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM cum
GROUP BY source, seq_id
"""


# --- stratified sampling ---------------------------------------------------

# Per-language keep fractions — the "domain reweighting" step of corpus
# mixing (downsample over-represented strata).
STRATA_FRACS = {"en": 0.5, "zh": 0.2, "fr": 0.2, "es": 0.2, "de": 0.2}


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: each language stratum keeps
    ceil(frac × n) documents, chosen by deterministic rank (doc_id order)
    so every engine and every cluster size selects the identical subset.
    Emits per-stratum audit counts.

    Scale shape: one window rank partitioned by the stratum key, one
    stratum-keyed aggregate — both shuffles carry the stratum partitioning;
    quotas need the stratum totals, which ride the same aggregate (no
    driver round-trip).
    """
    frac = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in STRATA_FRACS.items()
        ],
        F.lit(0.1),
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("n_total", F.count(F.lit(1)).over(Window.partitionBy("lang")))
        .withColumn("quota", F.ceil(frac * F.col("n_total")).cast("long"))
    )
    return d.groupBy("lang").agg(
        F.max("n_total").cast("long").alias("n_total"),
        F.max("quota").alias("quota"),
        F.sum(F.when(F.col("rnk") <= F.col("quota"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.max(F.when(F.col("rnk") <= F.col("quota"), F.col("doc_id"))).alias(
            "last_kept_doc"
        ),
    )


def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold stratified sampling — the SCALE path twin of
    ``stratified_sample``. Each document keeps independently iff its
    Knuth multiplicative hash bucket (0..9999, salted so it is
    uncorrelated with dataset_split's buckets) falls below
    floor(frac × 10000) for its stratum.

    Why a twin: the exact-quota sampler's rank serializes each stratum
    into ONE sort task (~5 strata → 5 tasks, billions of rows each at
    100 TB). This sampler has NO per-stratum sort and NO window — one
    narrow projection and one stratum-keyed aggregate, embarrassingly
    parallel at any scale. The kept set is deterministic (same docs in
    any engine — plain integer arithmetic, oracle-checkable) and its
    size concentrates tightly around frac × n (binomial; ±0.5% at a
    billion rows). Keep exact-quota as the audit anchor where the quota
    must be met exactly; run this form in production.
    """
    frac = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in STRATA_FRACS.items()
        ],
        F.lit(0.1),
    )
    # fold before multiply keeps the product in signed-64 range for the
    # DuckDB oracle (it errors on overflow; Spark would wrap); +7919
    # decorrelates from dataset_split's unsalted buckets
    bucket = (
        ((F.col("doc_id") + 7919) % 1000003)
        * F.lit(2654435761).cast("long")
    ) % 4294967296 % 10000
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .withColumn("threshold", F.floor(frac * 10000).cast("long"))
        .withColumn("kept", bucket < F.col("threshold"))
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("threshold").alias("threshold"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.min(F.when(F.col("kept"), F.col("doc_id"))).alias(
            "first_kept_doc"
        ),
        F.max(F.when(F.col("kept"), F.col("doc_id"))).alias(
            "last_kept_doc"
        ),
    )


_STRATA_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in STRATA_FRACS.items()
)

STRATIFIED_SAMPLE_HASH_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(floor((CASE lang {_STRATA_CASE} ELSE 0.1 END) * 10000)
              AS BIGINT) AS threshold,
         (((doc_id + 7919) % 1000003) * 2654435761)
           % 4294967296 % 10000 AS bucket
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(threshold) AS threshold,
       CAST(sum(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       min(CASE WHEN bucket < threshold THEN doc_id END) AS first_kept_doc,
       max(CASE WHEN bucket < threshold THEN doc_id END) AS last_kept_doc
FROM d
GROUP BY lang
"""


STRATIFIED_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rnk,
         count(*) OVER (PARTITION BY lang) AS n_total,
         CAST(ceil((CASE lang {_STRATA_CASE} ELSE 0.1 END) *
              count(*) OVER (PARTITION BY lang)) AS BIGINT) AS quota
  FROM documents
)
SELECT lang,
       CAST(max(n_total) AS BIGINT) AS n_total,
       max(quota) AS quota,
       CAST(sum(CASE WHEN rnk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       max(CASE WHEN rnk <= quota THEN doc_id END) AS last_kept_doc
FROM d
GROUP BY lang
"""


# --- n-gram LM perplexity filtering ----------------------------------------

# CCNet-style quality filtering scores each document with a language
# model trained on the corpus (or a trusted reference corpus) and drops
# the high-perplexity tail. The LM here is an add-k-smoothed unigram
# model over a CAPPED vocabulary with an OOV class — the cap is what
# makes the model broadcastable at any corpus scale (a 100 TB corpus has
# unbounded distinct tokens; a fixed-vocab LM with an UNK bucket is
# exactly how production LM filters bound their tables).
LM_VOCAB_MAX = 65_536
LM_ADD_K = 0.5


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-LM perplexity (C6 quality filtering — the
    CCNet recipe's scoring step).

    Two corpus passes, both scale-bounded:
    - training pass: token explode → one keyed count aggregate → a
      deterministic top-LM_VOCAB_MAX vocabulary (count DESC, token ASC,
      planned as TakeOrderedAndProject like the BPE cap) plus O(1)
      totals; out-of-vocabulary mass becomes one UNK class.
    - scoring pass: tokens LEFT-JOIN the broadcast vocabulary (bounded
      by the cap), per-token -ln p, one doc-keyed aggregate →
      ppl = exp(mean). The shuffle carries O(docs) rows.

    Emits (doc_id, n_tokens, n_oov, ppl); filtering is a WHERE on ppl.
    Probabilities are exact rationals of integer counts so both engines
    compute identical doubles; ppl rounds to 6 decimals to absorb
    summation-order jitter.
    """
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
    )
    # counts feeds three consumers (totals, vocab cap, broadcast LM) —
    # pool-persist so the corpus explode+aggregate runs ONCE, released
    # at the next operator entry like the other cached intermediates
    release_stale_caches()
    counts = pooled_persist(
        tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = counts.orderBy(F.desc("c"), F.asc("w")).limit(LM_VOCAB_MAX)
    consts = (
        counts.agg(F.sum("c").alias("n_tok"))
        .crossJoin(
            vocab.agg(
                F.sum("c").alias("n_vocab_tok"),
                F.count(F.lit(1)).alias("v"),
            )
        )
        .select(
            "n_tok",
            "v",
            (F.col("n_tok") - F.col("n_vocab_tok")).alias("c_oov"),
        )
    )
    p = (F.coalesce(F.col("c"), F.col("c_oov")) + F.lit(LM_ADD_K)) / (
        F.col("n_tok") + F.lit(LM_ADD_K) * (F.col("v") + 1)
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(consts))
        .withColumn("nlp", -F.log(p))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.round(F.exp(F.avg("nlp")), 6).alias("ppl"),
        )
    )


LM_PERPLEXITY_SQL = rf"""
WITH tok AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
  ) WHERE w <> ''
), counts AS (
  SELECT w, count(*) AS c FROM tok GROUP BY w
), vocab AS (
  SELECT w, c FROM counts ORDER BY c DESC, w ASC LIMIT {LM_VOCAB_MAX}
), consts AS (
  SELECT (SELECT sum(c) FROM counts) AS n_tok,
         (SELECT count(*) FROM vocab) AS v,
         (SELECT sum(c) FROM counts) - (SELECT sum(c) FROM vocab) AS c_oov
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN vocab.c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(exp(avg(-ln(
         (coalesce(vocab.c, consts.c_oov) + {LM_ADD_K})
         / (consts.n_tok + {LM_ADD_K} * (consts.v + 1))
       ))), 6) AS ppl
FROM tok LEFT JOIN vocab USING (w) CROSS JOIN consts
GROUP BY doc_id
"""


# --- composite curation report ---------------------------------------------

# Keep/drop thresholds. Tuned to the fixture corpus so both keep and
# drop branches are exercised; in production these are the pipeline's
# policy knobs.
CURATE_MIN_UNIQ = 0.30       # uniq_ratio below → repetitive junk
CURATE_MAX_DUP_FRAC = 0.50   # cross-doc span reuse above → boilerplate
CURATE_MAX_PPL_RATIO = 1.5   # ppl above 1.5× corpus median → outlier


def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE top-level curation artifact: one row per document joining the
    per-doc quality signals — lexical quality, benchmark contamination,
    LM perplexity, cross-document span reuse — into a keep/drop verdict
    with per-signal reason flags. This is the table a data engineer
    inspects before the DELETE; every signal column is itself an
    oracle-checked operator.

    Scale shape: each constituent is doc-keyed; the report is three
    doc-keyed equi-joins (contamination is a left join — clean docs have
    no row) plus one broadcast of the O(1) corpus-median row. No new
    shuffle shapes beyond the constituents'.
    """
    from pipeline_kinesis_spark.operators import (
        pooled_persist as _pool,
        shared_cache_scope,
    )
    from pipeline_kinesis_spark.operators.dedup import crossdoc_span_dup
    from pipeline_kinesis_spark.operators.textops import text_quality

    # shared_cache_scope (r15): without it, each constituent's entry
    # release unpersisted its siblings' pooled caches and the final
    # query re-ran those subtrees uncached (decontamination's gram
    # build, the perplexity counts). lm is additionally pooled itself:
    # it feeds BOTH the flags join and the corpus-median aggregate, and
    # a subtree holding an InMemoryRelation gets no AQE exchange reuse,
    # so without the cache the whole scoring pass executed twice.
    with shared_cache_scope():
        tq = text_quality(spark, sf_dir).select(
            "doc_id", "lang", "n_tokens", "uniq_ratio"
        )
        contam = decontaminate_overlap(spark, sf_dir).select(
            "doc_id", "is_contaminated"
        )
        lm = _pool(lm_perplexity(spark, sf_dir).select("doc_id", "ppl"))
        spans = crossdoc_span_dup(spark, sf_dir).select(
            "doc_id", "dup_frac"
        )
    med = lm.agg(
        F.median("ppl").alias("med_ppl")
    )
    flags = (
        tq.join(lm, "doc_id")
        .join(spans, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .crossJoin(F.broadcast(med))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "uniq_ratio",
            "ppl",
            F.coalesce("dup_frac", F.lit(0.0)).alias("dup_frac"),
            F.coalesce("is_contaminated", F.lit(False)).alias(
                "flag_contaminated"
            ),
            (F.col("uniq_ratio") < CURATE_MIN_UNIQ).alias("flag_repetitive"),
            (
                F.coalesce("dup_frac", F.lit(0.0)) > CURATE_MAX_DUP_FRAC
            ).alias("flag_boilerplate"),
            (
                F.col("ppl") > CURATE_MAX_PPL_RATIO * F.col("med_ppl")
            ).alias("flag_ppl_outlier"),
        )
    )
    return flags.withColumn(
        "keep",
        ~(
            F.col("flag_contaminated")
            | F.col("flag_repetitive")
            | F.col("flag_boilerplate")
            | F.col("flag_ppl_outlier")
        ),
    )


CURATION_REPORT_SQL = f"""
WITH tq AS ({{tq}}), contam AS ({{contam}}), lm AS ({{lm}}),
     spans AS ({{spans}}),
     med AS (SELECT median(ppl) AS med_ppl FROM lm)
SELECT tq.doc_id, tq.lang, tq.n_tokens, tq.uniq_ratio, lm.ppl,
       coalesce(spans.dup_frac, 0.0) AS dup_frac,
       coalesce(contam.is_contaminated, FALSE) AS flag_contaminated,
       tq.uniq_ratio < {CURATE_MIN_UNIQ} AS flag_repetitive,
       coalesce(spans.dup_frac, 0.0) > {CURATE_MAX_DUP_FRAC}
         AS flag_boilerplate,
       lm.ppl > {CURATE_MAX_PPL_RATIO} * med.med_ppl AS flag_ppl_outlier,
       NOT (coalesce(contam.is_contaminated, FALSE)
            OR tq.uniq_ratio < {CURATE_MIN_UNIQ}
            OR coalesce(spans.dup_frac, 0.0) > {CURATE_MAX_DUP_FRAC}
            OR lm.ppl > {CURATE_MAX_PPL_RATIO} * med.med_ppl) AS keep
FROM tq
JOIN lm ON lm.doc_id = tq.doc_id
LEFT JOIN spans ON spans.doc_id = tq.doc_id
LEFT JOIN contam ON contam.doc_id = tq.doc_id
CROSS JOIN med
"""


def _curation_report_sql() -> str:
    from pipeline_kinesis_spark.operators.dedup import CROSSDOC_SPAN_DUP_SQL
    from pipeline_kinesis_spark.operators.textops import TEXT_QUALITY_SQL

    return CURATION_REPORT_SQL.format(
        tq=TEXT_QUALITY_SQL,
        contam=DECONTAMINATE_SQL,
        lm=LM_PERPLEXITY_SQL,
        spans=CROSSDOC_SPAN_DUP_SQL,
    )


# ------------------------------------------------------ domain balance
# Per-source document caps (RefinedWeb-style domain balancing): keep at
# most DOMAIN_CAP documents per source, preferring longer documents
# (n_chars DESC, doc_id ASC as the deterministic tiebreak). The rank
# predicate compiles to Spark's WindowGroupLimit: each mapper keeps
# only its local top-CAP rows per source BEFORE the shuffle, so the
# exchange carries O(sources × cap × mappers) rows — never the corpus.
# That makes the grouped-top-N form scale-safe where a bare
# row_number() materialization would not be.
DOMAIN_CAP = 40


def domain_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
    )
    kept = ranked.filter(F.col("rk") <= DOMAIN_CAP)
    totals = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per_source = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.min("doc_id").alias("min_kept_doc"),
        F.max("doc_id").alias("max_kept_doc"),
    )
    return totals.join(per_source, "source").select(
        "source",
        "n_docs",
        "n_kept",
        "kept_chars",
        "min_kept_doc",
        "max_kept_doc",
    )


DOMAIN_BALANCE_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
),
kept AS (SELECT * FROM ranked WHERE rk <= {DOMAIN_CAP}),
totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT t.source,
       t.n_docs,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(k.n_chars) AS BIGINT) AS kept_chars,
       min(k.doc_id) AS min_kept_doc,
       max(k.doc_id) AS max_kept_doc
FROM totals t JOIN kept k ON t.source = k.source
GROUP BY t.source, t.n_docs
"""


QUERIES: dict[str, QuerySpec] = {
    "decontaminate_overlap": QuerySpec(
        decontaminate_overlap, DECONTAMINATE_SQL
    ),
    "lm_perplexity": QuerySpec(lm_perplexity, LM_PERPLEXITY_SQL, bench=True),
    "curation_report": QuerySpec(curation_report, _curation_report_sql()),
    "gopher_repetition": QuerySpec(gopher_repetition, GOPHER_REPETITION_SQL),
    "pii_redact": QuerySpec(pii_redact, PII_REDACT_SQL, bench=True),
    "sequence_pack": QuerySpec(sequence_pack, SEQUENCE_PACK_SQL, bench=True),
    "stratified_sample": QuerySpec(
        stratified_sample, STRATIFIED_SAMPLE_SQL, exact_anchor=True
    ),
    "stratified_sample_hash": QuerySpec(
        stratified_sample_hash, STRATIFIED_SAMPLE_HASH_SQL
    ),
    "domain_balance": QuerySpec(domain_balance, DOMAIN_BALANCE_SQL),
}
