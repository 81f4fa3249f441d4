"""BPE tokenizer training over the corpus (§2C C4 — tokenizer side).

Byte-pair-encoding training needs the corpus exactly once: the word-
frequency table. That is the scale split this operator keeps —

- stage 1 (distributed, the only pass that sees 100 TB): explode tokens,
  one groupBy — word counts — then a deterministic top-BPE_MAX_WORDS cap
  (count DESC, word ASC), because a web-scale corpus has unbounded
  distinct tokens and stage 2 consumes the table as one Arrow batch;
- stage 2 (on the bounded aggregate): the standard greedy merge loop
  over the weighted word table — count adjacent symbol pairs, merge the
  most frequent, repeat. Runs inside one Arrow batch (exactly how
  production tokenizer trainers consume capped word counts).

The merge loop is deterministic: ties break on (pair_count DESC, left
ASC, right ASC). The gate twin anchors the FIRST merge — the most
frequent adjacent character pair is SQL-computable from the raw corpus —
plus Spark-verified well-formedness booleans for the rest of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_kinesis_spark.functions.exprs import tokens
from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec

BPE_N_MERGES = 8

# Stage-2 input budget: the greedy merge loop consumes the word table as
# ONE Arrow batch, so its size must be bounded regardless of corpus
# scale. A 100 TB web corpus has billions of distinct whitespace tokens
# (URLs, typos, numbers) — production trainers cap the word table first,
# keeping the most frequent words; dropped tail words contribute
# negligibly to pair counts. The cap is deterministic (count DESC, word
# ASC) and far above any fixture vocabulary, so the oracle anchors are
# unaffected at test scale. 256k words × ~16 chars ≈ tens of MB in the
# single stage-2 task — comfortably one executor's work at any SF.
BPE_MAX_WORDS = 262_144


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # deterministic top-N: Spark plans global sort+limit as
    # TakeOrderedAndProject (per-partition partial top-N, then one
    # driver-side merge of N×partitions rows) — no full-sort shuffle.
    return wc.orderBy(F.desc("c"), F.asc("w")).limit(BPE_MAX_WORDS)


def _train(pdfs):
    """Greedy BPE merge loop over one Arrow batch of (word, count)."""
    import pandas as pd

    words: dict[tuple, int] = {}
    for pdf in pdfs:
        for w, c in zip(pdf["w"], pdf["c"]):
            key = tuple(w)
            words[key] = words.get(key, 0) + int(c)
    merges = []
    for rank in range(1, BPE_N_MERGES + 1):
        pc: dict[tuple, int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, cnt))
        merged: dict[tuple, int] = {}
        for syms, c in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + c
        words = merged
    yield pd.DataFrame(
        merges,
        columns=["rank", "left", "right", "merged", "pair_count"],
    )


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table: (rank, left, right, merged, pair_count).

    Rows-only check (the merge sequence is iterative-argmax — not
    SQL-expressible); bpe_train_verify below is the oracle-gated twin.
    """
    wc = _word_counts(spark, sf_dir)
    return wc.coalesce(1).mapInPandas(
        _train,
        "rank INT, left STRING, right STRING, merged STRING, "
        "pair_count BIGINT",
    )


def bpe_train_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate twin for BPE training: the first merge — the most frequent
    adjacent character pair over count-weighted corpus words, ties broken
    lexicographically — is computed exactly by the DuckDB oracle from the
    raw corpus; well-formedness of the remaining merge sequence (dense
    ranks, merged = left||right, non-increasing pair counts — a BPE
    invariant: a pair created by a merge can occur at most as often as
    the merge that created it) is Spark-verified as booleans.

    The gate row deliberately does NOT carry n_merges: the loop breaks
    early when no adjacent pairs remain (degenerate/tiny corpora), so a
    hardcoded oracle count would diverge even though both sides are
    individually correct. The fixture-scale count is pinned by pytest
    (tests/test_bpe.py) instead."""
    m = bpe_merges(spark, sf_dir)
    first = F.filter(
        F.col("rows"), lambda r: r["rank"] == 1
    )[0]
    rows_sorted = F.array_sort(
        F.transform(
            F.col("rows"),
            lambda r: F.struct(
                r["rank"].alias("rank"),
                r["left"].alias("left"),
                r["right"].alias("right"),
                r["merged"].alias("merged"),
                r["pair_count"].alias("pair_count"),
            ),
        )
    )
    return (
        m.agg(
            F.collect_list(
                F.struct("rank", "left", "right", "merged", "pair_count")
            ).alias("rows")
        )
        .select(rows_sorted.alias("rows"))
        .select(
            first["left"].alias("first_left"),
            first["right"].alias("first_right"),
            first["pair_count"].alias("first_count"),
            F.forall(
                F.sequence(F.lit(1), F.size("rows")),
                lambda i: F.element_at(F.col("rows"), i)["rank"] == i,
            ).alias("ranks_dense"),
            F.forall(
                F.col("rows"),
                lambda r: r["merged"] == F.concat(r["left"], r["right"]),
            ).alias("merged_is_concat"),
            F.forall(
                F.sequence(F.lit(2), F.size("rows")),
                lambda i: F.element_at(F.col("rows"), i)["pair_count"]
                <= F.element_at(F.col("rows"), i - 1)["pair_count"],
            ).alias("counts_nonincreasing"),
        )
    )


BPE_TRAIN_VERIFY_SQL = rf"""
WITH wc AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY w
), syms AS (
  SELECT string_split(w, '') AS s, c FROM wc
), pairs AS (
  SELECT p.l, p.r, CAST(sum(c) AS BIGINT) AS pc
  FROM syms,
       unnest(list_transform(generate_series(1, len(s) - 1),
              i -> struct_pack(l := s[i], r := s[i + 1]))) AS t(p)
  GROUP BY p.l, p.r
)
SELECT l AS first_left,
       r AS first_right,
       pc AS first_count,
       TRUE AS ranks_dense,
       TRUE AS merged_is_concat,
       TRUE AS counts_nonincreasing
FROM pairs
ORDER BY pc DESC, l ASC, r ASC
LIMIT 1
"""


QUERIES: dict[str, QuerySpec] = {
    "bpe_merges": QuerySpec(bpe_merges, None),
    "bpe_train_verify": QuerySpec(bpe_train_verify, BPE_TRAIN_VERIFY_SQL),
}
