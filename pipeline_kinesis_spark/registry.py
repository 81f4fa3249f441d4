"""Assembles the named-query registry from the operator modules.

This is the single source of truth consumed by __spark_entry__.py (driver
contract), bench.py (headline set) and tests (oracle differential suite).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_kinesis_spark.operators import QuerySpec, release_stale_caches
from pipeline_kinesis_spark.shipping import ship_package
from pipeline_kinesis_spark.operators import (
    bpe,
    dedup,
    events,
    multimodal,
    pandas_udfs,
    quality,
    relational,
    similarity,
    sketches,
    textops,
    timeseries,
    tpch,
)

_MODULES = (
    tpch,
    relational,
    timeseries,
    dedup,
    textops,
    quality,
    bpe,
    similarity,
    sketches,
    multimodal,
    pandas_udfs,
    events,
)

# The external correctness gate checks the FIRST 50 entries of queries()
# in dict order, so the front of the dict is curated: one representative
# of every SURVEY.md §2B/§2C operator family (joins/aggs/rollup/window/
# timeseries/dedup/textops/similarity/sketches/multimodal/pandas-UDF)
# sits inside that window; redundant TPC-H/relational variants that were
# already verified green follow after.
_WINDOW = 50

# Round-5 rotation (VERDICT r04 "Next round" #7): the five stalest
# oracled queries — each last driver-green in r02/r03 — rotate back in
# (agg_approx_distinct, agg_keyed_minmax, tumbling_window_agg,
# tfidf_top_terms, dataset_split), plus the new
# stratified_sample_hash (scale-path sampler twin) takes a gate row
# immediately. Late-round-5 additions (domain_balance,
# doc_chunk_overlap, oov_rate_filter) take gate rows too; three
# 3x-green rows retire for them with families still represented:
#   grouping_sets_revenue → B15 stays via unpivot_lineitem_measures
#   zscore_per_user       → B27 stays via scaled_value_pandas
#   fss_topk_tokens       → B14 stays via hll_mergeable_distinct +
#                           agg_approx_distinct
# Six rows green in 2-3 consecutive rounds incl. r04
# rotate out, each with its family still represented inside the window:
#   agg_approx_percentile → B14 stays via hll_mergeable_distinct +
#                           fss_topk_tokens + agg_approx_distinct
#   bloom_order_priorities → same B14 coverage
#   session_window_agg    → timeseries stays via asof_join +
#                           tumbling_window_agg (rotating back in)
#   corpus_clean          → textops stays via token_stats,
#                           text_normalize, tfidf_top_terms, winnow
#   agg_salted_skew       → B12 stays via q1/corr/exact-percentiles/
#                           histogram + agg_keyed_minmax; skew
#                           discipline stays via join_salted_skew
#   cosine_neardup_pairs  → similarity stays via the four recall twins
#                           + embedding_neardup_clusters
# Rotated-out rows remain covered by the local sf0.01 full differential
# (tools/compare_oracle.py) and pytest; tools/gate_history.py asserts
# every oracled registry query has held a driver-green row in some round.
_PRIORITY = (
    # TPC-H aggregate/join shapes
    "q1_pricing_summary", "q7_volume_shipping",
    # corpus-quality curation + dedup clustering + tokenizer training +
    # ANN compression twins (late round-3)
    "decontaminate_overlap", "gopher_repetition", "pii_redact",
    "neardup_components", "bpe_train_verify",
    "cosine_topk_pq_recall", "cosine_topk_ivfpq_recall",
    # approx aggregates (B14)
    "hll_mergeable_distinct", "agg_approx_distinct",
    # remaining §2B families (pivot_priority_by_year rotates out
    # 2x-green for funnel_conversion; B15 stays via grouping_sets +
    # unpivot)
    # (agg_keyed_minmax rotates out 2x-green for agg_corr_regression —
    # B12 keyed aggregates stay via salted-skew + q1)
    "funnel_conversion", "window_range_frame", "agg_corr_regression",
    "agg_keyed_minmax", "join_salted_skew", "unpivot_lineitem_measures",
    "window_distribution",
    # timeseries (B11/B23/B24) + pandas-UDF surface (B27);
    # tumbling_window_agg rotates out 2x-green for curation_report
    # (timeseries stays via session+asof)
    "curation_report", "tumbling_window_agg",
    "asof_join", "scaled_value_pandas",
    # dedup (C1/C2: exact, prefix-jaccard, MinHash LSH, SimHash, spans)
    "exact_dedup", "crossdoc_span_dup", "ngram_jaccard_prefix",
    "minhash_lsh_recall", "simhash_planted_capture",
    # text analysis / corpus ops (ngram_top_bigrams rotates out 2x-green
    # for the new dedup_spans_rewrite DELETE-step operator)
    # (text_quality, lang_id_heuristic, token_count_bpe rotate out
    # 2x-green for text_normalize + the exact-percentile and histogram
    # aggregates; text_quality's signals are embedded verbatim inside
    # curation_report's gate row, textops stays via corpus_clean/
    # token_stats/text_normalize, bpe stays via bpe_train_verify)
    "tfidf_top_terms", "token_stats",
    "text_normalize", "agg_exact_percentiles", "value_histogram",
    "dedup_spans_rewrite", "lm_perplexity", "winnow_fingerprint_stats",
    # corpus curation (C6: exact-quota sampler + its hash-threshold
    # scale twin + the deterministic-split primitive)
    "sequence_pack", "stratified_sample", "stratified_sample_hash",
    "dataset_split",
    # similarity search (embedding_centroids rotates out 2x-green for
    # the new embedding_neardup_clusters composition)
    "cosine_topk_lsh_recall", "cosine_topk_ivf_recall",
    "embedding_neardup_clusters",
    # sketches / events
    "cohort_retention",
    # late-round-5 curation additions (C4/C6)
    "domain_balance", "doc_chunk_overlap", "oov_rate_filter",
    # multimodal
    "multimodal_meta_stats", "multimodal_resize", "multimodal_frame_sample",
    "multimodal_features",
)

# The driver checks exactly the first _WINDOW entries of queries();
# overflow would silently push curated entries out of the gate.
assert len(_PRIORITY) == _WINDOW, f"window {len(_PRIORITY)} != {_WINDOW}"


def all_queries() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"priority entries not registered: {missing}")
    out = {n: merged[n] for n in _PRIORITY}
    out.update({n: s for n, s in merged.items() if n not in out})
    return out


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query fn so the package is shipped to Python workers first —
    keeps pandas-UDF operators working when the driver runs from a cwd
    that doesn't contain the repo (see shipping.py)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship_package(spark)
        # the PREVIOUS query's pooled caches are stale by now (its action
        # completed before the driver moved on) — release them so a long
        # gate session never accumulates cached partitions.
        release_stale_caches()
        return fn(spark, sf_dir)

    return run


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(spec.fn) for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_queries().items() if s.bench}
