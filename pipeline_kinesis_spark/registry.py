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

# Round-7 rotation (VERDICT r06 "Next round" #4): the stalest oracled
# greens — r01-only relational rows and r01 TPC-H — rotate back into
# the window for driver re-verification. Twelve return:
#   filter_predicates (B6), join_left_outer (B8), join_semi/join_anti
#   (B9), join_range (B10), agg_distinct (B13), order_limit (B18),
#   set_union_distinct (B20), scalar_string_funcs (B21), json_extract
#   (B22), q2_min_cost_supplier, q4_order_priority (r01 TPC-H).
# Twelve multi-round greens retire, each with its family still
# represented inside the window:
#   decontaminate_overlap/gopher_repetition/pii_redact/dataset_split
#     (4x each) → C6 stays via stratified_sample_hash, domain_balance,
#     doc_chunk_overlap, oov_rate_filter (curation_report also covered
#     until it retired late-r07, see below)
#   agg_approx_distinct (4x) → B14 stays via hll_mergeable_distinct
#   cosine_topk_pq_recall (4x) → C7 stays via cosine_topk_ivfpq_recall
#   cosine_topk_ivf_recall (4x) → C3 stays via cosine_topk_lsh_recall +
#     embedding_neardup_clusters
#   scaled_value_pandas (4x) → B27 stays via zscore_per_user
#   join_salted_skew (4x) → B12 stays via q1/agg_exact_percentiles/
#     value_histogram (agg_corr_regression also covered until it
#     retired late-r07, see below)
#   ngram_jaccard_prefix (5x) → C2 stays via crossdoc_span_dup,
#     minhash_lsh_recall, dedup_spans_rewrite
#   multimodal_meta_stats (5x) + multimodal_features (4x) → C5 stays
#     via multimodal_resize + multimodal_decode_stats
# Sole-family reps (asof_join B11, tumbling B23, unpivot B15,
# exact_dedup C1, bpe_train_verify C9, neardup_components C8) stay put
# regardless of streak. Rotated-out rows remain covered by the local
# sf0.01 full differential (tools/compare_oracle.py) and pytest;
# tools/gate_history.py asserts every oracled registry query has held
# a driver-green row in some round.
_PRIORITY = (
    # TPC-H aggregate/join shapes (q2/q4: r01-stale, returning)
    "q1_pricing_summary", "q7_volume_shipping",
    "q2_min_cost_supplier", "q4_order_priority",
    # PipelineDB combine() merge math, batch-expressible twins (B2):
    # exact transition states + the new KLL percentile sketch merge
    # (r07; takes text_normalize's row — 3x green, C4 stays via
    # text_quality/token_count_bpe + the new html_extract_main and
    # srt_caption_stats; winnow and lm_perplexity retired later in r07)
    "combine_regroup", "combine_percentile_regroup",
    # relational §2B rows returning from r01 (B6/B8/B9/B10/B13/B18/
    # B20/B21/B22)
    "filter_predicates", "join_left_outer", "join_semi", "join_anti",
    "join_range", "agg_distinct", "order_limit", "set_union_distinct",
    "scalar_string_funcs", "json_extract",
    # dedup clustering + tokenizer training + ANN compression
    "neardup_components", "bpe_train_verify", "cosine_topk_ivfpq_recall",
    # approx aggregates (B14) — theta_set_overlap is new r07 (sketch
    # SET ALGEBRA: union/intersection/difference across segments) and
    # takes agg_keyed_minmax's row (4x green; B12 stays via q1 /
    # agg_exact_percentiles / value_histogram)
    "hll_mergeable_distinct", "theta_set_overlap",
    # remaining §2B families
    "funnel_conversion",
    # late-r07: the audio twin of the cross-codec perceptual-dedup
    # gate (agg_corr_regression retires — multi-round green, B12 stays
    # via q1/agg_exact_percentiles/value_histogram)
    "audio_fingerprint_dedup",
    "unpivot_lineitem_measures",
    # window functions / top-k (B17/B19)
    "window_rank", "topk_per_group",
    # mid-r07 additions (C5: real video + audio-feature decode gates;
    # window_lag_lead retires — B17 stays via window_rank — and
    # winnow_fingerprint_stats retires (3x green) — C4 stays via
    # text_quality/token_count_bpe)
    "multimodal_video_stats", "audio_signal_features",
    # timeseries (B11/B23) + pandas-UDF surface (B27)
    # late-r07: caption-alignment parsing gate (curation_report
    # retires — multi-round green, C6 stays via stratified_sample_hash
    # + domain_balance + doc_chunk_overlap + oov_rate_filter)
    "srt_caption_stats", "tumbling_window_agg",
    "asof_join", "zscore_per_user",
    # dedup (C1/C2: exact, crossdoc spans, span rewrite;
    # minhash_lsh_recall retires mid-r07 — multi-round green, C2 stays
    # via crossdoc_span_dup + dedup_spans_rewrite — for the new C4
    # boilerplate-stripping gate row)
    "exact_dedup", "crossdoc_span_dup", "html_extract_main",
    # text analysis / corpus ops
    "text_quality", "token_count_bpe",
    "agg_exact_percentiles", "value_histogram",
    "dedup_spans_rewrite",
    # late-r07: the real nearest-neighbor resize kernel under the gate
    # (lm_perplexity retires — 4x green, C6 stays via
    # stratified_sample_hash/domain_balance/doc_chunk_overlap/
    # oov_rate_filter)
    "image_resize_stats",
    # corpus curation (C6: hash-threshold scale-path sampler et al.)
    "stratified_sample_hash",
    # similarity search
    "cosine_topk_lsh_recall", "embedding_neardup_clusters",
    # sketches / events / perceptual media dedup (cohort_retention
    # retires late-r07 — events stays via funnel_conversion — for the
    # new C2-for-media cross-codec dHash gate row)
    "image_dhash_dedup",
    # late-round-5 curation additions (C4/C6)
    "domain_balance", "doc_chunk_overlap", "oov_rate_filter",
    # multimodal (C5): the strongest checks — real image AND audio
    # codecs under full DuckDB oracles (multimodal_resize, 3x green,
    # rotates out mid-r07 for the new FLAC/WAV audio gate row; the
    # resize pipeline stays in the full differential)
    "multimodal_audio_stats", "multimodal_decode_stats",
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
