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

# Round-8 rotation (VERDICT r07 "Next round" #4): the stalest oracled
# greens — r02-only TPC-H/relational rows and r02-r0x streaming/
# window/sketch rows — rotate back into the window for driver
# re-verification. Twelve return:
#   q3_shipping_priority, q5_local_supplier_volume, q8_market_share
#     (r02 TPC-H), case_coalesce (B21, r02), cube_orders /
#     rollup_revenue (B15, r02), sliding_window_agg (B23, r03),
#     cms_event_counts (B14, r03), session_window_agg (B24, r04),
#     window_range_frame (B17, r05), corpus_clean (C6, r04),
#     cohort_retention (events, r06).
# Twelve r07 multi-round greens retire, each with its family still
# represented inside the window:
#   q1_pricing_summary / q7_volume_shipping (6x) → TPC-H agg/join
#     stays via q2/q4 + returning q3/q5/q8 (q1 remains the entry()
#     flagship and a bench headline — exercised every round anyway)
#   hll_mergeable_distinct (4x) → B14 stays via theta_set_overlap +
#     returning cms_event_counts
#   funnel_conversion (4x) → events stays via returning
#     cohort_retention
#   unpivot_lineitem_measures (5x) → B15 stays via returning
#     cube_orders + rollup_revenue
#   window_rank (3x) → B17 stays via returning window_range_frame
#   tumbling_window_agg (5x) → B23 stays via returning
#     sliding_window_agg
#   crossdoc_span_dup (4x) → C2 stays via dedup_spans_rewrite +
#     image_dhash_dedup + audio_fingerprint_dedup
#   agg_exact_percentiles (4x) → B12 stays via value_histogram +
#     returning TPC-H aggs; percentile math also via
#     combine_percentile_regroup
#   domain_balance / doc_chunk_overlap (3x) → C6 stays via
#     stratified_sample_hash + oov_rate_filter + returning
#     corpus_clean
#   embedding_neardup_clusters (4x) → C3 stays via
#     cosine_topk_lsh_recall
# Sole-family reps (asof_join B11, exact_dedup C1, bpe_train_verify
# C9, neardup_components C8, cosine_topk_ivfpq_recall C7,
# zscore_per_user B27) stay put regardless of streak. Rotated-out rows
# remain covered by the local sf0.01 full differential
# (tools/compare_oracle.py) and pytest; tools/gate_history.py asserts
# every oracled registry query has held a driver-green row in some
# round.
_PRIORITY = (
    # TPC-H aggregate/join shapes (q3/q5/q8: r02-stale, returning)
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q8_market_share",
    "q2_min_cost_supplier", "q4_order_priority",
    # PipelineDB combine() merge math, batch-expressible twins (B2):
    # exact transition states + the KLL percentile sketch merge
    "combine_regroup", "combine_percentile_regroup",
    # relational §2B rows (B6/B8/B9/B10/B13/B18/B20/B21/B22;
    # case_coalesce returns from r02)
    "filter_predicates", "join_left_outer", "join_semi", "join_anti",
    "join_range", "agg_distinct", "order_limit", "set_union_distinct",
    "scalar_string_funcs", "case_coalesce", "json_extract",
    # grouping sets family (B15): returning from r02
    "cube_orders", "rollup_revenue",
    # dedup clustering + tokenizer training + ANN compression
    "neardup_components", "bpe_train_verify", "cosine_topk_ivfpq_recall",
    # approx aggregates / sketches (B14): theta set algebra + the
    # returning count-min row
    "theta_set_overlap", "cms_event_counts",
    # events: returning cohort analysis row
    "cohort_retention",
    # perceptual media dedup twins (C2-for-media)
    "audio_fingerprint_dedup", "image_dhash_dedup",
    # window functions / top-k (B17/B19): range-frame row returns
    "window_range_frame", "topk_per_group",
    # C5: real video + audio-feature decode gates
    "multimodal_video_stats", "audio_signal_features",
    # timeseries (B11/B23/B24) + pandas-UDF surface (B27):
    # sliding/session window rows return
    "srt_caption_stats", "sliding_window_agg", "session_window_agg",
    "asof_join", "zscore_per_user",
    # dedup (C1/C2: exact + span rewrite) and C4 text analysis
    "exact_dedup", "dedup_spans_rewrite", "html_extract_main",
    "text_quality", "token_count_bpe",
    "value_histogram",
    # the real nearest-neighbor resize kernel under the gate
    "image_resize_stats",
    # corpus curation (C6): hash-threshold scale-path sampler + the
    # returning cleaning pipeline row
    "stratified_sample_hash", "corpus_clean", "oov_rate_filter",
    # similarity search (C3)
    "cosine_topk_lsh_recall",
    # multimodal (C5): real image AND audio codecs under full DuckDB
    # oracles
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
