"""Assembles the named-query registry from the operator modules.

This is the single source of truth consumed by __spark_entry__.py (driver
contract), bench.py (headline set) and tests (oracle differential suite).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_kinesis_spark.operators import QuerySpec, release_stale_caches
from pipeline_kinesis_spark.shipping import ship_package
from pipeline_kinesis_spark.gates import streaming as streaming_gate
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
    streaming_gate,
)

# The external correctness gate checks the FIRST 50 entries of queries()
# in dict order, so the front of the dict is curated: one representative
# of every SURVEY.md §2B/§2C operator family (joins/aggs/rollup/window/
# timeseries/dedup/textops/similarity/sketches/multimodal/pandas-UDF)
# sits inside that window; redundant TPC-H/relational variants that were
# already verified green follow after.
_WINDOW = 50

# Oracled queries born AFTER this round's window was frozen: scheduled
# for the NEXT rotation's driver-green slots, as {name: round pledged}.
# gate_history treats these as pending (same standing as
# in-window-not-yet-run rows) — but a pledge EXPIRES: once correctness
# history contains a round newer than pledge_round + 1 with the row
# still pledged and never green, gate_history fails loudly (ADVICE r13
# #3 — an open-ended pledge exempted a never-green row indefinitely).
# Until rotation, the full sf0.01/sf0.1 differentials and the sf1 sweep
# carry pledged rows. r14 rotated the four r13 pledges into _PRIORITY.
_PENDING_NEXT_WINDOW: dict[str, int] = {}

# Round-9 rotation (VERDICT r08 "Next round" #2 + #6): retire the
# r01/r02-only staleness tail. Sixteen rows whose last driver-green
# round is r01-r03 return to the window:
#   q13_customer_distribution / q16_supplier_cnt /
#     q21_waiting_suppliers (r01 TPC-H: left-outer-join agg,
#     NOT-IN + count(DISTINCT), exists/not-exists multi-join)
#   join_right_outer / join_full_outer / join_theta_pairs (B8/B10, r01)
#   set_intersect / set_except (B20, r01)
#   scalar_datetime_funcs / scalar_math_funcs (B21, r01)
#   agg_percentile / agg_stats (B12, r01)
#   window_distribution (B17, r03)
#   doc_fingerprint / ngram_top_bigrams (C4, r03)
#   streaming_view_counts (NEW, verdict #6: the standing-query engine
#     end-to-end — deterministic events replay through a real
#     continuous view, oracled as a plain GROUP BY; the one engine
#     path the oracle could never see before)
# Late-r09 deepening of the same verdict-#6 thread — two more engine
# paths the oracle could never see, now deterministic gate rows:
#   streaming_transform_chain (transform → sink relation → chained
#     continuous view, the PipelineDB output-stream composition)
#   streaming_restart_counts (consume_end + late data while the
#     pipeline is down + a SECOND Engine over the same metadata dir:
#     exactly-once across a full engine restart, oracled as the
#     one-shot GROUP BY)
#   streaming_dead_letter_replay (A13 quarantine + idempotent
#     recovery: mis-delimited rows dead-letter exactly, then
#     replay_dead_letters recovers exactly them; the before/after
#     quarantine counts ride in the result row)
#   streaming_activate_resume (B2a ACTIVATE/DEACTIVATE: maintenance
#     pauses while consumers keep archiving, resumes over the backlog
#     from the view checkpoint; the while-paused matrel snapshot
#     rides in the result row)
#   streaming_combine_regroup (combine() over partials MAINTAINED BY
#     THE STANDING QUERY — the engine path of the batch twin it
#     displaces; combine_regroup's merge arithmetic stays covered by
#     the full differential and the twin remains registered)
#   streaming_osrel_telescope (B2o output-stream delta emission:
#     Σ(new − old) over the full osrel history telescopes to the
#     final counts — invariant to micro-batch boundaries, broken by
#     any lost/duplicated/stale delta; displaces html_extract_main,
#     C4 keeps srt_caption_stats + doc_fingerprint +
#     ngram_top_bigrams + oov_rate_filter in-window)
# They displace case_coalesce (B21 keeps scalar_datetime_funcs +
# scalar_math_funcs in-window), rollup_revenue (B15 keeps
# cube_orders — cube subsumes the rollup grouping-set shapes),
# cms_event_counts (B14 keeps theta_set_overlap in-window; CMS stays
# covered by the full differential + pytest sketch suites), and
# image_dhash_dedup (perceptual-dedup family keeps
# audio_fingerprint_dedup; image decode stays in-window via
# multimodal_decode_stats / multimodal_video_stats /
# image_resize_stats).
# Sixteen r07/r08 multi-round greens retire, each with its family
# still represented inside the window:
#   q2_min_cost_supplier / q4_order_priority -> TPC-H stays via
#     q3/q5/q8 + returning q13/q16/q21 (q4's exists-semi-join shape
#     returns via q21's exists/not-exists)
#   filter_predicates (B6) -> every TPC-H row is filter-heavy; q16's
#     like + NOT IN predicates
#   join_left_outer (B8) -> returning join_right/full_outer + q13's
#     left outer join
#   join_semi / join_anti (B9) -> q21 exists + not exists, q16 NOT IN
#   join_range (B10) -> returning join_theta_pairs
#   agg_distinct (B13) -> q16 count(DISTINCT)
#   order_limit / topk_per_group (B18/B19) -> TPC-H order+limit rows
#     + returning window_distribution (rank family)
#   set_union_distinct (B20) -> returning set_intersect/set_except
#   scalar_string_funcs (B21) -> returning datetime/math rows; string
#     exprs also via doc_fingerprint + html_extract_main
#   window_range_frame (B17) -> returning window_distribution
#   text_quality / token_count_bpe (C4) -> returning doc_fingerprint +
#     ngram_top_bigrams; html/srt/oov rows stay
#   value_histogram (B12) -> returning agg_percentile + agg_stats
# Sole-family reps (asof_join B11, exact_dedup C1, bpe_train_verify
# C9, neardup_components C8, cosine_topk_ivfpq_recall C7,
# zscore_per_user B27, json_extract B22) stay put regardless of
# streak. Rotated-out rows remain covered by the local sf0.01 full
# differential (tools/compare_oracle.py) and pytest;
# tools/gate_history.py asserts every oracled registry query has held
# a driver-green row in some round.
_PRIORITY = (
    # Round-16 rotation (VERDICT r15 "Next round" #2):
    #
    # IN — (a) every r15-REWRITTEN oracled query whose post-rewrite
    # correctness so far rests on builder-side runs only (the r15
    # verdict's explicit ask): ngram_jaccard_prefix,
    # decontaminate_overlap, gopher_repetition, curation_report,
    # agg_exact_percentiles, plus the other r15-touched oracled rows
    # minhash_lsh_recall, neardup_components,
    # embedding_neardup_clusters, dedup_spans_rewrite,
    # crossdoc_span_dup, agg_percentile, asof_join,
    # winnow_fingerprint_stats, lm_perplexity (the last two sit in the
    # r12 cohort anyway); (b) the ENTIRE r12-last-green cohort (14
    # rows — clears the oldest staleness tier completely, so after
    # this round no oracled row's last green is older than r13);
    # (c) 25 of the 38-row r13 cohort.
    #
    # HELD — q1_pricing_summary (flagship, always first).
    #
    # OUT — the 50 r15-green rows (all fresh), the 49 r14-green rows
    # (within bound until r19), and 10 family-covered r13 rows
    # deferred to r17 (within bound until r18): case_coalesce +
    # filter_predicates (scalar/filter shapes via scalar_string_funcs
    # + text_normalize + the TPC-H rows), join_left_outer (join
    # family via join_anti/join_semi/join_range/join_salted_skew),
    # order_limit (top-k via topk_per_group + window_rank),
    # rollup_revenue (grouping-set family via r14-green cube_orders),
    # cms_event_counts (sketches via hll_mergeable_distinct),
    # html_extract_main (textops via text_quality + text_normalize),
    # image_dhash_dedup (perceptual dedup via multimodal_features /
    # multimodal_resize / multimodal_meta_stats),
    # q2_min_cost_supplier (TPC-H via q1/q4/q7), stratified_sample
    # (sampling via scaled_value_pandas; r14-green
    # stratified_sample_hash).
    "q1_pricing_summary",
    # (a) r15-rewritten rows the r15 driver samples missed
    "ngram_jaccard_prefix", "minhash_lsh_recall",
    "decontaminate_overlap", "gopher_repetition", "curation_report",
    "agg_exact_percentiles", "agg_percentile",
    "neardup_components", "embedding_neardup_clusters",
    "dedup_spans_rewrite", "crossdoc_span_dup", "asof_join",
    # (b) the full r12-last-green cohort (winnow_fingerprint_stats and
    # lm_perplexity are also r15-rewritten)
    "winnow_fingerprint_stats", "lm_perplexity",
    "hll_mergeable_distinct", "multimodal_features",
    "multimodal_resize", "q4_order_priority", "q7_volume_shipping",
    "text_normalize", "streaming_activate_resume",
    "streaming_combine_regroup", "streaming_dead_letter_replay",
    "streaming_osrel_telescope",
    # (c) 25 of the r13 cohort
    "agg_corr_regression", "agg_distinct", "agg_keyed_minmax",
    "combine_regroup", "cosine_topk_ivf_recall",
    "cosine_topk_pq_recall", "funnel_conversion", "join_anti",
    "join_range", "join_salted_skew", "join_semi",
    "multimodal_meta_stats", "scalar_string_funcs",
    "scaled_value_pandas", "set_union_distinct",
    "streaming_alter_schema", "streaming_datasource_counts",
    "streaming_dim_join_counts", "streaming_reshard_counts",
    "streaming_restart_counts", "text_quality", "token_count_bpe",
    "topk_per_group", "tumbling_window_agg", "window_rank",
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
    # a pledged row must be a real, oracled, below-window query — a
    # typo here would silently satisfy gate_history's coverage check
    bad = [
        n
        for n in _PENDING_NEXT_WINDOW
        if n in _PRIORITY or merged.get(n) is None or merged[n].oracle is None
    ]
    if bad:
        raise ValueError(f"invalid pending-window pledges: {bad}")
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
