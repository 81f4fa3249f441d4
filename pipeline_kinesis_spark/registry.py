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
    streaming_gate,
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
    # Round-12 rotation (VERDICT r11 "Next round" #1): the r05/r06
    # staleness tail returns — all EIGHTEEN rows gate_history showed
    # with no driver-green since r05/r06 (stratified_sample at r05, the
    # rest r06-latest) — plus the NEW streaming_dedup_redelivery row
    # (verdict #3: B26 stateful dedup under planted wire redelivery,
    # previously pytest-only) and a 13-row coverage set drawn
    # stale-first (r07/r08) so every §2 family keeps an in-window rep.
    # THIRTY-TWO r10/r11 multi-greens retire, each with its family
    # still represented:
    #   q6/q12/q22 (TPC-H, r11) -> returning q1 (B12 agg summary +
    #     date arith), q7 (multi-join volume/year), q2 (correlated
    #     min-subquery), q4 (EXISTS semi-join — also keeps the B9
    #     shape in-window)
    #   join_right_outer/join_full_outer (B8, r11) -> join_left_outer
    #     returns (r08)
    #   join_theta_pairs (B10, r11) -> join_range returns (r08)
    #   set_except (B20, r11) -> set_union_distinct returns (r08)
    #   agg_stats/agg_salted_skew (B12, r11) -> agg_keyed_minmax +
    #     agg_corr_regression return (r06); join_salted_skew (r06)
    #     keeps the salted-skew shape
    #   bloom/fss/approx_percentile/approx_distinct (B14, r11) ->
    #     hll_mergeable_distinct (r07) + cms_event_counts (r08) return
    #   grouping_sets_revenue (B15, r11) -> rollup_revenue returns (r08)
    #   window_lag_lead (B17, r11) -> window_rank returns (r07)
    #   sliding_window_agg (B23, r11) -> tumbling_window_agg returns
    #     (r07)
    #   cohort_retention (events, r11) -> funnel_conversion returns
    #     (r07)
    #   ngram_jaccard_pairs/simhash_planted_capture (C2, r11) ->
    #     ngram_jaccard_prefix + minhash_lsh_recall return (r06)
    #   cosine_topk/embedding_centroids/cosine_neardup_pairs (C3, r11)
    #     -> cosine_topk_ivf_recall + cosine_topk_pq_recall return (r06)
    #   lang_id_heuristic/tfidf_top_terms/token_stats (C4, r11) ->
    #     text_normalize + winnow_fingerprint_stats + lm_perplexity
    #     return (r06)
    #   corpus_clean/dataset_split/sequence_pack (C6, r11) ->
    #     curation_report + gopher_repetition + decontaminate_overlap +
    #     stratified_sample return (r05/r06)
    #   multimodal_decode_stats/frame_sample/audio_signal_features/
    #     audio_fingerprint_dedup (C5/C2+, r11) -> multimodal_meta_stats
    #     + multimodal_features + multimodal_resize return (r06);
    #     perceptual-media dedup rests on the differential this round
    #     (image_dhash_dedup r08 is next in the staleness queue)
    #   scaled_value_pandas (r06) returns alongside staying
    #     zscore_per_user (B27)
    # B13 (agg_distinct, r08) and C2-media (image_dhash_dedup, r08)
    # wait one round — the r05/r06 tail outranked them for slots; both
    # stay covered by the full differential + pytest.
    # Late-r12 swap: TWO more engine semantics graduated to oracle
    # rows mid-round — streaming_ttl_reap (B16's TTL sweep +
    # pipeline_ttl_expire under planted 2000/2099 eras, so wall-clock
    # never enters the hash) and streaming_alter_schema (B1's ALTER
    # STREAM ADD COLUMN across a stop/alter/restart, with the
    # mergeSchema NULL-fill sentinel). They take the window slots of
    # q2_min_cost_supplier (TPC-H keeps q1/q7/q4; q2 r08 is next in
    # the staleness queue) and cms_event_counts (B14 keeps
    # hll_mergeable_distinct; cms r08 likewise) — both stay in the
    # full differential and pend for r13.
    # Late-r12 swap 2: the last two pytest-only INGESTION semantics
    # graduated to oracle rows — streaming_reshard_counts (A2: shard
    # split AND merge mid-consume through the full pump protocol,
    # exactly-once across both reshard boundaries) and
    # streaming_start_position (A3: after_sequence_number offset
    # resolution against a closed-form midpoint threshold). They take
    # the window slots of zscore_per_user (B27 keeps
    # scaled_value_pandas in-window; zscore is green r02-r11) and
    # cosine_topk_ivfpq_recall (C7 keeps cosine_topk_pq_recall +
    # cosine_topk_ivf_recall in-window; ivfpq is green r03-r11) —
    # both stay in the full differential and pend for r13.
    # Late-r12 swap 3: streaming_datasource_counts oracle-gates the
    # EXECUTOR-PARALLEL ingest path (A1's datasource form — GetRecords
    # on executor tasks over real SigV4 HTTP, 12 shards > MAX_PROCS,
    # mid-consume appends) — the scale architecture previously
    # verified only by pytest e2e/soak. It takes the slot of asof_join
    # (B11), the registry's most multi-green row (r02-r11, ten
    # straight): as-of rests on the full differential for one round,
    # tumbling_window_agg keeps the timeseries family in-window.
    # TPC-H returning rows (stalest first: q1/q7 r07, q4 r08)
    "q1_pricing_summary", "q7_volume_shipping", "q4_order_priority",
    # the standing-query engine end-to-end (all eleven r09-r11 rows
    # stay — the oracle gate on the engine loop is the repo's hardest
    # evidence — PLUS the new B26 dedup-under-redelivery row)
    "streaming_view_counts", "streaming_transform_chain",
    "streaming_restart_counts", "streaming_dead_letter_replay",
    "streaming_activate_resume", "streaming_osrel_telescope",
    "streaming_combine_regroup", "streaming_watermark_drop",
    "streaming_dim_join_counts", "streaming_sessionize_payloads",
    "streaming_stream_join_pairs", "streaming_dedup_redelivery",
    "streaming_ttl_reap", "streaming_alter_schema",
    "streaming_reshard_counts", "streaming_start_position",
    "streaming_datasource_counts",
    # relational §2B returns (B8/B9-via-q4/B10/B20/B22)
    "join_left_outer", "join_range", "set_union_distinct",
    "json_extract",
    # aggregate stats family (B12): the r06 staleness pair + salted
    # skew join twin
    "agg_keyed_minmax", "agg_corr_regression", "join_salted_skew",
    # approx aggregates / sketches (B14): the r07 tail
    "hll_mergeable_distinct",
    # grouping sets (B15) + window functions (B17)
    "rollup_revenue", "window_rank",
    # dedup clustering + tokenizer training + ANN compression (sole
    # reps) + the r06 ANN recall tail (C3/C7)
    "neardup_components", "bpe_train_verify",
    "cosine_topk_ivf_recall", "cosine_topk_pq_recall",
    # events: funnel returns (r07)
    "funnel_conversion",
    # C5 multimodal: the r06 staleness trio
    "multimodal_meta_stats", "multimodal_features", "multimodal_resize",
    # timeseries (B11/B23) + pandas-UDF surface (B27, + returning r06
    # scaling twin)
    "tumbling_window_agg",
    "scaled_value_pandas",
    # dedup C1 sole rep + C2: the r06 recall tail
    "exact_dedup", "ngram_jaccard_prefix", "minhash_lsh_recall",
    # C4 text analysis: the r06 tail
    "text_normalize", "winnow_fingerprint_stats", "lm_perplexity",
    # corpus curation (C6): the r05/r06 tail
    "curation_report", "gopher_repetition", "decontaminate_overlap",
    "stratified_sample",
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
