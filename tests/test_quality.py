"""Semantic invariants of the corpus-curation operators (quality.py) —
properties the DuckDB hash-equality gate can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.functions.exprs import tokens
from pipeline_kinesis_spark.operators.quality import (
    SEQ_PACK_LEN,
    STRATA_FRACS,
    decontaminate_overlap,
    pii_redact,
    sequence_pack,
    stratified_sample,
)


def test_sequence_pack_partitions_the_corpus(spark, sf_dir):
    """Packing is a partition of each source shard: every document lands
    in exactly one sequence, token counts are conserved, sequence ids are
    dense from 0, and doc ranges of consecutive sequences never overlap
    (concat-and-split keeps doc_id order)."""
    packed = sequence_pack(spark, sf_dir).collect()
    d = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size(tokens("text"))).alias("toks"),
        )
        .collect()
    )
    totals = {r.source: (r.docs, r.toks) for r in d}
    by_source: dict[str, list] = {}
    for r in packed:
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == set(totals)
    for src, rows in by_source.items():
        rows.sort(key=lambda r: r.seq_id)
        assert [r.seq_id for r in rows] == list(range(len(rows)))
        assert sum(r.n_docs for r in rows) == totals[src][0]
        assert sum(r.n_tokens_packed for r in rows) == totals[src][1]
        for a, b in zip(rows, rows[1:]):
            assert a.last_doc < b.first_doc
        # a sequence begins within its token window: all but the last
        # must have accumulated at least SEQ_PACK_LEN tokens by the time
        # the next sequence starts
        running = 0
        for r in rows[:-1]:
            running += r.n_tokens_packed
            assert running >= (r.seq_id + 1) * SEQ_PACK_LEN - SEQ_PACK_LEN + 1


def test_stratified_sample_exact_quotas(spark, sf_dir):
    rows = {r.lang: r for r in stratified_sample(spark, sf_dir).collect()}
    assert set(rows) == set(STRATA_FRACS)
    import math

    for lang, r in rows.items():
        assert r.quota == math.ceil(STRATA_FRACS[lang] * r.n_total)
        assert r.n_kept == min(r.quota, r.n_total)


def test_pii_redact_counts_match_planting(spark, sf_dir):
    """The audit counts must equal the deterministic planting schedule
    (every 5th doc an email, 7th a phone, 11th an IPv4) — i.e. the
    regexes catch exactly what was planted and nothing else."""
    d = load(spark, sf_dir, "documents")
    expect = d.agg(
        F.sum((F.col("doc_id") % 5 == 0).cast("long")).alias("e"),
        F.sum((F.col("doc_id") % 7 == 0).cast("long")).alias("p"),
        F.sum((F.col("doc_id") % 11 == 0).cast("long")).alias("i"),
    ).collect()[0]
    got = (
        pii_redact(spark, sf_dir)
        .agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_phones").alias("p"),
            F.sum("n_ips").alias("i"),
            F.min("chars_redacted").alias("min_removed"),
        )
        .collect()[0]
    )
    assert (got.e, got.p, got.i) == (expect.e, expect.p, expect.i)
    assert got.min_removed >= 0


def test_decontaminate_fractions_well_formed(spark, sf_dir):
    rows = decontaminate_overlap(spark, sf_dir).collect()
    assert rows  # data-bearing at every fixture SF (n=4 calibration)
    for r in rows:
        assert 0 < r.n_matched <= r.n_ngrams
        assert 0.0 < r.contam_frac <= 1.0
        assert r.is_contaminated == (r.n_matched / r.n_ngrams >= 0.05)
        assert r.doc_id % 50 != 0  # benchmark docs never self-report


def test_lm_perplexity_oov_class(spark, tmp_path, monkeypatch):
    """With the vocabulary cap forced below the corpus vocabulary, rare
    tokens fall into the UNK class: they count as OOV and score with the
    shared OOV probability mass — the bounded-table behavior the 100 TB
    path depends on."""
    import math

    from pipeline_kinesis_spark.operators import quality

    d = tmp_path / "corpus"
    spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "aa rare1 rare2 bb")],
        "doc_id LONG, text STRING",
    ).write.parquet(str(d / "documents.parquet"))
    monkeypatch.setattr(quality, "LM_VOCAB_MAX", 2)
    rows = {
        r.doc_id: r for r in quality.lm_perplexity(spark, str(d)).collect()
    }
    # vocab = {aa:4, bb:2}; n_tok=8, c_oov=2, V=2, k=0.5
    assert rows[1].n_oov == 0 and rows[2].n_oov == 2
    k, n, v, c_oov = 0.5, 8, 2, 2
    denom = n + k * (v + 1)
    p_aa, p_bb, p_oov = (4 + k) / denom, (2 + k) / denom, (c_oov + k) / denom
    want1 = math.exp(-(3 * math.log(p_aa) + math.log(p_bb)) / 4)
    want2 = math.exp(
        -(math.log(p_aa) + 2 * math.log(p_oov) + math.log(p_bb)) / 4
    )
    assert abs(rows[1].ppl - round(want1, 6)) < 1e-6
    assert abs(rows[2].ppl - round(want2, 6)) < 1e-6
    # higher-perplexity doc is the one full of rare tokens
    assert rows[2].ppl > rows[1].ppl


def test_curation_report_ppl_outlier_flag(spark, tmp_path):
    """The perplexity flag (never exercised on the uniform fixture
    corpus) must fire for a doc of corpus-rare tokens: its unigram ppl
    exceeds 1.5x the corpus median."""
    from pipeline_kinesis_spark.operators.quality import curation_report

    common = "the quick brown fox jumps over the lazy dog again and again"
    d = tmp_path / "corpus"
    spark.createDataFrame(
        [(i, "en", f"src{i}", common, len(common)) for i in range(8)]
        + [(8, "en", "src8", "zzq xvw qqj zzk wwx vvz jjq kkz", 31)],
        "doc_id LONG, lang STRING, source STRING, text STRING, n_chars LONG",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {r.doc_id: r for r in curation_report(spark, str(d)).collect()}
    assert rows[8].flag_ppl_outlier and not rows[8].keep
    assert not rows[0].flag_ppl_outlier


def test_span_operators_survive_short_docs(spark, tmp_path):
    """Regression: docs with fewer than SPAN_N tokens (or empty text)
    must yield zero spans, not crash — sequence(1, 0) in Spark is [1, 0]
    (descending), so the ngrams() short-doc branch must produce a
    genuinely empty array."""
    from pipeline_kinesis_spark.operators.dedup import (
        crossdoc_span_dup,
        dedup_spans_rewrite,
    )

    d = tmp_path / "corpus"
    spark.createDataFrame(
        [
            (0, "only three tokens", "en", "s", 17),
            (1, "", "en", "s", 0),
            (2, " ".join(f"w{i}" for i in range(30)), "en", "s", 100),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.parquet(str(d / "documents.parquet"))
    # crossdoc excludes span-less docs; rewrite keeps them verbatim
    assert crossdoc_span_dup(spark, str(d)).count() == 1
    rows = {r.doc_id: r for r in dedup_spans_rewrite(spark, str(d)).collect()}
    assert len(rows) == 3 and rows[0].n_removed == 0
    assert rows[0].text_clean == "only three tokens"
