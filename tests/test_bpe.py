"""BPE tokenizer training (§2C C4): merge-loop semantics the oracle twin
cannot express — fixture-scale merge count, early exhaustion on degenerate
corpora, and the stage-2 word-table cap (bounded single-task input)."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.operators import bpe


def _write_docs(spark, tmp_path, texts) -> str:
    d = tmp_path / "corpus"
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_fixture_corpus_uses_full_merge_budget(spark, sf_dir):
    """The real fixture corpus never exhausts adjacent pairs, so exactly
    BPE_N_MERGES merges come back with dense ranks — the count the gate
    row deliberately omits (it would diverge on degenerate corpora)."""
    rows = bpe.bpe_merges(spark, sf_dir).collect()
    assert len(rows) == bpe.BPE_N_MERGES
    assert sorted(r["rank"] for r in rows) == list(
        range(1, bpe.BPE_N_MERGES + 1)
    )


def test_degenerate_corpus_breaks_early(spark, tmp_path):
    """Single-character words have no adjacent pairs: the loop must stop
    at zero merges instead of looping the full budget."""
    sf = _write_docs(spark, tmp_path, ["a b c", "a a b"])
    assert bpe.bpe_merges(spark, sf).collect() == []


def test_tiny_corpus_exhausts_mid_budget(spark, tmp_path):
    """'ab' admits exactly one merge; afterwards every word is a single
    symbol — n_merges lands strictly between 0 and the budget."""
    sf = _write_docs(spark, tmp_path, ["ab ab", "ab"])
    rows = bpe.bpe_merges(spark, sf).collect()
    assert len(rows) == 1
    assert (rows[0]["left"], rows[0]["right"], rows[0]["merged"]) == (
        "a", "b", "ab",
    )


def test_word_table_cap_is_deterministic_top_n(spark, tmp_path, monkeypatch):
    """With the cap forced below the vocabulary size, stage 2 sees only
    the most frequent words (count DESC, word ASC) — the merge result
    must equal training on that explicit subset."""
    texts = ["xx " * 5, "yy " * 3, "zz " * 2, "qq rr ss tt"]
    sf = _write_docs(spark, tmp_path, texts)
    monkeypatch.setattr(bpe, "BPE_MAX_WORDS", 2)
    rows = bpe.bpe_merges(spark, sf).collect()
    # surviving table: xx×5, yy×3 → first merge (x,x) count 5, then (y,y)
    got = [(r["left"], r["right"], r["pair_count"]) for r in rows]
    assert got == [("x", "x", 5), ("y", "y", 3)]


def test_cap_plan_has_no_full_sort_shuffle(spark, sf_dir):
    """The top-N cap must plan as TakeOrderedAndProject (per-partition
    partial top-N), not a global Sort — the difference between a bounded
    merge of N×partitions rows and a full-vocabulary sort shuffle."""
    plan = bpe._word_counts(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
