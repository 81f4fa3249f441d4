"""Winnowing fingerprints + IVF recall (rows-only operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_kinesis_spark.operators.similarity import (
    TOP_K,
    cosine_topk,
    cosine_topk_ivf,
)
from pipeline_kinesis_spark.operators.textops import winnow_fingerprints


def test_winnow_deterministic_and_shaped(spark, sf_dir):
    a = {r.doc_id: tuple(r.fingerprints) for r in winnow_fingerprints(spark, sf_dir).collect()}
    b = {r.doc_id: tuple(r.fingerprints) for r in winnow_fingerprints(spark, sf_dir).collect()}
    assert a == b
    # winnowing guarantee: fingerprint count ≤ gram count, ≥ 1 for any
    # doc longer than k+w chars
    assert all(len(v) >= 1 for v in a.values())


def test_winnow_detects_shared_substrings(spark, sf_dir):
    """Two docs sharing a long substring must share ≥1 fingerprint
    (winnowing's detection guarantee)."""
    df = winnow_fingerprints(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = {r.doc_id: set(r.fingerprints) for r in df.collect()}
    texts = {r.doc_id: r.text.lower().strip() for r in docs.collect()}
    ids = sorted(fps)
    checked = 0
    for i in ids[:20]:
        for j in ids[:20]:
            if i >= j:
                continue
            # find a shared 20-char substring, if any
            t1, t2 = texts[i], texts[j]
            shared = any(
                t1[k : k + 20] in t2 for k in range(0, max(len(t1) - 20, 0), 7)
            )
            if shared:
                checked += 1
                assert fps[i] & fps[j], f"docs {i},{j} share text, no fp overlap"
    # sanity: the corpus's shared vocabulary produces at least one case
    assert checked > 0


def test_ivf_recall_against_exact(spark, sf_dir):
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_ivf(spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # nprobe=3 of 8 cells on near-orthogonal vectors: modest but real
    assert recall >= 0.2, f"IVF recall {recall:.2f}"
    # and per query it returns at most TOP_K
    from collections import Counter

    per_q = Counter(q for q, _ in ivf)
    assert all(n <= TOP_K for n in per_q.values())
