"""Semantics of the approximate dedup/similarity tiers, anchored to their
exact counterparts (which are themselves oracle-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_kinesis_spark.operators.dedup import (
    SIMHASH_MAX_DIST,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from pipeline_kinesis_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
    cosine_topk_pq,
)


def test_minhash_recall_against_exact(spark, sf_dir):
    """LSH candidates must cover most truly-similar pairs (est. jaccard
    tracks exact jaccard)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.7)
        .collect()
    }
    approx = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6, f"minhash recall {recall:.2f} over {len(exact)} pairs"


def test_minhash_deterministic(spark, sf_dir):
    a = sorted(map(tuple, minhash_lsh_pairs(spark, sf_dir).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(spark, sf_dir).collect()))
    assert a == b


def test_simhash_deterministic_and_complete(spark, sf_dir):
    sigs = simhash_signatures(spark, sf_dir)
    rows = {r.doc_id: r.simhash for r in sigs.collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    again = {r.doc_id: r.simhash for r in simhash_signatures(spark, sf_dir).collect()}
    assert rows == again
    assert all(s >= 0 for s in rows.values())  # bit 63 kept clear


def test_simhash_pairs_capture_exact_duplicates(spark, sf_dir):
    """The banded Hamming join is recall-exact for distance <= 3 by
    pigeonhole, so every exact duplicate family (identical normalized
    text, hence identical signatures, distance 0) must appear as pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup_pairs = set()
    for fam in (
        docs.groupBy(F.trim("text"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .collect()
    ):
        ids = sorted(fam.ids)
        dup_pairs.update(
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        )
    pairs = simhash_pairs(spark, sf_dir).collect()
    assert all(r.hamming <= SIMHASH_MAX_DIST for r in pairs)
    assert all(r.doc_a < r.doc_b for r in pairs)
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert dup_pairs <= got, f"missed {sorted(dup_pairs - got)[:5]}"
    # one row per unordered pair
    assert len(pairs) == len(got)


def test_simhash_pairs_deterministic(spark, sf_dir):
    a = sorted(map(tuple, simhash_pairs(spark, sf_dir).collect()))
    b = sorted(map(tuple, simhash_pairs(spark, sf_dir).collect()))
    assert a == b


def test_ivf_cells_as_physical_partitions_prune_scan(spark, sf_dir, tmp_path):
    """The 100 TB IVF layout the docstring promises: cell assignment
    becomes the table's physical partitioning, so probing nprobe cells is
    a partition-PRUNED scan — Spark reads only the probed cells'
    directories, never the full collection."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from pipeline_kinesis_spark.operators.similarity import _with_dvec
    from pipeline_kinesis_spark.plans.inspect import explain_str

    e = _with_dvec(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    fe = e.withColumn("fvec", array_to_vector("dvec"))
    km = KMeans(k=8, seed=42, featuresCol="fvec", predictionCol="cell")
    assigned = km.fit(fe).transform(fe).select("vec_id", "dvec", "nrm", "cell")
    ivf_dir = str(tmp_path / "ivf")
    assigned.write.partitionBy("cell").parquet(ivf_dir)

    probe = spark.read.parquet(ivf_dir).filter(F.col("cell").isin(1, 3, 5))
    plan = explain_str(probe)
    assert "PartitionFilters" in plan and "cell" in plan
    # the pruned scan must touch at most the probed cells' rows
    full = spark.read.parquet(ivf_dir).count()
    pruned = probe.count()
    assert 0 < pruned < full


def test_lsh_topk_recall(spark, sf_dir):
    """Multi-table sign-LSH must actually find most true neighbors —
    recall@10 per query ≥ 0.5 (the gate's cosine_topk_lsh_recall row
    asserts the looser 0.4 bound; observed ≥ 0.6)."""
    exact = {}
    for r in cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in cosine_topk_lsh(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    for q, want in exact.items():
        rec = len(want & approx.get(q, set())) / len(want)
        assert rec >= 0.5, f"query {q}: LSH recall {rec:.2f}"


def test_prefix_jaccard_hot_shingle_skew(spark, tmp_path):
    """A stop-shingle planted in 50% of docs: (a) output still matches
    the naive exact twin, and (b) the document-frequency pass is a
    partial-aggregating groupBy, NOT a count-over-window — a window on
    the shingle key would put the hot shingle's whole posting list in
    one task at scale (no map-side combine, no AQE skew split)."""
    from pipeline_kinesis_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix,
    )

    hot = "alpha beta gamma"  # one trigram shingle shared by half the docs
    rows = []
    for i in range(40):
        uniq = " ".join(f"u{i}_{j}" for j in range(8))
        text = f"{hot} {uniq}" if i % 2 == 0 else uniq
        rows.append((i, text))
    # plus a genuine near-dup pair that must survive the skew
    rows.append((100, "the quick brown fox jumps over the lazy dog today"))
    rows.append((101, "the quick brown fox jumps over the lazy dog now"))
    d = tmp_path / "corpus"
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        str(d / "documents.parquet")
    )

    out = ngram_jaccard_prefix(spark, str(d))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, "df pass lost map-side partial agg"
    # windows partitioned by doc_id are fine (per-doc groups are bounded
    # by document length); a window partitioned by the SHINGLE key would
    # put the hot shingle's whole posting list in one task.
    import re

    for wline in re.findall(r"Window \[.*", plan):
        m = re.search(r"windowspecdefinition\((\w+)#", wline)
        assert m and m.group(1) == "doc_id", (
            "window partitioned by a non-doc key: " + wline[:120]
        )

    got = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard) for r in out.collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in ngram_jaccard_pairs(spark, str(d)).collect()
    }
    assert got == want
    assert any(a == 100 and b == 101 for a, b, _, _ in got)


def test_neardup_components_cluster_pairs(spark, sf_dir):
    """Every near-dup pair lands in one component, the canonical doc is
    the component minimum, and sizes count the member rows."""
    from pipeline_kinesis_spark.operators.dedup import (
        neardup_components,
        ngram_jaccard_prefix,
    )

    comp = {
        r.doc_id: (r.component, r.csize, r.is_canonical)
        for r in neardup_components(spark, sf_dir).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_prefix(spark, sf_dir).collect()
    ]
    assert pairs and comp
    for a, b in pairs:
        assert comp[a][0] == comp[b][0], f"pair ({a},{b}) split"
    members: dict[int, set] = {}
    for d, (c, _, _) in comp.items():
        members.setdefault(c, set()).add(d)
    for c, ms in members.items():
        assert c == min(ms)
        for d in ms:
            assert comp[d][1] == len(ms)
            assert comp[d][2] == (d == c)


def test_pq_topk_recall_and_exact_sims(spark, sf_dir):
    """The PQ tier must (a) recover most true neighbors through the ADC
    scan + rerank (recall@10 per query ≥ 0.6 observed; the gate's
    cosine_topk_pq_recall row asserts the looser 0.4 bound) and (b)
    report the exact similarity for every neighbor it returns — the
    quantization error must stay confined to candidate selection."""
    exact_sims = {
        (r.query_id, r.vec_id): r.sim
        for r in cosine_topk(spark, sf_dir).collect()
    }
    exact = {}
    for (q, v) in exact_sims:
        exact.setdefault(q, set()).add(v)
    approx = {}
    for r in cosine_topk_pq(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
        if (r.query_id, r.vec_id) in exact_sims:
            assert abs(exact_sims[(r.query_id, r.vec_id)] - r.sim) < 1e-9
    for q, want in exact.items():
        rec = len(want & approx.get(q, set())) / len(want)
        assert rec >= 0.6, f"query {q}: PQ recall {rec:.2f}"


def test_ivfpq_topk_recall(spark, sf_dir):
    """The composed IVF-PQ tier pays two approximation layers (cell
    pruning AND code quantization); it must still clear recall@10 ≥ 0.5
    per query (the gate's cosine_topk_ivfpq_recall row asserts the looser
    0.4 bound; observed ≥ 0.5 at sf0.001/sf0.01)."""
    exact = {}
    for r in cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in cosine_topk_ivfpq(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    for q, want in exact.items():
        rec = len(want & approx.get(q, set())) / len(want)
        assert rec >= 0.5, f"query {q}: IVF-PQ recall {rec:.2f}"


def test_lsh_topk_sims_match_exact(spark, sf_dir):
    """Every (query, neighbor) the LSH tier returns must carry the same
    similarity the exact tier computes — rerank must not approximate."""
    exact = {
        (r.query_id, r.vec_id): r.sim
        for r in cosine_topk(spark, sf_dir).collect()
    }
    for r in cosine_topk_lsh(spark, sf_dir).collect():
        if (r.query_id, r.vec_id) in exact:
            assert abs(exact[(r.query_id, r.vec_id)] - r.sim) < 1e-9


def test_connected_components_long_chain_converges_bounded_plan(spark):
    """A planted 20-node chain (diameter 19 — the label-propagation
    worst case) must converge to one component in O(log diameter)
    rounds (r09 path halving: each round propagates one hop AND
    replaces every label with its label's label) AND keep the final
    plan depth bounded: per-round localCheckpoint truncates lineage,
    so the surviving plan holds at most one round of joins no matter
    how many rounds ran."""
    import math

    from pipeline_kinesis_spark.operators import dedup
    from pipeline_kinesis_spark.operators.dedup import (
        _connected_components,
    )

    n = 20
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src LONG, dst LONG"
    )
    labels = _connected_components(edges)
    got = {r.n: r.lbl for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}

    # plain hash-to-min walks one hop per round — a diameter-19 chain
    # would take ~19 rounds; halving must land well under half that
    # (2*log2(19)+2 ≈ 10 leaves slack for the off-by-one tail plus the
    # final confirming round)
    rounds = dedup._LAST_CC_ROUNDS
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds
    assert rounds < (n - 1) // 2, rounds

    # lineage: every round ends in an eager localCheckpoint, so the
    # final LOGICAL plan carries zero join nodes regardless of round
    # count. (The analyzed plan is the lineage; the optimized/physical
    # rendering also prints cached-plan internals and would overcount.)
    plan = labels._jdf.queryExecution().analyzed().toString()
    n_joins = plan.count("Join")
    assert n_joins == 0, plan


def test_ivfpq_codes_partitioned_by_cell_prune_scan(spark, sf_dir, tmp_path):
    """The composed IVF-PQ tier at its physical layout: PQ code rows
    written partitionBy(cell) and probed with an nprobe cell filter must
    be a partition-PRUNED scan — every file the probe reads lives under a
    probed cell's directory, so per-query cost is nprobe/n_cells of the
    code table, with each row already 64x-compressed by PQ."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from pipeline_kinesis_spark.operators.similarity import (
        _pq_codebooks,
        _pq_encode,
        _with_dvec,
    )
    from pipeline_kinesis_spark.plans.inspect import explain_str

    e = _with_dvec(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    fe = e.withColumn("fvec", array_to_vector("dvec"))
    km = KMeans(k=8, seed=42, featuresCol="fvec", predictionCol="cell")
    assigned = km.fit(fe).transform(fe).select("vec_id", "dvec", "nrm", "cell")
    enc = _pq_encode(assigned, _pq_codebooks(e), passthrough=("cell",))

    codes_dir = str(tmp_path / "ivfpq_codes")
    enc.write.partitionBy("cell").parquet(codes_dir)

    nprobe_cells = (1, 3, 5)
    probe = spark.read.parquet(codes_dir).filter(
        F.col("cell").isin(*nprobe_cells)
    )
    plan = explain_str(probe)
    assert "PartitionFilters" in plan and "cell" in plan
    # the decisive check: the executed scan's own metrics — exactly
    # nprobe partition directories were read, not all n_cells (collect()
    # drives THIS DataFrame's queryExecution, whose leaf scan carries the
    # numPartitions metric; count() would execute a separate plan)
    n_rows = len(probe.collect())
    scan = probe._jdf.queryExecution().executedPlan().collectLeaves().head()
    n_parts = scan.metrics().apply("numPartitions").value()
    assert n_parts == len(nprobe_cells), f"scan read {n_parts} partitions"
    # and the probe reads strictly fewer rows than the full code table
    assert 0 < n_rows < spark.read.parquet(codes_dir).count()


def test_crossdoc_span_dup_planted_reuse(spark, tmp_path):
    """A passage copied between two documents must light up exactly its
    span positions in both docs; a unique doc reports zero duplication."""
    from pipeline_kinesis_spark.operators.dedup import (
        SPAN_N,
        crossdoc_span_dup,
    )

    shared = " ".join(f"s{i}" for i in range(SPAN_N))  # one shared span
    d = tmp_path / "corpus"
    spark.createDataFrame(
        [
            (1, f"{shared} alpha beta gamma delta epsilon zeta"),
            (2, f"eta theta iota kappa lam mu {shared}"),
            (3, "nu xi omicron pi rho sigma tau upsilon phi chi"),
        ],
        "doc_id LONG, text STRING",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {r.doc_id: r for r in crossdoc_span_dup(spark, str(d)).collect()}
    # docs 1 and 2 share exactly the one planted span; every other span
    # includes a doc-unique token so cannot repeat across docs
    assert rows[1].n_dup_spans == 1 and rows[2].n_dup_spans == 1
    assert rows[3].n_dup_spans == 0 and rows[3].dup_frac == 0.0
    for doc in (1, 2):
        n = rows[doc].n_spans
        assert abs(rows[doc].dup_frac - round(1 / n, 6)) < 1e-6


def test_dedup_spans_rewrite_removes_shared_passage(spark, tmp_path):
    """The planted shared passage is excised from BOTH docs (every token
    its spans cover), unique docs come back verbatim, and token
    accounting holds: n_kept + n_removed == n_tokens."""
    from pipeline_kinesis_spark.operators.dedup import (
        SPAN_N,
        dedup_spans_rewrite,
    )

    shared = " ".join(f"s{i}" for i in range(SPAN_N))
    uniq1 = "alpha beta gamma delta epsilon zeta"
    uniq2 = "eta theta iota kappa lam mu"
    uniq3 = "nu xi omicron pi rho sigma tau upsilon"
    d = tmp_path / "corpus"
    spark.createDataFrame(
        [
            (1, f"{shared} {uniq1}"),
            (2, f"{uniq2} {shared}"),
            (3, uniq3),
        ],
        "doc_id LONG, text STRING",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {r.doc_id: r for r in dedup_spans_rewrite(spark, str(d)).collect()}
    assert rows[1].text_clean == uniq1
    assert rows[2].text_clean == uniq2
    assert rows[3].text_clean == uniq3 and rows[3].n_removed == 0
    for r in rows.values():
        assert r.n_kept + r.n_removed == r.n_tokens
    assert rows[1].n_removed == SPAN_N and rows[2].n_removed == SPAN_N


def test_ann_parameters_scale_with_corpus():
    """The r10 sf1 recall probe found three fixed ANN constants that must
    scale with the corpus. Pin both halves of each fix: the floors keep
    every driver SF (n <= 200 embeddings at sf0.1) byte-identical to
    rounds 1-9, and past the floor the parameters grow ~sqrt(n) so the
    probed corpus fraction / rerank fraction don't shrink to zero at
    100 TB."""
    from pipeline_kinesis_spark.operators.similarity import (
        PQ_RERANK,
        _ivf_params,
        _pq_rerank_depth,
    )

    # Floors: driver SFs (sf0.001 n=20, sf0.01 n=200(?), sf0.1 n<=2000)
    # at or below the historical constants stay exactly historical.
    assert _ivf_params(20) == (8, 3)
    assert _ivf_params(200) == (8, 3)
    assert _pq_rerank_depth(20) == PQ_RERANK
    assert _pq_rerank_depth(56) == PQ_RERANK

    # Growth: ~sqrt(n) cells with a constant probed fraction (3/8), and
    # rerank depth 8*sqrt(n) once past the floor.
    for n in (20_000, 2_000_000, 200_000_000):
        cells, nprobe = _ivf_params(n)
        assert abs(cells - n**0.5 / 2) <= 1
        # ceil, not floor: the probed fraction must never drop BELOW
        # the historical 3/8 (floor division let it dip to 36% at
        # n=2000 and sf0.1 query-0 recall fell through the bound)
        assert nprobe == max(3, -((cells * 3) // -8))
        assert nprobe / cells >= 3 / 8
        # multiplier 16, set by the sf10 probe: 8*sqrt(n) hit the
        # recall bound with zero margin at 200k vectors; the reranked
        # FRACTION 16/sqrt(n) still vanishes with corpus growth
        assert _pq_rerank_depth(n) == int(16 * n**0.5)


def test_ivf_trains_on_bounded_sample_past_cap(spark, sf_dir, monkeypatch):
    """At 100 TB the IVF coarse quantizer cannot run Lloyd passes over
    the whole corpus; past IVF_TRAIN_CAP it trains on a hash-spread
    sample and assigns everything. Engage the sampled path here by
    lowering the cap below the fixture size and assert the tier still
    meets the recall bound against the exact baseline — i.e. sampling
    the fit degrades centers gracefully, not catastrophically."""
    import pipeline_kinesis_spark.operators.similarity as S

    monkeypatch.setattr(S, "IVF_TRAIN_CAP", 64)
    exact = {}
    for r in S.cosine_topk(spark, sf_dir).select("query_id", "vec_id").collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in (
        S.cosine_topk_ivf(spark, sf_dir).select("query_id", "vec_id").collect()
    ):
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    for q, ex in exact.items():
        rec = len(ex & approx.get(q, set())) / len(ex)
        assert rec >= S.IVF_RECALL_BOUND, f"query {q} recall {rec}"
