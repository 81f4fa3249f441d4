"""Scale-readiness assertions on physical plans — correctness of results is
covered by the oracle suite; these check the plans are the ones you'd want
at 100 TB: pushdown, pruning, broadcast joins, codegen.
"""

from __future__ import annotations

from pipeline_kinesis_spark.operators.relational import join_range
from pipeline_kinesis_spark.operators.tpch import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
    q6_forecast_revenue,
)
import pytest

from pipeline_kinesis_spark.plans.inspect import (
    explain_str,
    has_pushed_filters,
    scan_columns,
    uses_broadcast_join,
)
from pipeline_kinesis_spark.registry import all_queries

_ALL = sorted(all_queries().items())


@pytest.mark.parametrize("name", [n for n, _ in _ALL])
def test_plan_hygiene_every_query(spark, sf_dir, name):
    """Fleet-wide plan bans: no unconditioned cartesian products and no
    row-at-a-time Python UDFs (BatchEvalPython) anywhere in the library —
    the two plan shapes that can't survive a 100× scale-up. (Broadcast
    nested-loop joins are allowed: that's the intended physical form of a
    broadcast cross/theta join against a small side.)"""
    spec = dict(_ALL)[name]
    plan = explain_str(spec.fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row Python UDF"
    # r15 regression ban: an interpreted higher-order function inside a
    # Filter Condition. Exploding a NAMED array column lets
    # InferFiltersFromGenerate add size(arr)>0/isnotnull(arr), and
    # predicate pushdown then substitutes the whole lambda pipeline into
    # the scan filter — re-evaluated per input row on top of the
    # projection's own evaluation (measured 3-4x on minhash_lsh_pairs /
    # ngram_jaccard_pairs, ~20x on decontaminate_overlap's cache build).
    # Fix pattern: explode_outer over a provably non-empty array, or an
    # inline generator expression. corpus_clean is exempt: its HOF
    # predicate IS the declared quality gate (the oracle runs the same
    # expression) and is evaluated once per row at the scan.
    if name not in {"corpus_clean"}:
        hof_in_filter = [
            line
            for line in plan.splitlines()
            if line.lstrip().startswith("Condition")
            and "lambdafunction(" in line
        ]
        assert not hof_in_filter, (
            f"{name} evaluates a higher-order function inside a Filter "
            f"condition: {hof_in_filter[:1]}"
        )


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert has_pushed_filters(df, "LessThanOrEqual(l_shipdate")


def test_q1_column_pruning(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    cols = scan_columns(df)[0]
    # 7 needed columns, not all 11
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert "l_quantity" in cols and "l_shipdate" in cols


def test_q6_multiple_predicates_pushed(spark, sf_dir):
    df = q6_forecast_revenue(spark, sf_dir)
    assert has_pushed_filters(
        df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"
    )


def test_dimension_joins_broadcast(spark, sf_dir):
    assert uses_broadcast_join(q3_shipping_priority(spark, sf_dir))
    assert uses_broadcast_join(q5_local_supplier_volume(spark, sf_dir))
    assert uses_broadcast_join(join_range(spark, sf_dir))


def test_q1_whole_stage_codegen(spark, sf_dir):
    plan = explain_str(q1_pricing_summary(spark, sf_dir), mode="codegen")
    assert "WholeStageCodegen" in plan


def test_no_cartesian_in_tpch(spark, sf_dir):
    for q in (q3_shipping_priority, q5_local_supplier_volume):
        plan = explain_str(q(spark, sf_dir))
        assert "CartesianProduct" not in plan


def test_exact_anchors_flagged_and_twinned():
    """The exact_anchor flag (r10) marks deliberately-naive quadratic
    tiers so big-SF sweeps can exclude them mechanically. Two
    invariants: the flag set is exactly the documented four (adding a
    quadratic query without flagging it re-wedges the sf1 sweep;
    flagging a scale-path query hides it from big-SF verification),
    and every anchor's scale-safe twin is a registered, oracled query
    so the skipped semantics stay verified at every swept SF."""
    from pipeline_kinesis_spark.registry import all_queries

    qs = all_queries()
    anchors = {n for n, s in qs.items() if s.exact_anchor}
    assert anchors == {
        "ngram_jaccard_pairs",
        "cosine_neardup_pairs",
        "embedding_neardup_clusters",
        "stratified_sample",
    }
    twins = {
        "ngram_jaccard_pairs": "ngram_jaccard_prefix",
        "cosine_neardup_pairs": "cosine_topk_lsh_recall",
        "embedding_neardup_clusters": "neardup_components",
        "stratified_sample": "stratified_sample_hash",
    }
    for anchor, twin in twins.items():
        assert twin in qs and not qs[twin].exact_anchor
        assert qs[twin].oracle is not None
