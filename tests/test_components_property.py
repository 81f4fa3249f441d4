"""Property test: cluster_pairs (distributed hash-to-min label
propagation) equals a union-find reference on arbitrary random graphs —
components, min-id labels, sizes, and canonical flags. A handful of
Spark round-trips, each against a hypothesis-generated edge list."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_kinesis_spark.operators.dedup import cluster_pairs

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, set] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    out = {}
    for members in comps.values():
        lbl = min(members)
        for n in members:
            out[n] = (lbl, len(members), n == lbl)
    return out


@settings(max_examples=6, deadline=None)
@given(_edges)
def test_cluster_pairs_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a LONG, doc_b LONG"
    )
    got = {
        r.doc_id: (r.component, r.csize, r.is_canonical)
        for r in cluster_pairs(
            pairs, id_col="doc_id", cluster_col="component"
        ).collect()
    }
    assert got == _union_find(edges)
