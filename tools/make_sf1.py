"""Generate a seed-deterministic sf1-equivalent fixture in /tmp.

VERDICT r09 "next round" #2: the driver ships sf0.001/0.01/0.1 only
(/root/testdata is read-only), so the scale-decade evidence tops out at
600k lineitem rows. This tool derives an sf1 fixture (10x sf0.1) by
REPLICATION WITH KEY OFFSETS — ten copies of each scaling table with
every primary AND foreign key shifted by a per-table stride — which
preserves exactly the properties a scaling probe needs:

- join fan-outs are byte-identical per copy (copy c of lineitem joins
  copy c of orders/part/supplier), so a join-heavy plan sees 10x rows
  at the SAME selectivities and key skew;
- group-by cardinalities scale 10x with unchanged per-group sizes;
- `documents` text gets a per-copy word suffix (`word` -> `word~c`,
  copy 0 unperturbed), so shingle/minhash/simhash identity is preserved
  WITHIN a copy and destroyed ACROSS copies: the near-dup graph is ten
  disjoint replicas of sf0.1's graph (10x components, 10x edges, same
  diameter) instead of a 10x-denser graph that no real corpus shows.

region/nation stay fixed (TPC-H semantics: dimension tables do not
scale). `embeddings` scales by a PER-COPY ORTHOGONAL ROTATION: copy c
applies one seeded QR-derived rotation R_c to every vector (copy 0 is
the identity), which preserves every within-copy inner product and
norm EXACTLY — the cosine-neighborhood structure of sf0.1 is replicated
bit-for-bit up to one matmul's float error — while cross-copy cosines
scatter like random 64-dim vectors (~N(0, 1/64)), so no spurious
cross-copy neighbors form. Labels offset per copy (centroid groups
must not mix rotated copies). Deterministic: table perturbations are
pure functions of (copy, value); the rotations come from a
fixed-seeded numpy Generator.

Usage: python tools/make_sf1.py [outdir] [copies]
  (defaults /tmp/sparkgraft_sf1, 10 copies; pass e.g. 100 for an
  sf10-equivalent — strides hold to >=100 copies: max source keys
  are well under every stride, and stride*copies stays inside int64)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

# stride = a round power of ten comfortably above the table's max key,
# so offset keys never collide and stay readable in a debugger
STRIDES = {
    "custkey": 1_000_000,
    "suppkey": 100_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "doc_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
}


def main() -> int:
    global COPIES
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1"
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def gen(table: str, select_per_copy: str) -> None:
        parts = [
            select_per_copy.format(c=c, **STRIDES)
            for c in range(COPIES)
        ]
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dimensions: straight copy
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    gen(
        "customer",
        f"SELECT c_custkey + {{c}} * {{custkey}} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment "
        f"FROM '{SRC}/customer.parquet'",
    )
    gen(
        "supplier",
        f"SELECT s_suppkey + {{c}} * {{suppkey}} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'",
    )
    gen(
        "part",
        f"SELECT p_partkey + {{c}} * {{partkey}} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice "
        f"FROM '{SRC}/part.parquet'",
    )
    gen(
        "orders",
        f"SELECT o_orderkey + {{c}} * {{orderkey}} AS o_orderkey, "
        f"o_custkey + {{c}} * {{custkey}} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{SRC}/orders.parquet'",
    )
    gen(
        "lineitem",
        f"SELECT l_orderkey + {{c}} * {{orderkey}} AS l_orderkey, "
        f"l_partkey + {{c}} * {{partkey}} AS l_partkey, "
        f"l_suppkey + {{c}} * {{suppkey}} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'",
    )
    # copy 0 keeps the original text; copies 1..9 suffix every
    # whitespace-delimited word with ~c, which preserves word/shingle
    # counts per doc while making every shingle copy-local
    gen(
        "documents",
        f"SELECT doc_id + {{c}} * {{doc_id}} AS doc_id, "
        f"CASE WHEN {{c}} = 0 THEN text "
        f"ELSE regexp_replace(text, '(\\S+)', '\\1~{{c}}', 'g') END "
        f"AS text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet'",
    )
    gen(
        "events",
        f"SELECT event_id + {{c}} * {{event_id}} AS event_id, ts, "
        f"user_id + {{c}} * {{user_id}} AS user_id, event_type, value, "
        f"props FROM '{SRC}/events.parquet'",
    )
    _gen_embeddings(con, out)
    print(f"sf fixture ({COPIES} copies of sf0.1) at {out}")
    return 0


def _gen_embeddings(con: duckdb.DuckDBPyConnection, out: str) -> None:
    """COPIES rotated copies of the embeddings table (see module
    docstring). numpy-side because DuckDB has no matmul over list
    columns; one QR per copy, one (n, d) @ (d, d) per copy."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    vec_ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float32)
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    d = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for c in range(COPIES):
        if c == 0:
            r_c = np.eye(d, dtype=np.float64)
        else:
            rng = np.random.default_rng([42, c])
            q, r = np.linalg.qr(rng.standard_normal((d, d)))
            # canonical QR sign fix: make the rotation unique for the
            # seed regardless of LAPACK's sign conventions
            r_c = q * np.sign(np.diag(r))
        out_ids.append(vec_ids + c * 1_000_000)
        out_vecs.append((vecs.astype(np.float64) @ r_c.T).astype(np.float32))
        out_labels.append(labels + c * 1_000)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.concatenate(out_vecs)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(out_labels), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {tbl.num_rows} rows (rotated copies)")


if __name__ == "__main__":
    sys.exit(main())
