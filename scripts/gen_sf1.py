"""Generate a builder-local sf1 dataset for the scale sweep
(VERDICT r09 task 7).  The driver ships sf0.001/0.01/0.1 only and
its generator is not in the tree, so sf1 is DERIVED deterministically
from the driver's own sf0.1:

- relational tables (customer/supplier/part/orders/lineitem/events):
  10 replicas with disjoint key offsets (dense 0-based key spaces
  observed in the driver data), dims region/nation copied as-is —
  preserves every marginal distribution and referential edge;
- documents: 10 replicas; replica 0 is the original text, replicas
  1-9 deterministically SHUFFLE each doc's tokens (seeded per
  (replica, doc_id)) — unigram stats, lang/source marginals and
  lengths preserved, cross-replica 3-gram near-duplication avoided
  (a plain text copy would make every doc a 10-way near-dup and
  quadratically inflate every LSH/verify pair join with an artifact
  of the replication, not a property of scale);
- embeddings: 20,000 fresh unit-norm gaussian vectors (the measured
  sf0.1 structure: value std 1/sqrt(64), labels uniform 0-9 and NOT
  cluster-correlated), fixed seed.

Output: /root/repo/.scratch/sf1/*.parquet (gitignored).  This is
builder-generated SCALE data — correctness stays pinned at the
driver's own sf0.01/sf0.1; sf1 exists to measure how every
registered plan's runtime scales one decade up.

Usage: python scripts/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
R = 10  # replicas

# dense 0-based key-space sizes observed in the driver's sf0.1
SIZES = {"custkey": 15_000, "suppkey": 1_000, "partkey": 20_000,
         "orderkey": 150_000, "event_id": 100_000, "user_id": 1_500,
         "doc_id": 5_000}


def _rel(con: duckdb.DuckDBPyConnection) -> None:
    con.execute(f"CREATE VIEW gs AS SELECT unnest(range({R})) AS i")
    copies = {
        "region": "SELECT * FROM src",
        "nation": "SELECT * FROM src",
        "customer": f"""
            SELECT c_custkey + i * {SIZES['custkey']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM src CROSS JOIN gs""",
        "supplier": f"""
            SELECT s_suppkey + i * {SIZES['suppkey']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM src CROSS JOIN gs""",
        "part": f"""
            SELECT p_partkey + i * {SIZES['partkey']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM src CROSS JOIN gs""",
        "orders": f"""
            SELECT o_orderkey + i * {SIZES['orderkey']} AS o_orderkey,
                   o_custkey + i * {SIZES['custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM src CROSS JOIN gs""",
        "lineitem": f"""
            SELECT l_orderkey + i * {SIZES['orderkey']} AS l_orderkey,
                   l_partkey + i * {SIZES['partkey']} AS l_partkey,
                   l_suppkey + i * {SIZES['suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM src CROSS JOIN gs""",
        "events": f"""
            SELECT event_id + i * {SIZES['event_id']} AS event_id,
                   ts, user_id + i * {SIZES['user_id']} AS user_id,
                   event_type, value, props
            FROM src CROSS JOIN gs""",
    }
    for name, sql in copies.items():
        con.execute("DROP VIEW IF EXISTS src")
        con.execute(
            f"CREATE VIEW src AS SELECT * FROM '{SRC}/{name}.parquet'")
        con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'") \
            .fetchone()[0]
        print(f"{name}: {n} rows")


def _documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [],
           "n_chars": []}
    for i in range(R):
        for d, tx, lg, sc in zip(doc_id, text, lang, source):
            if i == 0:
                new = tx
            else:
                toks = tx.strip().split()
                random.Random((i << 32) | d).shuffle(toks)
                new = " ".join(toks)
            out["doc_id"].append(d + i * SIZES["doc_id"])
            out["text"].append(new)
            out["lang"].append(lg)
            out["source"].append(sc)
            out["n_chars"].append(len(new))
    pq.write_table(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }), f"{OUT}/documents.parquet")
    print(f"documents: {len(out['doc_id'])} rows")


def _embeddings() -> None:
    n, dim = 2_000 * R, 64
    rng = np.random.RandomState(4242)
    e = rng.normal(0.0, 1.0, (n, dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in e.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array((rng.permutation(n) % 10).astype("int32"),
                          pa.int32()),
    }), f"{OUT}/embeddings.parquet")
    print(f"embeddings: {n} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    _rel(con)
    _documents()
    _embeddings()
    print(f"sf1 written to {OUT}")


if __name__ == "__main__":
    main()
