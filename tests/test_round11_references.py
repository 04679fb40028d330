"""Independent-reimplementation references for the round-11 batch
(b156/b157/b158/c132) — numpy/pandas/hashlib recomputations that are
failure-independent of both the Spark implementation and its mirrored
DuckDB oracle (the tests/test_sketch_references.py pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import md5_48
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


_md5_48 = md5_48


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["value_cents"] = np.floor(ev["value"] * 100).astype("int64")
    return ev


def test_b156_matches_numpy_brute_force(spark):
    """Brute-force MIPS: quantize + weight every vector in numpy,
    compute ALL 5x500 exact dots (no pruning), and demand the
    engine's pruned top-10 equals the unpruned truth — which also
    proves the Cauchy-Schwarz bound never excluded a true top-10
    vector.  n_scanned is recomputed from the seed construction."""
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    v = np.stack([np.asarray(e, dtype=np.float64)
                  for e in emb["embedding"]])
    scaled = v * 50.0
    grid = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
        np.int64)  # HALF-AWAY = Spark F.round / DuckDB round
    w = (1 + ids % 15) ** 2
    vec = grid * w[:, None]
    nsq = (vec * vec).sum(axis=1)

    got = (REGISTRY["b156_mips_norm_pruned_topk"].fn(spark, SF_SMALL)
           .collect())
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(int(r.q_id), []).append(r)

    order = np.lexsort((ids, -nsq))  # nsq DESC, vec_id ASC
    seed_idx = order[:50]
    for q_id in range(5):
        qi = np.where(ids == q_id)[0][0]
        dots = vec @ vec[qi]
        # unpruned truth: top-10 by (ip DESC, vec_id ASC)
        full = sorted(zip(dots, ids), key=lambda t: (-t[0], t[1]))[:10]
        rows = sorted(by_q[q_id], key=lambda r: r.rank)
        assert [(r.ip, r.vec_id) for r in rows] == \
            [(int(d), int(i)) for d, i in full], q_id
        # n_scanned from the seed bound
        seed_dots = sorted(zip(dots[seed_idx], ids[seed_idx]),
                           key=lambda t: (-t[0], t[1]))
        l = int(seed_dots[9][0])
        scanned = int((nsq * nsq[qi] >= l * l).sum()) if l >= 0 \
            else len(ids)
        assert rows[0].n_scanned == scanned, q_id


def test_b157_matches_python_partition_model(spark):
    """Pure-Python recompute of the skew model: md5-48 partition
    assignment, ceil salt factors, shard splits, max loads."""
    ev = _events()
    counts = ev.groupby("event_type").size().to_dict()
    total = sum(counts.values())
    h = 32
    loads: dict[int, int] = {}
    salted_loads: dict[int, int] = {}
    salts = {}
    for k, n in counts.items():
        p = _md5_48(f"k:{k}") % h
        loads[p] = loads.get(p, 0) + n
        s = max(1, (n * h + total - 1) // total)
        salts[k] = s
        for j in range(s):
            shard = n // s + (1 if j < n % s else 0)
            sp = _md5_48(f"k:{k}#{j}") % h
            salted_loads[sp] = salted_loads.get(sp, 0) + shard
    mu = max(loads.values()) * 1_000_000 // total
    ms = max(salted_loads.values()) * 1_000_000 // total
    rows = (REGISTRY["b157_skew_salt_audit"].fn(spark, SF_SMALL)
            .collect())
    assert len(rows) == len(counts)
    for r in rows:
        assert r.n_rows == counts[r.event_type]
        assert r.salt_factor == salts[r.event_type]
        assert r.max_load_unsalted_ppm == mu
        assert r.max_load_salted_ppm == ms
    assert ms < mu  # salting must actually flatten this skew profile


def test_b158_matches_pandas_full_recompute(spark):
    """The incremental retract/add algebra must equal a from-scratch
    pandas latest-per-user aggregation over ALL events."""
    ev = _events()
    latest = (ev.sort_values(["ts_us", "event_id"])
              .groupby("user_id").last())
    ref = (latest.groupby("event_type")["value_cents"]
           .agg(["count", "sum"]))
    rows = (REGISTRY["b158_incremental_agg_retraction"]
            .fn(spark, SF_SMALL).collect())
    got = {r.event_type: (r.n_users, r.total_cents) for r in rows}
    assert got == {k: (int(c), int(s)) for k, (c, s) in
                   zip(ref.index, ref.to_numpy())}


def test_c132_matches_pandas_ap(spark):
    """AP recomputed with a plain pandas sort + cumulative sum,
    including the truncating integer-ppm semantics."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet",
                           columns=["doc_id", "n_chars", "lang"])
    d = docs.sort_values(["n_chars", "doc_id"],
                         ascending=[False, True]).reset_index(drop=True)
    pos = (d["lang"] == "en").astype(int).to_numpy()
    ranks = np.arange(1, len(d) + 1)
    cum = pos.cumsum()
    n_pos = int(pos.sum())
    ap = int(sum(int(c) * 1_000_000 // int(r)
                 for c, r, p in zip(cum, ranks, pos) if p) // n_pos)
    row = (REGISTRY["c132_average_precision"].fn(spark, SF_SMALL)
           .collect()[0])
    assert (row.n_docs, row.n_pos, row.ap_ppm) == (len(d), n_pos, ap)
