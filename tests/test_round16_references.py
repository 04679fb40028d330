"""Independent-reimplementation references for the round-16 batch
(c141, b175, b176) — pure-Python/pandas recomputations independent of
both the Spark implementation and the mirrored DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import pandas as pd

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


# --------------------------------------------------------------- c141

def _doc_shingles() -> dict[int, set]:
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    out = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.strip().lower().split(" ") if t != ""]
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if sh:
            out[int(doc_id)] = sh
    return out


def test_c141_ptab_is_close_to_exact_rational_s_curve():
    """The iterated-multiply integer table vs the EXACT rational
    p(s) = 1-(1-s^r)^b: each truncating step moves < 1 ppm (downward
    in the power chains, upward through the 1e6-minus complements),
    so the table sits within +/-(r + b) ppm of the rational value —
    independent arithmetic, same spec."""
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round16 \
        import _LSH_PTAB
    for b, r, k, mid, p in _LSH_PTAB:
        s = Fraction(mid, 1_000_000)
        exact = (1 - (1 - s ** r) ** b) * 1_000_000
        assert abs(p - exact) <= r + b, (b, r, k)
    # shape: more bands (shorter rows) -> more permissive at fixed s
    by = {(b, r, k): p for b, r, k, _, p in _LSH_PTAB}
    for k in range(21):
        perm = [by[(b, r, k)] for b, r in
                [(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)]]
        assert perm == sorted(perm), f"bucket {k} not monotone in bands"


def test_c141_matches_python_brute_force_histogram(spark):
    """Expected costs recomputed from an ALL-PAIRS python histogram
    (no inverted index) x the registered literal table."""
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round16 \
        import _LSH_PTAB, _LSH_TAU

    sh = _doc_shingles()
    ids = sorted(sh)
    hist: dict[int, int] = {}
    for i, a in enumerate(ids):
        for b_ in ids[i + 1:]:
            inter = len(sh[a] & sh[b_])
            if inter == 0:
                continue  # engine histogram holds colliding pairs only
            s_ppm = inter * 1_000_000 // len(sh[a] | sh[b_])
            hist[s_ppm // 50_000] = hist.get(s_ppm // 50_000, 0) + 1

    want = {}
    for bands, rows in [(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)]:
        ptab = {k: (mid, p) for b, r, k, mid, p in _LSH_PTAB
                if (b, r) == (bands, rows)}
        cand = sum(c * ptab[k][1] for k, c in hist.items())
        fp = sum(c * ptab[k][1] for k, c in hist.items()
                 if ptab[k][0] < _LSH_TAU)
        fn = sum(c * (1_000_000 - ptab[k][1]) for k, c in hist.items()
                 if ptab[k][0] >= _LSH_TAU)
        want[bands] = (rows, sum(hist.values()), cand // 1_000_000,
                       fp // 1_000_000, fn // 1_000_000)

    rows_ = (REGISTRY["c141_lsh_param_expected_cost"]
             .fn(spark, SF_SMALL).collect())
    got = {r.bands: (r.rows_per_band, r.n_pairs, r.exp_candidates,
                     r.exp_false_pos, r.exp_false_neg) for r in rows_}
    assert got == want
    # the optimizer's reason to exist: recall and precision trade off
    # monotonically across the grid
    fns = [got[b][4] for b in [1, 2, 4, 8, 16]]
    fps = [got[b][3] for b in [1, 2, 4, 8, 16]]
    assert fns == sorted(fns, reverse=True)
    assert fps == sorted(fps)


# --------------------------------------------------------------- b175

def test_b175_matches_python_bloom_per_file(spark):
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round16 \
        import _FB_FILE_DIV, _FB_K, _FB_M, _FB_PROBES

    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    files: dict[int, set] = {}
    for ok, pk in zip(li.l_orderkey, li.l_partkey):
        files.setdefault(int(ok) // _FB_FILE_DIV, set()).add(int(pk))

    def pos(j: int, key: int) -> int:
        h = hashlib.md5(f"{j}#{key}".encode()).hexdigest()[:12]
        return int(h, 16) % _FB_M

    bits = {fid: {pos(j, k) for k in ks for j in range(_FB_K)}
            for fid, ks in files.items()}
    maxp = int(li.l_partkey.max())
    want = []
    for i in range(1, _FB_PROBES + 1):
        key = maxp * i // (_FB_PROBES + 1)
        ppos = {pos(j, key) for j in range(_FB_K)}
        true = sum(1 for ks in files.values() if key in ks)
        zone = sum(1 for ks in files.values()
                   if min(ks) <= key <= max(ks))
        bloom = sum(1 for fid in files if ppos <= bits[fid])
        want.append((i, key, true, zone, bloom))

    rows = (REGISTRY["b175_file_bloom_index_audit"]
            .fn(spark, SF_SMALL).collect())
    got = [(r.probe_id, r.key, r.n_files_true, r.n_files_zone_pass,
            r.n_files_bloom_pass) for r in rows]
    assert got == want
    # the audit's reason to exist: one-sided (bloom never misses a
    # true file) and it prunes where zone maps cannot
    for _, _, true, zone, bloom in got:
        assert bloom >= true
        assert zone >= true
    assert sum(b for *_, b in got) < sum(z for *_, z, _ in got)


# --------------------------------------------------------------- b176

def test_b176_matches_python_interval_grouping(spark):
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round16 \
        import _FB_FILE_DIV

    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    d = (li.l_shipdate - pd.Timestamp("1992-01-01")).dt.days
    zm = (pd.DataFrame({"fid": li.l_orderkey // _FB_FILE_DIV, "d": d})
          .groupby("fid")["d"].agg(["min", "max", "count"])
          .reset_index().sort_values(["min", "fid"]))
    groups = []
    run_max = None
    for _, r in zm.iterrows():
        if run_max is None or r["min"] > run_max:
            groups.append([])
        groups[-1].append(r)
        run_max = r["max"] if run_max is None else max(run_max, r["max"])
    want = [(i + 1, len(g), int(min(x["min"] for x in g)),
             int(max(x["max"] for x in g)),
             int(sum(x["count"] for x in g)),
             "keep" if len(g) == 1 else "merge")
            for i, g in enumerate(groups)]

    rows = (REGISTRY["b176_sorted_run_merge_planner"]
            .fn(spark, SF_SMALL).collect())
    got = [(r.merge_task, r.n_files, r.mn_d, r.mx_d, r.rows_total,
            r.action) for r in rows]
    assert got == want
    # structural invariants: groups partition the files and their
    # [mn, mx] ranges are pairwise disjoint in task order
    assert sum(n for _, n, *_ in got) == len(zm)
    for (_, _, _, mx1, _, _), (_, _, mn2, _, _, _) in zip(got, got[1:]):
        assert mx1 < mn2
