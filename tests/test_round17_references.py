"""Round-17 reference tests: b177 merge-plan execution proof.

The oracle already pins footer-manifest == promised-manifest at three
SFs; these tests pin the write path itself against an independent
pandas recomputation and the two post-conditions the rewrite promises
(all-'keep', depth 1) — the VERDICT r09 task-3 contract."""

from __future__ import annotations

import pandas as pd
import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def b177(spark):
    return (REGISTRY["b177_merge_plan_execution_proof"]
            .fn(spark, SF).toPandas())


def _reference_manifest() -> pd.DataFrame:
    """Sequential pandas recomputation of the promised merged layout:
    ingestion manifest -> interval-grouping sweep -> per-task
    day-bucket files."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    d = (pd.to_datetime(li.l_shipdate).dt.normalize()
         - pd.Timestamp("1992-01-01")).dt.days
    df = pd.DataFrame({"fid": li.l_orderkey // 128, "d": d})
    zm = (df.groupby("fid")["d"].agg(["min", "max"])
          .reset_index().sort_values(["min", "fid"]))
    task, running_max, tasks = 0, -1, {}
    for _, r in zm.iterrows():
        if r["min"] > running_max:
            task += 1
        running_max = max(running_max, r["max"])
        tasks[r["fid"]] = task
    df["task"] = df.fid.map(tasks)
    df["nfid"] = df.d // 56
    out = (df.groupby(["task", "nfid"])["d"]
           .agg(mn_d="min", mx_d="max", n_rows="count").reset_index())
    return out.sort_values(["task", "nfid"]).reset_index(drop=True)


def test_b177_footer_manifest_matches_pandas_reference(b177):
    ref = _reference_manifest()
    got = (b177[["merge_task", "new_fid", "mn_d", "mx_d", "n_rows"]]
           .sort_values(["merge_task", "new_fid"])
           .reset_index(drop=True))
    assert got.merge_task.tolist() == ref.task.tolist()
    assert got.new_fid.tolist() == ref.nfid.tolist()
    assert got.mn_d.tolist() == ref.mn_d.tolist()
    assert got.mx_d.tolist() == ref.mx_d.tolist()
    assert got.n_rows.tolist() == ref.n_rows.tolist()
    # no row lost or duplicated by the rewrite
    li_rows = len(pd.read_parquet(f"{SF}/lineitem.parquet",
                                  columns=["l_orderkey"]))
    assert int(got.n_rows.sum()) == li_rows


def _h48(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_c142_matches_pandas_reference(spark):
    """Exact sequential recomputation of the TV audit: same truncating
    integer-ppm arithmetic, pure python/pandas."""
    got = (REGISTRY["c142_label_signal_ceiling"].fn(spark, SF)
           .toPandas().set_index(["kind", "cls"]).sort_index())
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    docs["pseudo"] = ["h" + str(_h48(str(i)) % 5) for i in docs.doc_id]
    docs["toks"] = (docs.text.str.strip().str.lower()
                    .str.split(r" +", regex=True))
    from collections import Counter
    pool: Counter = Counter()
    per: dict[tuple, Counter] = {}
    ndocs: Counter = Counter()
    for _, r in docs.iterrows():
        for kind, cls in (("label", r.lang), ("hash_null", r.pseudo)):
            per.setdefault((kind, cls), Counter()).update(r.toks)
            ndocs[(kind, cls)] += 1
        pool.update(r.toks)
    n = sum(pool.values())
    for key, cnt in per.items():
        n_cls = sum(cnt.values())
        tv2 = sum(abs(cnt.get(w, 0) * 1_000_000 // n_cls
                      - cw * 1_000_000 // n)
                  for w, cw in pool.items())
        row = got.loc[key]
        assert int(row.n_docs) == ndocs[key]
        assert int(row.n_tokens) == n_cls
        assert int(row.tv_ppm) == tv2 // 2, key


def test_c142_label_tv_sits_in_null_band(spark):
    """The finding itself (VERDICT r09 task 4): the lang label's TV
    distances overlap the hash-null partition's band — text carries
    no label signal, so c139's kappa ~ 0 is the Bayes ceiling.  Band
    comparison is loose (same order of magnitude, overlapping
    ranges), not exact — both are sampling noise."""
    got = (REGISTRY["c142_label_signal_ceiling"].fn(spark, SF)
           .toPandas())
    lab = got[got.kind == "label"].tv_ppm
    nul = got[got.kind == "hash_null"].tv_ppm
    assert lab.min() < nul.max() * 3
    assert nul.min() < lab.max() * 3


def test_c143_containment_vs_pandas(spark):
    """Independent containment/Jaccard recomputation over raw text."""
    got = (REGISTRY["c143_shingle_containment"].fn(spark, SF)
           .toPandas())
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    sh = {}
    for _, r in docs.iterrows():
        toks = r.text.strip().lower().split()
        sh[r.doc_id] = {" ".join(toks[i:i + 3])
                        for i in range(len(toks) - 2)}
    for _, r in got.iterrows():
        a, b = sh[r.d1], sh[r.d2]
        inter = len(a & b)
        assert inter == r.n_common
        assert r.containment_ppm == inter * 1_000_000 // min(len(a),
                                                             len(b))
        assert r.containment_ppm >= 800_000
        jac = inter * 1_000_000 // (len(a) + len(b) - inter)
        assert r.jaccard_ppm == jac
        assert r.dup_class == ("wrap" if jac < 500_000 else "near_dup")
    # every high-containment pair is present (not just the emitted set)
    ids = list(sh)
    n_expected = sum(
        1 for i, d1 in enumerate(ids) for d2 in ids[i + 1:]
        if (lambda x, y: len(x & y) * 1_000_000
            // min(len(x), len(y)) >= 800_000 if x and y else False)
        (sh[min(d1, d2)], sh[max(d1, d2)]))
    assert len(got) == n_expected


def test_c144_sq8_error_and_recall_properties(spark):
    """SQ8 dequantization error is bounded by the quantization step:
    per-dim |deq - q| <= step = (mx-mn)/255 + 1, so the dot error is
    bounded by sum_i |qq_i| * step_i.  Also top-k overlap must be
    high for a 4x compression on unit-norm data."""
    import numpy as np
    docs = pd.read_parquet(f"{SF}/embeddings.parquet")
    E = np.array([np.asarray(v, dtype=np.float64)
                  for v in docs.embedding])
    q = (np.sign(E * 1000) * np.floor(np.abs(E * 1000) + 0.5)
         ).astype(np.int64)
    mn, mx = q.min(axis=0), q.max(axis=0)
    qq = q[docs.vec_id.tolist().index(0)]
    step = (mx - mn) // 255 + 1
    bound = int(np.abs(qq) @ step)
    got = (REGISTRY["c144_sq8_quantization_audit"].fn(spark, SF)
           .toPandas())
    assert len(got) == 20
    assert (got.abs_err <= bound).all()
    assert got.in_exact_topk.sum() >= 10  # recall@20 >= 0.5
    # exact dots must match numpy exactly
    dots = {int(v): int(d) for v, d in zip(docs.vec_id, q @ qq)}
    for _, r in got.iterrows():
        assert dots[r.vec_id] == r.exact_dot


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark `div` / DuckDB `//`)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def test_b178_interpolation_properties(spark):
    import numpy as np

    got = (REGISTRY["b178_gap_fill_interpolation"].fn(spark, SF)
           .toPandas())
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderpriority", "o_orderdate",
                                      "o_totalprice"])
    d = (pd.to_datetime(orders.o_orderdate).dt.normalize()
         - pd.Timestamp("1992-01-01")).dt.days
    cents = np.floor(orders.o_totalprice.values * 100).astype("int64")
    obs = (pd.DataFrame({"prio": orders.o_orderpriority, "d": d,
                         "c": cents})
           .groupby(["prio", "d"])["c"].sum())
    # full spine: every (prio, day) present exactly once
    mn, mx = d.min(), d.max()
    prios = orders.o_orderpriority.unique()
    assert len(got) == len(prios) * (mx - mn + 1)
    for (prio, day), c in obs.items():
        row = got[(got.prio == prio) & (got.d == day)].iloc[0]
        assert row.src == "obs" and row.cents_filled == c
    # interpolated points match the exact truncating-div reference
    interp = got[got.src == "interp"]
    assert len(interp) > 0  # sf0.001 is sparse enough to have gaps
    for prio in prios:
        series = obs.loc[prio]
        days = sorted(series.index)
        for _, r in interp[interp.prio == prio].iterrows():
            prev_d = max(x for x in days if x < r.d)
            next_d = min(x for x in days if x > r.d)
            pv, nv = int(series[prev_d]), int(series[next_d])
            expect = pv + _tdiv((nv - pv) * (int(r.d) - prev_d),
                                next_d - prev_d)
            assert r.cents_filled == expect


def test_b179_code_range_equals_string_range(spark):
    got = (REGISTRY["b179_dictionary_encoding_audit"].fn(spark, SF)
           .toPandas())
    # the proof the query hash-checks, asserted directly
    assert (got.in_range_str == got.in_range_code).all()
    # codes are dense ranks of the sorted values
    assert got.sort_values("code").value.is_monotonic_increasing
    assert got.code.tolist() == list(range(1, len(got) + 1))
    # fact counts reconcile with the raw join
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey"])
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    n = (li.merge(part, left_on="l_partkey", right_on="p_partkey")
         .p_brand.value_counts())
    for _, r in got.iterrows():
        assert r.n_fact_rows == int(n.get(r.value, 0))


def test_c145_char5_minhash_matches_hashlib_reference(spark):
    """Full-pipeline recomputation of the char-5-gram MinHash LSH
    with hashlib + pure-Python sets (the test_lsh_banding_references
    failure-independence pattern, applied to the char-shingle unit):
    candidate banding AND verified pairs must match exactly."""
    import hashlib
    import re

    from tp_airflow_gtfs_snowflake_spark.operators import dedup as D

    got = (REGISTRY["c145_char5_minhash_neardup"].fn(spark, SF)
           .toPandas())
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    P = D.MINHASH_P
    coeffs = D.minhash_coefficients(16)

    def grams(text: str) -> set[str]:
        s = re.sub(" +", " ", text.lower().strip())
        return {s[i:i + 5] for i in range(len(s) - 4)}

    def h60(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    sh = {r.doc_id: grams(r.text) for _, r in docs.iterrows()}
    sig = {}
    for d, g in sh.items():
        hs = [h60(s) % P for s in g]
        sig[d] = [min((h * a + b) % P for h in hs) for a, b in coeffs]
    buckets: dict = {}
    for d, s in sig.items():
        for b in range(4):
            key = (b, hashlib.md5(
                ",".join(str(m) for m in s[b * 4:b * 4 + 4])
                .encode()).hexdigest())
            buckets.setdefault(key, []).append(d)
    cand = {(min(a, b), max(a, b))
            for ds in buckets.values() if len(ds) > 1
            for i, a in enumerate(ds) for b in ds[i + 1:]}
    expect = {}
    for d1, d2 in cand:
        inter = len(sh[d1] & sh[d2])
        j = inter / (len(sh[d1]) + len(sh[d2]) - inter)
        if j >= 0.8:
            expect[(d1, d2)] = j
    assert {(r.d1, r.d2) for _, r in got.iterrows()} == set(expect)
    for _, r in got.iterrows():
        assert abs(r.jaccard - expect[(r.d1, r.d2)]) < 1e-12


def test_b180_ivm_exact_and_matches_pandas(spark):
    import numpy as np

    got = (REGISTRY["b180_join_view_delta_maintenance"].fn(spark, SF)
           .toPandas())
    assert (got.ivm_exact == 1).all()
    assert (got.n_full == got.n_ivm).all()
    assert (got.cents_full == got.cents_ivm).all()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])
    li["cents"] = np.floor(li.l_extendedprice.values * 100
                           ).astype("int64")
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    ref = j.groupby("o_orderpriority").agg(
        n=("cents", "size"), cents=("cents", "sum"))
    for _, r in got.iterrows():
        assert r.n_full == int(ref.loc[r.prio, "n"])
        assert r.cents_full == int(ref.loc[r.prio, "cents"])


def test_b177_postconditions_all_keep_depth_one(b177):
    """The two properties a clustering rewrite promises: the re-run
    planner finds only singleton groups, and no day is covered by
    more than one file per merge task's output."""
    assert set(b177.action) == {"keep"}
    assert set(b177.max_depth_after) == {1}
    # day-bucket files are genuinely disjoint in [mn_d, mx_d]
    m = b177.sort_values("mn_d")
    prev_end = -1
    for _, r in m.iterrows():
        assert r.mn_d > prev_end
        prev_end = r.mx_d
