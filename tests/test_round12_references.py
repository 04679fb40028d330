"""Independent-reimplementation references for the round-12 batch
(b161-b164, c133-c135) — pure-Python/pandas/numpy recomputations that
are failure-independent of both the Spark implementation and its
mirrored DuckDB oracle (the tests/test_sketch_references.py pattern).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import md5_48
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["value_cents"] = np.floor(ev["value"] * 100).astype("int64")
    return ev


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def test_b161_matches_pandas_full_recompute(spark):
    """The streaming retraction log, summed, must equal a from-scratch
    pandas latest-per-user aggregation over ALL events — across both
    landing phases and the checkpoint restart."""
    ev = _events()
    latest = (ev.sort_values(["ts_us", "event_id"])
              .groupby("user_id").last())
    ref = (latest.groupby("event_type")["value_cents"]
           .agg(["count", "sum"]))
    rows = (REGISTRY["b161_streaming_retraction_restart"]
            .fn(spark, SF_SMALL).collect())
    got = {r.event_type: (r.n_users, r.total_cents) for r in rows}
    assert got == {k: (int(c), int(s)) for k, (c, s) in
                   zip(ref.index, ref.to_numpy())}


def test_b162_matches_pandas_zonemap(spark):
    """Zone-map classification recomputed row-by-row in pandas."""
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    li["bkt"] = li["l_orderkey"] // 1024
    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1997-12-31")
    g = li.groupby("bkt")["l_shipdate"].agg(["min", "max", "count"])
    g["hits"] = li.assign(
        hit=li["l_shipdate"].between(lo, hi)).groupby("bkt")["hit"].sum()
    skip = (g["max"] < lo) | (g["min"] > hi)
    full = (~skip) & (g["min"] >= lo) & (g["max"] <= hi)
    partial = ~(skip | full)
    row = (REGISTRY["b162_zonemap_skipping_audit"]
           .fn(spark, SF_SMALL).collect())[0]
    assert row.n_buckets == len(g)
    assert row.n_skip == int(skip.sum())
    assert row.n_full == int(full.sum())
    assert row.n_partial == int(partial.sum())
    assert row.rows_total == int(g["count"].sum())
    assert row.rows_scanned == int(g.loc[~skip, "count"].sum())
    assert row.rows_matched == int(g["hits"].sum())
    # the invariant the audit exists for: skipped buckets hold no hits
    assert int(g.loc[skip, "hits"].sum()) == 0
    assert row.skip_ppm == int(g.loc[skip, "count"].sum()) \
        * 1_000_000 // int(g["count"].sum())


def test_b163_matches_pandas_estimator(spark):
    """System-R containment estimate and exact join size in pandas."""
    ev = _events()
    r = ev[ev["event_type"] == "click"]
    s = ev[ev["event_type"] == "purchase"]

    def stats(df):
        g = df.assign(bkt=df["user_id"] % 16).groupby("bkt")["user_id"]
        return pd.DataFrame({"n": g.size(), "d": g.nunique()})

    st = stats(r).join(stats(s), lsuffix="_r", rsuffix="_s",
                       how="inner")
    est = int((st["n_r"] * st["n_s"]
               // st[["d_r", "d_s"]].max(axis=1)).sum())
    cr = r.groupby("user_id").size()
    cs = s.groupby("user_id").size()
    exact = int((cr * cs).dropna().sum())
    row = (REGISTRY["b163_join_cardinality_estimate"]
           .fn(spark, SF_SMALL).collect())[0]
    assert row.n_buckets == len(st)
    assert row.est_card == est
    assert row.exact_card == exact
    assert row.err_ppm == abs(est - exact) * 1_000_000 // exact


def test_b164_matches_numpy_boundaries(spark):
    """Sample, boundaries, and realized range loads in numpy."""
    d = _docs()
    h = d["doc_id"].map(lambda x: md5_48(str(x)))
    sample = (d.assign(h=h).sort_values(["h", "doc_id"])
              .head(200)["n_chars"].sort_values().to_numpy())
    bounds = [sample[(i * 200) // 8 - 1] for i in range(1, 8)]
    rid = np.zeros(len(d), dtype=int)
    for b in bounds:
        rid += (d["n_chars"].to_numpy() > b).astype(int)
    counts = np.bincount(rid, minlength=8)
    rows = (REGISTRY["b164_range_partition_boundaries"]
            .fn(spark, SF_SMALL).collect())
    assert [r.range_id for r in rows] == list(range(8))
    assert [r.n_rows for r in rows] == counts.tolist()
    for r in rows:
        assert r.load_ppm == int(counts[r.range_id]) \
            * 8 * 1_000_000 // len(d)


def test_c133_matches_python_rbo(spark):
    """Truncated RBO recomputed from two explicit python sorts."""
    d = _docs()
    a = (d.sort_values(["n_chars", "doc_id"],
                       ascending=[False, True])
         .head(50)["doc_id"].tolist())
    nospace = d["text"].str.replace(" ", "", regex=False).str.len()
    b = (d.assign(ns=nospace)
         .sort_values(["ns", "doc_id"], ascending=[False, True])
         .head(50)["doc_id"].tolist())
    ra = {doc: i + 1 for i, doc in enumerate(a)}
    rb = {doc: i + 1 for i, doc in enumerate(b)}
    ms = sorted(max(ra[x], rb[x]) for x in set(a) & set(b))
    rbo = 0.0
    for depth in range(1, 51):
        ov = sum(1 for m in ms if m <= depth)
        rbo += 0.1 * 0.9 ** (depth - 1) * ov / depth
    row = (REGISTRY["c133_rank_biased_overlap"]
           .fn(spark, SF_SMALL).collect())[0]
    assert row.k == 50
    assert row.overlap_at_k == len(ms)
    assert row.rbo_ppm == round(rbo * 1_000_000)


def test_c134_matches_python_ndcg(spark):
    """NDCG@20 per source recomputed with explicit python sorts."""
    d = _docs()
    d = d.assign(rel=d["doc_id"].map(lambda x: md5_48(str(x)) % 4))
    rows = (REGISTRY["c134_ndcg_eval"].fn(spark, SF_SMALL).collect())
    got = {r.source: r for r in rows}
    for src, g in d.groupby("source"):
        ranked = g.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True])["rel"].tolist()
        ideal = g.sort_values(["rel", "doc_id"],
                              ascending=[False, True])["rel"].tolist()

        def dcg(rels):
            return sum((2 ** rel - 1) / math.log2(i + 2)
                       for i, rel in enumerate(rels[:20]))

        r = got[src]
        assert r.n_docs == len(g)
        assert r.dcg_ppm == round(dcg(ranked) * 1_000_000)
        assert r.idcg_ppm == round(dcg(ideal) * 1_000_000)
        assert r.ndcg_ppm == round(dcg(ranked) / dcg(ideal) * 1_000_000)


def test_c135_matches_python_suffix_lcp(spark):
    """Suffix sort + adjacent token-LCP recomputed in pure python,
    including the global-max-equals-adjacent-max property."""
    d = _docs()
    rows = (REGISTRY["c135_token_suffix_lcp_dup"]
            .fn(spark, SF_SMALL).collect())
    got = {r.source: r for r in rows}
    for src, g in d.groupby("source"):
        sufs = []
        for _, doc in g.iterrows():
            toks = doc["text"].split(" ")
            for p in range(len(toks)):
                s = tuple(toks[p:p + 8])
                sufs.append((" ".join(s), doc["doc_id"], p + 1, s))
        sufs.sort()
        lcps = []
        for (_, _, _, s1), (_, _, _, s2) in zip(sufs, sufs[1:]):
            k = 0
            while k < min(len(s1), len(s2)) and s1[k] == s2[k]:
                k += 1
            lcps.append(k)
        n_rep = sum(1 for x in lcps if x >= 4)
        r = got[src]
        assert r.n_suffixes == len(sufs)
        assert r.max_lcp == max(lcps)
        assert r.n_rep4 == n_rep
        assert r.rep_ppm == n_rep * 1_000_000 // len(sufs)
        # adjacency theorem sanity: brute-force max over ALL pairs in
        # a small sample equals the adjacent max (sampled to stay fast)
        if len(sufs) > 1:
            import itertools
            sample = sufs[:: max(1, len(sufs) // 60)]
            for (_, _, _, s1), (_, _, _, s2) in \
                    itertools.combinations(sample, 2):
                k = 0
                while k < min(len(s1), len(s2)) and s1[k] == s2[k]:
                    k += 1
                assert k <= max(lcps)
