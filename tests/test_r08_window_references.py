"""Independent-reimplementation references for the r08-window cohort
(the 45 oracle-able names still pending a driver slot after r07):
full pure-Python/pandas recomputations at sf0.001 for every name that
only had plan-shape or invariance coverage — written THIS round so the
r08 window enters with the same failure-independent verification depth
r06/r07 had.

Parity rules as in test_r07_window_references: DuckDB integer `//`
truncates toward zero (= Spark `div`; all divisions below have
non-negative operands unless noted), quantile_disc(q) = sorted[
floor((n-1)*q)], DuckDB dayofweek is Sunday=0, cosines are explicit
left-to-right folds rounded HALF_UP to 6 dp before ranking.
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from tests.conftest import round_half_up
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e["ts_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    e["t_s"] = e["ts_us"] // 1_000_000
    e["cents"] = np.floor(e["value"] * 100).astype("int64")
    e["day_num"] = (e["ts"].dt.normalize()
                    - pd.Timestamp("2024-01-01")).dt.days
    return e.sort_values(["ts_us", "event_id"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


@pytest.fixture(scope="module")
def emb() -> dict:
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    return {int(r.vec_id): (np.asarray(r.embedding, dtype=np.float64),
                            int(r.label))
            for r in e.itertuples()}


@pytest.fixture(scope="module")
def shingle_graph(docs):
    """Shared by c114/c119/c122/c123: distinct token 3-gram shingles,
    pairwise jaccard, >= 0.5 edges, union-find components."""
    sh = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in re.split(" +", t.lower().strip()) if w]
        sh[int(did)] = {" ".join(toks[i:i + 3])
                        for i in range(len(toks) - 2)}
    inv = defaultdict(list)
    for did, ss in sh.items():
        for s in ss:
            inv[s].append(did)
    common = Counter()
    for s, dids in inv.items():
        dids.sort()
        for i, a in enumerate(dids):
            for b in dids[i + 1:]:
                common[(a, b)] += 1
    edges = [(a, b) for (a, b), c in common.items()
             if 2 * c >= len(sh[a]) + len(sh[b]) - c]  # J >= 0.5
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in parent}
    return {"shingles": sh, "edges": sorted(edges), "comp": comp}


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMALL).collect()


# ---------------------- events / lineitem tier ----------------------


def test_b104_matches_python_depths(spark):
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet",
                           columns=["p_partkey"])
    depths = [int(k).bit_length() - 1 if k >= 1 else 0
              for k in part["p_partkey"]]
    per = defaultdict(list)
    for k, d in zip(part["p_partkey"], depths):
        per[d].append(int(k))
    got = {r.depth: (r.n_nodes, r.min_node, r.max_node)
           for r in _run(spark, "b104_tree_depth_histogram")}
    assert got == {d: (len(v), min(v), max(v)) for d, v in per.items()}


def test_c04c_matches_python_json(spark, ev):
    ref = {}
    for t, g in ev.groupby("event_type"):
        ks = []
        n_parsed = 0
        for p in g["props"]:
            if p is None:
                continue
            n_parsed += 1
            try:
                k = json.loads(p).get("k")
                if k is not None:
                    ks.append(int(k))
            except Exception:
                pass
        ref[t] = (n_parsed, sum(ks) if ks else None,
                  max(ks) if ks else None)
    got = {r.event_type: (r.n_parsed, r.sum_k, r.max_k)
           for r in _run(spark, "c04c_variant_extract")}
    assert got == ref


def test_b108_matches_python_headways(spark, ev):
    got = {r.event_type: r for r in _run(spark, "b108_excess_wait_time")}
    for t, g in ev.groupby("event_type"):
        ts = sorted(g["t_s"])
        hh = [b - a for a, b in zip(ts, ts[1:]) if b - a > 0]
        n = len(hh)
        s, s2 = sum(hh), sum(h * h for h in hh)
        mean = s // n
        ewt = s2 // (2 * s)
        r = got[t]
        assert (r.n_headways, r.mean_headway_s, r.ewt_s,
                r.bunching_ratio_ppm) == \
            (n, mean, ewt, ewt * 2_000_000 // mean)


def test_b110_matches_python_sweep(spark, ev):
    got = {r.user_id: (r.covered_s, r.n_islands)
           for r in _run(spark, "b110_interval_union")}
    ref = {}
    for u, g in ev.groupby("user_id"):
        ivs = sorted((int(t), int(t) + 300) for t in g["t_s"])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        ref[u] = (sum(e - s for s, e in merged), len(merged))
    assert got == ref


def test_b111_matches_python_pattern(spark, ev):
    seqs = {u: "".join(t[0] for t in g["event_type"])
            for u, g in ev.groupby("user_id")}
    counts = Counter(s.count("vcp") for s in seqs.values())
    got = {r.n_matches: r.n_users
           for r in _run(spark, "b111_sequence_pattern_match")}
    assert got == dict(counts)


def test_b114_matches_pandas_leadtime(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    dd = (j["l_shipdate"].dt.normalize()
          - j["o_orderdate"].dt.normalize()).dt.days
    j = j.assign(dd=dd)
    got = {r.o_orderpriority: r for r in
           _run(spark, "b114_lead_time_matrix")}
    for p, g in j.groupby("o_orderpriority"):
        d = g["dd"]
        r = got[p]
        assert (r.d_lt30, r.d_30_60, r.d_60_90, r.d_ge90, r.mean_days) \
            == (int((d < 30).sum()),
                int(((d >= 30) & (d < 60)).sum()),
                int(((d >= 60) & (d < 90)).sum()),
                int((d >= 90).sum()),
                int(d.sum()) // len(d))


def test_b115_matches_python_sessions(spark, ev):
    sessions = []
    for u, g in ev.groupby("user_id"):
        ts = sorted(g["t_s"])
        start, n = ts[0], 1
        for a, b in zip(ts, ts[1:]):
            if b - a > 1800:
                sessions.append((start, n))
                start, n = b, 1
            else:
                n += 1
        sessions.append((start, n))
    per_day = defaultdict(lambda: [0, 0])
    for start, n in sessions:
        d = per_day[start // 86400]
        d[0] += 1
        d[1] += 1 if n == 1 else 0
    got = {r.day_num: (r.n_sessions, r.n_bounces, r.bounce_ppm)
           for r in _run(spark, "b115_bounce_rate")}
    assert got == {d: (s, b, b * 1_000_000 // s)
                   for d, (s, b) in per_day.items()}


def test_b116_matches_python_lift(spark, ev):
    got = {r.event_type: r for r in _run(spark, "b116_weekend_lift")}
    wknd = ev["ts"].dt.dayofweek >= 5  # pandas Sat=5/Sun=6 = duck 6/0
    for t, g in ev.assign(w=wknd).groupby("event_type"):
        nw = int(g["w"].sum())
        nd = len(g) - nw
        lift = None if nd == 0 else nw * 5 * 1_000_000 // (nd * 2)
        r = got[t]
        assert (r.n_weekend, r.n_weekday, r.weekend_lift_ppm) \
            == (nw, nd, lift)


def test_b101_matches_python_radius(spark):
    import hashlib
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet",
                           columns=["c_custkey"])
    pts = {}
    for k in cust["c_custkey"]:
        h = hashlib.md5(str(int(k)).encode()).hexdigest()
        pts[int(k)] = (int(h[:8], 16) % 1_000_000,
                       int(h[8:16], 16) % 1_000_000)
    ids = sorted(pts)
    ref = {}
    for i, a in enumerate(ids):
        ax, ay = pts[a]
        for b in ids[i + 1:]:
            bx, by = pts[b]
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if d2 < 5000 * 5000:
                ref[(a, b)] = d2
    got = {(r.id_a, r.id_b): r.dist_sq
           for r in _run(spark, "b101_spatial_radius_join")}
    assert got == ref


def test_b105_matches_python_lift(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    basket = {(int(o), int(p)) for o, p in
              zip(li["l_orderkey"], li["l_partkey"])}
    per_order = defaultdict(set)
    supp = Counter()
    for o, p in basket:
        per_order[o].add(p)
        supp[p] += 1
    n_orders = len(per_order)
    pairs = Counter()
    for o, ps in per_order.items():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pairs[(a, b)] += 1
    rows = [((a, b), c, c * n_orders * 1_000_000 // (supp[a] * supp[b]))
            for (a, b), c in pairs.items() if c >= 2]
    rows.sort(key=lambda t: (-t[1],) + t[0])
    got = [((r.p1, r.p2), r.cnt, r.lift_ppm)
           for r in _run(spark, "b105_copurchase_pairs")]
    assert got == rows[:20]


def test_b109_matches_python_median(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_extendedprice"])
    cents = sorted(int(math.floor(x * 100))
                   for x in li["l_extendedprice"])
    n = len(cents)
    row = _run(spark, "b109_exact_global_median_two_pass")[0]
    assert (row.n, row.median_cents) == (n, cents[(n - 1) // 2])


def test_b112_matches_python_autocorr(spark, ev):
    got = {r.event_type: r for r in
           _run(spark, "b112_periodicity_detection")}
    for t, g in ev.groupby("event_type"):
        daily = Counter(g["day_num"])
        best = None
        for lag in range(1, 11):
            pairs = [(daily[d], daily[d + lag]) for d in daily
                     if d + lag in daily]
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            den = (float(n) * sxx - float(sx) * sx) \
                * (float(n) * syy - float(sy) * sy)
            corr = round_half_up(
                (float(n) * sxy - float(sx) * sy) / math.sqrt(den), 6)
            if best is None or (corr, -lag) > (best[1], -best[0]):
                best = (lag, corr, n)
        r = got[t]
        assert (r.best_lag, r.best_corr, r.n_pairs) == best


def test_b113_matches_python_retention(spark, ev):
    ud = sorted({(int(u), int(d))
                 for u, d in zip(ev["user_id"], ev["day_num"])})
    days_by_user = defaultdict(set)
    for u, d in ud:
        days_by_user[u].add(d)
    per_day = defaultdict(lambda: [0, 0])
    for u, d in ud:
        per_day[d][0] += 1
        if any(d < f <= d + 7 for f in days_by_user[u]):
            per_day[d][1] += 1
    got = {r.day_num: (r.n_active, r.n_retained)
           for r in _run(spark, "b113_future_activity_labels")}
    assert got == {d: tuple(v) for d, v in per_day.items()}


def test_b132_matches_python_day_union(spark, ev):
    got = {r.day: r.covered_seconds
           for r in _run(spark, "b132_interval_union_utilization")}
    day = ev["ts"].dt.strftime("%Y-%m-%d")
    ref = {}
    for d, g in ev.assign(d=day).groupby("d"):
        ivs = sorted(
            (int(gg["ts_us"].min()), int(gg["ts_us"].max()))
            for _, gg in g.groupby("user_id"))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        ref[d] = sum(e - s for s, e in merged) // 1_000_000
    assert got == ref


def test_b133_matches_python_neyman(spark, ev):
    stats = {}
    for t, g in ev.groupby("event_type"):
        n = len(g)
        sx = int(g["cents"].sum())
        sxx = int((g["cents"].astype(object) ** 2).sum())
        sd = int(math.floor(math.sqrt(float((n * sxx - sx * sx)
                                            // (n * n)))))
        stats[t] = (n, sd)
    denom = sum(n * sd for n, sd in stats.values())
    alloc = {t: (1000 * n * sd // denom, (1000 * n * sd) % denom)
             for t, (n, sd) in stats.items()}
    leftover = 1000 - sum(b for b, _ in alloc.values())
    ranked = sorted(alloc.items(), key=lambda kv: (-kv[1][1], kv[0]))
    sizes = {t: b + (1 if rk < leftover else 0)
             for rk, (t, (b, _)) in enumerate(ranked)}
    got = {r.event_type: (r.n_stratum, r.sd_cents, r.sample_size)
           for r in _run(spark, "b133_neyman_allocation")}
    assert got == {t: (stats[t][0], stats[t][1], sizes[t])
                   for t in stats}


# -------------------------- curation tier ---------------------------


def _cos_fold(a, b) -> float:
    dp = na = nb = 0.0
    for x, y in zip(a, b):
        dp = dp + x * y
        na = na + x * x
        nb = nb + y * y
    return dp / (math.sqrt(na) * math.sqrt(nb))


def test_c114_matches_python_mixture_shift(spark, docs, shingle_graph):
    comp = shingle_graph["comp"]
    losers = {n for n, c in comp.items() if n != c}
    pre = Counter(docs["lang"])
    post = Counter(docs.loc[[int(d) not in losers
                             for d in docs["doc_id"]], "lang"])
    np_, nq = sum(pre.values()), sum(post.values())
    got = {r.lang: r for r in _run(spark, "c114_dedup_mixture_shift")}
    for lang in pre:
        sb = pre[lang] * 1_000_000 // np_
        sa = post[lang] * 1_000_000 // nq
        r = got[lang]
        assert (r.n_before, r.n_after, r.share_before_ppm,
                r.share_after_ppm, r.shift_ppm) == \
            (pre[lang], post[lang], sb, sa, sa - sb)


def test_c115_matches_python_bm25(spark, docs):
    toks = {int(d): [w for w in re.split(" +", t.lower().strip()) if w]
            for d, t in zip(docs["doc_id"], docs["text"])}
    n_docs = len(toks)
    avgdl_m = sum(len(v) for v in toks.values()) * 1000 // n_docs
    terms = ("query", "merge", "vector", "hash")
    tf = {(d, t): c for d, v in toks.items()
          for t, c in Counter(v).items() if t in terms}
    df = Counter(t for (_, t) in tf)
    idf = {t: (2 * (n_docs - df[t]) + 1) * 1_000_000 // (2 * df[t] + 1)
           for t in df}
    scores = defaultdict(lambda: [0, 0])
    for (d, t), f in tf.items():
        dl_m = len(toks[d]) * 1000
        s = idf[t] * (44 * avgdl_m * f) \
            // (20 * avgdl_m * f + 6 * avgdl_m + 18 * dl_m)
        scores[d][0] += s
        scores[d][1] += 1
    top = sorted(((d, s, n) for d, (s, n) in scores.items()),
                 key=lambda t: (-t[1], t[0]))[:20]
    got = [(r.doc_id, r.score_ppm, r.n_terms)
           for r in _run(spark, "c115_bm25_retrieval")]
    assert got == top


def test_c118_matches_python_pass_at_k(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    per_task = defaultdict(lambda: [0, 0])
    for p, f in zip(li["l_partkey"], li["l_returnflag"]):
        per_task[int(p)][0] += 1
        if f == "R":
            per_task[int(p)][1] += 1
    per_brand = defaultdict(lambda: [0, 0, 0])
    for task, (n, c) in per_task.items():
        if n < 5:
            continue
        p1 = c * 1_000_000 // n
        nc = n - c
        if nc < 5:
            p5 = 1_000_000
        else:
            num = nc * (nc - 1) * (nc - 2) * (nc - 3) * (nc - 4)
            den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
            p5 = 1_000_000 - num * 1_000_000 // den
        b = per_brand[brand[task]]
        b[0] += 1
        b[1] += p1
        b[2] += p5
    got = {r.brand: (r.n_tasks, r.mean_pass1_ppm, r.mean_pass5_ppm)
           for r in _run(spark, "c118_pass_at_k")}
    assert got == {b: (n, s1 // n, s5 // n)
                   for b, (n, s1, s5) in per_brand.items()}


def test_c119_matches_python_modularity(spark, shingle_graph):
    edges = shingle_graph["edges"]
    comp = shingle_graph["comp"]
    m = len(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    per = defaultdict(lambda: [set(), 0, 0])  # nodes, deg_sum, in_edges
    for n, c in comp.items():
        per[c][0].add(n)
        per[c][1] += deg[n]
    for a, b in edges:
        per[comp[a]][2] += 1
    got = {r.community: (r.n_nodes, r.in_edges, r.deg_sum, r.q_contrib)
           for r in _run(spark, "c119_modularity_int")}
    assert got == {c: (len(ns), ie, ds, 4 * m * ie - ds * ds)
                   for c, (ns, ds, ie) in per.items()}


def test_c120_matches_python_matryoshka(spark, emb):
    keep = {v: (e, e[:8]) for v, (e, _) in emb.items()
            if sum(x * x for x in e) > 0 and sum(x * x for x in e[:8]) > 0}
    cents = {c: keep[c][0] for c in keep if c < 8}
    assign = {}
    for v, (full, _) in keep.items():
        best = sorted(((round_half_up(_cos_fold(full, cv), 6), c)
                       for c, cv in cents.items()),
                      key=lambda t: (-t[0], t[1]))[0]
        assign[v] = best[1]
    clusters = defaultdict(list)
    for v, c in assign.items():
        clusters[c].append(v)
    ref = {}
    for c, vs in clusters.items():
        vs.sort()
        n_pairs = n_both = n_fo = n_po = gap = 0
        for i, a in enumerate(vs):
            for b in vs[i + 1:]:
                fu = round(round_half_up(
                    _cos_fold(keep[a][0], keep[b][0]), 6) * 1_000_000)
                pu = round(round_half_up(
                    _cos_fold(keep[a][1], keep[b][1]), 6) * 1_000_000)
                n_pairs += 1
                n_both += fu >= 350000 and pu >= 350000
                n_fo += fu >= 350000 and pu < 350000
                n_po += fu < 350000 and pu >= 350000
                gap += abs(fu - pu)
        if n_pairs:
            ref[c] = (n_pairs, n_both, n_fo, n_po, gap // n_pairs)
    got = {r.cent_id: (r.n_pairs, r.n_both, r.n_full_only,
                       r.n_prefix_only, r.mean_abs_gap_ppm)
           for r in _run(spark, "c120_matryoshka_audit")}
    assert got == ref


def test_c121_matches_python_diversity(spark, docs):
    per = defaultdict(lambda: [0, 0, 0])  # n_docs, sum_ttr, sum_simpson
    for did, lang, src, t in zip(docs["doc_id"], docs["lang"],
                                 docs["source"], docs["text"]):
        toks = [w for w in re.split(" +", t.lower().strip()) if w]
        if not toks:
            continue
        c = Counter(toks)
        n = len(toks)
        types = len(c)
        rep = sum(v * (v - 1) for v in c.values())
        e = per[(lang, src)]
        e[0] += 1
        e[1] += types * 1_000_000 // n
        e[2] += rep * 1_000_000 // (n * (n - 1)) if n >= 2 else 0
    got = {(r.lang, r.source): (r.n_docs, r.mean_ttr_ppm,
                                r.mean_simpson_ppm)
           for r in _run(spark, "c121_lexical_diversity")}
    assert got == {k: (n, st // n, ss // n)
                   for k, (n, st, ss) in per.items()}


def test_c122_matches_python_rouge(spark, docs, shingle_graph):
    counts = {int(d): Counter(w for w in
                              re.split(" +", t.lower().strip()) if w)
              for d, t in zip(docs["doc_id"], docs["text"])}
    ref = {}
    for d1, d2 in shingle_graph["edges"]:
        a, b = counts[d1], counts[d2]
        overlap = sum(min(a[t], b[t]) for t in a if t in b)
        na, nb = sum(a.values()), sum(b.values())
        p = overlap * 1_000_000 // na
        r = overlap * 1_000_000 // nb
        f1 = 0 if p + r == 0 else 2 * p * r // (p + r)
        ref[(d1, d2)] = (p, r, f1)
    got = {(r.d1, r.d2): (r.rouge1_p_ppm, r.rouge1_r_ppm,
                          r.rouge1_f1_ppm)
           for r in _run(spark, "c122_rouge_dup_audit")}
    assert got == ref


_LSH_PERMS = [(654540476, 52848), (308976216, 93351),
              (963411963, 133854), (617847703, 174357),
              (272283443, 214860), (926719190, 255363),
              (581154930, 295866), (235590670, 336369),
              (890026417, 376872), (544462157, 417375),
              (198897897, 457878), (853333644, 498381),
              (507769384, 538884), (162205124, 579387),
              (816640871, 619890), (471076611, 660393)]
_LSH_P = 1_000_000_007


def test_c123_matches_python_band_sweep(spark, docs, shingle_graph):
    import hashlib
    sh = shingle_graph["shingles"]
    sig = {}
    for did, ss in sh.items():
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
              % _LSH_P for s in ss]
        sig[did] = [min((h * a + b) % _LSH_P for h in hs)
                    for a, b in _LSH_PERMS]
    truth = set(shingle_graph["edges"])
    ref = {}
    for bands in (2, 4, 8):
        rows_per = 16 // bands
        buckets = defaultdict(list)
        for did, m in sig.items():
            for band in range(bands):
                key = (band, tuple(m[band * rows_per:
                                     (band + 1) * rows_per]))
                buckets[key].append(did)
        cand = set()
        for _, dids in buckets.items():
            dids.sort()
            for i, a in enumerate(dids):
                for b in dids[i + 1:]:
                    cand.add((a, b))
        hit = cand & truth
        ref[bands] = (rows_per, len(cand), len(truth), len(hit),
                      None if not cand
                      else len(hit) * 1_000_000 // len(cand),
                      None if not truth
                      else len(hit) * 1_000_000 // len(truth))
    got = {r.bands: (r.rows_per_band, r.n_candidates, r.n_truth,
                     r.n_hit, r.precision_ppm, r.recall_ppm)
           for r in _run(spark, "c123_lsh_band_sweep")}
    assert got == ref
