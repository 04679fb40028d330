"""Independent-reimplementation references for the portable-sketch
and integer-recurrence families (same rationale as
test_round10_references.py: the DuckDB oracles mirror each query's
algorithm, so a shared algorithmic error would pass both engines —
hashlib/Counter/sequential-loop reimplementations close that hole).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from datetime import date

import pandas as pd

from tests.conftest import SF_SMALL
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_b102_kmv_matches_hashlib_reference(spark):
    """k=128 KMV over md5-48 hashes of user-day codes, per event
    type: exact integer equality on every estimate."""
    out = {r["g"]: r for r in
           REGISTRY["b102_kmv_distinct_estimate"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    vals = defaultdict(set)
    for _, r in ev.iterrows():
        v = int(r.user_id) * 100000 + (r.ts.date() - date(2024, 1, 1)).days
        vals[r.event_type].add(v)
    for g, vs in vals.items():
        hashes = sorted(_md5_48(str(v)) for v in vs)
        nh = len(hashes)
        est = nh if nh < 128 else 127 * (1 << 48) // hashes[127]
        assert out[g]["n_exact"] == len(vs)
        assert out[g]["est"] == est, g
        assert out[g]["err_ppm"] == abs(est - len(vs)) * 1_000_000 \
            // len(vs)


def test_c38_heavy_hitters_matches_counter_reference(spark):
    """Sharded deterministic Misra-Gries: per md5-48%32 shard, count
    table truncated by the 33rd-largest count; top-10 surviving
    items by (est desc, item)."""
    out = [(r["item"], r["est_count"]) for r in
           REGISTRY["c38_heavy_hitters"].fn(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    shard_counts = defaultdict(Counter)
    for _, r in d.iterrows():
        for item in re.split(" +", r.text.lower().strip()):
            shard_counts[_md5_48(item) % 32][item] += 1
    survivors = []
    for p, cnts in shard_counts.items():
        ranked = sorted(cnts.items(), key=lambda t: (-t[1], t[0]))
        m = ranked[32][1] if len(ranked) >= 33 else 0
        survivors += [(item, c - m) for item, c in ranked if c > m]
    survivors.sort(key=lambda t: (-t[1], t[0]))
    assert out == survivors[:10]


def test_b141_countmin_matches_hashlib_reference(spark):
    """d=4 x w=256 Count-Min over per-user event counts: exact
    integer equality on the top-20 point estimates."""
    out = [(r["user_id"], r["n_exact"], r["est"], r["overcount"])
           for r in REGISTRY["b141_countmin_frequency"]
           .fn(spark, SF_SMALL).collect()]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    n = Counter(int(u) for u in ev.user_id)
    counters = defaultdict(int)
    for u, c in n.items():
        for r in range(4):
            counters[(r, _md5_48(f"{r}:{u}") % 256)] += c
    ref = []
    for u, c in n.items():
        est = min(counters[(r, _md5_48(f"{r}:{u}") % 256)]
                  for r in range(4))
        ref.append((u, c, est, est - c))
    ref.sort(key=lambda t: (-t[1], t[0]))
    assert out == ref[:20]
    assert all(t[3] >= 0 for t in out)  # CM never undercounts


def test_b144_bloom_matches_hashlib_reference(spark):
    """16384-bit k=4 Bloom filter over (user, day) purchase keys
    probed with error keys: per-bucket exact equality including the
    measured false-positive counts."""
    out = {r["bucket"]: r for r in
           REGISTRY["b144_bloom_membership"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")

    def keys(et):
        sub = ev[ev.event_type == et]
        return {(int(r.user_id), f"{int(r.user_id)}|{r.ts.date()}")
                for _, r in sub.iterrows()}

    members = keys("purchase")
    probes = keys("error")
    member_keys = {k for _, k in members}
    bits = {_md5_48(f"{j}#{k}") % 16384
            for _, k in members for j in range(4)}
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for u, k in probes:
        claimed = all(_md5_48(f"{j}#{k}") % 16384 in bits
                      for j in range(4))
        is_m = k in member_keys
        row = agg[u % 4]
        row[0] += 1
        row[1] += claimed
        row[2] += is_m
        row[3] += claimed and not is_m
    assert set(out) == set(agg)
    for b, (np_, ncl, nm, nfp) in agg.items():
        assert (out[b]["n_probes"], out[b]["n_claimed"],
                out[b]["n_members"], out[b]["n_false_pos"]) \
            == (np_, ncl, nm, nfp), b
        assert nm <= ncl  # a member probe can never fail the filter


def test_b146_balance_matches_sequential_reference(spark):
    """Literal sequential clamped recurrence r = max(0, r + delta)
    per user in (ts, event_id) order — the loop the Lindley window
    identity replaces."""
    out = {r["bucket"]: r for r in
           REGISTRY["b146_clamped_running_balance"].fn(spark, SF_SMALL)
           .collect()}
    ev = (pd.read_parquet(f"{SF_SMALL}/events.parquet")
          .sort_values(["ts", "event_id"]))
    fin = {}
    for u, g in ev.groupby("user_id"):
        r = peak = 0
        for _, row in g.iterrows():
            cents = math.floor(row.value * 100)
            delta = cents if row.event_type in ("purchase", "signup") \
                else -cents
            r = max(0, r + delta)
            peak = max(peak, r)
        fin[int(u)] = (r, peak)
    agg = defaultdict(lambda: [0, 0, 0])
    for u, (r, peak) in fin.items():
        b = agg[u % 16]
        b[0] += 1
        b[1] += r
        b[2] += peak
    for b, (nu, fc, pc) in agg.items():
        assert (out[b]["n_users"], out[b]["final_cents"],
                out[b]["peak_cents"]) == (nu, fc, pc), b


def test_b148_dense_ids_match_sorted_enumerate(spark):
    """Global sorted enumerate (the literal spec) must reproduce all
    97 bucket checksums of the blocked two-pass id assignment."""
    out = {r["bucket"]: r for r in
           REGISTRY["b148_dense_global_ids"].fn(spark, SF_SMALL)
           .collect()}
    ev = (pd.read_parquet(f"{SF_SMALL}/events.parquet")
          .sort_values(["ts", "event_id"]).reset_index(drop=True))
    agg = defaultdict(lambda: [0, 0, 0])
    for i, eid in enumerate(ev.event_id, start=1):
        b = agg[i % 97]
        b[0] += 1
        b[1] += i
        b[2] += int(eid)
    assert set(out) == set(agg)
    for b, (n, gs, es) in agg.items():
        assert (out[b]["n"], out[b]["gid_sum"], out[b]["eid_sum"]) \
            == (n, gs, es), b


def test_c116_markov_matches_python_power_iteration(spark):
    """Pure-Python 3-round integer power iteration (per-edge
    truncating pi*n//out, parts-per-trillion) over transitions built
    from per-user (ts, event_id)-ordered sequences."""
    out = {r["event_type"]: r["pi_ppt"] for r in
           REGISTRY["c116_markov_stationary_int"].fn(spark, SF_SMALL)
           .collect()}
    ev = (pd.read_parquet(f"{SF_SMALL}/events.parquet")
          .sort_values(["ts", "event_id"]))
    tr = Counter()
    for _, g in ev.groupby("user_id"):
        seq = list(g.event_type)
        for a, b in zip(seq, seq[1:]):
            tr[(a, b)] += 1
    outn = Counter()
    for (a, _), n in tr.items():
        outn[a] += n
    states = sorted(set(ev.event_type))
    pi = {s: 1_000_000_000_000 // len(states) for s in states}
    for _ in range(3):
        nxt = {s: 0 for s in states}
        for (a, b), n in tr.items():
            nxt[b] += pi[a] * n // outn[a]
        pi = nxt
    assert out == pi


def test_c105_bigram_lm_matches_counter_reference(spark):
    """Counter-based corpus bigram statistics and per-doc integer-ppm
    fluency scores, rolled up per (lang, source)."""
    out = {(r["lang"], r["source"]): r for r in
           REGISTRY["c105_bigram_lm_score"].fn(spark, SF_SMALL)
           .collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    doc_bigrams = {}
    c_xy = Counter()
    for _, r in d.iterrows():
        toks = re.split(" +", r.text.lower().strip())
        if len(toks) < 2:
            continue
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        doc_bigrams[int(r.doc_id)] = (r.lang, r.source, Counter(bgs))
        c_xy.update(bgs)
    c_x = Counter()
    for bg, c in c_xy.items():
        c_x[bg.split(" ")[0]] += c
    rolled = defaultdict(lambda: [0, 0, None])
    for _, (lang, source, ks) in doc_bigrams.items():
        num = sum(k * (c_xy[bg] * 1_000_000 // c_x[bg.split(" ")[0]])
                  for bg, k in ks.items())
        score = num // sum(ks.values())
        row = rolled[(lang, source)]
        row[0] += 1
        row[1] += score
        row[2] = score if row[2] is None else min(row[2], score)
    assert set(out) == set(rolled)
    for key, (n, ssum, smin) in rolled.items():
        assert (out[key]["n_docs"], out[key]["sum_score_ppm"],
                out[key]["min_score_ppm"]) == (n, ssum, smin), key


def _kmv_state(ev):
    """(vals-by-group, sorted-hash-list-by-group, theta-by-group) for
    the user-day KMV family (k=128, md5-48 space)."""
    vals = defaultdict(set)
    for _, r in ev.iterrows():
        vals[r.event_type].add(
            int(r.user_id) * 100000 + (r.ts.date() - date(2024, 1, 1)).days)
    hashes = {g: sorted(_md5_48(str(v)) for v in vs)
              for g, vs in vals.items()}
    theta = {g: (h[127] if len(h) >= 128 else 1 << 48)
             for g, h in hashes.items()}
    return vals, hashes, theta


def test_b103_kmv_intersection_matches_hashlib_reference(spark):
    """Theta-sketch intersection: retained = hashes below own theta;
    combined theta = min; est = |common below cth| * 2^48 // cth."""
    out = {(r["g1"], r["g2"]): r for r in
           REGISTRY["b103_kmv_intersection_estimate"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    vals, hashes, theta = _kmv_state(ev)
    ret = {g: {x for x in h if x < theta[g]} for g, h in hashes.items()}
    gs = sorted(vals)
    for i, g1 in enumerate(gs):
        for g2 in gs[i + 1:]:
            cth = min(theta[g1], theta[g2])
            common = len({x for x in ret[g1] & ret[g2] if x < cth})
            est = common * (1 << 48) // cth
            row = out[(g1, g2)]
            assert row["n_exact"] == len(vals[g1] & vals[g2]), (g1, g2)
            assert row["est_inter"] == est, (g1, g2)


def test_b122_kmv_difference_matches_hashlib_reference(spark):
    """Theta-sketch a-not-b for every ordered pair: retained g1
    hashes below cth absent from g2's retained set, rescaled."""
    out = {(r["g1"], r["g2"]): r for r in
           REGISTRY["b122_kmv_difference_estimate"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    vals, hashes, theta = _kmv_state(ev)
    ret = {g: {x for x in h if x < theta[g]} for g, h in hashes.items()}
    for (g1, g2), row in out.items():
        cth = min(theta[g1], theta[g2])
        c = len({x for x in ret[g1] if x < cth and x not in ret[g2]})
        assert row["est_diff"] == c * (1 << 48) // cth, (g1, g2)


def _neardup_edges(d):
    """Exact token-3-gram Jaccard >= 0.5 pairs (the c08 edge set) via
    brute-force set math."""
    sh = {}
    for _, r in d.iterrows():
        toks = re.split(" +", r.text.lower().strip())
        if len(toks) >= 3:
            sh[int(r.doc_id)] = {" ".join(toks[i:i + 3])
                                 for i in range(len(toks) - 2)}
    ids = sorted(sh)
    edges = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                edges.append((a, b))
    return edges


def test_c104_pagerank_matches_python_iteration(spark):
    """Pure-Python 3-round integer PageRank (per-edge rank//outdeg,
    150000 + 85*sum//100 damping) over brute-force exact near-dup
    edges: full integer equality on every rank."""
    out = {r["doc_id"]: r["rank_ppm"] for r in
           REGISTRY["c104_pagerank_int"].fn(spark, SF_SMALL).collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    sym = []
    for a, b in _neardup_edges(d):
        sym += [(a, b), (b, a)]
    nodes = sorted({a for a, _ in sym})
    outdeg = Counter(a for a, _ in sym)
    rank = {v: 1_000_000 for v in nodes}
    for _ in range(3):
        sums = Counter()
        for a, b in sym:
            sums[b] += rank[a] // outdeg[a]
        rank = {v: 150_000 + 85 * sums[v] // 100 for v in nodes}
    assert out == rank


def test_b95_cusum_matches_brute_force_max_window(spark):
    """O(days^2) brute force over every contiguous window of present
    days must reproduce the Kadane-identity burst size and end day."""
    out = {r["event_type"]: r for r in
           REGISTRY["b95_cusum_burst"].fn(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    daily = defaultdict(Counter)
    for _, r in ev.iterrows():
        x = (r.ts.date() - date(2024, 1, 1)).days
        daily[r.event_type][x] += math.floor(r.value * 100)
    for et, cnts in daily.items():
        days = sorted(cnts)
        target = sum(cnts.values()) // len(days)
        dev = [cnts[x] - target for x in days]
        best, best_end = None, None
        for j in range(len(days)):
            for i in range(j + 1):
                s = sum(dev[i:j + 1])
                if best is None or s > best or (s == best
                                                and days[j] < best_end):
                    best, best_end = s, days[j]
        assert out[et]["max_burst_cents"] == best, et
        assert out[et]["burst_end_day"] == best_end, et


def test_c124_priority_sample_matches_hashlib_reference(spark):
    """Duffield-Lund-Thorup priorities w * 2^36 // (md5_48//4096 + 1),
    top-50 sample, tau = 51st priority, HT estimate sum(max(w, tau))
    — all exact integers."""
    out = {r["doc_id"]: r for r in
           REGISTRY["c124_priority_sample"].fn(spark, SF_SMALL)
           .collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    pr = []
    for _, r in d.iterrows():
        w = int(r.n_chars)
        p = w * 68719476736 // (_md5_48(str(int(r.doc_id))) // 4096 + 1)
        pr.append((int(r.doc_id), w, p))
    pr.sort(key=lambda t: (-t[2], t[0]))
    sample = pr[:50]
    tau = pr[50][2] if len(pr) >= 51 else 0
    est = sum(max(w, tau) for _, w, _ in sample)
    assert set(out) == {i for i, _, _ in sample}
    for i, w, p in sample:
        assert (out[i]["w"], out[i]["priority"],
                out[i]["est_total_w"]) == (w, p, est), i


def test_c19_components_match_bfs_reference(spark):
    """Brute-force BFS components (min doc_id label) over the exact
    near-dup edge set."""
    out = {r["doc_id"]: r["component_id"] for r in
           REGISTRY["c19_dup_components"].fn(spark, SF_SMALL).collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    adj = defaultdict(set)
    for a, b in _neardup_edges(d):
        adj[a].add(b)
        adj[b].add(a)
    ref = {}
    for start in sorted(adj):
        if start in ref:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            comp.update(
                frontier := [w for v in frontier for w in adj[v]
                             if w not in comp])
        label = min(comp)
        for v in comp:
            ref[v] = label
    assert out == ref


def test_c98_triangles_match_brute_force(spark):
    """Adjacency-set triangle enumeration over the exact co-purchase
    edge set (parts sharing an order)."""
    row = REGISTRY["c98_triangle_count"].fn(spark, SF_SMALL).collect()[0]
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    by_order = defaultdict(set)
    for _, r in li.iterrows():
        by_order[int(r.l_orderkey)].add(int(r.l_partkey))
    edges = set()
    nodes = set()
    for parts in by_order.values():
        nodes.update(parts)
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)  # oriented low->high: triangles counted once
    tri = sum(len(adj[a] & adj[b]) for a, b in edges)
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) \
        == (len(nodes), len(edges), tri)


def test_c112_kcore_matches_sequential_peel(spark):
    """Literal 3-round k=2 peel on the symmetrized near-dup edges:
    each round keeps endpoints with degree >= k, then re-filters
    edges to surviving endpoints."""
    out = {r["doc_id"]: r["deg"] for r in
           REGISTRY["c112_kcore_peeling"].fn(spark, SF_SMALL).collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    sym = set()
    for a, b in _neardup_edges(d):
        sym.add((a, b))
        sym.add((b, a))
    for _ in range(3):
        deg = Counter(a for a, _ in sym)
        keep = {v for v, c in deg.items() if c >= 2}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
    ref = dict(Counter(a for a, _ in sym))
    assert out == ref
