"""Independent-reimplementation references for r06 driver-window
queries that did not yet have one (b137/b139/b147/b154/c127/c128/
c129).

Same rationale as tests/test_round10_references.py: each DuckDB
oracle mirrors its query's algorithm, so a shared algorithmic bug
passes the value-hash gate.  These tests recompute the answers with
UNRELATED implementations (sequential Python loops, brute-force
pair scans, hashlib, Counter, classic O(L^2) Levenshtein DP) on the
same sf0.001 parquet.

Integer division throughout is truncation toward zero — verified to
match BOTH Spark `div` and DuckDB `//` ((-7) div 2 == -7 // 2 == -3
in both engines).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd

from tests.conftest import SF_SMALL, md5_48, round_half_up, tdiv
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY


_md5_48 = md5_48
_tdiv = tdiv


def test_b137_matches_brute_force_pair_median(spark):
    """All-pairs slope scan + sorted lower median, no SQL windows."""
    out = {r["event_type"]: r for r in
           REGISTRY["b137_theil_sen_slope"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    base = pd.Timestamp("2024-01-01").date()
    daily: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for _, r in ev.iterrows():
        x = (r.ts.date() - base).days
        daily[r.event_type][x] += math.floor(r.value * 100)
    assert set(out) == set(daily)
    for et, series in daily.items():
        pts = sorted(series.items())
        slopes = sorted(
            _tdiv((y2 - y1) * 1_000_000, x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:])
        assert out[et]["n_pairs"] == len(slopes)
        # lower median: 1-based rank (n+1) div 2
        assert out[et]["slope_med_ppm"] == slopes[(len(slopes) + 1) // 2 - 1]


def test_b139_matches_sequential_holt_loop(spark):
    """Literal sequential Holt recursion (alpha=beta=1/2, truncating
    integer arithmetic) over each type's sorted daily series."""
    out = {r["event_type"]: r for r in
           REGISTRY["b139_holt_linear_forecast"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    base = pd.Timestamp("2024-01-01").date()
    daily: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for _, r in ev.iterrows():
        day = (r.ts.date() - base).days
        daily[r.event_type][day] += math.floor(r.value * 100)
    for et, series in daily.items():
        ys = [y for _, y in sorted(series.items())]
        if len(ys) < 2:
            assert et not in out
            continue
        lvl, trd = ys[0], ys[1] - ys[0]
        for y in ys[2:]:
            new_l = _tdiv(y + lvl + trd, 2)
            trd = _tdiv(trd + new_l - lvl, 2)
            lvl = new_l
        row = out[et]
        assert row["n_days"] == len(ys)
        assert row["level_cents"] == lvl
        assert row["trend_cents"] == trd
        assert row["forecast_1"] == lvl + trd
        assert row["forecast_7"] == lvl + 7 * trd


def test_b147_matches_sequential_sessionization(spark):
    """Per-user sequential scan: 30-min gap sessionization, first-5
    path build, Counter rollup, top-10 by (count desc, path)."""
    got = [(r["path"], r["n_sessions"], r["sum_events"]) for r in
           REGISTRY["b147_top_session_paths"].fn(spark, SF_SMALL)
           .collect()]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    sessions: list[list[str]] = []
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        prev_us = None
        for _, r in g.iterrows():
            us = r.ts.value // 1000
            if prev_us is None or us - prev_us > 1_800_000_000:
                sessions.append([])
            sessions[-1].append(r.event_type)
            prev_us = us
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for s in sessions:
        p = ">".join(s[:5])
        agg[p][0] += 1
        agg[p][1] += len(s)
    want = sorted(((p, n, tot) for p, (n, tot) in agg.items()),
                  key=lambda t: (-t[1], t[0]))[:10]
    assert got == want


def test_b154_matches_python_sliding_hll(spark):
    """hashlib-md5 sliding-window HLL: per-day register partials
    max-merged over each trailing 7-day window, identical estimate
    expression — extends b153's whole-corpus reference to the
    windowed merge."""
    out = {r["day"]: r for r in
           REGISTRY["b154_sliding_hll_distinct"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    partials: dict = defaultdict(dict)  # day -> bucket -> max rank
    day_users: dict = defaultdict(set)
    for _, r in ev.iterrows():
        day = r.ts.date()
        day_users[day].add(int(r.user_id))
        h = _md5_48(f"u:{int(r.user_id)}")
        bucket, rem = divmod(h, 2 ** 42)
        m = min(42, 43 - rem.bit_length())  # rem==0 folds into max
        p = partials[day]
        p[bucket] = max(p.get(bucket, 0), m)
    spine = sorted(partials)
    assert len(out) == len(spine)
    for d in spine:
        regs: dict = {}
        users: set = set()
        for pd_day in spine:
            if 0 <= (d - pd_day).days <= 6:
                users |= day_users[pd_day]
                for bkt, rr in partials[pd_day].items():
                    regs[bkt] = max(regs.get(bkt, 0), rr)
        n_present = len(regs)
        s = sum(1 << (42 - rr) for rr in regs.values())
        raw = (0.709 * 64 * 64 * 2.0 ** 42) / (
            float(s) + (64 - n_present) * 2.0 ** 42)
        if raw <= 160.0 and n_present < 64:
            est = round(64.0 * math.log(64.0 / (64 - n_present)))
        else:
            est = round(raw)
        row = out[str(d)]
        assert row["n_registers"] == n_present
        assert row["distinct_est"] == est
        assert row["distinct_exact"] == len(users)


_round_half_up = round_half_up


def test_c127_matches_brute_force_knn(spark):
    """Pure-Python exhaustive kNN with left-to-right float folds (the
    exact accumulation order of the engine's aggregate lambdas),
    HALF_UP micro-unit rounding, (sim desc, nid) ranking, and the
    cnt*100-label vote tiebreak."""
    out = {r["label"]: (r["n_probes"], r["n_correct"]) for r in
           REGISTRY["c127_knn_label_consistency"].fn(spark, SF_SMALL)
           .collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = {}
    for _, r in emb.iterrows():
        v = [float(x) for x in r.embedding]
        nsq = 0.0
        for x in v:
            nsq = nsq + x * x
        if nsq > 0:
            vecs[int(r.vec_id)] = (v, math.sqrt(nsq), int(r.label))
    probe_ids = sorted(vecs, key=lambda i: (_md5_48(str(i)), i))[:100]
    correct: Counter = Counter()
    n_probes: Counter = Counter()
    for pid in probe_ids:
        pv, pn, plabel = vecs[pid]
        scored = []
        for nid, (nv, nn, nlabel) in vecs.items():
            if nid == pid:
                continue
            dp = 0.0
            for a, b in zip(pv, nv):
                dp = dp + a * b
            sim = int(_round_half_up(
                _round_half_up(dp / (pn * nn), 6) * 1_000_000, 0))
            scored.append((-sim, nid, nlabel))
        scored.sort()
        votes: Counter = Counter(lbl for _, _, lbl in scored[:5])
        pred = max(votes, key=lambda lbl: votes[lbl] * 100 - lbl)
        n_probes[plabel] += 1
        if pred == plabel:
            correct[plabel] += 1
    assert out == {lbl: (n_probes[lbl], correct[lbl]) for lbl in n_probes}


def test_c128_matches_counter_dsir(spark):
    """Counter/hashlib recomputation of hashed-bigram DSIR importance
    scores: bucket counts, exact big-int ratio table, per-doc ratio
    sums, top-20 by (score desc, doc_id)."""
    got = [(r["doc_id"], r["source"], r["score"], r["n_grams"]) for r in
           REGISTRY["c128_dsir_importance"].fn(spark, SF_SMALL)
           .collect()]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    targets = {"src0", "src1", "src2", "src3", "src4"}
    doc_buckets: dict[int, list[int]] = {}
    doc_src: dict[int, str] = {}
    cnt_t: Counter = Counter()
    cnt_c: Counter = Counter()
    for _, r in docs.iterrows():
        toks = re.split(" +", r.text.lower().strip(" "))
        bks = [_md5_48(f"{a} {b}") % 8192
               for a, b in zip(toks, toks[1:])]
        doc_buckets[int(r.doc_id)] = bks
        doc_src[int(r.doc_id)] = r.source
        cnt_c.update(bks)
        if r.source in targets:
            cnt_t.update(bks)
    n_c = sum(cnt_c.values())
    n_t = sum(cnt_t.values())
    ratio = {b: (cnt_t.get(b, 0) * n_c * 1_000_000) // (c * n_t)
             for b, c in cnt_c.items()}
    rows = [(did, doc_src[did], sum(ratio[b] for b in bks), len(bks))
            for did, bks in doc_buckets.items() if bks]
    rows.sort(key=lambda t: (-t[2], t[0]))
    assert got == rows[:20]


def test_b159_qdigest_contract(spark):
    """The q-digest's PAPER guarantees, recomputed against a pandas
    histogram (independent of both the engine's Arrow compress loop
    and the oracle's unrolled CTEs): every reported quantile is an
    UPPER bound on the exact one; its true rank lies in
    [ceil(p*n/100), rank + L*(n div k)]; and the digest size is
    bounded by the sketch, not the data."""
    rows = (REGISTRY["b159_qdigest_quantiles"].fn(spark, SF_SMALL)
            .collect())
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    vals = sorted(min(max(math.floor(v * 100), 0), (1 << 16) - 1)
                  for v in ev.value)
    n = len(vals)
    L, k = 16, 256
    import bisect
    assert len(rows) == 7
    for r in rows:
        rk = (r["pct"] * n + 99) // 100
        exact = vals[rk - 1]
        assert r["exact_cents"] == exact
        assert r["qdigest_cents"] >= exact          # upper-bound walk
        # rank RANGE of the reported value must intersect
        # [rk, rk + L*(n div k)] (duplicates stretch the upper end)
        hi_rank = bisect.bisect_right(vals, r["qdigest_cents"])
        lo_rank = bisect.bisect_left(vals, r["qdigest_cents"]) + 1
        assert hi_rank >= rk, (r["pct"], rk, hi_rank)
        assert lo_rank <= rk + L * (n // k), (r["pct"], rk, lo_rank)
        assert r["n_nodes"] <= 3 * k                # classic size bound


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_c129_matches_python_dp_levenshtein(spark):
    """Classic O(L^2) DP Levenshtein over the same prefix-blocked
    candidate pairs (36 pairs at sf0.001 — non-vacuous)."""
    got = [(r["doc_a"], r["doc_b"], r["lev"]) for r in
           REGISTRY["c129_edit_distance_verify"].fn(spark, SF_SMALL)
           .collect()]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    blocks: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for _, r in docs.iterrows():
        t = re.sub("[^a-z0-9 ]", "", r.text.lower())
        if len(t) >= 16:
            blocks[t[:16]].append((int(r.doc_id), t))
    want = []
    for members in blocks.values():
        members.sort()
        for i, (da, ta) in enumerate(members):
            for db, tb in members[i + 1:]:
                want.append((da, db, _levenshtein(ta[:160], tb[:160])))
    want.sort(key=lambda t: (t[2], t[0], t[1]))
    assert len(want) > 0
    assert got == want[:100]


def test_b150_matches_pandas_stratified_rates(spark):
    """Pooled-vs-stratum rate comparison recomputed with pandas
    merges and exact integer rate math."""
    out = {r["n_name"]: r for r in
           REGISTRY["b150_simpson_reversal_audit"].fn(spark, SF_SMALL)
           .collect()}
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    n = pd.read_parquet(f"{SF_SMALL}/nation.parquet")
    c = c[c.c_mktsegment.isin(["BUILDING", "MACHINERY"])]
    j = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    j["hi"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    per = {}
    for name, g in j.groupby("n_name"):
        a = g[g.c_mktsegment == "BUILDING"]
        b = g[g.c_mktsegment == "MACHINERY"]
        per[name] = (len(a), int(a.hi.sum()), len(b), int(b.hi.sum()))
    pa = sum(v[1] for v in per.values()) * 1_000_000 \
        // sum(v[0] for v in per.values())
    pb = sum(v[3] for v in per.values()) * 1_000_000 \
        // sum(v[2] for v in per.values())
    want_names = {k for k, v in per.items() if v[0] > 0 and v[2] > 0}
    assert set(out) == want_names
    for name in want_names:
        na, ha, nb, hb = per[name]
        ra, rb = ha * 1_000_000 // na, hb * 1_000_000 // nb
        row = out[name]
        assert (row["rate_a_ppm"], row["rate_b_ppm"]) == (ra, rb)
        assert (row["pooled_a_ppm"], row["pooled_b_ppm"]) == (pa, pb)
        def sgn(x):
            return (x > 0) - (x < 0)
        assert row["reversed"] == int(sgn(ra - rb) * sgn(pa - pb) == -1)


def test_c126_matches_sorted_list_quantiles(spark):
    """Bottom-k-by-hash sample + type-1 discrete quantiles rebuilt
    with sorted Python lists."""
    out = {r["p_pct"]: r for r in
           REGISTRY["c126_sampled_quantiles"].fn(spark, SF_SMALL)
           .collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    by_hash = sorted(
        ((_md5_48(str(int(r.doc_id))), int(r.doc_id), int(r.n_chars))
         for r in d.itertuples()))
    samp = sorted(nc for _, _, nc in by_hash[:400])
    exact = sorted(int(x) for x in d.n_chars)
    for p in (25, 50, 75, 90):
        sq = samp[(p * len(samp) + 99) // 100 - 1]
        xq = exact[(p * len(exact) + 99) // 100 - 1]
        row = out[p]
        assert row["sample_q"] == sq
        assert row["exact_q"] == xq
        assert row["abs_err"] == abs(sq - xq)


def test_b160_sliding_qdigest_contract(spark):
    """Windowed q-digest guarantees recomputed from per-day pandas
    histograms: per window, the reported quantile upper-bounds the
    exact windowed quantile, its true windowed rank stays within
    L*(n_w div k), and the digest counts resum to the window total."""
    import bisect
    rows = (REGISTRY["b160_sliding_qdigest"].fn(spark, SF_SMALL)
            .collect())
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    per_day: dict = defaultdict(list)
    for _, r in ev.iterrows():
        per_day[r.ts.date()].append(
            min(max(math.floor(r.value * 100), 0), (1 << 16) - 1))
    days = sorted(per_day)
    L, k = 16, 256
    got = {(r["day"], r["pct"]): r for r in rows}
    assert len(got) == 2 * len(days)
    for d in days:
        win = sorted(v for pd_day in days
                     if 0 <= (d - pd_day).days <= 6
                     for v in per_day[pd_day])
        n_w = len(win)
        for p in (50, 95):
            row = got[(str(d), p)]
            rk = (p * n_w + 99) // 100
            assert row["exact_cents"] == win[rk - 1]
            assert row["qdigest_cents"] >= win[rk - 1]
            hi_rank = bisect.bisect_right(win, row["qdigest_cents"])
            lo_rank = bisect.bisect_left(win, row["qdigest_cents"]) + 1
            assert hi_rank >= rk, (str(d), p, rk, hi_rank)
            assert lo_rank <= rk + L * (n_w // k), \
                (str(d), p, rk, lo_rank)
