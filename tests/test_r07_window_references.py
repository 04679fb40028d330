"""Independent-reimplementation references for the r07 driver-window
cohort that lacked full recomputations (b59-b76 events tier, c82-c97
curation tier) — pure-Python/pandas recomputations at sf0.001,
failure-independent of both the Spark implementation and its mirrored
DuckDB oracle (the tests/test_window_references.py pattern).

Arithmetic parity: DuckDB's integer `//` TRUNCATES toward zero
(SELECT -7 // 2 = -3), matching Spark's `div` — so tdiv is the
reference for any division whose numerator can go negative (b76
growth); plain python `//` (floor) is only safe on the non-negative
divisions.  Cosines are explicit left-to-right float folds (same
fold order as F.aggregate / list_cosine_similarity), rounded HALF_UP
to 6 dp before any ranking, exactly as both engines do.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from tests.conftest import md5_48, round_half_up, tdiv
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e["ts_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    e["cents"] = np.floor(e["value"] * 100).astype("int64")
    e["day"] = e["ts"].dt.strftime("%Y-%m-%d")
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


def _cos(a, b) -> float:
    dp = na = nb = 0.0
    for x, y in zip(a, b):
        dp = dp + x * y
        na = na + x * x
        nb = nb + y * y
    return dp / (math.sqrt(na) * math.sqrt(nb))


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMALL).collect()


# --------------------------- events tier ----------------------------


def test_b59_matches_python_scan(spark, ev):
    got = {r.user_id: r for r in _run(spark, "b59_running_peak_drawdown")}
    ref = {}
    for uid, g in ev[ev.user_id < 100].groupby("user_id"):
        run = peak = dd = None
        tot = 0
        peak = -10**18
        dd = -10**18
        for c in g["cents"]:
            tot += int(c)
            peak = max(peak, tot)
            dd = max(dd, peak - tot)
        ref[uid] = (peak, dd)
    assert {u: (r.peak_cents, r.max_drawdown_cents)
            for u, r in got.items()} == ref


def test_b60_matches_python_carry(spark, ev):
    got = {r.user_id: r for r in _run(spark, "b60_ignore_nulls_carry")}
    assert got
    for uid, g in ev[ev.user_id < 100].groupby("user_id"):
        carried = None
        n_before = 0
        mx = None
        for _, row in g.iterrows():
            if row["event_type"] == "purchase":
                carried = int(row["cents"])
            if carried is None:
                n_before += 1
            else:
                mx = carried if mx is None else max(mx, carried)
        r = got[uid]
        assert (r.n_events, r.n_before_first_purchase, r.max_carried) \
            == (len(g), n_before, mx)


def test_b61_matches_python_intervals(spark, ev):
    got = {r.state: (r.n_purchases, r.cents)
           for r in _run(spark, "b61_point_in_time_join")}
    ref = defaultdict(lambda: [0, 0])
    for uid, g in ev.groupby("user_id"):
        ch = g[g.event_type != "purchase"]
        starts = []  # (valid_from_us, state)
        prev = None
        for _, row in ch.iterrows():
            if prev is None or row["event_type"] != prev:
                starts.append((int(row["ts_us"]), row["event_type"]))
            prev = row["event_type"]
        starts.sort()
        if uid >= 200:
            continue
        for _, p in g[g.event_type == "purchase"].iterrows():
            pt = int(p["ts_us"])
            for i, (vf, st) in enumerate(starts):
                vt = starts[i + 1][0] if i + 1 < len(starts) else None
                if pt >= vf and (vt is None or pt < vt):
                    ref[st][0] += 1
                    ref[st][1] += int(p["cents"])
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_b62_matches_python_mode(spark, ev):
    got = {r.user_id: (r.mode_type, r.mode_n)
           for r in _run(spark, "b62_group_mode")}
    ref = {}
    for uid, g in ev[ev.user_id < 200].groupby("user_id"):
        cnt = Counter(g["event_type"])
        best = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[0]
        ref[uid] = best
    assert got == ref


def test_b63_matches_python_cohorts(spark, ev):
    got = {r.first_month: r.new_users
           for r in _run(spark, "b63_first_seen_cohorts")}
    first = ev.groupby("user_id")["ts"].min().dt.strftime("%Y-%m")
    assert got == dict(Counter(first))


def test_b64_matches_python_grouping_sets(spark, ev):
    rows = _run(spark, "b64_grouping_sets")
    got = {(r.event_type, r.iso_dow, r.g_type, r.g_dow):
           (r.n_events, r.value_cents) for r in rows}
    assert len(got) == len(rows)
    dow = ev["ts"].dt.dayofweek + 1  # pandas Mon=0 -> ISO Mon=1
    e = ev.assign(dow=dow)
    ref = {}
    for (t, d), g in e.groupby(["event_type", "dow"]):
        ref[(t, d, 0, 0)] = (len(g), int(g["cents"].sum()))
    for d, g in e.groupby("dow"):
        ref[(None, d, 1, 0)] = (len(g), int(g["cents"].sum()))
    ref[(None, None, 1, 1)] = (len(e), int(e["cents"].sum()))
    assert got == ref


def test_b65_matches_python_twa(spark, ev):
    got = {(r.event_type, r.event_date):
           (r.dur_sum_s, r.weighted_sum, r.twa_cents)
           for r in _run(spark, "b65_time_weighted_avg")}
    ref = {}
    for (t, d), g in ev.assign(es=ev.ts_us // 1_000_000).groupby(
            ["event_type", "day"]):
        g = g.sort_values(["es", "event_id"])
        es = g["es"].tolist()
        cs = g["cents"].tolist()
        durs = [es[i + 1] - es[i] for i in range(len(es) - 1)]
        if not durs:
            continue
        ds = sum(durs)
        ws = sum(c * du for c, du in zip(cs, durs))
        ref[(t, d)] = (ds, ws, ws // ds if ds else None)
    assert got == ref


def test_b66_matches_python_ohlc(spark, ev):
    got = {(r.event_type, r.event_date):
           (r.open_cents, r.high_cents, r.low_cents, r.close_cents,
            r.n_events) for r in _run(spark, "b66_ohlc")}
    ref = {}
    for (t, d), g in ev.groupby(["event_type", "day"]):
        g = g.sort_values(["ts_us", "event_id"])
        cs = g["cents"].tolist()
        ref[(t, d)] = (cs[0], max(cs), min(cs), cs[-1], len(cs))
    assert got == ref


def test_b67_matches_python_regression(spark, ev):
    got = {r.event_type: r for r in _run(spark, "b67_integer_trend")}
    epoch = pd.Timestamp("2024-01-01")
    x = (ev["ts"].dt.normalize() - epoch).dt.days
    e = ev.assign(x=x)
    for t, g in e.groupby("event_type"):
        daily = g.groupby("x")["cents"].sum()
        n = len(daily)
        sx = int(daily.index.to_series().sum())
        sy = int(daily.sum())
        sxy = int((daily.index.to_series() * daily).sum())
        sxx = int((daily.index.to_series() ** 2).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = None if den == 0 else \
            int(np.sign(num)) * (1_000_000 * abs(num) // den)
        r = got[t]
        assert (r.n, r.sx, r.sy, r.sxy, r.sxx, r.slope_cents_ppm) \
            == (n, sx, sy, sxy, sxx, slope)


def test_b68_matches_numpy_mad(spark, ev):
    got = {r.event_type: r for r in _run(spark, "b68_mad_outliers")}
    for t, g in ev.groupby("event_type"):
        cs = g["cents"].to_numpy(dtype=np.float64)
        med = float(np.percentile(cs, 50, method="linear"))
        mad = float(np.percentile(np.abs(cs - med), 50, method="linear"))
        n_out = int((np.abs(cs - med) > 3 * mad).sum())
        r = got[t]
        assert r.med_cents == med and r.mad_cents == mad
        assert (r.n_events, r.n_outliers) == (len(cs), n_out)
        assert r.outlier_ppm == n_out * 1_000_000 // len(cs)


def test_b69_matches_python_multisets(spark, ev):
    rows = _run(spark, "b69_set_ops_all")
    got = Counter((r.user_id, r.op) for r in rows)
    clicks = Counter(ev.loc[ev.event_type == "click", "user_id"])
    purch = Counter(ev.loc[ev.event_type == "purchase", "user_id"])
    ref = Counter()
    for u in clicks:
        ref[(u, "except_all")] += max(0, clicks[u] - purch.get(u, 0))
        ref[(u, "intersect_all")] += min(clicks[u], purch.get(u, 0))
    assert got == +ref


def test_b70_matches_python_null_safe(spark, ev):
    rows = _run(spark, "b70_null_safe_join")
    got = {r.k: (r.n_clicks, r.n_views) for r in rows}
    assert len(got) == len(rows)

    def keyed(t):
        g = ev[ev.event_type == t]
        return Counter(None if int(u) % 7 == 0 else int(u) % 100
                       for u in g["user_id"])

    a, b = keyed("click"), keyed("view")
    ref = {k: (a[k], b[k]) for k in a if k in b}
    assert got == ref


def test_b71_matches_pandas_semi(spark):
    li = pd.read_parquet(
        f"{SF_SMALL}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_returnflag",
                 "l_linestatus", "l_quantity"])
    keys = set(map(tuple, li.loc[li.l_returnflag == "R",
                                 ["l_partkey", "l_suppkey"]].to_numpy()))
    sel = li[[tuple(t) in keys for t in
              li[["l_partkey", "l_suppkey"]].to_numpy()]]
    ref = {t: (len(g), int(g["l_quantity"].sum()))
           for t, g in sel.groupby("l_linestatus")}
    got = {r.l_linestatus: (r.n_lines, r.sum_qty)
           for r in _run(spark, "b71_tuple_in_semi")}
    assert got == ref


def test_b72_matches_python_cumulative(spark, ev):
    rows = _run(spark, "b72_cumulative_distinct_users")
    first = ev.groupby("user_id")["day"].min()
    per_day = Counter(first)
    cum = 0
    ref = []
    for d in sorted(per_day):
        cum += per_day[d]
        ref.append((d, per_day[d], cum))
    assert sorted((r.day, r.new_users, r.cum_distinct_users)
                  for r in rows) == ref


def test_b76_matches_python_growth(spark, ev):
    got = {(r.event_type, r.event_date): (r.cents, r.prev_cents,
                                          r.growth_ppm)
           for r in _run(spark, "b76_dod_growth")}
    ref = {}
    for t, g in ev.groupby("event_type"):
        daily = g.groupby("day")["cents"].sum().sort_index()
        prev = None
        for d, c in daily.items():
            c = int(c)
            growth = None if prev in (None, 0) else \
                tdiv((c - prev) * 1_000_000, prev)
            ref[(t, d)] = (c, prev, growth)
            prev = c
    assert got == ref


# -------------------------- curation tier ---------------------------


def _words(text: str) -> list[str]:
    import re
    return [w for w in re.split("[^a-z]+", text.lower()) if w]


def test_c82_matches_python_pair_counts(spark, docs):
    freq = Counter()
    for t in docs["text"]:
        freq.update(_words(t))
    pairs = Counter()
    for w, f in freq.items():
        w = w + chr(183)
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += f
    top = sorted(pairs.items(), key=lambda t: (-t[1],) + t[0])[:30]
    rows = _run(spark, "c82_bpe_pair_counts")
    assert [((r.left_sym, r.right_sym), r.cnt) for r in rows] == top


def test_c85_matches_python_feature_hash(spark, docs):
    ref = Counter()
    for did, t in zip(docs["doc_id"], docs["text"]):
        for w in _words(t):
            ref[(did, md5_48(w) % 16)] += 1
    rows = _run(spark, "c85_feature_hash_bow")
    got = {(r.doc_id, r.dim): r.cnt for r in rows}
    assert len(got) == len(rows)
    assert got == dict(ref)


def test_c87_matches_python_centroid_dedup(spark, emb):
    cents = {cid: v for cid, (v, _) in emb.items() if cid < 8}
    assign = {}
    for vid, (v, _) in emb.items():
        best = sorted(((round_half_up(_cos(v, cv), 6), cid)
                       for cid, cv in cents.items()),
                      key=lambda t: (-t[0], t[1]))[0]
        assign[vid] = best[1]
    clusters = defaultdict(list)
    for vid, cid in assign.items():
        clusters[cid].append(vid)
    dropped = set()
    for cid, vids in clusters.items():
        vids.sort()
        for i, a in enumerate(vids):
            for b in vids[i + 1:]:
                if round_half_up(_cos(emb[a][0], emb[b][0]), 6) >= 0.35:
                    dropped.add(b)
    ref = defaultdict(lambda: [0, 0])
    for vid, (_, lab) in emb.items():
        ref[lab][0] += 1
        if vid not in dropped:
            ref[lab][1] += 1
    got = {r.label: (r.n_total, r.n_kept)
           for r in _run(spark, "c87_semantic_dedup")}
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_c88_matches_python_gap_rule(spark, ev):
    ud = sorted({(int(u), (pd.Timestamp(t).normalize()
                           - pd.Timestamp("2024-01-01")).days)
                 for u, t in zip(ev["user_id"], ev["ts"])})
    per_user = defaultdict(list)
    for u, d in ud:
        per_user[u].append(d)
    kept = Counter()
    for u, ds in per_user.items():
        prev = None
        for d in sorted(ds):
            if prev is None or d - prev > 7:
                kept[d] += 1
            prev = d
    got = {r.day_num: r.n_kept for r in _run(spark, "c88_lookback_dedup")}
    assert got == dict(kept)


def test_c90_matches_python_zipf(spark, docs):
    freq = Counter()
    for t in docs["text"]:
        freq.update(_words(t))
    ranked = sorted(freq.items(), key=lambda t: (-t[1], t[0]))
    agg = defaultdict(lambda: [0, 0])
    for rnk, (_, f) in enumerate(ranked, start=1):
        b = rnk.bit_length() - 1
        agg[b][0] += 1
        agg[b][1] += f.bit_length() - 1
    means = {b: s * 1_000_000 // n for b, (n, s) in agg.items()}
    rows = _run(spark, "c90_zipf_slope_audit")
    prev = None
    for r in sorted(rows, key=lambda r: r.rank_log2):
        n, s = agg[r.rank_log2]
        assert (r.n_words, r.mean_freq_log2_ppm) == (n, means[r.rank_log2])
        assert r.slope_ppm == (None if prev is None
                               else prev - means[r.rank_log2])
        prev = means[r.rank_log2]


def test_c91_matches_python_ivf_recall(spark, emb):
    cents = {cid: v for cid, (v, _) in emb.items() if cid < 8}
    queries = {q: emb[q][0] for q in emb if 100 <= q <= 119}

    def topk(qid, qv, pool, k):
        scored = sorted(((round_half_up(_cos(emb[v][0], qv), 6), v)
                         for v in pool if v != qid),
                        key=lambda t: (-t[0], t[1]))
        return [v for _, v in scored[:k]]

    assign = {}
    for vid, (v, _) in emb.items():
        assign[vid] = sorted(((round_half_up(_cos(v, cv), 6), cid)
                              for cid, cv in cents.items()),
                             key=lambda t: (-t[0], t[1]))[0][1]
    cells = defaultdict(list)
    for vid, cid in assign.items():
        cells[cid].append(vid)
    recall_sum = rr_sum = 0
    for q, qv in queries.items():
        truth = topk(q, qv, emb.keys(), 10)
        probes = [cid for _, cid in sorted(
            ((-round_half_up(_cos(cv, qv), 6), cid)
             for cid, cv in cents.items()))][:2]
        pool = [v for cid in probes for v in cells[cid]]
        ivf = topk(q, qv, pool, 10)
        recall_sum += len(set(truth) & set(ivf))
        t1 = truth[0]
        if t1 in ivf:
            rr_sum += 1_000_000 // (ivf.index(t1) + 1)
    row = _run(spark, "c91_ann_recall_eval")[0]
    assert row.n_queries == len(queries)
    assert row.recall10_ppm == recall_sum * 1_000_000 // (10 * len(queries))
    assert row.mrr_ppm == rr_sum // len(queries)


def test_c92_matches_python_threshold_sweep(spark, docs):
    import re
    shingles = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in re.split(" +", t.lower().strip()) if w]
        shingles[did] = {" ".join(toks[i:i + 3])
                         for i in range(len(toks) - 2)}
    inv = defaultdict(list)
    for did, sh in shingles.items():
        for s in sh:
            inv[s].append(did)
    common = Counter()
    for s, dids in inv.items():
        dids.sort()
        for i, a in enumerate(dids):
            for b in dids[i + 1:]:
                common[(a, b)] += 1
    js = [c * 1_000_000 // (len(shingles[a]) + len(shingles[b]) - c)
          for (a, b), c in common.items()]
    got = {r.threshold_ppm: r.n_pairs
           for r in _run(spark, "c92_dedup_threshold_sweep")}
    ref = {thr: sum(1 for j in js if j >= thr)
           for thr in (500000, 600000, 700000, 800000, 900000)}
    assert got == ref


_POISSON_THR = [103548857136060, 207097714272121, 258872142840152,
                276130285696162, 280444821410164, 281307728552965,
                281451546410098, 281472091818260]


def test_c95_matches_python_bootstrap(spark, docs):
    means = []
    for r in range(16):
        sw = swx = 0
        for did, x in zip(docs["doc_id"], docs["n_chars"]):
            u = md5_48(f"{did}-{r}")
            w = next((i for i, t in enumerate(_POISSON_THR) if u < t), 8)
            sw += w
            swx += w * int(x)
        means.append(swx // sw if sw else None)
    n = len(means)
    var = (n * sum(m * m for m in means) - sum(means) ** 2) \
        // (n * (n - 1))
    row = _run(spark, "c95_poisson_bootstrap")[0]
    assert (row.n_reps, row.min_mean, row.max_mean, row.var_est) \
        == (n, min(means), max(means), var)


def test_c96_matches_python_gini(spark, docs):
    got = {r.source: (r.n_docs, r.gini_ppm)
           for r in _run(spark, "c96_gini_concentration")}
    ref = {}
    for src, g in docs.groupby("source"):
        xs = [int(x) for _, x in
              sorted(zip(g["doc_id"], g["n_chars"]),
                     key=lambda t: (t[1], t[0]))]
        n = len(xs)
        sx = sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        ref[src] = (n, (2 * six - (n + 1) * sx) * 1_000_000 // (n * sx))
    assert got == ref


def test_c97_matches_python_needle_sweep(spark, docs):
    top10 = docs.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True]).head(10)
    got = {r.needle_len: (r.n_hits, r.n_docs_hit)
           for r in _run(spark, "c97_decontam_needle_sweep")}
    ref = {}
    for nl in (6, 8, 12, 16, 24):
        hits = 0
        docs_hit = set()
        for _, nrow in top10.iterrows():
            needle = nrow["text"][:nl]
            for did, t in zip(docs["doc_id"], docs["text"]):
                if did != nrow["doc_id"] and needle in t:
                    hits += 1
                    docs_hit.add(did)
        ref[nl] = (hits, len(docs_hit))
    assert got == ref


def test_c86_matches_python_projection(spark, emb):
    got = {(r.vec_id, r.j): r.val
           for r in _run(spark, "c86_jl_projection")}
    # the sign is the first md5 hex BYTE of "(i-1)-j" mod 2
    import hashlib
    ref = {}
    for vid, (v, _) in emb.items():
        q = [math.floor(float(x) * 1_000_000) for x in v]
        for j in range(8):
            tot = 0
            for i, qq in enumerate(q):
                b = int(hashlib.md5(f"{i}-{j}".encode())
                        .hexdigest()[:2], 16)
                tot += qq * (1 - 2 * (b % 2))
            ref[(vid, j)] = tot
    assert got == ref


def test_c89_matches_python_surprise(spark, docs):
    toks = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks.extend((did, w) for w in _words(t))
    vocab = Counter(w for _, w in toks)
    n = len(toks)
    per_doc = defaultdict(lambda: [0, 0])
    for did, w in toks:
        per_doc[did][0] += 1
        per_doc[did][1] += n.bit_length() - vocab[w].bit_length()
    scored = sorted(
        ((s * 1_000_000 // c, did, c, s)
         for did, (c, s) in per_doc.items()),
        key=lambda t: (-t[0], t[1]))[:20]
    rows = _run(spark, "c89_unigram_surprise")
    assert [(r.doc_id, r.n_tokens, r.sum_surprise, r.avg_surprise_ppm)
            for r in rows] == \
        [(did, c, s, a) for a, did, c, s in scored]


def test_c94_matches_python_quantile_norm(spark, docs):
    xs = sorted(zip(docs["n_chars"], docs["doc_id"]))
    gx = [int(x) for x, _ in xs]          # global sorted values
    ng = len(gx)
    ref = defaultdict(lambda: [0, 0, None, None])
    for src, g in docs.groupby("source"):
        vals = sorted(zip(g["n_chars"], g["doc_id"]))
        ns = len(vals)
        for r in range(1, ns + 1):
            m = gx[(r * ng + ns - 1) // ns - 1]   # 1-based gr
            e = ref[src]
            e[0] += 1
            e[1] += m
            e[2] = m if e[2] is None else min(e[2], m)
            e[3] = m if e[3] is None else max(e[3], m)
    got = {r.source: (r.n_docs, r.sum_mapped, r.min_mapped, r.max_mapped)
           for r in _run(spark, "c94_quantile_normalization")}
    assert got == {k: tuple(v) for k, v in ref.items()}
