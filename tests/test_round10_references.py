"""Independent-reimplementation references for the round-10 queries.

The DuckDB oracles deliberately mirror each query's algorithm so the
value-hash pins cross-ENGINE parity — but an algorithmic error both
sides share would sail through.  These tests recompute the answers
with UNRELATED implementations (pandas.merge_asof, a pure-Python
sweep line, hashlib md5, collections.Counter math) on the same
sf0.001 parquet, so the algorithm itself is cross-checked, not just
its translation.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from tests.conftest import SF_SMALL
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_b151_matches_pandas_merge_asof(spark):
    """pandas.merge_asof(direction='nearest', tolerance=10min,
    by=user) is the de-facto reference for nearest-as-of semantics —
    including backward preference on |dt| ties and last-at-equal-key
    (max id) intra-tie resolution when the right side is sorted by
    (ts, id)."""
    got = {r["event_id"]: r["matched_id"] for r in
           REGISTRY["b151_asof_tolerance_nearest"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e = (ev[ev.event_type == "error"][["event_id", "user_id", "ts"]]
         .sort_values(["ts", "event_id"]).reset_index(drop=True))
    p = (ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
         .sort_values(["ts", "event_id"]).reset_index(drop=True))
    m = pd.merge_asof(e, p, on="ts", by="user_id", direction="nearest",
                      tolerance=pd.Timedelta("10min"), suffixes=("", "_p"))
    assert len(m) == len(got) > 0
    for _, row in m.iterrows():
        want = None if pd.isna(row.event_id_p) else int(row.event_id_p)
        assert got[int(row.event_id)] == want, int(row.event_id)


def test_b152_matches_sweep_line_union(spark):
    """Classic sort-and-sweep interval union per user (no windows, no
    SQL) must reproduce covered_s / n_islands for every emitted
    user."""
    out = {r["user_id"]: r for r in
           REGISTRY["b152_interval_union_coverage"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    v = ev[ev.event_type == "view"]
    per_user = defaultdict(list)
    for _, r in v.iterrows():
        s = r.ts.value // 1000  # ns -> us
        per_user[int(r.user_id)].append(
            (s, s + math.floor(r.value * 60) * 1_000_000))
    ref = {}
    for u, ivs in per_user.items():
        ivs.sort()
        islands, cur_s, cur_e = [], None, None
        for s, e in ivs:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    islands.append(cur_e - cur_s)
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append(cur_e - cur_s)
        ref[u] = (len(islands), sum(islands) // 1_000_000)
    for u, row in out.items():
        n_islands, covered_s = ref[u]
        assert row["n_islands"] == n_islands, u
        assert row["covered_s"] == covered_s, u


def test_b149_matches_python_midrank_reference(spark):
    """Pure-Python midrank-CDF + decile binning over the same
    documents; integer ppm arithmetic reproduced with // division."""
    out = {r["bin"]: r for r in
           REGISTRY["b149_ece_calibration_bins"].fn(spark, SF_SMALL)
           .collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    hist = sorted(
        (nc, len(g), int((g.lang == "en").sum()))
        for nc, g in d.groupby("n_chars"))
    n_total = sum(c for _, c, _ in hist)
    bins = defaultdict(lambda: [0, 0, 0])  # n, pos, conf_ppm*cnt
    below = 0
    for _, cnt, pos in hist:
        conf_ppm = (2 * below + cnt) * 1_000_000 // (2 * n_total)
        b = conf_ppm // 100_000
        bins[b][0] += cnt
        bins[b][1] += pos
        bins[b][2] += conf_ppm * cnt
        below += cnt
    assert set(out) == set(bins)
    for b, (n, pos, confsum) in bins.items():
        assert out[b]["n_docs"] == n
        assert out[b]["mean_label_ppm"] == pos * 1_000_000 // n
        assert out[b]["mean_conf_ppm"] == confsum // n
        assert out[b]["gap_ppm"] == abs(pos * 1_000_000 // n
                                        - confsum // n)


def test_c131_matches_python_contingency_reference(spark):
    """Counter-based purity and MI over the same embeddings; the MI
    column is compared in exact integer nanonats (same per-cell
    rounding rule)."""
    out = {r["cluster"]: r for r in
           REGISTRY["c131_cluster_purity_mi"].fn(spark, SF_SMALL)
           .collect()}
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    cells = Counter()
    for _, r in e.iterrows():
        em = r.embedding
        c = (4 * (em[0] > 0)) + (2 * (em[1] > 0)) + (em[2] > 0)
        cells[(int(c), int(r.label))] += 1
    n = sum(cells.values())
    n_c = Counter()
    n_l = Counter()
    for (c, l), v in cells.items():
        n_c[c] += v
        n_l[l] += v
    for c in n_c:
        members = {l: v for (cc, l), v in cells.items() if cc == c}
        top_label = min(l for l, v in members.items()
                        if v == max(members.values()))
        mi9 = sum(
            round((v / n) * math.log((n * v) / (n_c[c] * n_l[l]))
                  * 1e9)
            for l, v in members.items())
        assert out[c]["n"] == n_c[c]
        assert out[c]["top_label"] == top_label
        assert out[c]["purity_ppm"] == members[top_label] * 1_000_000 \
            // n_c[c]
        assert out[c]["mi_nanonats"] == mi9, c


def test_c130_matches_python_jsd_reference(spark):
    """Counter-based smoothed JSD per language pair; compared at
    1e-6 relative tolerance (the engine output sums PER-TOKEN-ROUNDED
    nanonat terms, the reference sums unrounded floats)."""
    out = {(r["lang_a"], r["lang_b"]): r for r in
           REGISTRY["c130_jsd_lang_divergence"].fn(spark, SF_SMALL)
           .collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    counts = defaultdict(Counter)
    for _, r in d.iterrows():
        for tk in re.split(r"[^a-z]+", r.text.lower()):
            if len(tk) >= 2:
                counts[r.lang][tk] += 1
    vocab = set().union(*counts.values())
    v = len(vocab)
    totals = {lng: sum(c.values()) for lng, c in counts.items()}
    for (a, b), row in out.items():
        jsd = 0.0
        for tk in vocab:
            p = (counts[a][tk] + 1) / (totals[a] + v)
            q = (counts[b][tk] + 1) / (totals[b] + v)
            m = 0.5 * (p + q)
            jsd += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        ref = jsd * 1e9
        assert abs(row["jsd_nanonats"] - ref) <= max(1e-6 * ref, 5e3), \
            (a, b, row["jsd_nanonats"], ref)
        assert row["n_tok_a"] == totals[a]
        assert row["n_tok_b"] == totals[b]
        assert row["vocab"] == v


def test_b153_matches_python_hll_reference(spark):
    """hashlib-md5 reimplementation of the portable HLL: identical
    hash, buckets, ranks, register maxes, and the exact same final
    estimate expression — full-row integer equality."""
    row = (REGISTRY["b153_hll_portable_sketch"].fn(spark, SF_SMALL)
           .collect()[0])
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    regs = {}
    days = set()
    users = set()
    for _, r in ev.iterrows():
        days.add(r.ts.date())
        users.add(int(r.user_id))
        h = _md5_48(f"u:{int(r.user_id)}")
        bucket, rem = divmod(h, 2 ** 42)
        # rem == 0 folds into the max register (rank clamp: keeps the
        # engine-side shift 42 - m non-negative; see ADVICE r05)
        m = min(42, 43 - rem.bit_length())
        regs[bucket] = max(regs.get(bucket, 0), m)
    n_present = len(regs)
    s = sum(1 << (42 - rr) for rr in regs.values())
    raw = (0.709 * 64 * 64 * 2.0 ** 42) / (float(s)
                                           + (64 - n_present) * 2.0 ** 42)
    if raw <= 160.0 and n_present < 64:
        est = round(64.0 * math.log(64.0 / (64 - n_present)))
    else:
        est = round(raw)
    assert row["n_partials"] == len(days)
    assert row["n_registers"] == n_present
    assert row["distinct_est"] == est
    assert row["distinct_exact"] == len(users)
    assert row["err_ppm"] == abs(est - len(users)) * 1_000_000 \
        // len(users)
