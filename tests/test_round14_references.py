"""Independent-reimplementation references for the round-14 batch
(b168, b169, c138) — pure-Python/pandas recomputations independent of
both the Spark implementation and the mirrored DuckDB oracle.
"""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import round_half_up, tdiv
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


# --------------------------------------------------------------- b168

def test_b168_matches_python_split_scan(spark):
    """Every candidate split's gain recomputed with an explicit
    per-split slice (no prefix sums), same IEEE double formula."""
    ev = _events()
    daily = (ev.assign(day=ev.ts.dt.date,
                       cents=(ev.value * 100).apply(math.floor))
             .groupby("day")["cents"].sum().sort_index())
    vals = daily.to_numpy()
    days = [d.strftime("%Y-%m-%d") for d in daily.index]
    n = len(vals)
    want = {}
    for k in range(1, n):
        s1, s2 = int(vals[:k].sum()), int(vals[k:].sum())
        a = float(s1 * (n - k) - s2 * k)
        gain = round_half_up(a * a / (float(k) * (n - k) * n), 3)
        want[days[k - 1]] = (k, n - k, s1, s2, gain)
    best_gain = max(g for *_, g in want.values())
    best_day = min(d for d, v in want.items() if v[4] == best_gain)

    rows = (REGISTRY["b168_changepoint_binary_segmentation"]
            .fn(spark, SF_SMALL).collect())
    assert len(rows) == n - 1
    for r in rows:
        k, nk, s1, s2, gain = want[r.split_day]
        assert (r.n_before, r.n_after) == (k, nk)
        assert (r.sum_before_cents, r.sum_after_cents) == (s1, s2)
        assert r.gain == gain
        assert r.is_best == (1 if r.split_day == best_day else 0)
    assert sum(r.is_best for r in rows) == 1


# --------------------------------------------------------------- b169

def test_b169_matches_pandas_partition_stats(spark):
    ev = _events()
    lo, hi = pd.Timestamp("2024-01-08"), pd.Timestamp("2024-01-15")
    hit = (ev.ts >= lo) & (ev.ts < hi)

    def audit(part):
        g = pd.DataFrame({"part": part, "hit": hit}).groupby("part")
        cnt, hits = g.size(), g["hit"].sum()
        touched = hits > 0
        total = int(cnt.sum())
        scanned = int(cnt[touched].sum())
        return {
            "n_partitions": len(cnt),
            "rows_total": total,
            "max_part_ppm": int(cnt.max()) * 1_000_000 // total,
            "parts_touched": int(touched.sum()),
            "scan_ppm": scanned * 1_000_000 // total,
            "scan_precision_ppm":
                int(hits.sum()) * 1_000_000 // max(scanned, 1),
        }

    want = {"bucket16_user": audit(ev.user_id % 16),
            "day_ts": audit(ev.ts.dt.date),
            "type": audit(ev.event_type)}
    rows = (REGISTRY["b169_partition_transform_audit"]
            .fn(spark, SF_SMALL).collect())
    assert {r.transform for r in rows} == set(want)
    for r in rows:
        w = want[r.transform]
        assert {k: getattr(r, k) for k in w} == w, r.transform
    by = {r.transform: r for r in rows}
    # the decision the audit exists for: day(ts) prunes the time
    # workload (reads less than the whole table at full precision);
    # the user-bucket transform cannot prune it at all
    assert by["day_ts"].scan_ppm < 1_000_000
    assert by["day_ts"].scan_precision_ppm == 1_000_000
    assert by["bucket16_user"].scan_ppm == 1_000_000


# --------------------------------------------------------------- c138

def test_c138_matches_python_greedy(spark):
    """The greedy max-coverage picks recomputed with explicit Python
    set algebra over the same shingle universe."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    sh = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.strip().lower().split(" ") if t != ""]
        grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if grams:
            sh[int(doc_id)] = grams
    total = len(set().union(*sh.values()))
    covered: set = set()
    want = []
    avail = dict(sh)
    for rank in range(1, 6):
        best = max(avail.items(),
                   key=lambda kv: (len(kv[1] - covered), -kv[0]))
        doc_id, gain = best[0], len(best[1] - covered)
        covered |= best[1]
        del avail[doc_id]
        want.append((rank, doc_id, gain,
                     len(covered) * 1_000_000 // total))
    rows = (REGISTRY["c138_greedy_max_coverage_selection"]
            .fn(spark, SF_SMALL).collect())
    got = [(r.pick_rank, r.doc_id, r.gain, r.coverage_ppm)
           for r in rows]
    assert got == want
    # submodularity: marginal gains never increase down the ranking
    gains = [g for *_, g, _ in got]
    assert gains == sorted(gains, reverse=True)
    # coverage is monotone and <= 1e6
    cov = [c for *_, c in got]
    assert cov == sorted(cov) and cov[-1] <= 1_000_000

# --------------------------------------------------------------- c139

def test_c139_matches_python_kappa(spark):
    """Kappa recomputed from the engine's own confusion relation with
    sklearn-formula arithmetic in exact integers."""
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
        REGISTRY as R)
    pred = [(r.lang, r.lang_pred)
            for r in R["c03c_lang_id"].fn(spark, SF_SMALL).collect()]
    n = len(pred)
    agree = sum(1 for g, p in pred if g == p)
    from collections import Counter
    gold = Counter(g for g, _ in pred)
    pr = Counter(p for _, p in pred)
    # per-class ppm marginals (ADVICE r08): each factor <= 1e6, so the
    # product sum stays inside int64 at any doc count — the naive
    # pe_num * 1e6 / N^2 form overflows past ~3M docs
    po_ppm = agree * 1_000_000 // n
    pe_ppm = sum((gold[c] * 1_000_000 // n)
                 * (pr[c] * 1_000_000 // n)
                 for c in gold if c in pr) // 1_000_000
    # tdiv: kappa can be NEGATIVE (sub-chance agreement) and Spark
    # div / DuckDB // truncate toward zero, unlike Python's floor
    kappa_ppm = tdiv((po_ppm - pe_ppm) * 1_000_000,
                     1_000_000 - pe_ppm)
    row = (R["c139_cohens_kappa_langid"]
           .fn(spark, SF_SMALL).collect())[0]
    assert (row.n_docs, row.n_agree) == (n, agree)
    assert (row.po_ppm, row.pe_ppm, row.kappa_ppm) == \
        (po_ppm, pe_ppm, kappa_ppm)
    # the metric's reason to exist: chance-corrected <= raw accuracy
    assert row.kappa_ppm <= row.po_ppm


# --------------------------------------------------------------- b170

def test_b170_matches_python_bloom(spark):
    """The runtime-filter audit recomputed with an explicit Python
    bloom (same salted md5-48 positions) over pandas relations."""
    import hashlib

    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_orderkey"])
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    sel = orders[(orders.o_orderpriority == "1-URGENT")
                 & (orders.o_orderdate >= pd.Timestamp("1997-01-01"))
                 & (orders.o_orderdate < pd.Timestamp("1998-01-01"))]
    build = {int(k) for k in sel.o_orderkey}

    def pos(j, key):
        h = hashlib.md5(f"{j}#{key}".encode()).hexdigest()[:12]
        return int(h, 16) % 16384

    bits = {pos(j, k) for k in build for j in range(4)}
    probe = li.groupby("l_orderkey").size()
    probe_rows = int(probe.sum())
    exact = int(probe[probe.index.isin(build)].sum())
    pass_rows = false_rows = 0
    for key, nrows in probe.items():
        if all(pos(j, int(key)) in bits for j in range(4)):
            pass_rows += int(nrows)
            if int(key) not in build:
                false_rows += int(nrows)
    r = (REGISTRY["b170_runtime_filter_reduction_audit"]
         .fn(spark, SF_SMALL).collect())[0]
    assert (r.probe_rows, r.probe_keys) == (probe_rows, len(probe))
    assert (r.build_keys, r.bits_set) == (len(build), len(bits))
    assert (r.exact_rows, r.pass_rows, r.false_pass_rows) == \
        (exact, pass_rows, false_rows)
    assert r.reduction_ppm == \
        (probe_rows - pass_rows) * 1_000_000 // probe_rows
    assert r.bit_density_ppm == len(bits) * 1_000_000 // 16384
    # correctness property of any bloom: no false negatives
    assert r.pass_rows >= r.exact_rows
