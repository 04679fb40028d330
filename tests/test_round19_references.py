"""Round-19 reference tests: exact sequential pandas/Counter
recomputations of b184/b185/b186/c150/c151/c152/c153 with the same
truncating integer-ppm arithmetic, plus the structural properties
each audit promises (monotone late-drop and coverage curves,
sketch-vs-exact error bounds, split shares summing to the stratum)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round19 import (
    _CP_WINDOWS, _DT_THRESH_PPM, _HR_ALPHA, _HR_M, _HR_RANK_BITS,
    _SS_TRAIN, _SS_VAL, _VC_KS, _WM_BATCH, _WM_DELAYS_S)

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return re.split(" +", text.strip().lower())


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_b184_matches_python_reference(spark):
    got = (REGISTRY["b184_watermark_delay_audit"].fn(spark, SF)
           .toPandas())
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(batch=ev.event_id // _WM_BATCH,
                   ts_us=ev.ts.astype("int64") // 1000)
    bmax = ev.groupby("batch").ts_us.max().sort_index()
    wm = bmax.cummax().shift(1)  # watermark entering each batch
    lateness = []
    for r in ev.itertuples():
        w = wm.get(r.batch)
        if pd.notna(w) and w > r.ts_us:
            lateness.append(int(w) - int(r.ts_us))
    n = len(ev)
    for row in got.itertuples():
        n_late = sum(1 for L in lateness if L > row.delay_s * 1_000_000)
        assert row.n_events == n
        assert row.n_late == n_late
        assert row.late_ppm == n_late * 1_000_000 // n
    # monotone: a larger delay never drops more events
    assert got.sort_values("delay_s").n_late.is_monotonic_decreasing
    assert got.delay_s.tolist() == _WM_DELAYS_S


def test_b185_matches_pandas_reference(spark):
    got = (REGISTRY["b185_column_profile"].fn(spark, SF)
           .toPandas().set_index("col"))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cols = {
        "l_orderkey": li.l_orderkey,
        "l_quantity": li.l_quantity.astype("int64"),
        "l_price_cents": (li.l_extendedprice * 100).apply(math.floor),
        "l_returnflag": li.l_returnflag,
        "l_linestatus": li.l_linestatus,
        "l_shipdate": li.l_shipdate.dt.date,
    }
    assert sorted(got.index) == sorted(cols)
    for name, s in cols.items():
        row = got.loc[name]
        assert row.n_rows == len(li)
        assert row.n_null == int(s.isna().sum())
        assert row.n_distinct == s.nunique()
        assert str(row.min_v) == str(s.min())
        assert str(row.max_v) == str(s.max())


def _hll_est(regs: dict[int, int]) -> int:
    np_, sp = len(regs), sum(1 << (_HR_RANK_BITS - r)
                             for r in regs.values())
    raw = (_HR_ALPHA * _HR_M * _HR_M * 2.0 ** _HR_RANK_BITS
           / (sp + (_HR_M - np_) * 2.0 ** _HR_RANK_BITS))
    if raw <= 2.5 * _HR_M and np_ < _HR_M:
        return round(_HR_M * math.log(_HR_M / (_HR_M - np_)))
    return round(raw)


def test_b186_matches_python_reference(spark):
    got = (REGISTRY["b186_hll_hierarchy_rollup"].fn(spark, SF)
           .toPandas())
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    r = pd.read_parquet(f"{SF}/region.parquet")
    f = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey")
         .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    two_r = 2 ** _HR_RANK_BITS
    regs: dict[tuple, dict[int, int]] = defaultdict(dict)
    exact: dict[tuple, set] = defaultdict(set)
    for row in f.itertuples():
        hv = _h48(f"u:{row.o_custkey}")
        bucket, rem = hv // two_r, hv % two_r
        m = 1 if rem == 0 else _HR_RANK_BITS + 1 - len(f"{rem:b}")
        for key in (("nation", row.n_name), ("region", row.r_name),
                    ("global", "*")):
            cur = regs[key].get(bucket, 0)
            regs[key][bucket] = max(cur, m)
            exact[key].add(row.o_custkey)
    assert len(got) == len(regs)
    for row in got.itertuples():
        key = (row.level, row.name)
        est, ex = _hll_est(regs[key]), len(exact[key])
        assert row.distinct_est == est
        assert row.distinct_exact == ex
        assert row.err_ppm == abs(est - ex) * 1_000_000 // ex
        # 64 registers -> ~13% standard error; 5x that is a hard
        # bound any correct implementation stays far inside
        assert abs(est - ex) <= max(0.65 * ex, 10)


def _shingles(toks: list[str], n: int = 3) -> set:
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_c150_matches_python_reference(spark, docs):
    got = (REGISTRY["c150_dedup_threshold_curve"].fn(spark, SF)
           .toPandas())
    toks = {int(r.doc_id): _toks(r.text) for r in docs.itertuples()}
    sh = {d: _shingles(t) for d, t in toks.items()}
    inv = defaultdict(set)
    for d, ss in sh.items():
        for s in ss:
            inv[s].add(d)
    cand = set()
    for ds in inv.values():
        ds = sorted(ds)
        cand.update((a, b) for i, a in enumerate(ds) for b in ds[i + 1:])
    jppm = {}
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        j = inter * 1_000_000 // (len(sh[a]) + len(sh[b]) - inter)
        if j >= _DT_THRESH_PPM[0]:
            jppm[(a, b)] = j
    dmax: dict[int, int] = {}
    for (a, b), j in jppm.items():
        dmax[b] = max(dmax.get(b, 0), j)
    n_docs = len(toks)
    for row in got.itertuples():
        t = row.thr_ppm
        n_pairs = sum(1 for j in jppm.values() if j >= t)
        removed = [d for d, j in dmax.items() if j >= t]
        assert row.n_pairs == n_pairs
        assert row.n_docs_removed == len(removed)
        assert row.n_tokens_removed == sum(len(toks[d])
                                           for d in removed)
        assert row.removed_doc_ppm == len(removed) * 1_000_000 // n_docs
    # monotone: a stricter threshold never removes more
    srt = got.sort_values("thr_ppm")
    assert srt.n_pairs.is_monotonic_decreasing
    assert srt.n_docs_removed.is_monotonic_decreasing


def test_c151_matches_python_reference(spark, docs):
    got = (REGISTRY["c151_context_packing_audit"].fn(spark, SF)
           .toPandas().set_index("window_tokens"))
    lens = [len(_toks(r.text)) for r in
            docs.sort_values("doc_id").itertuples()]
    total, nd = sum(lens), len(lens)
    for wsz in _CP_WINDOWS:
        cum = 0
        straddle = frags = 0
        for w in lens:
            cum += w
            fr = (cum - 1) // wsz - (cum - w) // wsz + 1
            frags += fr
            straddle += fr > 1
        row = got.loc[wsz]
        assert row.n_windows == (total + wsz - 1) // wsz
        assert row.n_docs_straddling == straddle
        assert row.straddle_ppm == straddle * 1_000_000 // nd
        assert row.frags_per_doc_milli == frags * 1000 // nd
    # larger windows -> fewer windows and fewer straddles
    assert got.sort_index().n_windows.is_monotonic_decreasing
    assert got.sort_index().n_docs_straddling.is_monotonic_decreasing


def test_c152_matches_python_reference(spark, docs):
    got = (REGISTRY["c152_stratified_split_audit"].fn(spark, SF)
           .toPandas().set_index("lang"))
    per = defaultdict(Counter)
    glob: Counter = Counter()
    for r in docs.itertuples():
        bkt = _h48(f"s:{int(r.doc_id)}") % 1000
        split = ("train" if bkt < _SS_TRAIN
                 else "val" if bkt < _SS_VAL else "test")
        per[r.lang][split] += 1
        glob[split] += 1
    gn = sum(glob.values())
    assert sorted(got.index) == sorted(per)
    for lang, cnt in per.items():
        row = got.loc[lang]
        n = sum(cnt.values())
        assert row.n_docs == n
        assert (row.n_train, row.n_val, row.n_test) == (
            cnt["train"], cnt["val"], cnt["test"])
        dev = max(abs(cnt[s] * 1_000_000 // n
                      - glob[s] * 1_000_000 // gn)
                  for s in ("train", "val", "test"))
        assert row.max_dev_ppm == dev
        # split shares partition the stratum exactly
        assert row.n_train + row.n_val + row.n_test == n


def test_c153_matches_counter_reference(spark, docs):
    got = (REGISTRY["c153_vocab_coverage_curve"].fn(spark, SF)
           .toPandas().set_index("k"))
    uni: Counter = Counter()
    for r in docs.itertuples():
        uni.update(_toks(r.text))
    total = sum(uni.values())
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    for k in _VC_KS:
        cov = sum(c for _, c in ranked[:k])
        row = got.loc[k]
        assert row.vocab_size == len(uni)
        assert row.covered_tokens == cov
        assert row.coverage_ppm == cov * 1_000_000 // total
    # coverage is monotone in k and ends at full mass once k >= vocab
    assert got.sort_index().covered_tokens.is_monotonic_increasing
    if _VC_KS[-1] >= len(uni):
        assert got.loc[_VC_KS[-1]].coverage_ppm == 1_000_000


def test_b187_matches_python_reference(spark):
    got = (REGISTRY["b187_scd2_late_arrival_repair"].fn(spark, SF)
           .toPandas().set_index("event_type"))
    ev = pd.read_parquet(f"{SF}/events.parquet")
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round19 \
        import _LA_DEN, _LA_NUM
    cutoff = (int(ev.event_id.max()) + 1) * _LA_NUM // _LA_DEN
    aff = set(ev.loc[ev.event_id >= cutoff, "user_id"])

    def intervals(df):
        out = set()
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            runs = []
            for r in g.itertuples():
                if not runs or runs[-1][0] != r.event_type:
                    runs.append((r.event_type,
                                 r.ts.value // 1000))
            for i, (et, f) in enumerate(runs):
                t = runs[i + 1][1] if i + 1 < len(runs) else -1
                out.add((uid, et, f, t))
        return out

    sub = ev[ev.user_id.isin(aff)]
    base = intervals(sub[sub.event_id < cutoff])
    full = intervals(sub)
    per = defaultdict(lambda: [0, 0, 0, 0])  # base, rep, add, rem
    for iv in base | full:
        et = iv[1]
        if iv in base:
            per[et][0] += 1
        if iv in full:
            per[et][1] += 1
        if iv in full and iv not in base:
            per[et][2] += 1
        if iv in base and iv not in full:
            per[et][3] += 1
    assert sorted(got.index) == sorted(per)
    for et, (nb, nr, na, nrm) in per.items():
        row = got.loc[et]
        assert (row.n_base, row.n_repaired, row.n_added,
                row.n_removed) == (nb, nr, na, nrm)
        # conservation: repaired = base - removed + added
        assert row.n_repaired == row.n_base - row.n_removed + row.n_added


def _isqrt(n: int) -> int:
    return math.isqrt(n)


def test_c154_matches_python_reference(spark, docs):
    got = (REGISTRY["c154_temperature_mixture_weights"].fn(spark, SF)
           .toPandas().set_index("source"))
    cnt = docs.source.value_counts().to_dict()
    nd = sum(cnt.values())
    tw = sum(_isqrt(n) for n in cnt.values())
    assert sorted(got.index) == sorted(cnt)
    for src, n in cnt.items():
        row = got.loc[src]
        w = _isqrt(n)
        assert row.n_docs == n
        assert row.weight == w
        assert row.raw_share_ppm == n * 1_000_000 // nd
        assert row.sampled_share_ppm == w * 1_000_000 // tw
        assert row.resample_ratio_ppm == (nd * w // tw) * 1_000_000 // n
    # temperature flattening: sampled shares are closer to uniform
    # than raw shares for the extreme sources
    u = 1_000_000 // len(cnt)
    raw_dev = max(abs(r - u) for r in got.raw_share_ppm)
    smp_dev = max(abs(s - u) for s in got.sampled_share_ppm)
    assert smp_dev <= raw_dev
