"""Round-18 reference tests: exact sequential pandas/Counter
recomputations of c146/c147/c148/b181/b182 with the same truncating
integer-ppm arithmetic, plus the structural properties each audit
promises (monotone vocab growth, non-increasing session breaks,
probability-mass closure of the EMD cumsum)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round18 import (
    _GT_MAX_R, _HP_LEVELS, _KM_DAY_US, _PMI_MIN_C, _PMI_TOPK, _ST_BANDS,
    _TAXONOMY, _TC_BUCKET)

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return re.split(" +", text.strip().lower())


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_c146_matches_python_reference(spark, docs):
    got = (REGISTRY["c146_heaps_law_vocab_growth"].fn(spark, SF)
           .toPandas())
    toks = {int(r.doc_id): _toks(r.text) for r in docs.itertuples()}
    first = {}
    for did in sorted(toks):
        for w in toks[did]:
            first.setdefault(w, did)
    rows, pv, pt = [], None, None
    nd = nt = vc = 0
    for lvl, lo, hi in _HP_LEVELS:
        ids = [d for d in toks if lo <= d < hi]
        if not ids:
            continue
        nd += len(ids)
        nt += sum(len(toks[d]) for d in ids)
        vc += sum(1 for w, fd in first.items() if lo <= fd < hi)
        rows.append((lvl, hi, nd, nt, vc,
                     None if pv is None else vc * 1000000 // pv,
                     None if pt is None else nt * 1000000 // pt))
        pv, pt = vc, nt
    ref = pd.DataFrame(rows, columns=got.columns)
    assert got.lvl.tolist() == ref.lvl.tolist()
    assert got.vocab.tolist() == ref.vocab.tolist()
    assert got.n_docs.tolist() == ref.n_docs.tolist()
    assert got.n_tokens.tolist() == ref.n_tokens.tolist()
    assert (got.vocab_ratio_ppm.fillna(-1).astype(int).tolist()
            == ref.vocab_ratio_ppm.fillna(-1).astype(int).tolist())
    assert (got.token_ratio_ppm.fillna(-1).astype(int).tolist()
            == ref.token_ratio_ppm.fillna(-1).astype(int).tolist())
    # Heaps: vocabulary never shrinks, and grows sublinearly in
    # tokens once past the first checkpoints (ratio < token ratio)
    assert got.vocab.is_monotonic_increasing
    tail = got.dropna()
    assert (tail.vocab_ratio_ppm <= tail.token_ratio_ppm).all()


def test_c147_matches_counter_reference(spark, docs):
    got = REGISTRY["c147_pmi_collocations"].fn(spark, SF).toPandas()
    uni: Counter = Counter()
    bg: Counter = Counter()
    for r in docs.itertuples():
        t = _toks(r.text)
        uni.update(t)
        bg.update(zip(t, t[1:]))
    n = sum(uni.values())
    scored = [(w1, w2, c, uni[w1], uni[w2],
               c * n * 1000000 // (uni[w1] * uni[w2]))
              for (w1, w2), c in bg.items() if c >= _PMI_MIN_C]
    scored.sort(key=lambda r: (-r[5], r[0], r[1]))
    ref = scored[:_PMI_TOPK]
    assert [tuple(r) for r in got.itertuples(index=False)] == ref


def test_c148_matches_counter_reference(spark, docs):
    got = (REGISTRY["c148_taxonomy_keyword_tagging"].fn(spark, SF)
           .toPandas().set_index("topic"))
    tax = dict(_TAXONOMY)
    n_docs_tot = len(docs)
    prim: Counter = Counter()
    prim_hits: Counter = Counter()
    tot: Counter = Counter()
    for r in docs.itertuples():
        hits: Counter = Counter(tax[w] for w in _toks(r.text)
                                if w in tax)
        tot.update(hits)
        if hits:
            top = min(hits.items(), key=lambda kv: (-kv[1], kv[0]))
            prim[top[0]] += 1
            prim_hits[top[0]] += top[1]
        else:
            prim["untagged"] += 1
    for topic in got.index:
        assert got.loc[topic, "n_docs"] == prim[topic]
        assert (got.loc[topic, "share_ppm"]
                == prim[topic] * 1000000 // n_docs_tot)
        assert got.loc[topic, "primary_hits"] == prim_hits[topic]
        assert got.loc[topic, "total_hits"] == tot[topic]
    assert int(got.n_docs.sum()) == n_docs_tot


def test_b181_matches_python_reference(spark):
    got = (REGISTRY["b181_t_closeness_audit"].fn(spark, SF)
           .toPandas().set_index(["n_name", "c_mktsegment"]))
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_nationkey",
                                 "c_mktsegment"])
    nat = pd.read_parquet(f"{SF}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    j = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    j["bkt"] = (j.o_totalprice // _TC_BUCKET).astype(int)
    gb = j.groupby("bkt").size()
    n, m = len(j), len(gb)
    for (nn, seg), g in j.groupby(["n_name", "c_mktsegment"]):
        cnts = g.groupby("bkt").size()
        n_grp = len(g)
        cum, acc = 0, 0
        for b in sorted(gb.index):
            cum += (int(cnts.get(b, 0)) * 1000000 // n_grp
                    - int(gb[b]) * 1000000 // n)
            acc += abs(cum)
        t_ppm = acc // (m - 1)
        assert got.loc[(nn, seg), "n_rows"] == n_grp
        assert got.loc[(nn, seg), "t_ppm"] == t_ppm
    # mass closure: the final cumulative difference is bounded by the
    # ppm truncation error (|buckets| ulps per side), so no group's
    # t can exceed 1e6
    assert (got.t_ppm < 1_000_000).all()


def test_b182_matches_python_reference(spark):
    got = (REGISTRY["b182_session_threshold_audit"].fn(spark, SF)
           .toPandas().set_index("thr_s"))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    # normalize to datetime64[us] FIRST (pandas may surface parquet
    # timestamps as ns or us depending on the writer), then int64 is
    # epoch-us; ~1.7e15 is exact in the NaN-introducing float shift
    ev["ts_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["gap"] = ev.ts_us - ev.groupby("user_id").ts_us.shift()
    gaps = ev.gap.dropna().astype(int)
    n_users = ev.user_id.nunique()
    n_gaps = len(gaps)
    for band, lo_us, _hi in _ST_BANDS:
        if band == 0:
            continue
        n_breaks = int((gaps >= lo_us).sum())
        thr = lo_us // 1_000_000
        assert got.loc[thr, "n_gaps"] == n_gaps
        assert got.loc[thr, "n_breaks"] == n_breaks
        assert got.loc[thr, "n_sessions"] == n_users + n_breaks
        assert (got.loc[thr, "split_ppm"]
                == n_breaks * 1000000 // n_gaps)
        assert (got.loc[thr, "sessions_per_user_milli"]
                == (n_users + n_breaks) * 1000 // n_users)
    # more sessions at tighter thresholds, never fewer
    assert got.n_breaks.is_monotonic_decreasing


def test_c149_matches_counter_reference(spark, docs):
    got = (REGISTRY["c149_good_turing_unseen_mass"].fn(spark, SF)
           .toPandas().set_index("r_class"))
    cw: Counter = Counter()
    for r in docs.itertuples():
        cw.update(_toks(r.text))
    n = sum(cw.values())
    coc: Counter = Counter()
    mass: Counter = Counter()
    for _w, c in cw.items():
        r_class = c if c <= _GT_MAX_R else _GT_MAX_R + 1
        coc[r_class] += 1
        mass[r_class] += c
    for r_class in got.index:
        assert got.loc[r_class, "n_words"] == coc[r_class]
        assert got.loc[r_class, "mass"] == mass[r_class]
        assert (got.loc[r_class, "mass_ppm"]
                == mass[r_class] * 1000000 // n)
        exp = (((r_class + 1) * coc[r_class + 1] * 1000000
                // coc[r_class])
               if r_class <= _GT_MAX_R - 1 and coc[r_class + 1] else None)
        v = got.loc[r_class, "gt_rstar_ppm"]
        assert (pd.isna(v) and exp is None) or int(v) == exp
    # GT identity: per-class mass == r_class * n_words for r <= 10
    head = got.loc[got.index <= _GT_MAX_R]
    assert (head.mass == head.index * head.n_words).all()


def test_b183_matches_python_reference(spark):
    got = (REGISTRY["b183_conversion_hazard"].fn(spark, SF)
           .toPandas().set_index("lag_d"))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    ev["ts_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    horizon = int(ev.ts_us.max())
    su = (ev[ev.event_type == "signup"]
          .groupby("user_id").ts_us.min())
    lags, convs = [], []
    pur = ev[ev.event_type == "purchase"]
    for uid, s in su.items():
        p = pur[(pur.user_id == uid) & (pur.ts_us >= s)].ts_us
        if len(p):
            lags.append((int(p.min()) - int(s)) // _KM_DAY_US)
            convs.append(1)
        else:
            lags.append((horizon - int(s)) // _KM_DAY_US)
            convs.append(0)
    lab = pd.DataFrame({"lag_d": lags, "conv": convs})
    n_total = len(lab)
    exited = 0
    for d in sorted(lab.lag_d.unique()):
        sel = lab[lab.lag_d == d]
        at_risk = n_total - exited
        assert got.loc[d, "n_at_risk"] == at_risk
        assert got.loc[d, "n_converted"] == int(sel.conv.sum())
        assert got.loc[d, "n_censored"] == int((1 - sel.conv).sum())
        assert (got.loc[d, "hazard_ppm"]
                == int(sel.conv.sum()) * 1000000 // at_risk)
        exited += len(sel)
    # every cohort member exits exactly once
    assert int(got.n_converted.sum() + got.n_censored.sum()) == n_total
    # the risk set is strictly decreasing across event days
    assert got.n_at_risk.is_monotonic_decreasing
