"""Independent-reimplementation references for the c5x-c7x curation
tier — the cohort entering the r06 driver window.  Each test
recomputes the full metric with plain Python/pandas (sets, Counter,
sorted lists) on sf0.001, failure-independent of both the Spark
implementation and the mirrored DuckDB oracle.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def _toks(text: str) -> list[str]:
    return re.split(" +", text.lower().strip())


def _shingles3(text: str) -> set[str]:
    t = _toks(text)
    return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}


def test_c51_matches_python_pair_scan(spark, docs):
    """Per-source dup rate recomputed from an all-pairs exact Jaccard
    scan over 3-shingle sets."""
    sh = {int(r.doc_id): _shingles3(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    paired = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                paired.update((a, b))
    assert len(paired) >= 10  # not vacuous at sf0.001
    ref = {}
    for src, grp in docs.groupby("source"):
        n = len(grp)
        nd = sum(int(d) in paired for d in grp["doc_id"])
        ref[src] = (n, nd, nd * 1_000_000 // n)
    got = {r.source: (r.n_docs, r.n_duplicated, r.dup_ppm) for r in
           REGISTRY["c51_source_dup_rate"].fn(spark, SF_SMALL).collect()}
    assert got == ref


def test_c60_matches_python_substring_scan(spark, docs):
    """Needle containment counts recomputed with plain `in`."""
    top = docs.sort_values(["n_chars", "doc_id"],
                           ascending=[False, True]).head(10)
    ref = {}
    for r in top.itertuples():
        needle = r.text[:12]
        ref[(int(r.doc_id), needle)] = sum(
            needle in d.text for d in docs.itertuples()
            if int(d.doc_id) != int(r.doc_id))
    got = {(r.src_id, r.needle): r.n_contaminated for r in
           REGISTRY["c60_exact_substring_decontam"]
           .fn(spark, SF_SMALL).collect()}
    assert got == ref
    assert sum(ref.values()) > 0  # at least one real contamination


def test_c69_matches_counter_bigrams(spark, docs):
    """Hapax rate per source from a Counter over non-distinct
    bigrams."""
    ref = {}
    for src, grp in docs.groupby("source"):
        c = Counter()
        for r in grp.itertuples():
            t = _toks(r.text)
            c.update(" ".join(t[i:i + 2]) for i in range(len(t) - 1))
        vocab = len(c)
        hapax = sum(1 for n in c.values() if n == 1)
        ref[src] = (vocab, hapax, hapax * 1_000_000 // vocab)
    got = {r.source: (r.vocab_size, r.n_hapax, r.hapax_ppm) for r in
           REGISTRY["c69_hapax_rate"].fn(spark, SF_SMALL).collect()}
    assert got == ref


def test_c71_matches_sorted_list_winsorization(spark):
    """Winsorized mean recomputed from explicit sorted lists with the
    1-based ceil(n*p) discrete-quantile convention."""
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet",
                         columns=["event_type", "value"])
    ev["cents"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    ref = {}
    for et, grp in ev.groupby("event_type"):
        vals = sorted(grp["cents"])
        n = len(vals)
        lo = vals[math.ceil(n * 0.05) - 1]
        hi = vals[math.ceil(n * 0.95) - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        ref[et] = (n, sum(v < lo for v in vals),
                   sum(v > hi for v in vals), sum(clamped) // n)
    got = {r.event_type: (r.n, r.n_clamped_low, r.n_clamped_high,
                          r.winsorized_mean_cents) for r in
           REGISTRY["c71_winsorized_mean"].fn(spark, SF_SMALL).collect()}
    assert got == ref


def test_c73_matches_python_tv_distance(spark, docs):
    """Total-variation drift recomputed with dict histograms and the
    exact truncating-ppm arithmetic, including zero-count bands."""
    def band(text: str) -> int:
        return min(len(re.split(" +", text.strip())) // 10, 9)

    per_src: dict[str, Counter] = {}
    corpus = Counter()
    for r in docs.itertuples():
        b = band(r.text)
        per_src.setdefault(r.source, Counter())[b] += 1
        corpus[b] += 1
    ctot = sum(corpus.values())
    ref = {}
    for src, hist in per_src.items():
        tot = sum(hist.values())
        ref[src] = sum(
            abs(hist.get(b, 0) * 1_000_000 // tot
                - cn * 1_000_000 // ctot)
            for b, cn in corpus.items())
    got = {r.source: r.tv_x2_ppm for r in
           REGISTRY["c73_distribution_drift_tv"]
           .fn(spark, SF_SMALL).collect()}
    assert got == ref
