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


def test_c52_matches_brute_force_triangle_census(spark, docs):
    """Edges from an all-pairs exact-Jaccard scan; wedges from the
    degree sequence; triangles by sorted-adjacency intersection —
    no joins, no SQL."""
    row = REGISTRY["c52_triangle_census"].fn(spark, SF_SMALL).collect()[0]
    sh = {int(r.doc_id): _shingles3(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    adj: dict[int, set[int]] = {i: set() for i in ids}
    n_edges = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter / union >= 0.5:
                adj[a].add(b)
                adj[b].add(a)
                n_edges += 1
    linked = [d for d in ids if adj[d]]
    wedges = sum(len(adj[d]) * (len(adj[d]) - 1) // 2 for d in linked)
    tri = 0
    for a in linked:
        for b in adj[a]:
            if b > a:
                tri += sum(1 for c in (adj[a] & adj[b]) if c > b)
    assert row["n_docs"] == len(ids)
    assert row["n_linked_docs"] == len(linked)
    assert row["n_edges"] == n_edges
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    assert row["clustering_ppm"] == (3 * tri * 1_000_000 // wedges
                                     if wedges else None)


def test_c62_matches_python_structure_groups(spark, docs):
    """Length-pattern template groups rebuilt with a plain dict keyed
    by the first-6-token length tuple (NOT lowered — the signature is
    over trim(text) only)."""
    import hashlib
    got = {r["structure_sig"]: r for r in
           REGISTRY["c62_template_detection"].fn(spark, SF_SMALL)
           .collect()}
    groups: dict[str, list] = {}
    for r in docs.itertuples():
        toks = re.split(" +", r.text.strip(" "))
        sig = hashlib.md5(",".join(
            str(len(t)) for t in toks[:6]).encode()).hexdigest()
        groups.setdefault(sig, []).append((int(r.doc_id), r.text))
    want = {sig: g for sig, g in groups.items()
            if len(g) >= 2 and len({t for _, t in g}) > 1}
    assert set(got) == set(want)
    for sig, g in want.items():
        assert got[sig]["n_docs"] == len(g)
        assert got[sig]["n_variants"] == len({t for _, t in g})
        assert got[sig]["example_doc_id"] == min(d for d, _ in g)


def test_c64_matches_python_source_sets(spark, docs):
    """Source-level shingle-set Jaccard matrix from plain set unions."""
    got = {(r["src1"], r["src2"]): (r["n_common"], r["jaccard_ppm"])
           for r in REGISTRY["c64_source_overlap_matrix"]
           .fn(spark, SF_SMALL).collect()}
    per_src: dict[str, set] = {}
    for r in docs.itertuples():
        per_src.setdefault(r.source, set()).update(_shingles3(r.text))
    srcs = sorted(per_src)
    want = {}
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1:]:
            inter = len(per_src[s1] & per_src[s2])
            union = len(per_src[s1]) + len(per_src[s2]) - inter
            ppm = inter * 1_000_000 // union
            if ppm >= 10_000:
                want[(s1, s2)] = (inter, ppm)
    assert got == want


def test_c68_matches_counter_skipgrams(spark, docs):
    """Distance-1 and distance-2 token pairs counted with a Counter,
    top-20 by (count desc, pair)."""
    got = [(r["pair"], r["n_cooc"]) for r in
           REGISTRY["c68_skipgram_pairs"].fn(spark, SF_SMALL).collect()]
    c: Counter = Counter()
    for r in docs.itertuples():
        toks = _toks(r.text)
        c.update(f"{a}|{b}" for a, b in zip(toks, toks[1:]))
        c.update(f"{a}|{b}" for a, b in zip(toks, toks[2:]))
    want = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:20]
    assert got == want


def test_c74_matches_python_fingerprint_groups(spark, docs):
    """Cross-language duplicate pairs from a dict keyed by the
    sorted-distinct-token fingerprint."""
    got = {(r["lang1"], r["lang2"]): (r["n_pairs"], r["example_doc1"])
           for r in REGISTRY["c74_cross_lang_dups"]
           .fn(spark, SF_SMALL).collect()}
    groups: dict[str, list] = {}
    for r in docs.itertuples():
        fp = " ".join(sorted(set(_toks(r.text))))
        groups.setdefault(fp, []).append((int(r.doc_id), r.lang))
    want: dict = {}
    for g in groups.values():
        for d1, l1 in g:
            for d2, l2 in g:
                if l1 < l2:
                    n, ex = want.get((l1, l2), (0, None))
                    want[(l1, l2)] = (n + 1,
                                      d1 if ex is None else min(ex, d1))
    assert got == want


def test_c76_matches_python_bigint_covariance(spark):
    """Scaled covariance n*Sxy - Sx*Sy per dimension pair with exact
    Python big ints over the quantized embedding grid."""
    got = [(r["d1"], r["d2"], r["cov_scaled"]) for r in
           REGISTRY["c76_feature_covariance"].fn(spark, SF_SMALL)
           .collect()]
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = [[math.floor(float(x) * 1_000_000) for x in r.embedding]
            for r in emb.itertuples()]
    n = len(vecs)
    dims = len(vecs[0])
    cov = []
    for i in range(dims):
        for j in range(i + 1, dims):
            sx = sum(v[i] for v in vecs)
            sy = sum(v[j] for v in vecs)
            sxy = sum(v[i] * v[j] for v in vecs)
            cov.append((i + 1, j + 1, n * sxy - sx * sy))
    cov.sort(key=lambda t: (-abs(t[2]), t[0], t[1]))
    assert got == cov[:10]
