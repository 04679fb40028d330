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

from tests.conftest import round_half_up, tdiv
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


def test_c57_matches_rational_percentiles(spark, docs):
    """Type-7 interpolated percentiles recomputed with exact
    Fractions; band membership is decided rationally (integer chars
    vs a rational edge), so the kept counts are exact."""
    from fractions import Fraction
    out = {r["lang"]: r for r in
           REGISTRY["c57_length_percentile_filter"].fn(spark, SF_SMALL)
           .collect()}
    for lang, g in docs.groupby("lang"):
        vals = sorted(int(x) for x in g.n_chars)
        n = len(vals)

        def pct(p: Fraction) -> Fraction:
            rank = p * (n - 1)
            lo_i = rank.numerator // rank.denominator
            frac = rank - lo_i
            if lo_i + 1 >= n:
                return Fraction(vals[-1])
            return vals[lo_i] + frac * (vals[lo_i + 1] - vals[lo_i])

        lo, hi = pct(Fraction(1, 20)), pct(Fraction(19, 20))
        kept = [v for v in vals if lo <= v <= hi]
        row = out[lang]
        assert abs(row["lo"] - float(lo)) < 1e-6
        assert abs(row["hi"] - float(hi)) < 1e-6
        assert row["n_docs"] == n
        assert row["n_kept"] == len(kept)
        assert row["kept_chars"] == sum(kept)


def test_c67_matches_python_loo_encoding(spark):
    """Leave-one-out target encoding recomputed with plain loops and
    truncating integer division."""
    out = {r["event_type"]: r for r in
           REGISTRY["c67_target_encoding"].fn(spark, SF_SMALL)
           .collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    for et, g in ev.groupby("event_type"):
        cents = [math.floor(v * 100) for v in g.value]
        s, n = sum(cents), len(cents)
        if n <= 1:
            continue
        loos = sorted(_t67_tdiv((s - c) * 1_000_000, n - 1)
                      for c in cents)
        row = out[et]
        assert row["n"] == n
        assert row["min_loo_ppm"] == loos[0]
        assert row["max_loo_ppm"] == loos[-1]
        assert row["avg_loo_ppm"] == _t67_tdiv(sum(loos), n)


_t67_tdiv = tdiv


def test_c70_matches_python_set_containment(spark, docs):
    """Directed shingle containment from plain set intersections."""
    got = {(r["d1"], r["d2"]): (r["n_common"], r["cont1_ppm"],
                                r["cont2_ppm"])
           for r in REGISTRY["c70_containment_pairs"]
           .fn(spark, SF_SMALL).collect()}
    sh = {int(r.doc_id): _shingles3(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        if len(sh[a]) < 5:
            continue
        for b in ids[i + 1:]:
            if len(sh[b]) < 5:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            c1 = inter * 1_000_000 // len(sh[a])
            c2 = inter * 1_000_000 // len(sh[b])
            if max(c1, c2) >= 600_000:
                want[(a, b)] = (inter, c1, c2)
    assert got == want


def test_c75_matches_counter_dup_weights(spark, docs):
    """1/k duplicate weights from a Counter over exact text copies."""
    out = {r["source"]: r for r in
           REGISTRY["c75_inverse_dup_weighting"].fn(spark, SF_SMALL)
           .collect()}
    dup_n = Counter(docs.text)
    per_src: dict = {}
    for r in docs.itertuples():
        n, s = per_src.get(r.source, (0, 0))
        per_src[r.source] = (n + 1, s + 1_000_000 // dup_n[r.text])
    assert set(out) == set(per_src)
    for src, (n, s) in per_src.items():
        row = out[src]
        assert (row["n_docs"], row["weight_sum_ppm"],
                row["mean_weight_ppm"]) == (n, s, s // n)


def test_c77_matches_python_funnel(spark, docs):
    """Dedup -> length -> decontam funnel replayed with dicts,
    substring `in`, and the same top-10-longest needle set."""
    row = REGISTRY["c77_curation_funnel"].fn(spark, SF_SMALL).collect()[0]
    first_of_text: dict = {}
    for r in sorted(docs.itertuples(), key=lambda r: int(r.doc_id)):
        first_of_text.setdefault(r.text, int(r.doc_id))
    needles = [(int(r.doc_id), r.text[:12]) for r in sorted(
        docs.itertuples(),
        key=lambda r: (-int(r.n_chars), int(r.doc_id)))[:10]]
    n_total = len(docs)
    dedup = qual = decon = 0
    for r in docs.itertuples():
        if first_of_text[r.text] != int(r.doc_id):
            continue
        dedup += 1
        if not 20 <= len(re.split(" +", r.text.strip(" "))) <= 80:
            continue
        qual += 1
        if any(sid != int(r.doc_id) and nd in r.text
               for sid, nd in needles):
            continue
        decon += 1
    assert (row["n_total"], row["survive_dedup"],
            row["survive_quality"], row["survive_decontam"]) \
        == (n_total, dedup, qual, decon)


def _seq_cosine(a, b) -> float:
    dp = na = nb = 0.0
    for x, y in zip(a, b):
        dp = dp + x * y
        na = na + x * x
        nb = nb + y * y
    return dp / (math.sqrt(na) * math.sqrt(nb))


_half_up = round_half_up


def test_b138_matches_counter_l_diversity(spark, docs):
    """l-diversity per (lang, source) from Counter band histograms."""
    out = {(r["lang"], r["source"]): r for r in
           REGISTRY["b138_l_diversity"].fn(spark, SF_SMALL).collect()}
    groups: dict = {}
    for r in docs.itertuples():
        groups.setdefault((r.lang, r.source), Counter())[
            int(r.n_chars) // 500] += 1
    assert set(out) == set(groups)
    for key, bands in groups.items():
        row = out[key]
        n = sum(bands.values())
        assert row["n_docs"] == n
        assert row["l_distinct"] == len(bands)
        assert row["top_band_ppm"] == max(bands.values()) * 1_000_000 // n
        assert row["is_diverse"] == int(len(bands) >= 3)


def test_c56_matches_python_cell_cohesion(spark):
    """IVF assignment (8 id-centroids, 6dp-rounded cosine argmax,
    low-id tiebreak) + per-cell mean pairwise cosine, replayed with
    sequential-float cosines and HALF_UP micro-rounding."""
    out = {r["cent_id"]: r for r in
           REGISTRY["c56_cluster_cohesion"].fn(spark, SF_SMALL)
           .collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in emb.itertuples()}
    cents = {cid: vecs[cid] for cid in sorted(vecs) if cid < 8}
    cells: dict = {cid: [] for cid in cents}
    for vid, v in vecs.items():
        best = max(cents,
                   key=lambda c: (_half_up(_seq_cosine(v, cents[c]), 6),
                                  -c))
        cells[best].append(vid)
    for cid, members in cells.items():
        members.sort()
        sims = [int(_half_up(
            _seq_cosine(vecs[a], vecs[b]) * 1_000_000, 0))
            for i, a in enumerate(members) for b in members[i + 1:]]
        row = out[cid]
        assert row["n_vecs"] == len(members)
        assert row["n_pairs"] == len(sims)
        if sims:
            s = sum(sims)
            want = abs(s) // len(sims) * (1 if s >= 0 else -1)
            assert row["mean_cos_ppm"] == want
        else:
            assert row["mean_cos_ppm"] is None


def test_c61_matches_python_centroid_outliers(spark):
    """Quantized label centroids + farthest-5 ranking replayed with
    sequential floats."""
    got = {(r["label"], r["rn"]): (r["vec_id"], r["cos_sim"]) for r in
           REGISTRY["c61_mislabel_candidates"].fn(spark, SF_SMALL)
           .collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    by_label: dict = {}
    for r in emb.itertuples():
        by_label.setdefault(int(r.label), []).append(
            (int(r.vec_id), [float(x) for x in r.embedding]))
    want = {}
    for lbl, members in by_label.items():
        n = len(members)
        cent = [sum(math.floor(v[i] * 1_000_000) for _, v in members)
                / n / 1_000_000.0 for i in range(64)]
        scored = sorted(
            ((_half_up(_seq_cosine(v, cent), 6), vid)
             for vid, v in members))
        for rn, (cs, vid) in enumerate(scored[:5], 1):
            want[(lbl, rn)] = (vid, cs)
    assert got == want


def test_c65_matches_python_token_yield(spark, docs):
    """Canonical-survivor token yield from dicts."""
    out = {r["source"]: r for r in
           REGISTRY["c65_effective_token_yield"].fn(spark, SF_SMALL)
           .collect()}
    first_of_text: dict = {}
    for r in sorted(docs.itertuples(), key=lambda r: int(r.doc_id)):
        first_of_text.setdefault(r.text, int(r.doc_id))
    per: dict = {}
    for r in docs.itertuples():
        n_tok = len(re.split(" +", r.text.strip(" ")))
        nd, raw, eff = per.get(r.source, (0, 0, 0))
        keep = n_tok if first_of_text[r.text] == int(r.doc_id) else 0
        per[r.source] = (nd + 1, raw + n_tok, eff + keep)
    assert set(out) == set(per)
    for src, (nd, raw, eff) in per.items():
        row = out[src]
        assert (row["n_docs"], row["raw_tokens"],
                row["effective_tokens"], row["yield_ppm"]) \
            == (nd, raw, eff, eff * 1_000_000 // raw)


def test_c72_matches_counter_contingency(spark, docs):
    """Dup x length-band contingency from Counters."""
    got = {(r["len_band"], r["is_dup"]): r["n_docs"] for r in
           REGISTRY["c72_dup_quality_contingency"].fn(spark, SF_SMALL)
           .collect()}
    text_n = Counter(docs.text)
    c: Counter = Counter()
    for r in docs.itertuples():
        n_tok = len(re.split(" +", r.text.strip(" ")))
        band = ("mid" if 30 <= n_tok <= 60
                else "short" if n_tok < 30 else "long")
        c[(band, int(text_n[r.text] > 1))] += 1
    assert got == dict(c)


def test_c53_matches_python_span_merge(spark, docs):
    """Corpus-global duplicate 5-gram spans + per-doc island merge,
    replayed with dicts and a sequential sweep."""
    out = {r["doc_id"]: r for r in
           REGISTRY["c53_dup_span_flagging"].fn(spark, SF_SMALL)
           .collect()}
    toks = {int(r.doc_id): _toks(r.text) for r in docs.itertuples()}
    gram_count: Counter = Counter()
    occ: dict = {}
    for did, t in toks.items():
        grams = [" ".join(t[i:i + 5]) for i in range(len(t) - 4)]
        occ[did] = grams
        gram_count.update(grams)
    assert set(out) == set(toks)
    for did, t in toks.items():
        spans = sorted((i, i + 4) for i, g in enumerate(occ[did])
                       if gram_count[g] > 1)
        flagged: set = set()
        islands = 0
        max_f = None
        for s, f in spans:
            flagged.update(range(s, f + 1))
            if max_f is None or s > max_f:
                islands += 1
            max_f = f if max_f is None else max(max_f, f)
        row = out[did]
        assert row["n_tokens"] == len(t)
        assert row["n_flagged"] == len(flagged)
        assert row["n_islands"] == islands
        assert row["flagged_ppm"] == len(flagged) * 1_000_000 // len(t)


def test_c58_matches_python_centroid_cosine(spark, docs):
    """Per-source quantized centroid-vs-global cosine with exact big
    ints and a final float division."""
    out = {r["source"]: r["centroid_cos_ppm"] for r in
           REGISTRY["c58_source_embedding_drift"].fn(spark, SF_SMALL)
           .collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    qv = {int(r.vec_id): [math.floor(float(x) * 1_000_000)
                          for x in r.embedding]
          for r in emb.itertuples()}
    src_of = {int(r.doc_id): r.source for r in docs.itertuples()}
    per: dict = {}
    glob = [0] * 64
    for vid, v in qv.items():
        if vid not in src_of:
            continue
        s = per.setdefault(src_of[vid], [0] * 64)
        for i, x in enumerate(v):
            s[i] += x
            glob[i] += x
    assert set(out) == set(per)
    for src, s in per.items():
        num = sum(a * b for a, b in zip(s, glob))
        den = math.sqrt(sum(a * a for a in s)) \
            * math.sqrt(sum(b * b for b in glob))
        assert out[src] == math.floor(1_000_000.0 * float(num) / den)


def test_c63_matches_python_norm_audit(spark):
    """Per-label embedding QA stats from quantized norm sums."""
    out = {r["label"]: r for r in
           REGISTRY["c63_embedding_qa_audit"].fn(spark, SF_SMALL)
           .collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    per: dict = {}
    for r in emb.itertuples():
        nq = sum(math.floor(float(x) * float(x) * 1e12)
                 for x in r.embedding)
        per.setdefault(int(r.label), []).append(
            (len(r.embedding), nq))
    assert set(out) == set(per)
    for lbl, rows in per.items():
        row = out[lbl]
        norms = [nq for _, nq in rows]
        assert row["n_vecs"] == len(rows)
        assert row["n_distinct_dims"] == len({d for d, _ in rows})
        assert row["min_normsq_q"] == min(norms)
        assert row["max_normsq_q"] == max(norms)
        assert row["avg_normsq_q"] == sum(norms) // len(norms)
        assert row["n_zero_vecs"] == sum(1 for n in norms if n == 0)


def test_c78_matches_python_moment_corr(spark, docs):
    """Per-language Pearson corr(n_chars, quantized normsq) from
    exact integer moments and one float expression."""
    out = {r["lang"]: r for r in
           REGISTRY["c78_text_embedding_join"].fn(spark, SF_SMALL)
           .collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    nv = {int(r.vec_id): sum(math.floor(float(x) * float(x) * 1e6)
                             for x in r.embedding)
          for r in emb.itertuples()}
    per: dict = {}
    for r in docs.itertuples():
        if int(r.doc_id) in nv:
            per.setdefault(r.lang, []).append(
                (int(r.n_chars), nv[int(r.doc_id)]))
    assert set(out) == set(per)
    for lang, pts in per.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        corr = (n * float(sxy) - float(sx) * sy) / math.sqrt(
            (n * float(sxx) - float(sx) * sx)
            * (n * float(syy) - float(sy) * sy))
        row = out[lang]
        assert row["n_docs"] == n
        assert abs(row["corr_len_normsq"] - corr) < 2e-6
