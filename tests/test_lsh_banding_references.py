"""Independent-reimplementation references for the MinHash-LSH
banding family (VERDICT r05 task 6).

c06 / c41 / c123's DuckDB oracles MIRROR the banding construction
(portable md5 minhash, same coefficients, same band concatenation), so
a banding bug shared by both engines — wrong coefficient recurrence,
off-by-one band slice, concat separator drift — would pass the oracle
gate on both sides.  These tests recompute the ENTIRE pipeline with
hashlib + pure-Python sets on sf0.001 and assert:

- exact CANDIDATE-SET equality for the self-join (c06 shape, via
  operators.dedup.minhash_lsh_candidates) and the bipartite join
  (c41 shape, via the registry query), and
- exact verified-pair equality plus float Jaccard agreement for the
  final outputs of c06 and c41.

The same failure-independence pattern as tests/test_sketch_references
(hashlib KMV/CM/Bloom) applied to the LSH tier.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from tp_airflow_gtfs_snowflake_spark.operators import dedup as D
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"
P = D.MINHASH_P


def _md5_60(s: str) -> int:
    """Python twin of operators.dedup.portable_hash64 (first 15 md5
    hex chars as an integer)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingle_set(text: str, n: int = 3) -> set[str]:
    """Python twin of token_shingles: lower/trim, split on runs of
    spaces, distinct space-joined n-grams."""
    toks = re.split(" +", text.lower().strip())
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _signature(sh: set[str], num_hashes: int = 16) -> list[int]:
    coeffs = D.minhash_coefficients(num_hashes)
    hs = [_md5_60(s) % P for s in sh]
    return [min((h * a + b) % P for h in hs) for a, b in coeffs]


def _band_buckets(sig: list[int], bands: int = 4) -> list[str]:
    """md5 digest per band of the comma-joined signature slice —
    exactly the engine's concat_ws(',', slice(...)) construction."""
    rows = len(sig) // bands
    return [hashlib.md5(",".join(
        str(m) for m in sig[b * rows:(b + 1) * rows]).encode())
        .hexdigest() for b in range(bands)]


@pytest.fixture(scope="module")
def corpus():
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet",
                           columns=["doc_id", "text"])
    sh = {int(r.doc_id): _shingle_set(r.text)
          for r in docs.itertuples()}
    sigs = {d: _signature(s) for d, s in sh.items() if s}
    buckets = {d: _band_buckets(g) for d, g in sigs.items()}
    return sh, buckets


def _py_candidates(buckets: dict) -> set[tuple[int, int]]:
    by_key: dict[tuple[int, str], list[int]] = {}
    for d, bks in buckets.items():
        for band, bk in enumerate(bks):
            by_key.setdefault((band, bk), []).append(d)
    out = set()
    for ids in by_key.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                out.add((a, b))
    return out


def _py_verified(sh: dict, cands, threshold: float):
    out = {}
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if j >= threshold:
            out[(a, b)] = j
    return out


def test_c06_candidate_set_matches_hashlib_banding(spark, corpus):
    """The engine's banded candidate join produces EXACTLY the pairs
    the brute-force hashlib banding produces — no more (phantom
    collisions) and no fewer (lost bands/buckets)."""
    sh, buckets = corpus
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _t
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
        _spread)
    docs = _spread(spark, _t(spark, SF_SMALL, "documents"))
    sig = D.minhash_signatures(docs, "doc_id", "text", 16, 3,
                               D.portable_hash64)
    cand = D.minhash_lsh_candidates(sig, bands=4, rows_per_band=4)
    engine = {(int(r.d1), int(r.d2)) for r in cand.collect()}
    ref = _py_candidates(buckets)
    assert len(ref) >= 20  # sf0.001 yields 28 — equality is not vacuous
    assert engine == ref


def test_c06_output_matches_hashlib_reference(spark, corpus):
    sh, buckets = corpus
    ref = _py_verified(sh, _py_candidates(buckets), 0.5)
    assert len(ref) >= 20  # 28 at sf0.001 — not vacuous
    got = {(int(r.d1), int(r.d2)): r.jaccard for r in
           REGISTRY["c06_minhash_neardup"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(ref)
    for k, j in got.items():
        assert abs(j - ref[k]) < 1e-12, (k, j, ref[k])


def test_c41_bipartite_output_matches_hashlib_reference(spark, corpus):
    """Bipartite (train even / test odd) banding + verify, the c41
    decontamination shape — candidate generation AND the final
    verified pairs recomputed brute-force."""
    sh, buckets = corpus
    cands = {(a, b) for a, abks in buckets.items() if a % 2 == 0
             for b, bbks in buckets.items() if b % 2 == 1
             for band in range(4) if abks[band] == bbks[band]}
    ref = {}
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if j >= 0.35:
            ref[(a, b)] = j
    assert len(ref) >= 8  # 11 at sf0.001 — not vacuous
    got = {(int(r.train_id), int(r.test_id)): r.jaccard for r in
           REGISTRY["c41_bipartite_lsh_decontam"].fn(spark, SF_SMALL)
           .collect()}
    assert set(got) == set(ref)
    for k, j in got.items():
        assert abs(j - ref[k]) < 1e-12, (k, j, ref[k])


def test_c125_estimate_error_matches_hashlib(spark, corpus):
    """Signature-agreement estimate vs exact Jaccard for every
    verified pair, recomputed from the hashlib signatures."""
    sh, _ = corpus
    sigs = {d: _signature(s) for d, s in sh.items() if s}
    got = {(r["d1"], r["d2"]): (r["est_ppm"], r["exact_ppm"],
                                r["abs_err_ppm"])
           for r in REGISTRY["c125_minhash_estimate_error"]
           .fn(spark, SF_SMALL).collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            union = len(sh[a]) + len(sh[b]) - inter
            if inter / union < 0.5:
                continue
            exact_ppm = inter * 1_000_000 // union
            agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
            est_ppm = agree * 1_000_000 // 16
            want[(a, b)] = (est_ppm, exact_ppm,
                            abs(est_ppm - exact_ppm))
    assert got == want
