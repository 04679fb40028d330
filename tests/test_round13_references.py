"""Independent-reimplementation references for the round-13 batch
(b165-b167, c136-c137) — pure-Python/pandas/numpy recomputations that
are failure-independent of both the Spark implementation and its
mirrored DuckDB oracle (the tests/test_sketch_references.py pattern).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def _lineitem(cols) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/lineitem.parquet", columns=cols)


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


# --------------------------------------------------------------- b165

def _morton_py(x: int, y: int) -> int:
    z = 0
    for k in range(8):
        z += ((x >> k) & 1) << (2 * k + 1)
        z += ((y >> k) & 1) << (2 * k)
    return z


def test_b165_matches_python_zone_maps(spark):
    """Both layouts' zone maps recomputed with Python int bit ops
    (the engine builds the Morton code from div/mod arithmetic — a
    genuinely different formulation)."""
    li = _lineitem(["l_partkey", "l_suppkey"])
    maxp, maxs = int(li.l_partkey.max()), int(li.l_suppkey.max())
    x = ((li.l_partkey - 1).clip(lower=0) * 256 // maxp) \
        .clip(upper=255).astype(int)
    y = ((li.l_suppkey - 1).clip(lower=0) * 256 // maxs) \
        .clip(upper=255).astype(int)
    z = pd.Series([_morton_py(a, b) for a, b in zip(x, y)])
    hit = (x < 64) & (y < 64)

    def audit(fid):
        g = pd.DataFrame({"fid": fid, "x": x.values, "y": y.values,
                          "hit": hit.values}).groupby("fid")
        mn_x, mn_y = g["x"].min(), g["y"].min()
        mx_x, mx_y = g["x"].max(), g["y"].max()
        cnt, hits = g.size(), g["hit"].sum()
        skip = (mn_x > 63) | (mn_y > 63)
        full = (mx_x <= 63) & (mx_y <= 63)
        assert int(hits[skip].sum()) == 0  # the invariant under audit
        return {
            "n_files": len(cnt), "n_skip": int(skip.sum()),
            "n_full": int(full.sum()), "rows_total": int(cnt.sum()),
            "rows_scanned": int(cnt[~skip].sum()),
            "rows_matched": int(hits.sum()),
            "skip_ppm": int(skip.sum()) * 1_000_000 // len(cnt),
        }

    ref = {"linear": audit((x // 2).values),
           "zorder": audit((z // 512).values)}
    rows = (REGISTRY["b165_zorder_clustering_audit"]
            .fn(spark, SF_SMALL).collect())
    assert len(rows) == 2
    for r in rows:
        want = ref[r.layout]
        got = {k: getattr(r, k) for k in want}
        assert got == want, r.layout
    # the point of z-ordering: it must skip strictly more files than
    # the linear layout for the 2-D predicate (both match identically)
    by = {r.layout: r for r in rows}
    assert by["zorder"].n_skip > by["linear"].n_skip
    assert by["zorder"].rows_matched == by["linear"].rows_matched


# --------------------------------------------------------------- b166

def test_b166_matches_python_first_fit(spark):
    """The cumulative-sum bin assignment re-derived with an explicit
    sequential first-fit loop (running total, new bin at each target
    boundary) instead of a window function."""
    li = _lineitem(["l_orderkey", "l_linenumber"])
    g = li.groupby(li.l_orderkey // 64)
    manifest = (g.size() * 100 + g["l_linenumber"].sum()).sort_index()
    bins: dict[int, list] = {}
    cum = 0
    for fid, b in manifest.items():
        bins.setdefault(cum // 100_000, []).append((int(fid), int(b)))
        cum += int(b)
    rows = (REGISTRY["b166_compaction_bin_packing"]
            .fn(spark, SF_SMALL).collect())
    assert len(rows) == len(bins)
    for r in rows:
        files = bins[r.bin_id]
        total = sum(b for _, b in files)
        assert (r.n_files, r.total_bytes) == (len(files), total)
        assert (r.first_file, r.last_file) == (files[0][0], files[-1][0])
        assert r.fill_ppm == total * 1_000_000 // 100_000
    # plan sanity: bins partition the manifest into contiguous,
    # non-overlapping file ranges (each rewrite task reads a range)
    ordered = [bins[k] for k in sorted(bins)]
    flat = [f for fs in ordered for f, _ in fs]
    assert flat == sorted(manifest.index.astype(int).tolist())
    # cum_before bucketing boundary invariant: bin k starts while the
    # running total is still inside [k*T, (k+1)*T) and (for non-last
    # bins) ends at or past (k+1)*T — no bin closes short while files
    # remain, which is what makes this ordered first-fit
    running = 0
    for i, k in enumerate(sorted(bins)):
        assert k * 100_000 <= running < (k + 1) * 100_000
        running += sum(b for _, b in bins[k])
        if i < len(bins) - 1:
            assert running >= (k + 1) * 100_000
    assert sum(r.total_bytes for r in rows) == int(manifest.sum())


# --------------------------------------------------------------- b167

def test_b167_matches_pandas_delete_stats(spark):
    li = _lineitem(["l_orderkey", "l_returnflag", "l_discount"])
    li["fid"] = li.l_orderkey // 256
    li["del"] = (li.l_returnflag == "R") & (li.l_discount >= 0.05)
    g = li.groupby("fid")["del"].agg(["count", "sum"])
    rows = (REGISTRY["b167_delete_vector_audit"]
            .fn(spark, SF_SMALL).collect())
    assert len(rows) == len(g)
    for r in rows:
        n, d = int(g.loc[r.file_id, "count"]), int(g.loc[r.file_id, "sum"])
        assert (r.n_rows, r.n_deleted, r.live_rows) == (n, d, n - d)
        ppm = d * 1_000_000 // n
        assert r.del_ppm == ppm
        want = "none" if d == 0 else ("rewrite" if ppm >= 190_000 else "dv")
        assert r.action == want
    # the audit is only useful if the decision actually splits
    actions = {r.action for r in rows}
    assert "rewrite" in actions and "dv" in actions


# --------------------------------------------------------------- c136

def test_c136_matches_python_suffix_scan(spark):
    """Cross-doc adjacent-LCP recomputed with an explicit sorted
    suffix list per first token and a sequential scan."""
    docs = _docs()
    suffixes: dict[str, list] = {}
    for doc_id, source, text in zip(docs.doc_id, docs.source, docs.text):
        tk = text.split(" ")
        for p in range(len(tk)):
            s = tuple(tk[p:p + 8])
            suffixes.setdefault(s[0], []).append(
                ((" ".join(s), int(doc_id), p + 1), s, source))
    stats: dict[str, Counter] = {}
    for first_tok, items in suffixes.items():
        items = sorted(items, key=lambda t: t[0])
        for (ka, sa, _), (kb, sb, src_b) in zip(items, items[1:]):
            if ka[1] == kb[1]:
                continue  # same document
            lcp = 0
            for t1, t2 in zip(sa, sb):
                if t1 != t2:
                    break
                lcp += 1
            c = stats.setdefault(src_b, Counter())
            c["n"] += 1
            c["max"] = max(c["max"], lcp)
            if lcp >= 4:
                c["rep"] += 1
    rows = (REGISTRY["c136_crossdoc_suffix_lcp"]
            .fn(spark, SF_SMALL).collect())
    assert {r.source for r in rows} == set(stats)
    for r in rows:
        c = stats[r.source]
        assert (r.n_cross_pairs, r.max_lcp, r.n_rep4) == \
            (c["n"], c["max"], c["rep"])
        assert r.rep_ppm == c["rep"] * 1_000_000 // c["n"]


# --------------------------------------------------------------- c137

def _jaccard_edges(docs: pd.DataFrame) -> list[tuple[int, int]]:
    """c08 exact 3-gram Jaccard >= 0.5 pairs, recomputed in Python
    (same normalization as dedup._tokens: lower, trim, split on
    space runs)."""
    sh = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.strip().lower().split(" ") if t != ""]
        sh[int(doc_id)] = {" ".join(toks[i:i + 3])
                           for i in range(len(toks) - 2)}
    ids = sorted(sh)
    edges = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                edges.append((a, b))
    return edges


def test_c137_matches_python_sync_lpa(spark):
    """4 rounds of synchronous self-inclusive LPA with an explicit
    adjacency-list loop and (count desc, label asc) tiebreak."""
    edges = _jaccard_edges(_docs())
    assert edges, "fixture must contain near-dup pairs"
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[m] for m in nbrs)
            cnt[labels[n]] += 1  # self-inclusive vote
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    rows = (REGISTRY["c137_label_propagation_communities"]
            .fn(spark, SF_SMALL).collect())
    assert {r.doc_id: r.community for r in rows} == labels
