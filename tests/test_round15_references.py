"""Independent-reimplementation references for the round-15 batch
(b171, b172, b173, c140) — pure-Python/pandas recomputations
independent of both the Spark implementation and the mirrored DuckDB
oracle.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def _lineitem() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")


# --------------------------------------------------------------- b171

def test_b171_written_footers_match_python_zone_maps(spark):
    """The zone maps the write path persisted, recomputed with
    explicit Python bit interleaving and dict aggregation."""
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round13 \
        import _ZO_B, _ZO_FILE_DIV, _ZO_Q

    li = _lineitem()
    maxp, maxs = int(li.l_partkey.max()), int(li.l_suppkey.max())
    want: dict[int, list] = {}
    n_rows = 0
    for pk, sk in zip(li.l_partkey, li.l_suppkey):
        x = min(max(int(pk) - 1, 0) * _ZO_B // maxp, _ZO_B - 1)
        y = min(max(int(sk) - 1, 0) * _ZO_B // maxs, _ZO_B - 1)
        z = 0
        for k in range(8):
            z |= ((x >> k) & 1) << (2 * k + 1)
            z |= ((y >> k) & 1) << (2 * k)
        fid = z // _ZO_FILE_DIV
        cur = want.setdefault(fid, [x, x, y, y, 0])
        cur[0], cur[1] = min(cur[0], x), max(cur[1], x)
        cur[2], cur[3] = min(cur[2], y), max(cur[3], y)
        cur[4] += 1
        n_rows += 1

    rows = (REGISTRY["b171_zorder_write_layout_check"]
            .fn(spark, SF_SMALL).collect())
    assert [r.fid for r in rows] == sorted(want)
    for r in rows:
        mn_x, mx_x, mn_y, mx_y, cnt = want[r.fid]
        assert (r.mn_x, r.mx_x, r.mn_y, r.mx_y, r.cnt) == \
            (mn_x, mx_x, mn_y, mx_y, cnt)
        if mn_x > _ZO_Q - 1 or mn_y > _ZO_Q - 1:
            assert r.decision == "skip"
        elif mx_x <= _ZO_Q - 1 and mx_y <= _ZO_Q - 1:
            assert r.decision == "full"
        else:
            assert r.decision == "partial"
    # losslessness: the written layout holds every input row
    assert sum(r.cnt for r in rows) == n_rows
    # the write-path point: a materialized z layout actually skips
    assert any(r.decision == "skip" for r in rows)


# --------------------------------------------------------------- b172

def test_b172_matches_python_retention_ledger(spark):
    """The expiry ledger recomputed with explicit per-file Python
    state (add/remove/reclaim), no SQL."""
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    days = (o.o_orderdate - pd.Timestamp("1992-01-01")).dt.days
    f = (pd.DataFrame({
        "add_snap": days // 28,
        "kg": o.o_orderkey // 256,
        "b": 100 + (o.o_custkey % 97)})
        .groupby(["add_snap", "kg"])["b"].sum().reset_index())
    # NB: count(*)*100 + sum(custkey%97) == sum(100 + custkey%97)
    head = int(f.add_snap.max())
    n_files, total = len(f), int(f.b.sum())
    rm_snaps = [
        a + 2 if (2 * b * n_files < total and a + 2 <= head) else None
        for a, b in zip(f.add_snap, f.b)]

    added: dict[int, list] = {}
    removed: dict[int, list] = {}
    for a, b, rm in zip(f.add_snap, f.b, rm_snaps):
        cur = added.setdefault(int(a), [0, 0])
        cur[0] += 1
        cur[1] += int(b)
        if rm is not None:
            cur = removed.setdefault(int(rm), [0, 0])
            cur[0] += 1
            cur[1] += int(b)

    rows = (REGISTRY["b172_snapshot_expiry_audit"]
            .fn(spark, SF_SMALL).collect())
    assert [r.snap for r in rows] == sorted(set(added) | set(removed))
    cutoff = head - 4
    for r in rows:
        na, ba = added.get(r.snap, [0, 0])
        nr, br = removed.get(r.snap, [0, 0])
        assert (r.n_added, r.bytes_added, r.n_removed) == (na, ba, nr)
        if r.snap <= cutoff:
            assert (r.n_reclaimable, r.bytes_reclaimable,
                    r.retention) == (nr, br, "expired")
        else:
            assert (r.n_reclaimable, r.bytes_reclaimable,
                    r.retention) == (0, 0, "retained")
    # the audit's reason to exist: some disk is actually reclaimable
    # and the retained window reclaims nothing
    assert sum(r.bytes_reclaimable for r in rows) > 0
    n_retained = len({s for s in (set(added) | set(removed))
                      if s > cutoff})
    assert sum(1 for r in rows if r.retention == "retained") \
        == n_retained
    # conservation: every file added exactly once
    assert sum(r.n_added for r in rows) == n_files
    assert sum(r.bytes_added for r in rows) == total


# --------------------------------------------------------------- b173

def test_b173_matches_python_per_day_depth(spark):
    """Overlap depth recomputed by brute force — for every calendar
    day count the files whose [min,max] covers it — no sweep line."""
    li = _lineitem()
    d = (li.l_shipdate - pd.Timestamp("1992-01-01")).dt.days

    def audit(fid):
        zm = pd.DataFrame({"fid": fid, "d": d}).groupby("fid")["d"] \
            .agg(["min", "max"])
        lo, hi = int(zm["min"].min()), int(zm["max"].max())
        span = hi - lo + 1
        depth = [int(((zm["min"] <= day) & (day <= zm["max"])).sum())
                 for day in range(lo, hi + 1)]
        return {"n_files": len(zm), "span_days": span,
                "max_depth": max(depth),
                "avg_depth_ppm": sum(depth) * 1_000_000 // span}

    want = {"ingestion": audit(li.l_orderkey // 128),
            "sorted": audit(d // 56)}
    rows = (REGISTRY["b173_clustering_depth_audit"]
            .fn(spark, SF_SMALL).collect())
    assert [r.layout for r in rows] == ["ingestion", "sorted"]
    for r in rows:
        w = want[r.layout]
        assert {k: getattr(r, k) for k in w} == w, r.layout
    by = {r.layout: r for r in rows}
    # the metric's reason to exist: ingestion-ordered files overlap
    # massively (a date probe opens ~every file), sorted ranges are
    # disjoint (depth exactly 1 everywhere)
    assert by["sorted"].max_depth == 1
    assert by["ingestion"].max_depth > 10 * by["sorted"].max_depth


# --------------------------------------------------------------- c140

def test_c140_matches_python_counter(spark):
    """Gopher repetition scores recomputed with collections.Counter
    over explicit token pairs."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    scored = []
    for doc_id, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        toks = [t for t in text.strip().lower().split(" ") if t != ""]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            continue
        c = Counter(grams)
        top_cnt = max(c.values())
        top_gram = min(g for g, n in c.items() if n == top_cnt)
        n_chars = len(text)
        top2 = top_cnt * len(top_gram) * 1_000_000 // n_chars
        dup2 = (len(grams) - len(c)) * 1_000_000 // len(grams)
        scored.append((int(doc_id), lang, len(grams), top_gram,
                       top_cnt, top2, dup2,
                       "fail" if top2 > 200_000 else "ok"))
    scored.sort(key=lambda t: (-t[5], t[0]))
    want = scored[:20]

    rows = (REGISTRY["c140_gopher_repetition"]
            .fn(spark, SF_SMALL).collect())
    got = [(r.doc_id, r.lang, r.n_grams, r.top_gram, r.top_cnt,
            r.top2_chars_ppm, r.dup2_ppm, r.gate) for r in rows]
    assert got == want


# --------------------------------------------------------------- b174

def test_b174_streaming_matches_batch_and_bloom_math(spark):
    """The streamed result recomputed with pandas set algebra, the
    bitmap recomputed with hashlib.md5, and the one-sided-error
    contract asserted from the per-batch telemetry."""
    import hashlib
    import math

    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round15 \
        import _SB_K, _SB_M, b174_last_telemetry

    li = _lineitem()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    urgent = set(o.o_orderkey[
        (o.o_orderpriority == "1-URGENT")
        & (o.o_orderdate >= pd.Timestamp("1997-01-01"))
        & (o.o_orderdate < pd.Timestamp("1998-01-01"))])
    hit = li[li.l_orderkey.isin(urgent)]
    want = {}
    for flag, g in hit.groupby("l_returnflag"):
        want[flag] = (len(g), g.l_orderkey.nunique(),
                      int(sum(math.floor(p * 100)
                              for p in g.l_extendedprice)))

    rows = (REGISTRY["b174_streaming_bloom_prefilter"]
            .fn(spark, SF_SMALL).collect())
    assert {r.l_returnflag: (r.n_rows, r.n_orders, r.cents)
            for r in rows} == want

    # bitmap recomputed with hashlib: positions of key k under salt j
    def pos(j: int, k: int) -> int:
        h = hashlib.md5(f"{j}#{k}".encode()).hexdigest()[:12]
        return int(h, 16) % _SB_M
    bits = {pos(j, k) for k in urgent for j in range(_SB_K)}
    member = [all(pos(j, k) in bits for j in range(_SB_K))
              for k in li.l_orderkey]
    n_member = sum(member)

    tel = list(b174_last_telemetry)
    assert len(tel) == 3, "6 files at maxFilesPerTrigger=2 -> 3 batches"
    total_in = sum(i for i, _ in tel)
    total_pass = sum(p for _, p in tel)
    assert total_in == len(li), "every stream row entered exactly once"
    # the engine's pass count IS the python bloom's member count
    assert total_pass == n_member
    # one-sided error: never drops a true match, and it actually cut
    assert total_pass >= len(hit)
    assert total_pass < total_in
