"""Round-17 reference tests: b177 merge-plan execution proof.

The oracle already pins footer-manifest == promised-manifest at three
SFs; these tests pin the write path itself against an independent
pandas recomputation and the two post-conditions the rewrite promises
(all-'keep', depth 1) — the VERDICT r09 task-3 contract."""

from __future__ import annotations

import pandas as pd
import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def b177(spark):
    return (REGISTRY["b177_merge_plan_execution_proof"]
            .fn(spark, SF).toPandas())


def _reference_manifest() -> pd.DataFrame:
    """Sequential pandas recomputation of the promised merged layout:
    ingestion manifest -> interval-grouping sweep -> per-task
    day-bucket files."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    d = (pd.to_datetime(li.l_shipdate).dt.normalize()
         - pd.Timestamp("1992-01-01")).dt.days
    df = pd.DataFrame({"fid": li.l_orderkey // 128, "d": d})
    zm = (df.groupby("fid")["d"].agg(["min", "max"])
          .reset_index().sort_values(["min", "fid"]))
    task, running_max, tasks = 0, -1, {}
    for _, r in zm.iterrows():
        if r["min"] > running_max:
            task += 1
        running_max = max(running_max, r["max"])
        tasks[r["fid"]] = task
    df["task"] = df.fid.map(tasks)
    df["nfid"] = df.d // 56
    out = (df.groupby(["task", "nfid"])["d"]
           .agg(mn_d="min", mx_d="max", n_rows="count").reset_index())
    return out.sort_values(["task", "nfid"]).reset_index(drop=True)


def test_b177_footer_manifest_matches_pandas_reference(b177):
    ref = _reference_manifest()
    got = (b177[["merge_task", "new_fid", "mn_d", "mx_d", "n_rows"]]
           .sort_values(["merge_task", "new_fid"])
           .reset_index(drop=True))
    assert got.merge_task.tolist() == ref.task.tolist()
    assert got.new_fid.tolist() == ref.nfid.tolist()
    assert got.mn_d.tolist() == ref.mn_d.tolist()
    assert got.mx_d.tolist() == ref.mx_d.tolist()
    assert got.n_rows.tolist() == ref.n_rows.tolist()
    # no row lost or duplicated by the rewrite
    li_rows = len(pd.read_parquet(f"{SF}/lineitem.parquet",
                                  columns=["l_orderkey"]))
    assert int(got.n_rows.sum()) == li_rows


def _h48(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_c142_matches_pandas_reference(spark):
    """Exact sequential recomputation of the TV audit: same truncating
    integer-ppm arithmetic, pure python/pandas."""
    got = (REGISTRY["c142_label_signal_ceiling"].fn(spark, SF)
           .toPandas().set_index(["kind", "cls"]).sort_index())
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    docs["pseudo"] = ["h" + str(_h48(str(i)) % 5) for i in docs.doc_id]
    docs["toks"] = (docs.text.str.strip().str.lower()
                    .str.split(r" +", regex=True))
    from collections import Counter
    pool: Counter = Counter()
    per: dict[tuple, Counter] = {}
    ndocs: Counter = Counter()
    for _, r in docs.iterrows():
        for kind, cls in (("label", r.lang), ("hash_null", r.pseudo)):
            per.setdefault((kind, cls), Counter()).update(r.toks)
            ndocs[(kind, cls)] += 1
        pool.update(r.toks)
    n = sum(pool.values())
    for key, cnt in per.items():
        n_cls = sum(cnt.values())
        tv2 = sum(abs(cnt.get(w, 0) * 1_000_000 // n_cls
                      - cw * 1_000_000 // n)
                  for w, cw in pool.items())
        row = got.loc[key]
        assert int(row.n_docs) == ndocs[key]
        assert int(row.n_tokens) == n_cls
        assert int(row.tv_ppm) == tv2 // 2, key


def test_c142_label_tv_sits_in_null_band(spark):
    """The finding itself (VERDICT r09 task 4): the lang label's TV
    distances overlap the hash-null partition's band — text carries
    no label signal, so c139's kappa ~ 0 is the Bayes ceiling.  Band
    comparison is loose (same order of magnitude, overlapping
    ranges), not exact — both are sampling noise."""
    got = (REGISTRY["c142_label_signal_ceiling"].fn(spark, SF)
           .toPandas())
    lab = got[got.kind == "label"].tv_ppm
    nul = got[got.kind == "hash_null"].tv_ppm
    assert lab.min() < nul.max() * 3
    assert nul.min() < lab.max() * 3


def test_b177_postconditions_all_keep_depth_one(b177):
    """The two properties a clustering rewrite promises: the re-run
    planner finds only singleton groups, and no day is covered by
    more than one file per merge task's output."""
    assert set(b177.action) == {"keep"}
    assert set(b177.max_depth_after) == {1}
    # day-bucket files are genuinely disjoint in [mn_d, mx_d]
    m = b177.sort_values("mn_d")
    prev_end = -1
    for _, r in m.iterrows():
        assert r.mn_d > prev_end
        prev_end = r.mx_d
