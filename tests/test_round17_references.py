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
