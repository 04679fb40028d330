"""Incremental rollup maintenance: only touched date partitions are
recomputed, late data merges with history, untouched partition files
are not rewritten."""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators.incremental import (
    incremental_rollup_refresh)


def _build(df):
    return (df.groupBy("event_date", "route")
            .agg(F.count("*").alias("n"),
                 F.sum("delay").alias("total_delay")))


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "event_date date, route string, delay long, insert_date timestamp")


def _d(day):
    return dt.date(2026, 8, day)


def _t(h):
    return dt.datetime(2026, 8, 10, h)


def test_rollup_refresh_initial_and_incremental(spark, tmp_path):
    path = str(tmp_path / "rollup")
    fact = [(_d(1), "r1", 5, _t(1)), (_d(1), "r2", 7, _t(1)),
            (_d(2), "r1", 3, _t(2)), (_d(3), "r1", 1, _t(3))]
    src = _rows(spark, fact)
    assert incremental_rollup_refresh(
        spark, src, path, _build) == [_d(1), _d(2), _d(3)]

    # no new data -> no partitions refreshed, no writes
    assert incremental_rollup_refresh(spark, src, path, _build) == []

    # late row lands in day 2 + a brand-new day 4, both with newer
    # ingest stamps; day-1/day-3 partition files must not be rewritten
    before = {f: os.path.getmtime(f)
              for f in glob.glob(f"{path}/event_date=2026-08-0[13]/*.parquet")}
    fact += [(_d(2), "r2", 10, _t(4)), (_d(4), "r1", 2, _t(4))]
    src2 = _rows(spark, fact)
    assert incremental_rollup_refresh(
        spark, src2, path, _build) == [_d(2), _d(4)]

    after = {f: os.path.getmtime(f)
             for f in glob.glob(f"{path}/event_date=2026-08-0[13]/*.parquet")}
    assert before == after, "untouched partitions were rewritten"

    # rollup must equal the from-scratch recompute (late data merged)
    got = {(r["event_date"], r["route"]): (r["n"], r["total_delay"])
           for r in spark.read.parquet(path).collect()}
    want = {(r["event_date"], r["route"]): (r["n"], r["total_delay"])
            for r in _build(src2).collect()}
    assert got == want


def test_merge_upsert_latest_wins_partition_scoped(spark, tmp_path):
    from tp_airflow_gtfs_snowflake_spark.operators.incremental import (
        merge_upsert)
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10, _t(1), _d(1)), (2, "b", 20, _t(1), _d(1)),
         (3, "c", 30, _t(1), _d(2))],
        "id long, name string, v long, ingest timestamp, day date")
    assert merge_upsert(spark, base, path, key_cols=["id"],
                        order_col="ingest", partition_col="day") == 3

    before = {f: os.path.getmtime(f)
              for f in glob.glob(f"{path}/day=2026-08-02/*.parquet")}
    # update key 1 (newer), stale update for key 2 (older ingest ->
    # must LOSE), insert key 4 in a new partition
    upd = spark.createDataFrame(
        [(1, "a2", 11, _t(5), _d(1)), (2, "stale", 0, _t(0), _d(1)),
         (4, "d", 40, _t(5), _d(3))],
        "id long, name string, v long, ingest timestamp, day date")
    merge_upsert(spark, upd, path, key_cols=["id"],
                 order_col="ingest", partition_col="day")

    got = {r["id"]: (r["name"], r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a2", 11), 2: ("b", 20), 3: ("c", 30),
                   4: ("d", 40)}
    after = {f: os.path.getmtime(f)
             for f in glob.glob(f"{path}/day=2026-08-02/*.parquet")}
    assert before == after, "untouched partition rewritten"
