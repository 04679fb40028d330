"""Batch-incremental sessionization: slice-by-slice processing with
carried state must equal whole-history sessionization exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import sessions
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _t
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted((r["user"], r["start_epoch"], r["end_epoch"], r["n"])
                  for r in df.collect())


def test_incremental_equals_whole_batch(spark):
    ev = (_t(spark, SF_SMALL, "events")
          .select(F.col("user_id").alias("user"),
                  F.unix_timestamp("ts").alias("ts")))
    gap = 6 * 3600
    whole = sessions.sessionize(ev, gap_seconds=gap)

    # slice at global event-time terciles (the date-partitioned
    # ingest contract: later slices hold later events)
    t1, t2 = ev.approxQuantile("ts", [1 / 3, 2 / 3], 0.0)
    slices = [ev.filter(F.col("ts") <= t1),
              ev.filter((F.col("ts") > t1) & (F.col("ts") <= t2)),
              ev.filter(F.col("ts") > t2)]
    state, closed_parts = None, []
    for s in slices:
        closed, state = sessions.sessionize_increment(
            s, state, gap_seconds=gap)
        state = state.localCheckpoint(eager=True)
        closed_parts.append(closed.localCheckpoint(eager=True))
    got = closed_parts[0]
    for c in closed_parts[1:]:
        got = got.unionByName(c)
    got = got.unionByName(sessions.finalize(state))
    assert _rows(got) == _rows(whole)
    # sanity: the split actually exercised cross-slice merging
    assert len(closed_parts) == 3 and _rows(whole)


def test_slice_boundary_cases(spark):
    gap = 100

    def df(rows):
        return spark.createDataFrame(rows, "user long, ts long")

    # slice 1: A has an open session; B too
    s1 = df([(1, 0), (1, 50), (2, 0)])
    # slice 2: A continues within gap (merge); B idle (stays open);
    #          C starts fresh; A later breaks the gap -> first closed
    s2 = df([(1, 120), (1, 500), (3, 300)])
    closed1, st1 = sessions.sessionize_increment(s1, None,
                                                 gap_seconds=gap)
    assert _rows(closed1) == []  # nothing provably closed yet
    closed2, st2 = sessions.sessionize_increment(s2, st1,
                                                 gap_seconds=gap)
    # A's merged session 0-120 (3 events) closed by the 500 event
    assert _rows(closed2) == [(1, 0, 120, 3)]
    # open: A's 500-session, B untouched, C fresh
    assert _rows(sessions.finalize(st2)) == [
        (1, 500, 500, 1), (2, 0, 0, 1), (3, 300, 300, 1)]


def test_finalize_flushes_everything(spark):
    ev = spark.createDataFrame([(7, 10), (7, 5000)], "user long, ts long")
    closed, st = sessions.sessionize_increment(ev, None, gap_seconds=60)
    assert _rows(closed) == [(7, 10, 10, 1)]
    assert _rows(sessions.finalize(st)) == [(7, 5000, 5000, 1)]


def test_lookback_dedup_incremental_equals_batch(spark):
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        dedup_increment, dedup_with_lookback)
    ev = (_t(spark, SF_SMALL, "events")
          .select(F.col("user_id").alias("key"),
                  F.datediff(F.col("ts").cast("date"),
                             F.lit("2024-01-01").cast("date"))
                  .alias("day"))
          .distinct())
    whole = {(r["key"], r["day"]) for r in
             dedup_with_lookback(ev, lookback_days=7).collect()}

    d1, d2 = ev.approxQuantile("day", [1 / 3, 2 / 3], 0.0)
    slices = [ev.filter(F.col("day") <= d1),
              ev.filter((F.col("day") > d1) & (F.col("day") <= d2)),
              ev.filter(F.col("day") > d2)]
    state, kept = None, set()
    for s in slices:
        k, state = dedup_increment(s, state, lookback_days=7)
        state = state.localCheckpoint(eager=True)
        kept |= {(r["key"], r["day"]) for r in k.collect()}
    assert kept == whole and whole
    # state stays bounded by the lookback horizon
    mx = ev.agg(F.max("day")).collect()[0][0]
    assert all(r["last_day"] >= mx - 7 for r in state.collect())


def test_increment_first_batch_accepts_string_keys(spark):
    """The empty initial state must take its key type from the batch
    — a hardcoded `long` fails string-keyed datasets on their first
    batch (round-3 advice regression)."""
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        dedup_increment)
    ev = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1)], "key string, day long")
    kept, state = dedup_increment(ev, None, lookback_days=7)
    assert {(r["key"], r["day"]) for r in kept.collect()} == \
        {("a", 1), ("b", 1)}
    assert dict(state.collect()) == {"a": 3, "b": 1}

    ev2 = spark.createDataFrame(
        [("u1", 10), ("u1", 5000)], "user string, ts long")
    closed, st = sessions.sessionize_increment(ev2, None, gap_seconds=60)
    assert _rows(closed) == [("u1", 10, 10, 1)]
    assert _rows(sessions.finalize(st)) == [("u1", 5000, 5000, 1)]
