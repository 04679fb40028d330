"""Round-2c batch: blocked fuzzy matching, observe() metrics, the
Spark 4 Python DataSource, and the transformWithState odometer twin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests import fixtures_gtfs
from tests.conftest import SF_ORACLE
from tp_airflow_gtfs_snowflake_spark.observability import (load_audit_metrics,
                                                           observed)
from tp_airflow_gtfs_snowflake_spark.operators import fuzzy
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _t


# ---------------------------------------------------------------- fuzzy

def test_blocked_fuzzy_pairs_planted(spark):
    rows = [(1, "blue widget"), (2, "blue widgit"),   # dist 1, same block
            (3, "blue bracket"), (4, "red widget"),   # diff first token
            (5, "blue widget")]                       # exact dup of 1
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in
           fuzzy.blocked_fuzzy_pairs(df, id_col="id", name_col="name",
                                     max_dist=3).collect()}
    assert got[(1, 2)] == 1
    assert got[(2, 5)] == 1
    assert (1, 5) not in got           # exact dup excluded (min_dist=1)
    assert (1, 4) not in got           # different block, never compared
    assert all(1 <= d <= 3 for d in got.values())


def test_blocked_fuzzy_pairs_is_equi_join(spark):
    part = _t(spark, SF_ORACLE, "part")
    plan = (fuzzy.blocked_fuzzy_pairs(part, id_col="p_partkey",
                                      name_col="p_name")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_profile_symmetry(spark):
    part = _t(spark, SF_ORACLE, "part")
    pairs = fuzzy.blocked_fuzzy_pairs(part, id_col="p_partkey",
                                      name_col="p_name").count()
    prof = fuzzy.fuzzy_match_profile(part, id_col="p_partkey",
                                     name_col="p_name")
    agg = prof.agg(F.sum("n_matches").alias("s"),
                   F.count("*").alias("n")).first()
    assert agg["s"] == 2 * pairs       # every pair counts at both ends
    assert agg["n"] == part.count()    # zero-match records kept
    assert pairs > 0                   # non-vacuous on the real table


# ------------------------------------------------- mergeable sketches

def test_hll_union_of_partials_equals_single_shot(spark):
    """The mergeability contract b41 rides on: unioning per-day
    sketch partials must give EXACTLY the same estimate as sketching
    the whole table in one pass (HLL merge is lossless), and the
    estimate must sit near the exact distinct."""
    ev = _t(spark, SF_ORACLE, "events")
    merged = (ev.groupBy(F.date_trunc("day", "ts").alias("m"))
              .agg(F.hll_sketch_agg("user_id").alias("sk"))
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("est")).first()["est"])
    single = (ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                     .alias("est")).first()["est"])
    exact = ev.select("user_id").distinct().count()
    assert merged == single
    assert abs(merged - exact) / exact < 0.05


# ---------------------------------------------------------- observe()

def test_observed_metrics_ride_the_write(spark, tmp_path):
    ev = _t(spark, SF_ORACLE, "events").select("event_id", "user_id", "ts")
    df, obs = observed(ev, "load",
                       **load_audit_metrics(ev, key_col="event_id",
                                            ts_col="ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["null_keys"] == 0
    assert got["max_ts"] == ev.agg(F.max("ts")).first()[0]
    assert got["min_ts"] <= got["max_ts"]
    assert got["distinct_keys_approx"] > 0


# ------------------------------------------------- python data source

def _land_snapshots(landing, n=3):
    snaps = fixtures_gtfs.make_feed_snapshots(n)
    for i, s in enumerate(snaps):
        (landing / f"vp_20240304060{i}.json").write_text(s)
    (landing / "ignore.csv").write_text("not a snapshot")
    return snaps


def test_py_datasource_batch_read(spark, tmp_path):
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource
    landing = tmp_path / "landing"
    landing.mkdir()
    snaps = _land_snapshots(landing)
    py_datasource.register(spark)
    df = (spark.read.format("gtfs_rt_snapshots")
          .option("path", str(landing)).load())
    rows = sorted(df.collect(), key=lambda r: r.path)
    assert [r.feed_json for r in rows] == snaps     # suffix filter held
    assert all(r.mtime_epoch > 0 for r in rows)
    # composes with the shared parse path
    from tp_airflow_gtfs_snowflake_spark.sources.gtfs_rt import parse_feed_json
    parsed = parse_feed_json(df)
    assert parsed.filter(F.col("feed.entity").isNotNull()).count() == 3


def test_py_datasource_stream_tails_new_files(spark, tmp_path):
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource
    landing = tmp_path / "landing"
    landing.mkdir()
    snaps = fixtures_gtfs.make_feed_snapshots(4)
    for i, s in enumerate(snaps[:2]):
        (landing / f"vp_20240304060{i}.json").write_text(s)
    py_datasource.register(spark)
    stream = (spark.readStream.format("gtfs_rt_snapshots")
              .option("path", str(landing)).load())
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("pyds_tail")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM pyds_tail").first()[0] == 2
        for i, s in enumerate(snaps[2:], start=2):
            (landing / f"vp_20240304060{i}.json").write_text(s)
        q.processAllAvailable()
        got = spark.sql(
            "SELECT feed_json FROM pyds_tail ORDER BY path").collect()
        assert [r.feed_json for r in got] == snaps  # once each, in order
    finally:
        q.stop()


# --------------------------------------------- transformWithState twin

def test_tws_plan_constructs_without_protobuf(spark, tmp_path):
    """The migration-pair module must at least build its streaming plan
    (schema + grouping) in any environment; only EXECUTION needs the
    protobuf state protocol."""
    from tp_airflow_gtfs_snowflake_spark.streaming.rt_stream import (
        read_feed_stream)
    from tp_airflow_gtfs_snowflake_spark.streaming.stateful import (
        ODOMETER_SCHEMA)
    from tp_airflow_gtfs_snowflake_spark.streaming.tws import (
        vehicle_odometer_tws)
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "vp_202403040600.json").write_text(
        fixtures_gtfs.make_feed_snapshots(1)[0])
    stream = read_feed_stream(spark, str(landing))
    df = vehicle_odometer_tws(stream)
    assert df.isStreaming
    assert df.schema == ODOMETER_SCHEMA


def test_tws_odometer_matches_applyinpandas(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf "
               "(absent in this container); plan-construction is "
               "covered above")
    from tp_airflow_gtfs_snowflake_spark.streaming.rt_stream import (
        read_feed_stream)
    from tp_airflow_gtfs_snowflake_spark.streaming.stateful import (
        vehicle_odometer)
    from tp_airflow_gtfs_snowflake_spark.streaming.tws import (
        vehicle_odometer_tws)

    landing = tmp_path / "landing"
    landing.mkdir()
    snaps = fixtures_gtfs.make_feed_snapshots(3)
    for i, s in enumerate(snaps):
        (landing / f"vp_20240304060{i}.json").write_text(s)

    def final_totals(make_df, name):
        stream = read_feed_stream(spark, str(landing),
                                  max_files_per_trigger=1)
        q = (make_df(stream).writeStream.outputMode("update")
             .format("memory").queryName(name)
             .option("checkpointLocation",
                     str(tmp_path / f"ckpt_{name}")).start())
        q.processAllAvailable()
        q.stop()
        # update mode: last row per vehicle is the final state
        return {r.vehicle_id: (r.n_reports, round(r.path_degrees, 9))
                for r in spark.sql(f"SELECT * FROM {name}").collect()
                }  # later rows overwrite earlier keys via dict order

    old = final_totals(vehicle_odometer, "odo_old")
    new = final_totals(vehicle_odometer_tws, "odo_new")
    assert new == old
    assert any(n > 1 for n, _ in new.values())  # state crossed batches


def test_sliding_hll_union_tracks_exact_within_5pct(spark):
    """b49: 7-day distinct estimates from unioned daily HLL partials
    must track the exact sliding count-distinct within 5% on every
    window of the real event stream."""
    from pyspark.sql import functions as F
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
        REGISTRY, _t)
    est = {r["day"]: r["distinct_users_7d_est"]
           for r in REGISTRY["b49_sliding_distinct_sketch"]
           .fn(spark, "/root/testdata/sf0.01").collect()}
    ev = _t(spark, "/root/testdata/sf0.01", "events") \
        .select(F.to_date("ts").alias("day"), "user_id")
    d = ev.select("day").distinct().alias("d")
    exact = {r["day"]: r["n"]
             for r in d.join(
                 ev.alias("e"),
                 (F.col("e.day") >= F.date_sub(F.col("d.day"), 6))
                 & (F.col("e.day") <= F.col("d.day")))
             .groupBy(F.col("d.day").alias("day"))
             .agg(F.countDistinct("e.user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for day, e in est.items():
        assert abs(e - exact[day]) <= 0.05 * exact[day], \
            f"{day}: est {e} vs exact {exact[day]}"
