"""End-to-end GTFS pipeline: static CSV ingest -> bronze, RT flatten ->
bronze, incremental silver refresh — semantics mirrored from the
reference DAGs (cites in module docstrings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.catalog import Warehouse
from tp_airflow_gtfs_snowflake_spark.silver import refresh_silver
from tp_airflow_gtfs_snowflake_spark.sources.gtfs_rt import (
    flatten_trip_updates, flatten_vehicle_positions, parse_feed_json,
)
from tp_airflow_gtfs_snowflake_spark.sources.gtfs_static import ingest_static
from tests import fixtures_gtfs


@pytest.fixture(scope="module")
def gtfs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs_static")
    fixtures_gtfs.write_static_csvs(str(d))
    return str(d)


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory, gtfs_dir):
    root = str(tmp_path_factory.mktemp("warehouse"))
    wh = Warehouse(spark, root)
    wh.create_all()
    ingest_static(spark, gtfs_dir, wh)
    feed = parse_feed_json(
        spark.createDataFrame([(s,) for s in fixtures_gtfs.make_feed_snapshots()],
                              "feed_json string"))
    headers, stops = flatten_trip_updates(feed)
    wh.append("bronze", "trip_updates_raw", headers)
    wh.append("bronze", "trip_stop_times", stops)
    wh.append("bronze", "vehicle_positions_raw", flatten_vehicle_positions(feed))
    return wh


def test_static_ingest_counts(wh):
    assert wh.table("bronze", "routes_static").count() == fixtures_gtfs.N_ROUTES
    assert wh.table("bronze", "trips_static").count() == fixtures_gtfs.N_TRIPS
    st = wh.table("bronze", "stop_times_static")
    assert st.count() == fixtures_gtfs.N_TRIPS * fixtures_gtfs.STOPS_PER_TRIP
    # >24:00:00 service times survived as raw strings
    assert st.filter(F.col("arrival_time") >= "24:").count() > 0
    # NULL_IF applied: empty and 'NULL' tokens became real nulls
    assert wh.table("bronze", "routes_static").filter(
        F.col("route_color").isNull()).count() > 0
    # insert_date stamped everywhere
    assert st.filter(F.col("insert_date").isNull()).count() == 0


def test_rt_first_wins_dedup(wh):
    tu = wh.table("bronze", "trip_updates_raw")
    # one header per (trip, snapshot-batch): fixture has 3 snapshots ->
    # duplicates within a snapshot collapse to the FIRST entity
    assert tu.filter(F.col("route_id") == "DUP").count() == 0
    # every even trip appears once per snapshot (3 snapshots), dup
    # entities within a snapshot collapsed to the first
    counts = tu.groupBy("trip_id").count()
    assert counts.agg(F.max("count")).collect()[0][0] == 3
    assert counts.agg(F.min("count")).collect()[0][0] == 3


def test_rt_explode_null_semantics(wh):
    ts = wh.table("bronze", "trip_stop_times")
    assert ts.count() > 0
    # absent optional proto fields -> NULL (HasField guards, A14)
    assert ts.filter(F.col("stop_id").isNull()).count() > 0
    assert ts.filter(F.col("departure_time").isNull()).count() > 0
    # stop rows are NOT gated by seen_trips: null-trip_id entities
    # contribute stop rows (gtfs_rt_minutely.py:103-109), one per
    # snapshot from the tu-null fixture entity
    assert ts.filter(F.col("trip_id").isNull()).count() == 3
    vp = wh.table("bronze", "vehicle_positions_raw")
    assert vp.filter(F.col("bearing").isNull()).count() > 0
    # A17: bearing is integer-valued after rounding
    assert vp.filter(F.col("bearing") != F.round("bearing")).count() == 0


def test_silver_refresh_incremental(wh):
    first = refresh_silver(wh)
    assert first["routes_static_silver"] == fixtures_gtfs.N_ROUTES
    assert first["trip_stop_times_silver"] > 0
    # idempotent: nothing newer than the watermark -> zero appends
    second = refresh_silver(wh)
    assert all(n == 0 for n in second.values()), second

    rs = wh.table("silver", "routes_static_silver")
    assert set(rs.columns) == {"route_id", "agency_id", "route_long_name",
                               "route_type", "insert_date"}
    # null direction_id -> 'in experimentation' (gtfs_silver.py:184)
    tu = wh.table("silver", "trip_updates_silver")
    assert tu.filter(F.col("direction_id") == "in experimentation").count() > 0
    # intermediate_stop = COALESCE(arrival, departure) (gtfs_silver.py:173)
    st = wh.table("silver", "stop_times_static_silver")
    bad = st.filter(
        F.col("intermediate_stop") !=
        F.coalesce("arrival_time", "departure_time")).count()
    assert bad == 0


def test_silver_picks_up_new_bronze_rows(wh, spark):
    refresh_silver(wh)  # ensure baseline loaded
    before = wh.table("silver", "routes_static_silver").count()
    new_row = spark.createDataFrame(
        [("R999", "LA", "x", "Nouvelle ligne", 3, None, None, None)],
        "route_id string, agency_id string, route_short_name string, "
        "route_long_name string, route_type int, route_url string, "
        "route_color string, route_text_color string")
    wh.append("bronze", "routes_static", new_row)
    appended = refresh_silver(wh)
    assert appended["routes_static_silver"] == 1
    assert wh.table("silver", "routes_static_silver").count() == before + 1
