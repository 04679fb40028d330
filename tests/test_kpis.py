"""KPI layer over the GTFS fixture warehouse (B1-B13), including the
>24h service-time trap and the null-key join fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests import fixtures_gtfs
from tp_airflow_gtfs_snowflake_spark.catalog import Warehouse
from tp_airflow_gtfs_snowflake_spark.functions.gtfs_time import gtfs_time_to_seconds
from tp_airflow_gtfs_snowflake_spark.plans import kpis
from tp_airflow_gtfs_snowflake_spark.silver import refresh_silver
from tp_airflow_gtfs_snowflake_spark.sources.gtfs_rt import (
    flatten_trip_updates, flatten_vehicle_positions, parse_feed_json,
)
from tp_airflow_gtfs_snowflake_spark.sources.gtfs_static import ingest_static

SERVICE_DATE = fixtures_gtfs.BASE_DATE.date()


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs_static_kpi")
    fixtures_gtfs.write_static_csvs(str(d))
    root = str(tmp_path_factory.mktemp("warehouse_kpi"))
    wh = Warehouse(spark, root)
    wh.create_all()
    ingest_static(spark, str(d), wh)
    feed = parse_feed_json(
        spark.createDataFrame([(s,) for s in fixtures_gtfs.make_feed_snapshots()],
                              "feed_json string"))
    headers, stops = flatten_trip_updates(feed)
    wh.append("bronze", "trip_updates_raw", headers)
    wh.append("bronze", "trip_stop_times", stops)
    wh.append("bronze", "vehicle_positions_raw", flatten_vehicle_positions(feed))
    refresh_silver(wh)
    return wh


@pytest.fixture(scope="module")
def delays(wh):
    df = kpis.observed_vs_scheduled(wh, SERVICE_DATE)
    df.cache().count()
    return df


def test_gtfs_time_parse_over_24h(spark):
    rows = spark.createDataFrame(
        [("25:10:00",), ("00:00:30",), ("24:00:00",), (None,), ("garbage",)],
        "t string",
    ).select(gtfs_time_to_seconds("t").alias("s")).collect()
    assert [r.s for r in rows] == [25 * 3600 + 600, 30, 86400, None, None]


def test_delay_fact_join(delays, wh):
    assert delays.count() > 0
    # fixture delays are N(120s, 180s) clipped at -300; the COALESCE
    # path can substitute departure (= arrival + 30s dwell) on either
    # side, shifting a delay by up to 30s
    assert delays.agg(F.min("delay_s")).collect()[0][0] >= -330
    avg = delays.agg(F.avg("delay_s")).collect()[0][0]
    assert 0 < avg < 300
    # fallback path exercised: RT rows lacking stop_sequence joined too
    rt = wh.table("silver", "trip_stop_times_silver")
    assert rt.filter(F.col("stop_sequence").isNull()).count() > 0


def test_punctuality_and_buckets(delays):
    rate = kpis.punctuality_rate(delays).collect()[0]
    assert 0.0 < rate.punctuality_rate <= 1.0
    hist = kpis.delay_distribution(delays)
    assert hist.agg(F.sum("n")).collect()[0][0] == delays.count()
    over_time = kpis.avg_delay_over_time(delays)
    assert over_time.count() > 0


def test_topk_and_heatmap(wh, delays):
    lines = kpis.most_delayed_lines(wh, delays, k=3).collect()
    assert 0 < len(lines) <= 3
    stops = kpis.top_problem_stops(wh, delays, k=5).collect()
    assert 0 < len(stops) <= 5
    heat = kpis.delay_heatmap(delays).collect()
    # fixture snapshots are all on one service date -> one iso_dow
    assert {r.iso_dow for r in heat} == {1}  # BASE_DATE is a Monday


def test_travel_time_span(delays):
    tt = kpis.travel_time_actual_vs_scheduled(delays)
    rows = tt.collect()
    assert len(rows) == delays.select("trip_id").distinct().count()
    sp = {r.trip_id: r for r in rows}
    assert all(r.scheduled_s >= 0 for r in sp.values())


def test_live_map_latest_per_vehicle(wh):
    live = kpis.live_vehicle_map(wh)
    rows = live.collect()
    vp = wh.table("silver", "vehicle_positions_silver")
    assert len(rows) == vp.where(F.col("vehicle_id").isNotNull()) \
                          .select("vehicle_id").distinct().count()
    # each vehicle's reported position is its max timestamp
    mx = {r.vehicle_id: r.mx for r in
          vp.groupBy("vehicle_id").agg(F.max("timestamp_epoch").alias("mx")).collect()}
    assert all(r.timestamp_epoch == mx[r.vehicle_id] for r in rows)


def test_stop_service_state(wh):
    state = kpis.stop_service_state(wh)
    assert state.count() == fixtures_gtfs.N_STOPS
    assert "in-service" in {r.service_state for r in state.collect()}
    # recency filter far in the future -> every stop out-of-service (B13)
    future = kpis.stop_service_state(wh, since_epoch=2**40)
    assert {r.service_state for r in future.collect()} == {"out-of-service"}
    evo = kpis.delay_evolution_per_stop(
        kpis.observed_vs_scheduled(wh, SERVICE_DATE))
    assert evo.count() > 0


def test_headway_regularity_ewt(spark):
    from tp_airflow_gtfs_snowflake_spark.plans.kpis import (
        headway_regularity)
    # perfectly even 600s headways -> EWT = 300s, ratio 1.0 (1e6 ppm);
    # bunched 2x(100,1100) -> mean 600 but EWT = (2*100^2+2*1100^2)
    # / (2*2400) = 508s -> ratio > 1
    rows = ([("even", t) for t in range(0, 3001, 600)]
            + [("bunched", 0), ("bunched", 100), ("bunched", 1200),
               ("bunched", 1300), ("bunched", 2400)])
    df = spark.createDataFrame(rows, "stop_id string, arrival_s long")
    got = {r["stop_id"]: r for r in headway_regularity(df).collect()}
    assert got["even"]["mean_headway_s"] == 600
    assert got["even"]["ewt_s"] == 300
    assert got["even"]["bunching_ratio_ppm"] == 1000000
    assert got["bunched"]["mean_headway_s"] == 600
    assert got["bunched"]["ewt_s"] > 450
    assert got["bunched"]["bunching_ratio_ppm"] > 1500000
