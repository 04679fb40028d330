"""Streaming RT path: exactly-once file ingest across restarts (A7
semantics via checkpoint), watermarked windowed aggregation, and
late/duplicate micro-batch behavior (SURVEY §5.2 item 4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests import fixtures_gtfs
from tp_airflow_gtfs_snowflake_spark.catalog import Warehouse
from tp_airflow_gtfs_snowflake_spark.streaming.rt_stream import (
    read_feed_stream, start_bronze_ingest, windowed_position_counts,
)


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    return d


def _write_snapshot(landing, name: str, payload: str) -> None:
    p = landing / name
    tmp = landing / (name + ".tmp")
    tmp.write_text(payload)
    os.rename(tmp, p)  # atomic move, file-source-safe


def test_exactly_once_across_restart(spark, tmp_path, landing):
    snaps = fixtures_gtfs.make_feed_snapshots(3)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for t in ("trip_updates_raw", "trip_stop_times", "vehicle_positions_raw"):
        wh.create_if_not_exists("bronze", t)
    ckpt = str(tmp_path / "ckpt")

    _write_snapshot(landing, "tu_202403040600.json", snaps[0])
    q = start_bronze_ingest(spark, str(landing), wh, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = wh.table("bronze", "trip_stop_times").count()
    assert n1 > 0

    # restart with same checkpoint + one NEW file: only the new file
    # is processed (PURGE=TRUE equivalence), old one never replayed
    _write_snapshot(landing, "tu_202403040602.json", snaps[1])
    q = start_bronze_ingest(spark, str(landing), wh, ckpt, available_now=True)
    q.awaitTermination(120)
    n2 = wh.table("bronze", "trip_stop_times").count()
    assert n2 > n1

    # third restart, no new files -> zero new rows
    q = start_bronze_ingest(spark, str(landing), wh, ckpt, available_now=True)
    q.awaitTermination(120)
    assert wh.table("bronze", "trip_stop_times").count() == n2

    # non-matching file ignored by pathGlobFilter (COPY PATTERN)
    _write_snapshot(landing, "ignore_me.csv", "not json")
    q = start_bronze_ingest(spark, str(landing), wh, ckpt, available_now=True)
    q.awaitTermination(120)
    assert wh.table("bronze", "trip_stop_times").count() == n2


def test_windowed_counts_with_watermark(spark, landing, tmp_path):
    snaps = fixtures_gtfs.make_feed_snapshots(3)
    for i, s in enumerate(snaps):
        _write_snapshot(landing, f"vp_20240304060{i}.json", s)
    stream = read_feed_stream(spark, str(landing))
    agg = windowed_position_counts(stream, window="5 minutes",
                                   watermark="10 minutes")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("vp_windows")
         .option("checkpointLocation", str(tmp_path / "ckpt2")).start())
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM vp_windows")
    rows = out.collect()
    assert rows and all(r.n_reports >= r.n_vehicles >= 1 for r in rows)
    # fixture snapshots include out-of-order timestamps (up to 4 min
    # early) -> they still land in their event-time window
    total = sum(r.n_reports for r in rows)
    assert total == 36  # 12 vehicles x 3 snapshots
