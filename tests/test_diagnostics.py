"""A5 / A10 / A11 debug surface."""

from __future__ import annotations

import json

from tp_airflow_gtfs_snowflake_spark.diagnostics import (
    connection_probe, list_stage, write_debug_text,
)
from tp_airflow_gtfs_snowflake_spark.sources.gtfs_rt import parse_feed_json
from tests import fixtures_gtfs


def test_connection_probe(spark):
    assert connection_probe(spark) is True


def test_write_debug_text_one_record_per_entity(spark, tmp_path):
    snaps = fixtures_gtfs.make_feed_snapshots(1)
    feed = parse_feed_json(
        spark.createDataFrame([(s,) for s in snaps], "feed_json string"))
    out = tmp_path / "tu_txt"
    write_debug_text(feed, str(out), kind="trip_update")
    lines = [l for f in out.iterdir() if f.name.startswith("part-")
             for l in f.read_text().splitlines()]
    n_tu = json.loads(snaps[0])
    expected = sum(1 for e in n_tu["entity"] if "trip_update" in e)
    assert len(lines) == expected
    # each line is a readable record of the entity payload
    rec = json.loads(lines[0])
    assert "stop_time_update" in rec or "trip" in rec

    out2 = tmp_path / "vp_txt"
    write_debug_text(feed, str(out2), kind="vehicle")
    vp_lines = [l for f in out2.iterdir() if f.name.startswith("part-")
                for l in f.read_text().splitlines()]
    assert len(vp_lines) == sum(
        1 for e in n_tu["entity"] if "vehicle" in e)


def test_list_stage(spark, tmp_path):
    (tmp_path / "a_202403040600.json").write_text("{}")
    (tmp_path / "b_202403040602.json").write_text("{}")
    (tmp_path / "noise.csv").write_text("x")
    allf = list_stage(spark, str(tmp_path))
    assert allf.count() == 3
    assert set(allf.columns) == {"path", "size", "modification_time"}
    only_json = list_stage(spark, str(tmp_path), pattern="*.json")
    assert only_json.count() == 2
    assert all(r["path"].endswith(".json") for r in only_json.collect())
