"""Multi-format I/O: lossless round-trips through ORC/JSONL/CSV with
explicit schemas, ORC predicate pushdown parity with parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tp_airflow_gtfs_snowflake_spark.sources.formats import (
    read_table, write_table)


@pytest.fixture(scope="module")
def sample(spark):
    return (spark.read.parquet(f"{SF_SMALL}/orders.parquet")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
                    "o_orderdate").limit(500).cache())


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_round_trip_is_lossless(spark, tmp_path, sample, fmt):
    path = str(tmp_path / fmt)
    write_table(sample, path, fmt)
    schema = ("o_orderkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp_ntz")
    back = read_table(spark, path, fmt, schema=schema)
    want = {tuple(r) for r in sample.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want, f"{fmt} round-trip lost data"


def test_row_formats_require_schema(spark, tmp_path, sample):
    write_table(sample, str(tmp_path / "j"), "json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path / "j"), "json")


def test_orc_keeps_predicate_pushdown(spark, tmp_path, sample):
    path = str(tmp_path / "orc_pushdown")
    write_table(sample, path, "orc")
    df = (read_table(spark, path, "orc")
          .filter(F.col("o_totalprice") > 100000.0)
          .select("o_orderkey", "o_totalprice"))
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PushedFilters: [IsNotNull(o_totalprice), " \
           "GreaterThan(o_totalprice,100000.0)]" in p, \
        f"ORC scan lost pushdown:\n{p[:1000]}"
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read.split("struct<")[1].count(":") == 2, \
        f"ORC scan reads extra columns: {read}"


def test_partitioned_write_prunes(spark, tmp_path, sample):
    path = str(tmp_path / "by_status")
    write_table(sample, path, "orc", partition_cols=["o_orderstatus"])
    df = (read_table(spark, path, "orc")
          .filter(F.col("o_orderstatus") == "F"))
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    pf = next((l for l in p.splitlines() if "PartitionFilters" in l), "")
    assert "o_orderstatus" in pf, f"no partition pruning:\n{p[:800]}"


def test_merge_schema_across_evolving_parquet(spark, tmp_path):
    """Schema evolution on read: batches written before/after a column
    was added must union under mergeSchema (the b53 unionByName
    reconciliation, done by the scan itself)."""
    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(2, "b", 9)], "id long, v string, extra long")
    old.write.parquet(str(tmp_path / "t" / "batch=1"))
    new.write.parquet(str(tmp_path / "t" / "batch=2"))
    got = (spark.read.option("mergeSchema", "true")
           .parquet(str(tmp_path / "t")).orderBy("id").collect())
    assert [r["extra"] for r in got] == [None, 9]
    assert len(got[0].asDict()) == 4  # id, v, extra, batch


def test_python_datasource_writer_two_phase_commit(spark, tmp_path):
    """Custom DataSource WRITE path: per-partition jsonl part files
    land atomically, and the driver-side commit writes a _MANIFEST
    with the file list + row count (the export-dir contract of the
    reference's export scripts)."""
    import json
    import os

    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource

    py_datasource.register(spark)
    out = str(tmp_path / "export")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(20)], "id long, v string") \
        .repartition(3)
    df.write.format("gtfs_rt_snapshots").option("path", out) \
        .mode("append").save()

    manifest = json.loads(open(os.path.join(out, "_MANIFEST")).read())
    assert manifest["n_rows"] == 20
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert parts == manifest["files"] and len(parts) == 3
    rows = []
    for fname in parts:
        with open(os.path.join(out, fname)) as fh:
            rows += [json.loads(l) for l in fh]
    assert sorted(r["id"] for r in rows) == list(range(20))
    assert not any(f.endswith(".tmp") for f in os.listdir(out))


@pytest.mark.parametrize("mode,expect", [
    ("PERMISSIVE", 3), ("DROPMALFORMED", 2)])
def test_csv_malformed_row_modes(spark, tmp_path, mode, expect):
    """COPY ON_ERROR semantics, natively: PERMISSIVE keeps malformed
    rows (nulled + captured in _corrupt_record), DROPMALFORMED drops
    them, FAILFAST (below) aborts — the three Snowflake ON_ERROR
    postures (reference dags/gtfs_static_daily.py COPY options)."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = StructType([StructField("id", LongType()),
                         StructField("qty", LongType()),
                         StructField("_corrupt_record", StringType())])
    df = (spark.read.schema(schema).option("header", "true")
          .option("mode", mode)
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(str(p)))
    rows = df.collect()
    assert len(rows) == expect
    if mode == "PERMISSIVE":
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert len(bad) == 1 and bad[0]["qty"] is None
        assert "notanumber" in bad[0]["_corrupt_record"]


def test_csv_failfast_aborts(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n")
    df = (spark.read.schema("id long, qty long")
          .option("header", "true").option("mode", "FAILFAST")
          .csv(str(p)))
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_export_time_travel_and_vacuum(spark, tmp_path):
    """Versioned manifests: each commit publishes _MANIFEST.v{N} (old
    part files untouched), read_export resolves ONE manifest so reads
    are snapshot-isolated and version=N time-travels; vacuum removes
    only parts referenced exclusively by expired versions."""
    import os

    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource as pd_

    pd_.register(spark)
    out = str(tmp_path / "export")
    schema = "id long, v string"

    def write(rows):
        # overwrite = snapshot REPLACEMENT (each version stands alone;
        # append-mode accumulation is covered separately below)
        spark.createDataFrame(rows, schema).repartition(2) \
            .write.format("gtfs_rt_snapshots").option("path", out) \
            .mode("overwrite").save()

    write([(i, f"a{i}") for i in range(5)])
    write([(i, f"b{i}") for i in range(3)])
    write([(i, f"c{i}") for i in range(7)])
    assert pd_.latest_export_version(out) == 3

    # latest read sees ONLY v3's files; time travel pins v1/v2
    assert sorted(r["v"] for r in
                  pd_.read_export(spark, out, schema).collect()) \
        == sorted(f"c{i}" for i in range(7))
    assert sorted(r["v"] for r in
                  pd_.read_export(spark, out, schema, version=1)
                  .collect()) == sorted(f"a{i}" for i in range(5))
    assert pd_.load_export_manifest(out, 2)["n_rows"] == 3

    # vacuum keeping 2 versions: v1's parts + manifest go, v2/v3 stay
    acct = pd_.vacuum_export(out, keep_versions=2)
    assert acct["removed_versions"] == [1]
    assert acct["removed_files"] > 0
    assert sorted(r["v"] for r in
                  pd_.read_export(spark, out, schema, version=2)
                  .collect()) == sorted(f"b{i}" for i in range(3))
    with pytest.raises(FileNotFoundError):
        pd_.load_export_manifest(out, 1)
    # no stray tmp files; latest pointer still v3
    assert not any(f.endswith(".tmp") for f in os.listdir(out))
    assert pd_.load_export_manifest(out)["version"] == 3


def test_export_manifest_back_compat_latest_pointer(spark, tmp_path):
    """_MANIFEST (the latest pointer) still carries files + n_rows, so
    pre-versioning consumers keep working."""
    import json
    import os

    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource as pd_

    pd_.register(spark)
    out = str(tmp_path / "export")
    spark.createDataFrame([(1, "x")], "id long, v string") \
        .write.format("gtfs_rt_snapshots").option("path", out) \
        .mode("append").save()
    m = json.loads(open(os.path.join(out, "_MANIFEST")).read())
    assert m["n_rows"] == 1 and m["files"] and m["version"] == 1


def test_export_append_mode_accumulates(spark, tmp_path):
    """mode('append') must ADD to the previous snapshot's visibility
    (manifest = prior files + new parts), not silently replace it."""
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource as pd_

    pd_.register(spark)
    out = str(tmp_path / "export")
    schema = "id long, v string"

    def write(rows, mode):
        spark.createDataFrame(rows, schema) \
            .write.format("gtfs_rt_snapshots").option("path", out) \
            .mode(mode).save()

    write([(1, "a")], "overwrite")
    write([(2, "b")], "append")
    write([(3, "c")], "overwrite")
    got2 = sorted(r["v"] for r in
                  pd_.read_export(spark, out, schema, version=2)
                  .collect())
    assert got2 == ["a", "b"]            # append kept v1's rows
    got3 = sorted(r["v"] for r in
                  pd_.read_export(spark, out, schema).collect())
    assert got3 == ["c"]                 # overwrite replaced them
    assert pd_.load_export_manifest(out, 2)["n_rows"] == 2


def test_export_abort_tolerates_none_messages(spark, tmp_path):
    """Spark passes None commit-message slots for failed tasks; abort
    must skip them and still clean the committed parts."""
    import os

    from tp_airflow_gtfs_snowflake_spark.sources.py_datasource import (
        SnapshotExportWriter, _ExportCommit)

    out = str(tmp_path / "export")
    os.makedirs(out)
    part = "part-00000-deadbeef.jsonl"
    open(os.path.join(out, part), "w").write("{}\n")
    w = SnapshotExportWriter({"path": out})
    w.abort([_ExportCommit(part, 1), None])
    assert not os.path.exists(os.path.join(out, part))


def test_vacuum_rejects_zero_keep_versions(spark, tmp_path):
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource as pd_

    with pytest.raises(ValueError):
        pd_.vacuum_export(str(tmp_path), keep_versions=0)


def test_stream_offsets_survive_deletion_of_emitted_files(
        spark, tmp_path):
    """Name-based offsets: deleting already-emitted snapshots must not
    re-emit or skip anything (a positional index would shift)."""
    import os

    from tp_airflow_gtfs_snowflake_spark.sources.py_datasource import (
        GtfsRtSnapshotStreamReader)

    land = tmp_path / "landing"
    land.mkdir()
    for n in ("vp_202401010001.json", "vp_202401010002.json"):
        (land / n).write_text("{}")
    r = GtfsRtSnapshotStreamReader({"path": str(land)})
    o0, o1 = r.initialOffset(), r.latestOffset()
    batch1 = [os.path.basename(p.filepath)
              for p in r.partitions(o0, o1)]
    assert batch1 == ["vp_202401010001.json", "vp_202401010002.json"]
    r.commit(o1)
    # retention deletes the oldest emitted file; two new files land
    os.remove(land / "vp_202401010001.json")
    for n in ("vp_202401010003.json", "vp_202401010004.json"):
        (land / n).write_text("{}")
    o2 = r.latestOffset()
    batch2 = [os.path.basename(p.filepath)
              for p in r.partitions(o1, o2)]
    assert batch2 == ["vp_202401010003.json", "vp_202401010004.json"]


def test_stream_max_files_per_batch_caps_progress(spark, tmp_path):
    import os

    from tp_airflow_gtfs_snowflake_spark.sources.py_datasource import (
        GtfsRtSnapshotStreamReader)

    land = tmp_path / "landing"
    land.mkdir()
    for i in range(5):
        (land / f"vp_20240101000{i}.json").write_text("{}")
    r = GtfsRtSnapshotStreamReader({"path": str(land),
                                    "maxFilesPerBatch": "2"})
    o0 = r.initialOffset()
    o1 = r.latestOffset()          # first call: uncapped (no floor)
    r.partitions(o0, o1)           # plan it -> floor = o1
    for n in ("vp_202401010005.json", "vp_202401010006.json",
              "vp_202401010007.json"):
        (land / n).write_text("{}")
    o2 = r.latestOffset()          # capped: 2 of the 3 pending
    batch = [os.path.basename(p.filepath)
             for p in r.partitions(o1, o2)]
    assert batch == ["vp_202401010005.json", "vp_202401010006.json"]


def test_stream_offset_never_regresses_below_committed(spark, tmp_path):
    """ADVICE r04: after a restart (fresh reader, _floor=None) an
    emptied or retention-pruned landing dir must not make latestOffset
    report an offset BELOW the checkpointed watermark — Spark would
    commit the lower offset and still-present older files would be
    re-emitted as duplicates on later triggers."""
    import os

    from tp_airflow_gtfs_snowflake_spark.sources.py_datasource import (
        GtfsRtSnapshotStreamReader)

    land = tmp_path / "landing"
    land.mkdir()
    (land / "vp_202401010005.json").write_text("{}")
    committed = {"last": "vp_202401010005.json"}

    # restart: fresh reader; retention deleted the newest file so the
    # listing's max is now BELOW the committed watermark
    r = GtfsRtSnapshotStreamReader({"path": str(land)})
    # Spark replans the restart batch first: partitions(committed, ...)
    # must seed the floor from the checkpointed start
    r.partitions(committed, committed)
    os.remove(land / "vp_202401010005.json")
    (land / "vp_202401010001.json").write_text("{}")  # older name
    o = r.latestOffset()
    assert o["last"] >= committed["last"]
    # and the older still-present file is never re-admitted
    assert r.partitions(committed, o) == []

    # same with an EMPTY dir
    os.remove(land / "vp_202401010001.json")
    assert r.latestOffset()["last"] == committed["last"]


def test_export_commit_collision_retries_next_version(
        spark, tmp_path, monkeypatch):
    """ADVICE r04: two concurrent jobs committing to the same export
    dir must not both allocate _MANIFEST.v{N} (the loser's snapshot —
    and in append mode its rows — silently vanished from the lineage).
    The exclusive-link claim makes the loser retry with N+1 and
    re-merge the winner's manifest."""
    import json
    import os

    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource as pd_
    from tp_airflow_gtfs_snowflake_spark.sources.py_datasource import (
        SnapshotExportWriter, _ExportCommit)

    out = str(tmp_path / "export")
    os.makedirs(out)
    # v1: the base snapshot
    w1 = SnapshotExportWriter({"path": out})
    open(os.path.join(out, "part-a.jsonl"), "w").write("{}\n")
    w1.commit([_ExportCommit("part-a.jsonl", 1)])
    assert pd_.latest_export_version(out) == 1

    # appender B reads latest=1, then a concurrent writer lands v2
    # before B links its manifest.  Simulate the race by pinning B's
    # view of latest_export_version to the stale value.
    open(os.path.join(out, "part-c.jsonl"), "w").write("{}\n")
    json.dump({"version": 2, "files": ["part-a.jsonl", "part-c.jsonl"],
               "n_rows": 2},
              open(os.path.join(out, "_MANIFEST.v2"), "w"))
    monkeypatch.setattr(pd_, "latest_export_version", lambda p: 1)

    open(os.path.join(out, "part-b.jsonl"), "w").write("{}\n{}\n")
    wb = SnapshotExportWriter({"path": out}, overwrite=False)
    wb.commit([_ExportCommit("part-b.jsonl", 2)])

    monkeypatch.undo()
    assert pd_.latest_export_version(out) == 3
    m3 = pd_.load_export_manifest(out, 3)
    # the loser re-merged the winner's v2 file list: nothing lost
    assert m3["files"] == ["part-a.jsonl", "part-b.jsonl", "part-c.jsonl"]
    assert m3["n_rows"] == 4
    # the concurrent winner's snapshot is untouched
    assert pd_.load_export_manifest(out, 2)["files"] == [
        "part-a.jsonl", "part-c.jsonl"]
