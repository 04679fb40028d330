"""Round-11 tests: the custom Python DataSource stream reader's
PURGE/restart/re-delivery contract (the b155 driver row's mechanism),
exercised as a positive/negative control pair at fixture scale.

Reference contract: dags/gtfs_rt_minutely.py:225-257 — snapshots land
with timestamped names, are loaded, then purged; a producer retry may
re-deliver an already-loaded NAME, which must not be re-ingested.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _run_ingest(spark, landing: str, sink: str, ckpt: str) -> None:
    stream = (spark.readStream.format("gtfs_rt_snapshots")
              .option("path", landing).load())

    def write(batch, epoch_id):
        (batch.withColumn("ingest_epoch",
                          F.lit(int(epoch_id)).cast("long"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_epoch").parquet(sink))

    q = (stream.writeStream.foreachBatch(write)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_pyds_purge_restart_redelivery_exactly_once(spark, tmp_path):
    """POSITIVE control (the b155 semantics): after the landing dir is
    fully purged and the stream restarted over the EMPTY dir, the
    committed name-watermark survives — a later re-delivery of an
    already-ingested NAME (verbatim content) is skipped, while files
    with later-sorting names land exactly once."""
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource
    py_datasource.register(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    for i in range(1, 5):
        (landing / f"vp_{i:02d}.json").write_text(f"content-{i}")
    _run_ingest(spark, str(landing), sink, ckpt)
    assert spark.read.parquet(sink).count() == 4

    # reference PURGE: every loaded snapshot is deleted, then the
    # stream restarts over the empty dir — latestOffset must not
    # regress below the checkpointed watermark (vp_04)
    for f in os.listdir(landing):
        os.remove(os.path.join(str(landing), f))
    _run_ingest(spark, str(landing), sink, ckpt)
    assert spark.read.parquet(sink).count() == 4  # nothing re-emitted

    # producer retry re-delivers vp_02 verbatim + 2 genuinely new files
    (landing / "vp_02.json").write_text("content-2")
    (landing / "vp_05.json").write_text("content-5")
    (landing / "vp_06.json").write_text("content-6")
    _run_ingest(spark, str(landing), sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 6  # vp_02 skipped, vp_05/06 once each
    names = sorted(os.path.basename(r.path) for r in
                   got.select("path").collect())
    assert names == [f"vp_{i:02d}.json" for i in range(1, 7)]


def test_pyds_new_name_same_content_is_ingested(spark, tmp_path):
    """NEGATIVE control: the exactly-once skip is NAME-watermark
    driven, not content dedup — the same bytes under a LATER-sorting
    name ARE ingested (and would double the b155 counts, which is
    exactly the divergence the driver value-hash detects)."""
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource
    py_datasource.register(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    (landing / "vp_01.json").write_text("same-bytes")
    _run_ingest(spark, str(landing), sink, ckpt)
    (landing / "vp_02.json").write_text("same-bytes")
    _run_ingest(spark, str(landing), sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 2  # duplicate content, distinct names
    assert got.select("feed_json").distinct().count() == 1
