"""Round-11 registry additions (driver round 6).

b155 gives the custom Python DataSource stream reader
(sources/py_datasource.py, GtfsRtSnapshotStreamReader) the same hard
driver signal b134 gave the file-source ingest path: a checkpoint
restart across the reference's PATTERN/PURGE landing lifecycle
(dags/gtfs_rt_minutely.py:225-257 — snapshots land, are loaded, then
purged; a producer retry may re-deliver an already-loaded name).  The
r05 ADVICE fixed a latestOffset clamp in exactly this path; this query
makes that class of regression flip a value hash:

- phase 1 lands 4 JSON-lines snapshot files (vp_01..04), an
  availableNow micro-batch ingest writes them to an epoch-partitioned
  sink;
- the landing dir is then PURGED (all files deleted) and the stream
  restarts from the same checkpoint over the EMPTY dir — a reader
  whose latestOffset regresses below the committed name-watermark
  here poisons the checkpoint;
- phase 2 re-delivers an already-ingested name (vp_02, verbatim
  content) alongside 4 new files (vp_05..08) and restarts again.
  Exactly-once requires the re-delivered vp_02 to be skipped (its
  name is <= the watermark) and each new file to land once; any
  re-admission lands under a fresh ingest epoch and doubles counts.

The oracle is plain batch SQL over events: it matches iff the sink
holds every source row exactly once.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)

_B155_LINE_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value_cents", T.LongType()),
    T.StructField("ts_us", T.LongType()),
])


def _b155_export_snapshots(ev: DataFrame, export_dir: str) -> dict:
    """Render events as 8 JSON-lines snapshot files (fidx = event_id %
    8) in ONE Spark job: repartition(8, fidx) puts each fidx in
    exactly one task, so partitionBy(fidx) writes exactly one part
    file per directory — no driver-side row materialization."""
    lines = ev.select(
        (F.col("event_id") % 8).alias("fidx"),
        F.to_json(F.struct(
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 100).cast("long")
            .alias("value_cents"),
            F.unix_micros("ts").alias("ts_us"),
        )).alias("value"))
    (lines.repartition(8, "fidx")
     .write.partitionBy("fidx").text(export_dir))
    parts = {}
    for k in range(8):
        d = os.path.join(export_dir, f"fidx={k}")
        files = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(files) == 1, (d, files)
        parts[k] = os.path.join(d, files[0])
    return parts


@_register(
    "b155_streaming_datasource_restart",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT event_id % 8) AS BIGINT) AS n_src_files,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Exactly-once ingest through the CUSTOM Python DataSource stream "
    "reader (format gtfs_rt_snapshots) across checkpoint restarts, a "
    "full landing PURGE, and a re-delivered already-ingested file "
    "name — the reference's PATTERN/PURGE snapshot lifecycle "
    "(dags/gtfs_rt_minutely.py:225-257) made driver-hash-checkable.  "
    "events is rendered as 8 JSON-lines snapshots; phase 1 ingests "
    "vp_01..04, the dir is purged and the "
    "stream restarted over the EMPTY dir (latestOffset must not "
    "regress below the committed name-watermark), then vp_02 is "
    "re-delivered verbatim alongside new vp_05..08.  The sink is "
    "epoch-partitioned (dynamic overwrite), so any replay or "
    "re-admission lands under a fresh epoch and doubles n_events — "
    "the oracle (batch SQL over events) matches iff every row landed "
    "exactly once.  Scale shape: snapshot payloads are only ever read "
    "executor-side (one InputPartition per file); the driver sees "
    "names, never bytes.",
)
def b155_streaming_datasource_restart(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource
    py_datasource.register(spark)

    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="b155_pyds_")
    landing = os.path.join(base, "landing")
    export = os.path.join(base, "export")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing)
    parts = _b155_export_snapshots(ev, export)

    def land(k: int, name: str) -> None:
        shutil.copyfile(parts[k], os.path.join(landing, name))

    def run() -> None:
        # No maxFilesPerBatch: under availableNow the engine snapshots
        # latestOffset() ONCE as the drain target, so a capped reader
        # stops after a single capped batch per run (files are picked
        # up by the next run, but this query asserts full drain per
        # phase).  The cap path is exercised by pytest instead.
        stream = (spark.readStream.format("gtfs_rt_snapshots")
                  .option("path", landing).load())

        def write(batch: DataFrame, epoch_id: int) -> None:
            rows = (batch
                    .select(F.explode(F.split("feed_json", "\n"))
                            .alias("line"))
                    .filter(F.length("line") > 0)
                    .select(F.from_json("line", _B155_LINE_SCHEMA)
                            .alias("r"))
                    .select("r.*"))
            (rows.withColumn("ingest_epoch",
                             F.lit(int(epoch_id)).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("ingest_epoch").parquet(sink))

        q = (stream.writeStream.foreachBatch(write)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # phase 1: vp_01..04
    for k in range(4):
        land(k, f"vp_{k + 1:02d}.json")
    run()
    # PURGE (the reference deletes loaded snapshots) + restart over
    # the empty dir: the committed name-watermark must survive
    for f in os.listdir(landing):
        os.remove(os.path.join(landing, f))
    run()
    # phase 2: producer retry re-delivers vp_02 verbatim + 4 new files
    land(1, "vp_02.json")
    for k in range(4, 8):
        land(k, f"vp_{k + 1:02d}.json")
    run()

    return (spark.read.parquet(sink)
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("user_id").cast("long")
                 .alias("n_users"),
                 F.countDistinct(F.col("event_id") % 8).cast("long")
                 .alias("n_src_files"),
                 F.sum("value_cents").cast("long").alias("value_cents"),
                 F.max("ts_us").cast("long").alias("max_ts_us"))
            .orderBy("event_type"))
