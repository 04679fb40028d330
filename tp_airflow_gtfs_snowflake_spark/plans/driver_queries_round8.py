"""Round-8 registry additions: hard driver signal for the streaming
path (r04 verdict item 4).

The queries here actually RUN Structured Streaming micro-batches
inside the driver's correctness gate and oracle the *final
materialized state* — so the green row depends on checkpoint-correct
ingestion, not just on batch plan parity:

- b134 drives the exactly-once foreachBatch epoch-overwrite ingest
  (streaming/rt_stream.py:36-92 semantics, A7 in SURVEY §2) across a
  CHECKPOINT RESTART: phase-1 files are ingested, the query stops,
  more files land, a new query restarts from the same checkpoint.
  Any re-emission of phase-1 files lands under fresh epoch ids and
  DOUBLES the per-type counts — a value-hash mismatch by
  construction.
- b135 drives the versioned streaming KMV sketch state
  (streaming/sketch_state.py) across the same restart shape and
  oracles every distinct estimate bit-for-bit (portable md5-48 hash +
  truncating-integer estimator, the b102 pattern).  The accumulated
  state must equal the batch sketch of ALL data seen — merge loss,
  version-publish bugs, or replay drift all change the k-th smallest
  hash and flip the hash row.
- b136 drives the applyInPandasWithState + EventTimeTimeout session
  operator (streaming/stateful.py:timed_out_user_sessions) across a
  checkpoint restart and sentinel-advanced watermark, oracled against
  the batch gaps-and-islands spec — the stateful operator and its
  timer semantics get a hash row, not just pytest.

Reference parity: the reference ingests GTFS-RT micro-batches on a
2-minute cadence into Snowflake tables (dags/gtfs_rt_minutely.py) and
relies on task-level idempotence; these queries reconstruct that
contract on Structured Streaming checkpoints and make it
driver-checkable.

Streaming-in-a-driver-slot discipline: bounded input (availableNow),
deterministic file layout (two repartition(2) phases by event_id
parity), tempdir-isolated sink/checkpoint per invocation, and an
output aggregate in exact integer arithmetic only.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import kmv as _kmv
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round6 import (
    _KMV_SPACE, _KMV_VALS_SQL, _kmv_user_day_hashes)
from tp_airflow_gtfs_snowflake_spark.streaming.sketch_state import (
    read_sketch_state, start_kmv_accumulation)


def _two_phase_stream(spark: SparkSession, df: DataFrame, base: str,
                      run):
    """Land ``df`` in two deterministic phases (event-id parity) and
    call ``run(landing)`` after each — the second call restarts from
    the first call's checkpoint, which is the semantics under test."""
    landing = f"{base}/landing"
    parity = F.col("event_id") % 2
    df.filter(parity == 0).repartition(2).write.parquet(landing)
    run(landing)
    (df.filter(parity == 1).repartition(2)
     .write.mode("append").parquet(landing))
    run(landing)


@_register(
    "b134_streaming_ingest_restart",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Exactly-once streaming ingest ACROSS A CHECKPOINT RESTART, "
    "value-oracled (A7; reference contract: dags/gtfs_rt_minutely.py "
    "idempotent per-minute loads).  events lands as files in two "
    "phases; each phase runs an availableNow foreachBatch ingest "
    "with epoch-partitioned dynamic overwrite (the rt_stream "
    "append_epoch pattern) against ONE shared checkpoint.  The "
    "oracle is plain batch SQL over events: it matches iff the sink "
    "holds every source row exactly once — a restart that re-emits "
    "phase-1 files writes them under fresh epoch partitions and "
    "doubles the counts, so checkpoint correctness IS the hash row.",
)
def b134_streaming_ingest_restart(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="b134_ingest_")
    sink = f"{base}/sink"
    ckpt = f"{base}/ckpt"
    schema = ev.schema

    def run(landing: str) -> None:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(landing))

        def write(batch: DataFrame, epoch_id: int) -> None:
            (batch.withColumn("ingest_epoch",
                              F.lit(int(epoch_id)).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("ingest_epoch")
             .parquet(sink))

        q = (stream.writeStream.foreachBatch(write)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    _two_phase_stream(spark, ev, base, run)
    return (spark.read.parquet(sink)
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("user_id").cast("long").alias("n_users"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .cast("long").alias("value_cents"),
                 F.max(F.unix_micros("ts")).cast("long")
                 .alias("max_ts_us"))
            .orderBy("event_type"))


@_register(
    "b135_streaming_kmv_state",
    f"""
    WITH {_KMV_VALS_SQL}, agg AS (
      SELECT g, count(*) AS nh,
             max(CASE WHEN rn = 128 THEN h END) AS kth
      FROM r WHERE rn <= 128 GROUP BY g
    ), ex AS (SELECT g, count(*) AS n_exact FROM vals GROUP BY g)
    SELECT g, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN nh < 128 THEN nh
                     ELSE 127 * {_KMV_SPACE} // kth END AS BIGINT) AS est,
           CAST(abs(CASE WHEN nh < 128 THEN nh
                         ELSE 127 * {_KMV_SPACE} // kth END - n_exact)
                * 1000000 // n_exact AS BIGINT) AS err_ppm
    FROM ex JOIN agg USING (g) ORDER BY g
    """,
    "STREAMING sketch-state accumulation value-oracled bit-for-bit "
    "(streaming/sketch_state.py; the b102 batch twin's oracle "
    "verbatim).  The per-event-type user-day KMV sketch is "
    "accumulated via foreachBatch micro-batches across a checkpoint "
    "restart (two landing phases), published through versioned "
    "_SUCCESS-gated state dirs, then read back and estimated.  "
    "Because k-min-of-union == k-min-of-k-mins, the final state must "
    "EQUAL the batch sketch of all data — any merge loss, "
    "version-publish bug, or replay drift changes the k-th smallest "
    "hash and the estimate with it.  Portable md5-48 hash + "
    "truncating-div estimator keep every estimate oracle-exact.",
)
def b135_streaming_kmv_state(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    vals, _hashed = _kmv_user_day_hashes(spark, sf_dir)
    # stream over (g, v, event_id) rows; event_id drives the parity
    # split (any deterministic 50/50 split of the value space works)
    rows = vals.withColumn("event_id", F.col("v"))
    base = tempfile.mkdtemp(prefix="b135_kmv_")
    state = f"{base}/state"
    ckpt = f"{base}/ckpt"
    schema = rows.schema

    def run(landing: str) -> None:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(landing))
        q = start_kmv_accumulation(
            spark, stream, group_col="g", value_col="v",
            state_dir=state, checkpoint_dir=ckpt, k=128,
            available_now=True)
        q.awaitTermination()

    _two_phase_stream(spark, rows, base, run)
    sk = read_sketch_state(spark, state)
    est = _kmv.with_distinct_estimate(sk, 128).select("g", "est")
    exact = vals.groupBy("g").agg(
        F.count("*").cast("long").alias("n_exact"))
    return (exact.join(est, "g")
            .withColumn("err_ppm",
                        F.expr("abs(est - n_exact) * 1000000 "
                               "div n_exact").cast("long"))
            .select("g", "n_exact",
                    F.col("est").cast("long").alias("est"), "err_ppm")
            .orderBy("g"))


@_register(
    "b136_streaming_session_close",
    """
    WITH e AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), f AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ), g AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM f
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, session_id
    """,
    "STATEFUL streaming sessionization (applyInPandasWithState + "
    "EventTimeTimeout timers, streaming/stateful.py:"
    "timed_out_user_sessions) driven to completion inside the driver "
    "slot and value-oracled against the batch gaps-and-islands spec "
    "(b29's oracle verbatim).  events lands in two event-time-ordered "
    "phases; the second run RESTARTS from the first's checkpoint "
    "(state-store recovery), then two sentinel batches advance the "
    "watermark so every trailing open session is closed by its timer "
    "(timers fire one batch after the watermark passes).  In-order "
    "batches make eager emission exactly equal the batch spec, so any "
    "state-carry loss, timer miss, or double emission flips the hash. "
    "Exercises the exactly-once streaming file sink (_spark_metadata "
    "commit log) as the output path.",
)
def b136_streaming_session_close(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from tp_airflow_gtfs_snowflake_spark.streaming.stateful import (
        timed_out_user_sessions)

    GAP_US = 1_800_000_000  # 30 min, matches the b29 batch spec
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    lo, hi = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).first()
    mid = (lo + hi) // 2
    base = tempfile.mkdtemp(prefix="b136_sessions_")
    landing = f"{base}/landing"
    sink = f"{base}/sink"
    ckpt = f"{base}/ckpt"
    us = F.unix_micros("ts")
    (ev.filter(us < mid).repartition(2).write.parquet(landing))

    def start():
        stream = (spark.readStream.schema(ev.schema).parquet(landing))
        sessions = timed_out_user_sessions(
            stream, gap_seconds=1800, watermark="1 second")
        return (sessions.writeStream.outputMode("append")
                .format("parquet").option("path", sink)
                .option("checkpointLocation", ckpt))

    # run 1: phase-1 batch under availableNow, then stop (checkpoint
    # holds the per-user open-session state)
    q = start().trigger(availableNow=True).start()
    q.awaitTermination()

    # run 2: restart from the checkpoint; each drop is one in-order
    # micro-batch.  The two sentinel batches (a lone user -1 far past
    # max+gap) advance the watermark and then fire the timers; the
    # sentinel's own session stays open and is never emitted.
    q = start().start()
    (ev.filter(us >= mid).repartition(2)
     .write.mode("append").parquet(landing))
    q.processAllAvailable()
    for off in (GAP_US + 100_000_000, GAP_US + 110_000_000):
        (spark.range(1)
         .select(F.lit(-1).cast("long").alias("user_id"),
                 F.timestamp_micros(F.lit(hi + off)).alias("ts"))
         .write.mode("append").parquet(landing))
        q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(sink).filter(F.col("user_id") >= 0)
    sid = F.row_number().over(
        W.partitionBy("user_id").orderBy("session_start_us"))
    return out.select("user_id",
                      sid.cast("long").alias("session_id"),
                      "session_start_us", "session_end_us",
                      "n_events")
