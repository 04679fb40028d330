"""Round-8 unit/regression tests: streaming driver queries' helpers,
Theil-Sen median selection, Holt recurrence vs a sequential reference.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY


def _events(spark, tmp_path, rows):
    """Write a minimal events.parquet from (event_id, iso_ts, user_id,
    event_type, value) tuples and return the directory."""
    df = spark.createDataFrame(
        [(e, t, u, et, v, "{}") for e, t, u, et, v in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string").select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_theil_sen_keeps_even_pair_count_groups(spark, tmp_path):
    """4 days -> 6 pairwise slopes (EVEN count): the lower-median
    filter must still pick rn == (cnt+1) div 2 — a float division in
    the filter silently dropped even-count groups (r05 authoring
    bug, caught in self-review before any data hit it)."""
    sf = _events(spark, tmp_path, [
        (1, "2024-01-01T00:00:00", 7, "a", 1.0),
        (2, "2024-01-02T00:00:00", 7, "a", 2.0),
        (3, "2024-01-03T00:00:00", 7, "a", 3.0),
        (4, "2024-01-04T00:00:00", 7, "a", 4.0),
    ])
    out = REGISTRY["b137_theil_sen_slope"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["n_pairs"] == 6
    assert out[0]["slope_med_ppm"] == 100_000_000  # 1.00/day in cents


def test_holt_fold_matches_sequential_reference(spark, tmp_path):
    """The Spark array fold must replay the exact truncating-integer
    Holt recurrence, including negative-trend truncation toward
    zero."""
    daily = [500, 400, 290, 200, 90]  # falling series -> negative b
    rows = [(i, f"2024-01-0{i+1}T00:00:00", 7, "a", v / 100.0)
            for i, v in enumerate(daily, 0)]
    sf = _events(spark, tmp_path, [(e + 1, t, u, et, v)
                                   for e, (_, t, u, et, v)
                                   in enumerate(rows)])

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    l, b = daily[0], daily[1] - daily[0]
    for y in daily[2:]:
        l_new = trunc_div(y + l + b, 2)
        b = trunc_div(b + l_new - l, 2)
        l = l_new
    out = REGISTRY["b139_holt_linear_forecast"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["level_cents"], r["trend_cents"]) == (l, b)
    assert r["forecast_1"] == l + b and r["forecast_7"] == l + 7 * b
    assert b < 0  # the series actually exercises negative truncation


def test_streaming_restart_sink_semantics_under_checkpoint_loss(
        spark, tmp_path):
    """Negative/positive control pair for the b134 driver row.

    A naive APPEND sink duplicates phase-1 rows when the checkpoint
    is lost between phases (the textbook at-least-once failure — and
    exactly the end-state divergence the b134 value-hash catches).
    The epoch-partitioned dynamic-overwrite sink heals this specific
    loss mode: the restarted query re-ingests the whole backlog under
    restarted epoch ids, overwriting its own earlier directories, so
    the end state stays exact."""
    import shutil

    sf = _events(spark, tmp_path, [
        (i, f"2024-01-01T0{i}:00:00", i % 3, "a", float(i))
        for i in range(1, 7)
    ])
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))

    def run(landing, sink, ckpt, epoch_overwrite):
        stream = spark.readStream.schema(ev.schema).parquet(landing)

        def write(batch, epoch_id):
            out = batch.withColumn(
                "ingest_epoch", F.lit(int(epoch_id)).cast("long"))
            if epoch_overwrite:
                (out.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("ingest_epoch").parquet(sink))
            else:
                out.write.mode("append").parquet(sink)

        q = (stream.writeStream.foreachBatch(write)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for overwrite, expected in ((False, 9), (True, 6)):
        tag = "ow" if overwrite else "ap"
        landing = str(tmp_path / f"landing_{tag}")
        sink = str(tmp_path / f"sink_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        ev.filter("event_id <= 3").coalesce(1).write.parquet(landing)
        run(landing, sink, ckpt, overwrite)
        shutil.rmtree(ckpt)  # simulate checkpoint loss
        (ev.filter("event_id > 3").coalesce(1)
         .write.mode("append").parquet(landing))
        run(landing, sink, ckpt, overwrite)
        assert spark.read.parquet(sink).count() == expected, tag
