"""KPI/analytics layer (SURVEY §2.3, B1-B13).

reference: README.md:116-129 lists the dashboard KPIs ("retard moyen
dans le temps", "taux de ponctualité", "lignes les plus en retard",
"top arrêts problématiques", heatmap, distribution, "temps de parcours
réel vs théorique", live bus map, stop service-state map, per-stop
delay evolution).  The queries were computed Snowflake-side and are
not in the repo (README.md:133); these are their operator-faithful
Spark reconstructions over the silver tables.

Core semantics — delay:
  observed epoch (trip_stop_times_silver.arrival_time, RT) minus
  scheduled service time (stop_times_static_silver.arrival_time,
  "HH:MM:SS" possibly >= 24:00:00) anchored on a service date.
Join keys: (trip_id, stop_sequence) primary; RT may omit stop_sequence
or stop_id (gtfs_rt_minutely.py:104-105, README.md:138) -> fall back
to (trip_id, stop_id) for rows without a sequence (SURVEY §7).

Scale: the static schedule is a small dimension (10^5-10^6 rows even
for a huge network) -> broadcast it; the RT fact is the big side and
arrives date-partitioned, so every KPI takes a recency filter that
prunes partitions (B13, README.md:139).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.catalog import Warehouse
from tp_airflow_gtfs_snowflake_spark.functions.gtfs_time import (
    gtfs_time_to_seconds, service_seconds_to_epoch,
)

PUNCTUAL_THRESHOLD_S = 180  # "on time" = observed within 3 min of schedule


def observed_vs_scheduled(wh: Warehouse, service_date: dt.date) -> DataFrame:
    """B1+B2+B3: the delay fact — one row per observed stop event with
    its scheduled counterpart and delay_s."""
    rt = wh.table("silver", "trip_stop_times_silver").select(
        "trip_id", "stop_sequence", "stop_id",
        F.coalesce("arrival_time", "departure_time").alias("observed_epoch"),
    ).where(F.col("observed_epoch").isNotNull())

    sched = wh.table("silver", "stop_times_static_silver").select(
        "trip_id", "stop_sequence", "stop_id",
        gtfs_time_to_seconds(F.coalesce("arrival_time", "departure_time"))
        .alias("sched_s"),
    ).where(F.col("sched_s").isNotNull())
    sched = sched.withColumn(
        "sched_epoch",
        service_seconds_to_epoch(F.lit(service_date.isoformat()), F.col("sched_s")))

    # primary key join; fall back to (trip, stop) when RT lacks the seq
    with_seq = rt.where(F.col("stop_sequence").isNotNull()).join(
        F.broadcast(sched.select("trip_id", "stop_sequence",
                                 F.col("stop_id").alias("sched_stop_id"),
                                 "sched_epoch")),
        ["trip_id", "stop_sequence"], "inner",
    ).select("trip_id", "stop_sequence",
             F.coalesce("stop_id", "sched_stop_id").alias("stop_id"),
             "observed_epoch", "sched_epoch")

    no_seq = rt.where(F.col("stop_sequence").isNull()
                      & F.col("stop_id").isNotNull()).join(
        F.broadcast(sched.select("trip_id", "stop_id",
                                 F.col("stop_sequence").alias("sched_seq"),
                                 "sched_epoch")),
        ["trip_id", "stop_id"], "inner",
    ).select("trip_id", F.col("sched_seq").alias("stop_sequence"), "stop_id",
             "observed_epoch", "sched_epoch")

    return (with_seq.unionByName(no_seq)
            .withColumn("delay_s", F.col("observed_epoch") - F.col("sched_epoch")))


def avg_delay_over_time(delays: DataFrame, bucket: str = "5 minutes") -> DataFrame:
    """B5: 'retard moyen dans le temps' (README.md:120)."""
    return (delays
            .withColumn("ts", F.timestamp_seconds("observed_epoch"))
            .groupBy(F.window("ts", bucket).alias("w"))
            .agg(F.avg("delay_s").alias("avg_delay_s"),
                 F.count("*").alias("n_observations"))
            .select(F.col("w.start").alias("bucket_start"),
                    "avg_delay_s", "n_observations"))


def punctuality_rate(delays: DataFrame,
                     threshold_s: int = PUNCTUAL_THRESHOLD_S) -> DataFrame:
    """B6: 'taux de ponctualité' (README.md:121)."""
    on_time = F.when(F.abs("delay_s") <= threshold_s, 1).otherwise(0)
    return delays.agg(F.avg(on_time).alias("punctuality_rate"),
                      F.count("*").alias("n"))


def most_delayed_lines(wh: Warehouse, delays: DataFrame, k: int = 10) -> DataFrame:
    """B7+B4: 'lignes les plus en retard' (README.md:122)."""
    trips = wh.table("silver", "trips_static_silver").select("trip_id", "route_id")
    routes = wh.table("silver", "routes_static_silver").select(
        "route_id", "route_long_name")
    return (delays
            .join(F.broadcast(trips), "trip_id")
            .join(F.broadcast(routes), "route_id")
            .groupBy("route_id", "route_long_name")
            .agg(F.avg("delay_s").alias("avg_delay_s"),
                 F.count("*").alias("n_observations"))
            .orderBy(F.desc("avg_delay_s"), "route_id")
            .limit(k))


def top_problem_stops(wh: Warehouse, delays: DataFrame, k: int = 10,
                      threshold_s: int = PUNCTUAL_THRESHOLD_S) -> DataFrame:
    """B7: 'top des arrêts problématiques' (README.md:123) — stops
    ranked by late-share."""
    stops = wh.table("silver", "stops_static_silver").select("stop_id", "stop_name")
    late = F.when(F.col("delay_s") > threshold_s, 1).otherwise(0)
    return (delays.join(F.broadcast(stops), "stop_id")
            .groupBy("stop_id", "stop_name")
            .agg(F.avg(late).alias("late_share"),
                 F.avg("delay_s").alias("avg_delay_s"),
                 F.count("*").alias("n_observations"))
            .orderBy(F.desc("late_share"), F.desc("avg_delay_s"), "stop_id")
            .limit(k))


def delay_heatmap(delays: DataFrame) -> DataFrame:
    """B8: 'heatmap heures x jours' (README.md:124)."""
    ts = F.timestamp_seconds("observed_epoch")
    return (delays
            .groupBy((F.weekday(ts) + 1).alias("iso_dow"),
                     F.hour(ts).alias("hour_of_day"))
            .agg(F.avg("delay_s").alias("avg_delay_s"),
                 F.count("*").alias("n_observations")))


def delay_distribution(delays: DataFrame, bucket_s: int = 60) -> DataFrame:
    """B9: 'distribution des retards' (README.md:125)."""
    return (delays
            .groupBy(F.floor(F.col("delay_s") / bucket_s).alias("bucket"))
            .agg(F.count("*").alias("n"))
            .withColumn("bucket_lo_s", F.col("bucket") * bucket_s)
            .drop("bucket"))


def travel_time_actual_vs_scheduled(delays: DataFrame) -> DataFrame:
    """B10: 'temps de parcours réel vs théorique' (README.md:126) —
    per trip, last-stop minus first-stop time, observed and scheduled."""
    w = (W.partitionBy("trip_id").orderBy("stop_sequence", "observed_epoch")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (delays
            .select("trip_id",
                    (F.last("observed_epoch").over(w)
                     - F.first("observed_epoch").over(w)).alias("actual_s"),
                    (F.last("sched_epoch").over(w)
                     - F.first("sched_epoch").over(w)).alias("scheduled_s"))
            .distinct()
            .withColumn("diff_s", F.col("actual_s") - F.col("scheduled_s")))


def live_vehicle_map(wh: Warehouse) -> DataFrame:
    """B11: 'carte des bus en temps réel' (README.md:127) — newest
    position per vehicle."""
    vp = wh.table("silver", "vehicle_positions_silver")
    w = W.partitionBy("vehicle_id").orderBy(
        F.desc("timestamp_epoch"), F.desc("insert_date"), F.desc("trip_id"))
    return (vp.where(F.col("vehicle_id").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vehicle_id", "trip_id", "route_id", "latitude",
                    "longitude", "bearing", "timestamp_epoch"))


def stop_service_state(wh: Warehouse, since_epoch: int | None = None) -> DataFrame:
    """B12: 'carte des arrêts avec état de service' (README.md:128) —
    all stops left-joined to recent RT activity; no activity = out of
    service."""
    stops = wh.table("silver", "stops_static_silver").select(
        "stop_id", "stop_name", "stop_lat", "stop_lon")
    rt = wh.table("silver", "trip_stop_times_silver").where(
        F.col("stop_id").isNotNull())
    if since_epoch is not None:  # B13 recency filter
        rt = rt.where(F.coalesce("arrival_time", "departure_time") >= since_epoch)
    activity = rt.groupBy("stop_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.coalesce("arrival_time", "departure_time")).alias("last_seen_epoch"))
    return (stops.join(activity, "stop_id", "left")
            .select("stop_id", "stop_name", "stop_lat", "stop_lon",
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    "last_seen_epoch",
                    F.when(F.col("n_events").isNull(), F.lit("out-of-service"))
                     .otherwise(F.lit("in-service")).alias("service_state")))


def delay_evolution_per_stop(delays: DataFrame,
                             bucket: str = "15 minutes") -> DataFrame:
    """B5 per stop: 'évolution du retard par arrêt' (README.md:129)."""
    return (delays
            .withColumn("ts", F.timestamp_seconds("observed_epoch"))
            .groupBy("stop_id", F.window("ts", bucket).alias("w"))
            .agg(F.avg("delay_s").alias("avg_delay_s"),
                 F.count("*").alias("n_observations"))
            .select("stop_id", F.col("w.start").alias("bucket_start"),
                    "avg_delay_s", "n_observations"))


def headway_regularity(stop_times: DataFrame, *,
                       group_cols: tuple[str, ...] = ("stop_id",),
                       time_col: str = "arrival_s") -> DataFrame:
    """Scheduled headways and excess wait time per stop (classic
    transit KPI the reference's KPI list stops short of,
    README.md:116-129 names delays/heatmaps only): headway = gap to
    the next arrival at the same stop; EWT = E[h^2] / (2 E[h]) is the
    average wait a random-arriving passenger experiences, which
    exceeds half the mean headway exactly when service bunches.
    Computed as one window (lead) + one agg — integer seconds
    throughout."""
    from pyspark.sql import Window as W
    w = W.partitionBy(*group_cols).orderBy(time_col)
    h = (stop_times
         .withColumn("_h", F.lead(time_col).over(w) - F.col(time_col))
         .filter(F.col("_h").isNotNull() & (F.col("_h") > 0)))
    return (h.groupBy(*group_cols)
            .agg(F.count("*").alias("n_headways"),
                 F.expr("sum(_h) div count(*)").alias("mean_headway_s"),
                 F.expr("sum(_h * _h) div (2 * sum(_h))")
                 .alias("ewt_s"))
            .withColumn("bunching_ratio_ppm",
                        F.expr("ewt_s * 2000000 div "
                               "nullif(mean_headway_s, 0)")))
