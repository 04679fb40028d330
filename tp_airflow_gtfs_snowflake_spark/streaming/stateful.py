"""Stateful / advanced streaming operators (SURVEY M5 beyond the
basics): session windows, in-stream dedup, and a custom stateful
operator via applyInPandasWithState.

The reference never gets past permissive loads for late or duplicate
feed data (README.md:137-138); these are the Structured-Streaming-
native treatments:

- session windows bound gap-based activity without a fixed grid;
- dropDuplicatesWithinWatermark removes re-sent reports while keeping
  dedup state bounded by the watermark horizon (a plain
  dropDuplicates on a stream grows state forever);
- applyInPandasWithState holds per-key state across micro-batches for
  logic no built-in aggregate expresses (here: per-vehicle odometer —
  cumulative report count + path length from successive positions).

Scale notes: all three shuffle on their key exactly once per
micro-batch; state lives in the executor state store (RocksDB-backed
in production) and is bounded by watermark/timeout, so a 1000-executor
cluster shards state by key range with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from tp_airflow_gtfs_snowflake_spark.sources.gtfs_rt import (
    flatten_vehicle_positions, parse_feed_json,
)


def _positions(feed_stream: DataFrame) -> DataFrame:
    vp = flatten_vehicle_positions(parse_feed_json(feed_stream))
    return vp.withColumn("ts", F.timestamp_seconds("timestamp_epoch"))


def sessionized_vehicle_activity(feed_stream: DataFrame, *,
                                 gap: str = "10 minutes",
                                 watermark: str = "15 minutes") -> DataFrame:
    """Per-vehicle activity sessions: reports closer than `gap` merge
    into one session (dynamic-width windows — the 'trip burst' view a
    fixed tumbling grid can't express)."""
    return (_positions(feed_stream)
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("s"), "vehicle_id")
            .agg(F.count("*").alias("n_reports"))
            .select("vehicle_id",
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_reports"))


def deduped_position_reports(feed_stream: DataFrame, *,
                             watermark: str = "15 minutes") -> DataFrame:
    """Drop re-delivered (vehicle_id, timestamp) reports with state
    bounded by the watermark — the streaming analogue of the
    reference's first-wins snapshot dedup (gtfs_rt_minutely.py:98-100),
    which only deduped *within* one snapshot and silently kept
    cross-snapshot duplicates."""
    return (_positions(feed_stream)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["vehicle_id", "timestamp_epoch"]))


ODOMETER_SCHEMA = StructType([
    StructField("vehicle_id", StringType()),
    StructField("n_reports", LongType()),
    StructField("path_degrees", DoubleType()),
    StructField("last_lat", DoubleType()),
    StructField("last_lon", DoubleType()),
])

_ODO_STATE = StructType([
    StructField("n", LongType()),
    StructField("dist", DoubleType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
])


def vehicle_odometer(feed_stream: DataFrame, *,
                     watermark: str = "15 minutes") -> DataFrame:
    """Custom stateful operator: per-vehicle cumulative report count
    and coordinate-space path length across micro-batches.

    No built-in streaming aggregate can reference the PREVIOUS row's
    value (the position delta), so this is the applyInPandasWithState
    slot: state = (n, dist, last position), updated in event order
    within each batch.  Distance is in coordinate degrees — swap in a
    haversine for meters; the state machinery is the point here.

    Known limit of the one-pass state design (all pairwise-delta
    streaming accumulators share it): a late event arriving in a
    LATER batch — legal under the watermark — folds against the
    already-advanced last position, so its delta is measured from
    the newer point rather than its true neighbors.  Within a batch,
    rows are sorted by event time first; exact late-data reordering
    needs a buffer-until-watermark design (the session_window /
    watermarked-aggregation route) rather than per-row folding.
    """

    def update(key: tuple[str], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, dist, lat, lon = state.get
        else:
            n, dist, lat, lon = 0, 0.0, None, None
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp_epoch")
            for _, row in pdf.iterrows():
                if lat is not None:
                    dist += float(((row.latitude - lat) ** 2
                                   + (row.longitude - lon) ** 2) ** 0.5)
                lat, lon = float(row.latitude), float(row.longitude)
                n += 1
        state.update((n, dist, lat, lon))
        yield pd.DataFrame([{"vehicle_id": key[0], "n_reports": n,
                             "path_degrees": dist,
                             "last_lat": lat, "last_lon": lon}])

    pos = _positions(feed_stream).select(
        "vehicle_id", "timestamp_epoch", "latitude", "longitude", "ts")
    return (pos.withWatermark("ts", watermark)
            .groupBy("vehicle_id")
            .applyInPandasWithState(
                update, ODOMETER_SCHEMA, _ODO_STATE, "update",
                GroupStateTimeout.NoTimeout))


def trip_position_attribution(feed_stream: DataFrame, *,
                              join_window_seconds: int = 300,
                              watermark: str = "15 minutes",
                              how: str = "inner") -> DataFrame:
    """Watermarked stream-stream self-join: for each position report,
    the SAME vehicle's earlier reports within the last
    join_window_seconds (movement attribution — which prior fix does a
    report follow).

    Both sides carry a watermark and the join predicate bounds event
    time on both ends, so each side's state store holds only the
    window horizon — the required shape for an unbounded stream-stream
    join (an unbounded predicate would grow state forever).

    how='left_outer' additionally emits each report with NULL prior
    columns once the watermark proves no match can arrive — the
    streaming analogue of a batch left join, with emission delayed by
    (window + watermark) event time.
    """
    base = _positions(feed_stream).withWatermark("ts", watermark)
    cur = base.select(F.col("vehicle_id").alias("v"),
                      F.col("ts").alias("cur_ts"),
                      F.col("latitude").alias("cur_lat"),
                      F.col("longitude").alias("cur_lon"))
    prev = base.select(F.col("vehicle_id").alias("pv"),
                       F.col("ts").alias("prev_ts"),
                       F.col("latitude").alias("prev_lat"),
                       F.col("longitude").alias("prev_lon"))
    cond = ((F.col("v") == F.col("pv"))
            & (F.col("prev_ts") < F.col("cur_ts"))
            & (F.col("prev_ts") >= F.col("cur_ts")
               - F.expr(f"INTERVAL {join_window_seconds} SECONDS")))
    return (cur.join(prev, cond, how)
            .select("v", "cur_ts", "prev_ts",
                    (F.abs(F.col("cur_lat") - F.col("prev_lat"))
                     + F.abs(F.col("cur_lon") - F.col("prev_lon")))
                    .alias("l1_move")))


def _merge_gap_intervals(intervals: list[list[int]],
                         gap: int) -> list[list[int]]:
    """Merge ``[start, end, count]`` intervals whose gap to the
    previous merged interval is <= ``gap`` (all in one time unit).
    Shared by the vehicle- and user-keyed timeout sessionizers so the
    gap semantics cannot drift between them."""
    intervals = sorted(intervals, key=lambda iv: iv[0])
    merged: list[list[int]] = []
    for iv in intervals:
        if merged and iv[0] - merged[-1][1] <= gap:
            merged[-1][1] = max(merged[-1][1], iv[1])
            merged[-1][2] += iv[2]
        else:
            merged.append(list(iv))
    return merged


_TIMEOUT_SESSION_STATE = StructType([
    StructField("start_epoch", LongType()),
    StructField("end_epoch", LongType()),
    StructField("n", LongType()),
])

TIMEOUT_SESSION_SCHEMA = StructType([
    StructField("vehicle_id", StringType()),
    StructField("session_start", LongType()),
    StructField("session_end", LongType()),
    StructField("n_reports", LongType()),
])


def timed_out_sessions(feed_stream: DataFrame, *,
                       gap_seconds: int = 600,
                       watermark: str = "5 seconds") -> DataFrame:
    """TIMER-driven sessionization: a session row is emitted exactly
    once, when the event-time timer fires (watermark passes
    last_event + gap) — not re-emitted on every update.

    This is the GroupState timeout facility that the built-in
    session_window aggregation (sessionized_vehicle_activity) hides:
    each key re-arms ``setTimeoutTimestamp(end + gap)`` on every
    update; when the watermark crosses it, the callback runs with
    ``state.hasTimedOut`` and NO input rows, emits the final session,
    and clears state.  State per key is three longs — bounded no
    matter how long the session runs — and expiry is driven by the
    engine's watermark bookkeeping, not by data arrival for that key
    (an idle vehicle's session closes because OTHER traffic advances
    the watermark; a NoTimeout design would leak the key forever).
    transformWithState timers (streaming/tws.py) are the Spark-4
    successor of this shape; this form executes without the protobuf
    runtime dependency.

    Known limit (shared by every eager-emission GroupState
    sessionizer): a session closed by an IN-BATCH gap is emitted
    immediately, so a late event that would have bridged that gap —
    arriving in a later batch but inside the watermark — starts a
    new session instead of extending the emitted one (a split pair
    where ground truth is one session).  Emission is still
    exactly-once per detected session; if bridged-gap exactness
    matters more than eager output, use the built-in session_window
    aggregation, which buffers until the watermark before emitting.
    """

    def fn(key: tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame([{"vehicle_id": key[0],
                                 "session_start": start,
                                 "session_end": end,
                                 "n_reports": n}])
            return
        # Gap-aware merge (round-3 advice): the timer only fires for
        # keys with NO input this batch, so events arriving in one
        # batch but > gap apart (guaranteed during availableNow /
        # backlog catch-up) must be split HERE, not folded into one
        # carried session.  Treat the carried state as an interval,
        # each event as a point interval, sort, and merge on the gap;
        # every merged session except the last is provably closed by
        # in-batch data and is emitted now, the last stays in state.
        intervals: list[list[int]] = []
        if state.exists:
            s0, e0, n0 = state.get
            intervals.append([s0, e0, n0])
        epochs: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                epochs.extend(int(x) for x in pdf["timestamp_epoch"])
        intervals.extend([e, e, 1] for e in sorted(epochs))
        merged = _merge_gap_intervals(intervals, gap_seconds)
        if not merged:
            return
        *closed, (start, end, n) = merged
        # A timer STRICTLY below the current watermark is ILLEGAL to
        # register (the engine throws INVALID_TIMEOUT_TIMESTAMP) — and
        # also unnecessary: the watermark already proves no event can
        # extend the trailing session (later rows below the watermark
        # are dropped by withWatermark), so emit it eagerly instead.
        # Equality keeps the timer path: setTimeoutTimestamp rejects
        # only `timestampMs < watermark` (pinned by
        # test_timer_at_watermark_equality_is_legal), and an event at
        # exactly end+gap — deliverable because the late filter lags a
        # batch and merged by the gap<= rule — must still be able to
        # extend the session rather than see it split early.
        expiry_ms = (end + gap_seconds) * 1000
        if expiry_ms < state.getCurrentWatermarkMs():
            closed.append((start, end, n))
            if state.exists:
                state.remove()
        else:
            state.update((start, end, n))
            # re-arm: expire when the watermark proves the gap elapsed
            state.setTimeoutTimestamp(expiry_ms)
        if closed:
            yield pd.DataFrame(
                [{"vehicle_id": key[0], "session_start": s,
                  "session_end": e, "n_reports": c}
                 for s, e, c in closed])

    pos = _positions(feed_stream).select(
        "vehicle_id", "timestamp_epoch", "ts")
    return (pos.withWatermark("ts", watermark)
            .groupBy("vehicle_id")
            .applyInPandasWithState(
                fn, TIMEOUT_SESSION_SCHEMA, _TIMEOUT_SESSION_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))


USER_SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])

_USER_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
])


def timed_out_user_sessions(events_stream: DataFrame, *,
                            gap_seconds: int = 1800,
                            watermark: str = "1 second") -> DataFrame:
    """The user-keyed twin of :func:`timed_out_sessions` over a
    generic ``(user_id long, ts timestamp)`` event stream — timer-
    driven gap sessionization via applyInPandasWithState with
    EventTimeTimeout, microsecond precision (so its output is
    comparable against the batch gaps-and-islands spec, b29).

    Same contract and the same known limit as the vehicle variant:
    sessions closed by in-batch data are emitted eagerly and exactly
    once; the trailing open session per key is emitted when the
    watermark passes ``end + gap`` (which needs a later batch to
    advance the watermark, then one more batch to run the timers).
    When batches arrive in event-time order the emitted session set
    equals the batch gaps-and-islands sessionization exactly.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple[int], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": key[0],
                                 "session_start_us": start,
                                 "session_end_us": end,
                                 "n_events": n}])
            return
        intervals: list[list[int]] = []
        if state.exists:
            s0, e0, n0 = state.get
            intervals.append([s0, e0, n0])
        epochs: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                epochs.extend(int(x) for x in pdf["ts_us"])
        intervals.extend([e, e, 1] for e in sorted(epochs))
        merged = _merge_gap_intervals(intervals, gap_us)
        if not merged:
            return
        *closed, (start, end, n) = merged
        # timers are millisecond-granular; round the expiry UP so it
        # never fires a microsecond-fraction early.  A timer STRICTLY
        # below the current watermark is ILLEGAL to register (the
        # engine throws INVALID_TIMEOUT_TIMESTAMP — observed when a
        # batch jumps the watermark far past a session close, e.g. a
        # concurrent writer landing a sentinel in the same poll) and
        # unnecessary: the watermark already proves the trailing
        # session can never be extended, so emit it eagerly.  At exact
        # equality the timer stays legal (setTimeoutTimestamp rejects
        # only `<`) and must stay armed — a next-batch event at
        # ts == end+gap passes the lagging late filter and extends
        # the session under the gap<= merge rule.
        expiry_ms = -(-(end + gap_us) // 1000)
        if expiry_ms < state.getCurrentWatermarkMs():
            closed.append((start, end, n))
            if state.exists:
                state.remove()
        else:
            state.update((start, end, n))
            state.setTimeoutTimestamp(expiry_ms)
        if closed:
            yield pd.DataFrame(
                [{"user_id": key[0], "session_start_us": s,
                  "session_end_us": e, "n_events": c}
                 for s, e, c in closed])

    rows = events_stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"))
    return (rows.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, USER_SESSION_SCHEMA, _USER_SESSION_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))
