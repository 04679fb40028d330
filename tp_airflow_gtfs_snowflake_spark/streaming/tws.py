"""Arbitrary stateful streaming on the Spark 4 transformWithState API.

`streaming/stateful.py:90` implements the per-vehicle odometer on
applyInPandasWithState (the Spark 3.4 API).  Spark 4 ships its
successor, transformWithStateInPandas (public: SPARK-49564 /
pyspark.sql.streaming.stateful_processor): a StatefulProcessor class
with TYPED state handles (value/list/map), timers and per-state TTL —
the shape long-running 100 TB streaming jobs need (explicit state
schema evolution, TTL instead of hand-rolled timeout bookkeeping).

This module re-expresses the odometer on the new API with identical
output semantics, so the two coexist as a migration pair: same input
contract (_positions rows), same output schema, same event-order
update rule.  tests/test_round2c.py asserts the two APIs produce the
same final per-vehicle totals on the same snapshots.

Runtime requirement (Spark's, not ours): transformWithState's
state-server protocol is protobuf-encoded, so executing a query needs
the `protobuf` Python package (pyspark.sql.streaming.proto imports
google.protobuf at query start).  Plan CONSTRUCTION works without it;
in a container without protobuf the end-to-end test skips and
applyInPandasWithState (stateful.vehicle_odometer) remains the
executable path — same totals, older state API.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (StatefulProcessor,
                                                      StatefulProcessorHandle)
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from tp_airflow_gtfs_snowflake_spark.streaming.stateful import (
    _merge_gap_intervals, _positions, ODOMETER_SCHEMA, USER_SESSION_SCHEMA)

_ODO_STATE = StructType([
    StructField("n", LongType()),
    StructField("dist", DoubleType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
])


class OdometerProcessor(StatefulProcessor):
    """Per-vehicle cumulative report count + coordinate path length,
    held in a single ValueState cell keyed by vehicle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._odo = handle.getValueState("odometer", _ODO_STATE)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        if self._odo.exists():
            n, dist, lat, lon = self._odo.get()
        else:
            n, dist, lat, lon = 0, 0.0, None, None
        for pdf in rows:
            pdf = pdf.sort_values("timestamp_epoch")
            for _, row in pdf.iterrows():
                if lat is not None:
                    dist += float(((row.latitude - lat) ** 2
                                   + (row.longitude - lon) ** 2) ** 0.5)
                lat, lon = float(row.latitude), float(row.longitude)
                n += 1
        self._odo.update((n, dist, lat, lon))
        yield pd.DataFrame([{"vehicle_id": key[0], "n_reports": n,
                             "path_degrees": dist,
                             "last_lat": lat, "last_lon": lon}])

    def close(self) -> None:
        pass


def vehicle_odometer_tws(feed_stream: DataFrame, *,
                         watermark: str = "15 minutes") -> DataFrame:
    """transformWithStateInPandas twin of stateful.vehicle_odometer."""
    pos = _positions(feed_stream).select(
        "vehicle_id", "timestamp_epoch", "latitude", "longitude", "ts")
    return (pos.withWatermark("ts", watermark)
            .groupBy("vehicle_id")
            .transformWithStateInPandas(
                statefulProcessor=OdometerProcessor(),
                outputStructType=ODOMETER_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# ------------------------------------------- timer-driven sessionizer

_TWS_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
    # the armed timer's expiry: transformWithState keeps a SET of
    # timers per key (unlike GroupState's single timeout slot), so a
    # re-arm must deleteTimer() the old one explicitly or the session
    # would emit once per historical expiry.
    StructField("timer_ms", LongType()),
])


class UserSessionProcessor(StatefulProcessor):
    """Gap-timeout sessionizer on the Spark-4 timer API — the
    transformWithState twin of ``stateful.timed_out_user_sessions``
    (same merge rule, same microsecond output, same eager-close
    watermark clamp), completing the migration pair for the
    timer-driven shape.

    Same known limit as the GroupState twin: sessions closed by an
    in-batch gap are emitted eagerly and exactly once; the trailing
    open session emits from :meth:`handleExpiredTimer` when the
    watermark passes ``end + gap``.

    The eager-close clamp mirrors stateful.py: a trailing session
    whose expiry is STRICTLY below the current watermark is treated
    as closed — the engine contract drops sub-watermark rows once the
    late filter catches up, so only a one-batch filter lag could
    still deliver an extender, the same bridged-gap exactness the
    eager-emission family already trades away (see the GroupState
    twin's known-limit note).  It is emitted now instead of arming a
    below-watermark timer —
    the watermark-jump shape that crashed the GroupState path with
    INVALID_TIMEOUT_TIMESTAMP (b136, r07) and whose engine behavior
    on a TWS below-watermark registerTimer is version-dependent.  At
    exact equality the timer stays armed: a next-batch event at
    ts == end + gap passes the lagging late filter and extends the
    session under the gap<= merge rule.
    """

    def __init__(self, gap_seconds: int = 1800) -> None:
        self._gap_us = gap_seconds * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("session", _TWS_SESSION_STATE)

    def _emit(self, key, sessions) -> pd.DataFrame:
        return pd.DataFrame(
            [{"user_id": key[0], "session_start_us": s,
              "session_end_us": e, "n_events": c}
             for s, e, c in sessions])

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        intervals: list[list[int]] = []
        old_timer = None
        if self._sess.exists():
            s0, e0, n0, old_timer = self._sess.get()
            intervals.append([s0, e0, n0])
        epochs: list[int] = []
        for pdf in rows:
            if len(pdf):
                epochs.extend(int(x) for x in pdf["ts_us"])
        intervals.extend([e, e, 1] for e in sorted(epochs))
        merged = _merge_gap_intervals(intervals, self._gap_us)
        if not merged:
            return
        *closed, (start, end, n) = merged
        expiry_ms = -(-(end + self._gap_us) // 1000)  # ceil: never early
        if expiry_ms < timerValues.getCurrentWatermarkInMs():
            closed.append((start, end, n))
            if self._sess.exists():
                self._sess.clear()
            if old_timer is not None:
                self._handle.deleteTimer(old_timer)
        else:
            self._sess.update((start, end, n, expiry_ms))
            if old_timer != expiry_ms:
                if old_timer is not None:
                    self._handle.deleteTimer(old_timer)
                self._handle.registerTimer(expiry_ms)
        if closed:
            yield self._emit(key, closed)

    def handleExpiredTimer(self, key, timerValues,
                           expiredTimerInfo) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():
            return
        start, end, n, timer_ms = self._sess.get()
        if timer_ms != expiredTimerInfo.getExpiryTimeInMs():
            return  # stale timer raced a re-arm; the live one will fire
        self._sess.clear()
        yield self._emit(key, [(start, end, n)])

    def close(self) -> None:
        pass


def timed_out_user_sessions_tws(events_stream: DataFrame, *,
                                gap_seconds: int = 1800,
                                watermark: str = "1 second") -> DataFrame:
    """transformWithStateInPandas twin of
    ``stateful.timed_out_user_sessions`` — same input contract
    ``(user_id long, ts timestamp)``, same output schema."""
    from pyspark.sql import functions as F

    rows = events_stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"))
    return (rows.withWatermark("ts", watermark)
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserSessionProcessor(gap_seconds),
                outputStructType=USER_SESSION_SCHEMA,
                outputMode="Append",
                timeMode="EventTime"))
