"""transformWithState sessionizer twin (VERDICT r07 task 6).

The GroupState sessionizers carry a revert-verified watermark-jump
regression test (tests/test_streaming.py::test_watermark_jump_...).
This file gives the Spark-4 timer path the same coverage:

- unit level, via fake state/timer handles driving the processor
  callbacks directly with the EXACT b136 batch shape — executable in
  this container (the TWS state-server protocol needs protobuf, which
  is absent, but the clamp logic under test is pure Python);
- end-to-end, as a protobuf-gated twin of the GroupState test that
  runs wherever transformWithState can execute.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql.streaming.stateful_processor import (ExpiredTimerInfo,
                                                      TimerValues)

from tp_airflow_gtfs_snowflake_spark.streaming.tws import (
    UserSessionProcessor, timed_out_user_sessions_tws)

T0_US = 1_709_532_000_000_000
GAP_S = 300
GAP_US = GAP_S * 1_000_000


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    """Mirrors the StatefulProcessorHandle surface the processor
    touches; timers are a SET, as in transformWithState."""

    def __init__(self):
        self.state = _FakeValueState()
        self.timers: set[int] = set()

    def getValueState(self, name, schema):
        return self.state

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


def _mk():
    proc = UserSessionProcessor(gap_seconds=GAP_S)
    handle = _FakeHandle()
    proc.init(handle)
    return proc, handle


def _rows(*ts_us):
    return iter([pd.DataFrame({"ts_us": list(ts_us)})])


def _input(proc, key, ts_list, wm_ms):
    out = list(proc.handleInputRows(
        key, _rows(*ts_list), TimerValues(currentWatermarkInMs=wm_ms)))
    return pd.concat(out) if out else pd.DataFrame()


def test_tws_watermark_jump_emits_stale_session_instead_of_timer():
    """The b136 shape on the TWS path: a sentinel batch jumped the
    watermark far past a session close; the next batch's old rows
    pass the lagging late filter and reach the handler.  The
    processor must emit the provably-closed session eagerly and arm
    NO below-watermark timer."""
    proc, handle = _mk()
    jumped_wm_ms = (T0_US + 100 * GAP_US) // 1000
    out = _input(proc, (2,),
                 [T0_US + 2 * GAP_US, T0_US + 2 * GAP_US + 5_000_000],
                 jumped_wm_ms)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.user_id, r.session_start_us, r.session_end_us, r.n_events) \
        == (2, T0_US + 2 * GAP_US, T0_US + 2 * GAP_US + 5_000_000, 2)
    assert not handle.state.exists()
    assert handle.timers == set()


def test_tws_equality_keeps_timer_and_session_extends():
    """At expiry == watermark the timer stays armed (ADVICE r07: only
    strictly-below is illegal/closed), so a next-batch event at
    exactly end + gap — deliverable through the lagging late filter —
    extends the session instead of seeing it split early."""
    proc, handle = _mk()
    end_us = T0_US + 1_000_000
    expiry_ms = -(-(end_us + GAP_US) // 1000)

    out = _input(proc, (1,), [T0_US, end_us], expiry_ms)  # wm == expiry
    assert out.empty  # nothing closed, timer armed
    assert handle.timers == {expiry_ms}
    assert handle.state.get() == (T0_US, end_us, 2, expiry_ms)

    # boundary event at ts == end + gap: merges (gap<= rule), re-arms
    bridge_us = end_us + GAP_US
    out = _input(proc, (1,), [bridge_us], expiry_ms)
    assert out.empty
    new_expiry = -(-(bridge_us + GAP_US) // 1000)
    assert handle.timers == {new_expiry}  # old timer deleted on re-arm
    assert handle.state.get() == (T0_US, bridge_us, 3, new_expiry)


def test_tws_timer_fire_emits_once_and_ignores_stale_expiry():
    proc, handle = _mk()
    expiry_ms = -(-(T0_US + 1_000_000 + GAP_US) // 1000)
    _input(proc, (1,), [T0_US, T0_US + 1_000_000], 0)
    assert handle.timers == {expiry_ms}

    tv = TimerValues(currentWatermarkInMs=expiry_ms + 1)
    # a stale timer (raced by a re-arm) must emit nothing
    stale = list(proc.handleExpiredTimer(
        (1,), tv, ExpiredTimerInfo(expiryTimeInMs=expiry_ms - 7)))
    assert stale == []
    assert handle.state.exists()

    fired = pd.concat(list(proc.handleExpiredTimer(
        (1,), tv, ExpiredTimerInfo(expiryTimeInMs=expiry_ms))))
    assert len(fired) == 1
    assert fired.iloc[0].n_events == 2
    assert not handle.state.exists()
    # a second fire of the same (now cleared) key emits nothing
    assert list(proc.handleExpiredTimer(
        (1,), tv, ExpiredTimerInfo(expiryTimeInMs=expiry_ms))) == []


def test_tws_in_batch_gap_closes_eagerly_and_keeps_trailing():
    """Two events > gap apart in ONE batch: the first session closes
    eagerly (exactly-once), the second stays in state with a timer —
    same contract as the GroupState twin."""
    proc, handle = _mk()
    late_us = T0_US + 5 * GAP_US
    out = _input(proc, (3,), [T0_US, late_us], 0)
    assert len(out) == 1
    assert (out.iloc[0].session_start_us, out.iloc[0].n_events) == (T0_US, 1)
    expiry_ms = -(-(late_us + GAP_US) // 1000)
    assert handle.state.get() == (late_us, late_us, 1, expiry_ms)
    assert handle.timers == {expiry_ms}


def test_tws_session_plan_constructs_without_protobuf(spark):
    """Plan construction (schema + grouping + timeMode) must work in
    any environment; only execution needs the protobuf state
    protocol."""
    from tp_airflow_gtfs_snowflake_spark.streaming.stateful import (
        USER_SESSION_SCHEMA)
    stream = (spark.readStream.format("rate").load()
              .selectExpr("value AS user_id", "timestamp AS ts"))
    df = timed_out_user_sessions_tws(stream, gap_seconds=GAP_S)
    assert df.isStreaming
    assert df.schema == USER_SESSION_SCHEMA


def test_tws_watermark_jump_end_to_end(spark, tmp_path):
    """Protobuf-gated e2e twin of test_watermark_jump_emits_stale_
    session_instead_of_crashing, on transformWithState."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf "
               "(absent in this container); the unit tests above "
               "drive the identical clamp logic directly")
    from pyspark.sql import functions as F

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def land(rows):
        (spark.createDataFrame(rows, "user_id long, ts_us long")
         .select("user_id", F.timestamp_micros("ts_us").alias("ts"))
         .coalesce(1).write.mode("append").parquet(landing))

    def drain(max_files=None):
        reader = spark.readStream.schema("user_id long, ts timestamp")
        if max_files:
            reader = reader.option("maxFilesPerTrigger", str(max_files))
        out = timed_out_user_sessions_tws(
            reader.parquet(landing), gap_seconds=GAP_S,
            watermark="1 second")
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    land([(1, T0_US), (1, T0_US + 1_000_000)])
    drain()
    land([(99, T0_US + 100 * GAP_US)])
    import time
    time.sleep(1.1)
    land([(2, T0_US + 2 * GAP_US), (2, T0_US + 2 * GAP_US + 5_000_000)])
    drain(max_files=1)
    land([(99, T0_US + 101 * GAP_US)])
    drain()

    rows = spark.read.parquet(sink).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user.get(2, [])) == 1
    s2 = by_user[2][0]
    assert (s2.session_start_us, s2.session_end_us, s2.n_events) == \
        (T0_US + 2 * GAP_US, T0_US + 2 * GAP_US + 5_000_000, 2)
    assert len(by_user.get(1, [])) == 1
