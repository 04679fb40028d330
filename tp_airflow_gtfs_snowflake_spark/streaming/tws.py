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

from tp_airflow_gtfs_snowflake_spark.streaming.stateful import (_positions,
                                                                ODOMETER_SCHEMA)

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
