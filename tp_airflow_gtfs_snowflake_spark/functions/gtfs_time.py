"""GTFS service-time parsing (SURVEY B1).

GTFS static stop_times arrival/departure are "HH:MM:SS" strings where
HH may exceed 24 for post-midnight trips (the reference stores them raw
as STRING, dags/gtfs_static_daily.py:94-95, and never parses them).
A naive to_timestamp() fails on "25:10:00"; parse arithmetically to
seconds-since-service-midnight instead.  Pure native expressions ->
whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def gtfs_time_to_seconds(col: Column | str) -> Column:
    """'HH:MM:SS' (HH may be >= 24) -> seconds since service midnight.

    Null/malformed input -> null (mirrors the reference's permissive
    NULL_IF loads, gtfs_static_daily.py:121-122).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    ok = c.rlike(r"^\d+:\d{2}:\d{2}$")
    secs = (
        parts.getItem(0).cast("long") * 3600
        + parts.getItem(1).cast("long") * 60
        + parts.getItem(2).cast("long")
    )
    return F.when(ok, secs)


def service_seconds_to_epoch(service_date_col: Column, seconds_col: Column) -> Column:
    """Anchor seconds-since-service-midnight onto a service date ->
    epoch seconds.  Day rollover (>24h times) lands on the next civil
    day automatically because we add raw seconds."""
    return F.unix_timestamp(service_date_col.cast("timestamp")) + seconds_col
