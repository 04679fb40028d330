"""High-watermark incremental append (A21/A22).

reference: every silver load shares
  INSERT INTO dst SELECT ... FROM src
  WHERE src.insert_date > COALESCE((SELECT MAX(insert_date) FROM dst),
                                   '1900-01-01'::TIMESTAMP_NTZ)
(dags/gtfs_silver.py:125-213).

Batch mode computes MAX(insert_date) on the destination — a cheap
parquet-footer-statistics scan — then appends only newer source rows
(the filter pushes down to the source scan).  Restart safety comes
from the append-only watermark monotonicity: a crashed run re-appends
nothing already visible, exactly like the reference.

The streaming-native replacement (checkpointed file source, which
eliminates the destination scan entirely) lives in streaming/.
"""

from __future__ import annotations

import datetime as dt
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.catalog import Warehouse

EPOCH_FLOOR = dt.datetime(1900, 1, 1)  # '1900-01-01'::TIMESTAMP_NTZ


def destination_watermark(wh: Warehouse, layer: str, name: str,
                          col: str = "insert_date") -> dt.datetime:
    """(SELECT MAX(insert_date) FROM dst) — scalar agg; on parquet this
    is answered from row-group statistics, not a full scan."""
    if not wh.exists(layer, name):
        return EPOCH_FLOOR
    row = wh.table(layer, name).agg(F.max(col).alias("wm")).collect()[0]
    return row["wm"] or EPOCH_FLOOR


def incremental_append(
    wh: Warehouse,
    src: DataFrame,
    dst_name: str,
    transform: Callable[[DataFrame], DataFrame],
    *,
    dst_layer: str = "silver",
    watermark_col: str = "insert_date",
) -> int:
    """Append transform(src rows newer than dst watermark) to dst.

    Returns the number of appended rows.  `transform` is the
    declarative silver select-list; the watermark filter is applied on
    the *source* before the transform so Catalyst pushes it into the
    source scan (partition pruning when src is date-partitioned).
    """
    wm = destination_watermark(wh, dst_layer, dst_name, watermark_col)
    fresh = src.filter(F.col(watermark_col) > F.lit(wm))
    out = transform(fresh)
    n = out.count()
    if n:
        # DELIBERATE DEVIATION: carry the BRONZE insert_date into
        # silver.  The reference's silver INSERTs omit insert_date, so
        # the column DEFAULT stamps silver-load time
        # (gtfs_silver.py:126-213) — but then a bronze row committed
        # between a silver run's watermark read and its insert could be
        # skipped forever (watermark already advanced past it).  Keying
        # the watermark on the carried bronze timestamp removes that
        # missed-row race; consumers reading silver insert_date get
        # bronze-ingest recency, not silver-load recency.
        wh.append(dst_layer, dst_name, out, stamp_insert_date=False)
    return n
