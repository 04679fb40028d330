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


def incremental_rollup_refresh(
    spark,
    src: DataFrame,
    rollup_path: str,
    build: Callable[[DataFrame], DataFrame],
    *,
    date_col: str = "event_date",
    watermark_col: str = "insert_date",
) -> list:
    """Maintain a date-partitioned materialized rollup incrementally:
    recompute ONLY the partitions touched since the last refresh.

    The continuous-aggregate maintenance pattern (TimescaleDB calls it
    a hypertable rollup; Snowflake sells it as dynamic tables): at
    100 TB you cannot re-aggregate years of history because one late
    row arrived — you re-aggregate the one day it landed in.

    Mechanics per refresh:
    1. watermark = MAX(rollup_watermark) over the rollup (parquet
       footer stats, no full scan; EPOCH_FLOOR on first build);
    2. touched = DISTINCT date_col of source rows with
       watermark_col > watermark — a days-count-bounded list, safe to
       collect (same contract as the scalar watermark read);
    3. re-aggregate src WHERE date_col IN touched — ALL rows of those
       dates, so late data merges with history correctly (pruned scan:
       the IN list prunes partitions when src is date-partitioned);
    4. dynamic-partition-overwrite exactly those rollup directories.

    `build` is the rollup query (groupBy including date_col); the
    operator stamps each partition with rollup_watermark = MAX
    incoming watermark so refreshes compose.  Correctness requires
    watermark_col to be monotonic over arrival order (an ingest stamp,
    not an event time) — same contract as incremental_append.

    Returns the sorted list of refreshed date partitions.
    """
    try:
        existing = spark.read.parquet(rollup_path)
        wm = existing.agg(F.max("rollup_watermark").alias("wm")) \
            .collect()[0]["wm"] or EPOCH_FLOOR
    except Exception:
        wm = EPOCH_FLOOR
    fresh = src.filter(F.col(watermark_col) > F.lit(wm))
    touched = sorted(r[0] for r in
                     fresh.select(date_col).distinct().collect())
    if not touched:
        return []
    sliced = src.filter(F.col(date_col).isin(touched))
    wm_per_date = sliced.groupBy(date_col).agg(
        F.max(watermark_col).alias("rollup_watermark"))
    out = build(sliced).join(F.broadcast(wm_per_date), date_col)
    (out.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(date_col)
     .parquet(rollup_path))
    return touched


def merge_upsert(
    spark,
    updates: DataFrame,
    table_path: str,
    *,
    key_cols: list[str],
    order_col: str,
    partition_col: str | None = None,
) -> int:
    """Latest-wins keyed MERGE into a path-based parquet table (the
    UPDATE-by-key half the append-only loaders can't express — what
    MERGE INTO does on a transactional table format, built from
    primitives so it needs none).

    Rows with the same key collapse to the one with the highest
    `order_col` (use an ingest stamp; it must be unique per key for
    the winner to be well-defined).  With `partition_col` set, only
    partitions present in `updates` are read and rewritten (dynamic
    partition overwrite) — at 100 TB a trickle of updates rewrites
    the handful of dates it touches, never the table.  The merge
    itself is one hash aggregation on the keys: max_by(payload,
    order) — no window sort.

    NOT atomic across concurrent writers (parquet has no transaction
    log); single-writer-per-table is the operating contract, same as
    the reference's serialized loader DAGs.  Returns the number of
    rows written.
    """
    try:
        existing = spark.read.parquet(table_path)
        first_build = False
    except Exception:
        existing = None
        first_build = True

    if partition_col and not first_build:
        touched = [r[0] for r in
                   updates.select(partition_col).distinct().collect()]
        existing = existing.filter(F.col(partition_col).isin(touched))

    combined = updates if first_build \
        else existing.unionByName(updates)
    payload = [c for c in combined.columns if c not in key_cols]
    merged = (combined.groupBy(*key_cols)
              .agg(F.max_by(F.struct(*payload), F.col(order_col))
                   .alias("_p"))
              .select(*key_cols, "_p.*"))
    n = merged.count()

    writer = merged.write
    if partition_col:
        writer = (writer.mode("overwrite")
                  .option("partitionOverwriteMode", "dynamic")
                  .partitionBy(partition_col))
    else:
        writer = writer.mode("overwrite")
    writer.parquet(table_path)
    return n
