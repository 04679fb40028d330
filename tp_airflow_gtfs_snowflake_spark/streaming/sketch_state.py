"""Streaming sketch-state accumulation: merge per-micro-batch KMV
sketches into a persistent sketch table via foreachBatch.

The streaming twin of operators/kmv.py: each trigger sketches ONLY the
new rows, merges with the carried state, and overwrites the (tiny,
<= k rows per group) state table.  Because a KMV sketch is a SET of
minimum hashes, merge is idempotent and commutative:

- an at-least-once foreachBatch replay re-merges the same hashes into
  a state that already contains them — a no-op, so exactly-once
  output holds WITHOUT dedup bookkeeping (contrast additive counters,
  which double-count on replay and need the b41-style epoch ledger);
- the accumulated sketch equals the batch sketch of ALL data seen, so
  distinct estimates never drift from their batch recompute
  (tests/test_streaming.py pins exact equality).

Scale: per trigger the only work over new data is the mapInPandas
partial pass + one k-bounded merge agg; the state table is
vocabulary-of-groups sized, read+localCheckpoint'ed (it must be fully
materialized before the overwrite of its own directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tp_airflow_gtfs_snowflake_spark.operators import kmv


def merge_sketch_tables(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Merge two ``(g, sketch)`` tables: per group, the k smallest
    distinct hashes of the union — exactly the sketch of the unioned
    inputs (k-min of a union == k-min of the k-mins)."""
    return (a.unionByName(b)
            .select("g", F.explode("sketch").alias("h"))
            .groupBy("g")
            .agg(F.slice(F.array_sort(F.array_distinct(
                F.collect_list("h"))), 1, k).alias("sketch")))


def start_kmv_accumulation(spark: SparkSession, stream: DataFrame, *,
                           group_col: str, value_col: str,
                           state_dir: str, checkpoint_dir: str,
                           k: int = 128,
                           available_now: bool = False) -> StreamingQuery:
    """foreachBatch sink accumulating a per-group KMV distinct sketch
    of ``value_col`` into the parquet table at ``state_dir``."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        hashed = batch_df.select(
            F.col(group_col).alias("g"),
            kmv.portable_hash48(F.col(value_col)).alias("h"))
        part = kmv.kmv_sketch(hashed, "g", "h", k=k)
        try:
            prev = spark.read.parquet(state_dir)
            # materialize BEFORE overwriting the directory we read
            prev = prev.localCheckpoint(eager=True)
            part = merge_sketch_tables(prev, part, k)
        except Exception:
            pass  # first batch: no state yet
        part.write.mode("overwrite").parquet(state_dir)

    writer = stream.writeStream.foreachBatch(merge) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
