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
    from tp_airflow_gtfs_snowflake_spark.operators.kmv import (
        kmin_merge_agg)
    return (a.unionByName(b)
            .select("g", F.explode("sketch").alias("h"))
            .groupBy("g")
            .agg(kmin_merge_agg("h", k)))


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _current_version(spark: SparkSession, state_dir: str) -> int | None:
    """Highest committed version number, or None before any batch.

    A version dir ``v-<batch_id>`` counts as committed only once
    Spark's job-commit ``_SUCCESS`` marker exists inside it — a crash
    mid-write leaves a marker-less dir that readers skip.
    """
    jvm, root, fs = _fs(spark, state_dir)
    if not fs.exists(root):
        return None
    best = None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("v-"):
            continue
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{state_dir}/{name}/_SUCCESS")
        if fs.exists(marker):
            n = int(name[2:])
            best = n if best is None or n > best else best
    return best


def read_sketch_state(spark: SparkSession,
                      state_dir: str) -> DataFrame | None:
    """The published ``(g, sketch)`` table, or None before any batch.

    State is versioned: each batch publishes ``state_dir/v-<batch_id>/``
    and readers take the highest version whose ``_SUCCESS`` marker
    exists (round-3 advice: the previous mode('overwrite') of the
    directory just read could lose ALL accumulated state on a crash
    between its delete and write phases, and the blanket except hid
    any such reset as a silent re-start from the current batch).
    """
    version = _current_version(spark, state_dir)
    if version is None:
        return None
    return spark.read.parquet(f"{state_dir}/v-{version}")


def start_kmv_accumulation(spark: SparkSession, stream: DataFrame, *,
                           group_col: str, value_col: str,
                           state_dir: str, checkpoint_dir: str,
                           k: int = 128,
                           available_now: bool = False) -> StreamingQuery:
    """foreachBatch sink accumulating a per-group KMV distinct sketch
    of ``value_col`` into the versioned state table at ``state_dir``
    (read it back with :func:`read_sketch_state`)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        hashed = batch_df.select(
            F.col(group_col).alias("g"),
            kmv.portable_hash48(F.col(value_col)).alias("h"))
        part = kmv.kmv_sketch(hashed, "g", "h", k=k)
        prev = read_sketch_state(spark, state_dir)
        if prev is not None:
            # a replay of batch N reads the v-N it is about to
            # rewrite — materialize before touching the directory
            part = merge_sketch_tables(
                prev.localCheckpoint(eager=True), part, k)
        # publish: write the new version BESIDE the old one; it only
        # becomes visible when Spark's job commit drops _SUCCESS.  A
        # crash at any point leaves the previous committed version as
        # the read target; a foreachBatch replay of the same batch_id
        # rewrites the same dir and re-merges idempotently (KMV is a
        # set union).  No read-modify-overwrite of a live directory.
        part.write.mode("overwrite").parquet(f"{state_dir}/v-{batch_id}")
        # GC: keep the TWO newest committed versions (a crashed replay
        # rewrite of v-N must still find v-(N-1) to recover from),
        # drop everything older, committed or debris.
        jvm, root, fs = _fs(spark, state_dir)
        committed = sorted(
            int(st.getPath().getName()[2:])
            for st in fs.listStatus(root)
            if st.getPath().getName().startswith("v-")
            and fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{state_dir}/{st.getPath().getName()}/_SUCCESS")))
        keep = set(committed[-2:])
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v-") and int(name[2:]) not in keep:
                fs.delete(st.getPath(), True)

    writer = stream.writeStream.foreachBatch(merge) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
