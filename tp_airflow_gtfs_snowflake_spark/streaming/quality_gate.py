"""Streaming corpus-quality monitor: per-micro-batch curation-gate
pass rates appended to an idempotent monitor table.

The streaming face of the c23 Gopher rules: as document files land, each
trigger computes (n_docs, n_keep, keep_ppm, token totals) for its batch
and writes ONE row keyed by batch epoch — dynamic partition overwrite
on the epoch, so an at-least-once foreachBatch replay rewrites its own
row instead of double-counting (the catalog.append_epoch discipline,
here for an additive metric that HLL/KMV-style set-merge idempotence
cannot cover).

Why this exists: a 100 TB ingest pipeline doesn't re-scan the corpus to
ask "did yesterday's crawl get worse?"  It reads this table — per-batch
aggregates are the only pass over raw text, the monitor is
batch-count-sized, and drops in keep_ppm localize regressions to the
batch (hence crawl slice) that caused them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_STOPS = ("the", "a", "of", "and", "in")


def gopher_keep_flag(text):
    """The c23 keep rule as a reusable Column (integer-ppm exact)."""
    toks = F.split(F.trim(F.lower(text)), " +")
    n_words = F.size(toks)
    sum_wlen = F.aggregate(F.transform(toks, lambda w: F.length(w)),
                           F.lit(0).cast("long"), lambda a, x: a + x)
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*_STOPS)))
    # integer div (not float): sum_wlen * 1e6 can pass 2^53 on huge
    # docs, and c23's oracle-checked rule is integer arithmetic
    mean_ok = (sum_wlen * 1_000_000 - 3_000_000 * n_words >= 0) & \
        (sum_wlen * 1_000_000 <= 10_000_000 * n_words + n_words - 1)
    return (n_words.between(50, 100_000)
            & mean_ok
            & (n_alpha * 1_000_000 >= n_words * 800_000)
            & (n_stop >= 2)), n_words


def batch_quality_stats(batch: DataFrame) -> DataFrame:
    """One aggregate row: (n_docs, n_keep, keep_ppm, n_tokens)."""
    keep, n_words = gopher_keep_flag(F.col("text"))
    flagged = batch.select(keep.alias("keep"),
                           n_words.alias("n_words"))
    return flagged.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("n_keep"),
        F.expr("sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000 "
               "div count(*)").cast("long").alias("keep_ppm"),
        F.sum("n_words").cast("long").alias("n_tokens"))


def write_quality_stats_epoch(batch: DataFrame, batch_id: int,
                              monitor_dir: str) -> None:
    """One micro-batch of the quality monitor: append the stats row
    under its epoch partition (idempotent replay).  Empty micro-batches
    are skipped — they would write n_docs=0 rows whose
    keep_ppm/n_keep/n_tokens aggregates are NULL, noise for every
    downstream trend consumer of the monitor table."""
    if not batch.head(1):
        return
    row = batch_quality_stats(batch).withColumn(
        "ingest_epoch", F.lit(int(batch_id)).cast("long"))
    (row.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("ingest_epoch")
     .parquet(monitor_dir))


def start_quality_monitor(spark: SparkSession, doc_stream: DataFrame, *,
                          monitor_dir: str, checkpoint_dir: str,
                          available_now: bool = False) -> StreamingQuery:
    """foreachBatch sink appending one stats row per micro-batch to
    the parquet monitor table at ``monitor_dir``, partitioned by
    batch epoch for idempotent replay."""

    def write(batch: DataFrame, batch_id: int) -> None:
        write_quality_stats_epoch(batch, batch_id, monitor_dir)

    writer = doc_stream.writeStream.foreachBatch(write) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
