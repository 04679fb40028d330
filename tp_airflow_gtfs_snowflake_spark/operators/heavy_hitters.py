"""Misra-Gries heavy hitters: mergeable frequent-item summaries.

The deterministic counter-based sketch (Misra & Gries 1982; merge
analysis Berinde et al. PODS'09 / Agarwal et al. "Mergeable
Summaries" PODS'12 — public papers): each partition keeps at most k
counters; when a new item overflows the budget, the (k+1)-th largest
count is subtracted from every counter and non-positive ones drop.
Every decrement round removes >= k+1 occurrence mass, so the total
undercount is bounded by n/(k+1) — any item with true frequency
above that bound SURVIVES in the summary.

Scale shape (100 TB):
- one narrow mapInPandas pass per partition (state lives across Arrow
  batches inside the iterator — no per-row Python round trips, counts
  come from vectorized value_counts),
- partial summaries are tiny ((item, count) x k per partition) and
  merge associatively with a plain groupBy-sum: the same
  partial/merge discipline as b41's HLL and b44's bitmaps, here for
  the frequent-items problem,
- the merged estimate is a LOWER bound on the true count; the
  guarantee degrades additively per merged partial (sum of per-
  partition n_p/(k+1) = n/(k+1) total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shrink(counters: dict, k: int) -> dict:
    """Enforce the k-counter budget: subtract the (k+1)-th largest
    count from all, drop non-positives.  Uniform subtraction keeps the
    MG undercount bound (every removed unit is charged to >= k+1
    distinct occurrence masses)."""
    if len(counters) <= k:
        return counters
    m = sorted(counters.values(), reverse=True)[k]
    return {i: c - m for i, c in counters.items() if c - m > 0}


def misra_gries_partials(df: DataFrame, item_col: str,
                         k: int = 32) -> DataFrame:
    """Per-partition MG summaries: (item, mg_count) with <= k rows per
    input partition; mg_count underestimates the partition-local true
    count by at most n_partition/(k+1)."""
    import pandas as pd

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for item, cnt in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            counters = _shrink(counters, k)
        if counters:
            yield pd.DataFrame({"item": list(counters),
                                "mg_count": list(counters.values())})

    return (df.select(F.col(item_col).cast("string").alias("item"))
            .mapInPandas(mg, "item string, mg_count long"))


def heavy_hitters(df: DataFrame, item_col: str, k: int = 32,
                  top: int = 10) -> DataFrame:
    """Merged global summary: top `top` items by merged lower-bound
    count.  Any item with true frequency > n/(k+1) is guaranteed to
    appear in the merged summary (mergeable-summaries bound)."""
    partials = misra_gries_partials(df, item_col, k)
    merged = partials.groupBy("item").agg(
        F.sum("mg_count").cast("long").alias("est_count"))
    return (merged.orderBy(F.desc("est_count"), F.asc("item"))
            .limit(top))
