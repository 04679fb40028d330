"""Zero-extra-scan pipeline metrics via DataFrame.observe.

The reference audits each load with follow-up queries (row counts,
COPY load history: dags/gtfs_static_daily.py smoke checks, A12) —
every audit is ANOTHER warehouse query over the just-written data.
At 100 TB a second scan to count rows doubles the cost of the load.

Spark's `observe` API attaches aggregate metrics to the SAME job that
materializes the data: the metrics ride the action (write/count/
foreachBatch) as accumulators, so row counts, null counts and min/max
watermarks come back for free with the write.  This module wraps the
two shapes:

- batch: `observed(df, name, **metrics)` -> (df, Observation); call
  `.get` after any action on the returned df.
- streaming: `df.observe("name", ...)` works unchanged inside
  readStream graphs; per-batch values arrive on
  `StreamingQueryListener.onQueryProgress` (observedMetrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str,
             **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to df's next action.

    >>> df, obs = observed(df, "bronze_load",
    ...                    n_rows=F.count(F.lit(1)),
    ...                    null_ids=F.count_if(F.col("id").isNull()),
    ...                    max_ts=F.max("ts"))
    >>> df.write.parquet(path)   # ONE scan: data + metrics
    >>> obs.get["n_rows"]
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs


def load_audit_metrics(df: DataFrame, *, key_col: str,
                       ts_col: str | None = None) -> dict[str, Column]:
    """The standard load-audit bundle (A12's smoke checks as
    accumulators): volume, key nulls, and the incremental watermark the
    next run needs (operators/incremental.py reads it back with a
    scan — passing it forward from the write makes the next run's
    watermark lookup free)."""
    m: dict[str, Column] = {
        "n_rows": F.count(F.lit(1)),
        "null_keys": F.count_if(F.col(key_col).isNull()),
        "distinct_keys_approx": F.approx_count_distinct(key_col),
    }
    if ts_col is not None:
        m["max_ts"] = F.max(ts_col)
        m["min_ts"] = F.min(ts_col)
    return m
