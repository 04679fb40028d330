"""As-of join: for each left row, the latest right row with
right.ts <= left.ts within the same key.

The reference's nearest analogue is latest-row-per-key (B11,
README.md:127 live-bus map); a true as-of join generalizes it to
per-probe-time lookups (price-at-trade, position-at-event).

Scale design — union + window, not a range join:
a naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + max() builds
O(|l| x |r|/key) intermediate rows before aggregating.  Instead we
union both sides tagged by origin, sort within (key) by (ts, side)
via a single window, and carry the last right-side payload forward
with last(ignorenulls=True).  Cost: ONE shuffle of |l|+|r| rows and a
per-key sort — the same plan shape Spark uses for
sessionization, and the standard trick Flink/kdb+ users port to
Spark.  Skewed keys: salt the window key and merge, or let AQE split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: list[str],
              left_ts: str, right_ts: str,
              right_payload: list[str] | None = None,
              tolerance_seconds: int | None = None) -> DataFrame:
    """Left as-of join (backward): every left row + the most recent
    right row at-or-before its timestamp, matching on `on` keys.

    right_payload: right columns to carry (default: all non-key,
    non-ts columns).  tolerance_seconds: matches older than this are
    nulled out (pandas merge_asof `tolerance` semantics).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns
                        if c not in on and c != right_ts]

    lhs = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload, F.col(right_ts)
                                  .alias("_r_ts")).alias("s"))
            .schema["s"].dataType).alias("_r"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s"))
            .schema["s"].dataType).alias("_l"),
        F.struct(*right_payload, F.col(right_ts).alias("_r_ts")).alias("_r"),
    )
    # _side orders right rows before left rows at equal ts, so an
    # exactly-simultaneous right row IS visible to the left row (<=).
    w = (W.partitionBy(*on).orderBy("_ts", "_side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    joined = (lhs.unionByName(rhs)
              .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
              .filter(F.col("_side") == 1))
    if tolerance_seconds is not None:
        too_old = (F.col("_ts").cast("long")
                   - F.col("_match._r_ts").cast("long")) > tolerance_seconds
        joined = joined.withColumn(
            "_match", F.when(too_old, F.lit(None)).otherwise(F.col("_match")))
    out = joined.select(
        "_l.*",
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
        F.col("_match._r_ts").alias("asof_ts"),
    )
    return out
