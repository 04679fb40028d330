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


def asof_join_nearest(left: DataFrame, right: DataFrame, *,
                      on: list[str], left_ts: str, right_ts: str,
                      right_payload: list[str] | None = None,
                      order_col: str | None = None) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'):
    every left row + the right row with the smallest |ts delta|,
    matching on `on` keys.  Ties between an equally-near earlier and
    later right row resolve to the EARLIER (backward) one; ties
    within a side resolve by `order_col` (backward: last in order,
    forward: first in order) so the result is deterministic under
    duplicate timestamps.

    Same scale contract as asof_join: union + ONE window shuffle of
    |l|+|r| rows — never the O(|l| x |r|/key) candidate join.  The
    backward match is last(ignorenulls) over the preceding frame,
    the forward match first(ignorenulls) over the following frame;
    both ride the same sort.  Adds `asof_dist_us` (microsecond
    distance — full timestamp precision, so near-ties resolve
    identically in any engine) and `asof_direction` ('b'/'f',
    null on no match).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns
                         if c not in on and c != right_ts]
    r_struct = F.struct(*right_payload,
                        F.col(right_ts).alias("_r_ts"))
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    ordc = order_col if order_col is not None else right_ts

    lhs = left.select(
        *on, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_ord"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"))
    rhs = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.col(ordc).cast("long").alias("_ord"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s"))
            .schema["s"].dataType).alias("_l"),
        r_struct.alias("_r"))

    # Sort: (_ts, _side, _ord).  At equal ts the right row sorts
    # before the left row, so a simultaneous right row is a backward
    # match at distance 0.
    base = W.partitionBy(*on).orderBy("_ts", "_side", "_ord")
    wb = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    j = (lhs.unionByName(rhs)
         .withColumn("_back", F.last("_r", ignorenulls=True).over(wb))
         .withColumn("_fwd", F.first("_r", ignorenulls=True).over(wf))
         .filter(F.col("_side") == 1))
    db = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_back._r_ts"))
    df_ = F.unix_micros(F.col("_fwd._r_ts")) - F.unix_micros(F.col("_ts"))
    take_fwd = (F.col("_back").isNull()
                | (F.col("_fwd").isNotNull() & (df_ < db)))
    j = j.withColumn("_match", F.when(take_fwd, F.col("_fwd"))
                     .otherwise(F.col("_back")))
    return j.select(
        "_l.*",
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
        F.col("_match._r_ts").alias("asof_ts"),
        F.when(F.col("_match").isNull(), F.lit(None).cast("long"))
        .when(take_fwd, df_).otherwise(db).alias("asof_dist_us"),
        F.when(F.col("_match").isNull(), F.lit(None).cast("string"))
        .when(take_fwd, F.lit("f")).otherwise(F.lit("b"))
        .alias("asof_direction"))
