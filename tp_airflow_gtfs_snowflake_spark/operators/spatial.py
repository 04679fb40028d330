"""Grid-blocked spatial radius self-join.

The blocked-join family's spatial member (siblings: length-band fuzzy
join in operators/fuzzy.py, LSH band buckets in operators/dedup.py,
IVF cells in operators/similarity.py): points land in square grid
cells of side >= radius, the right side replicates into its 3x3 cell
neighborhood, candidates meet on a cell EQUI-join, and an exact
distance predicate verifies.  Every pair within the radius differs by
less than one cell width per axis, so the 3x3 neighborhood is a
PROVABLY complete candidate set (no recall loss), and a pair is
emitted exactly once because only the right side replicates.

Scale design (100 TB of points):
- Replication factor is a constant 9 on one side; the join is a hash
  equi-join on (cell_x, cell_y) -- shuffle keys are two integers, and
  candidate verification touches only co-bucketed rows: O(sum of
  cell-pair products), never the O(n^2) theta join an engine would
  otherwise plan for an inequality-only condition.
- Dense hot cells (urban cores in real geo data) are ordinary join
  skew: AQE skew-join splitting or salting the cell key applies
  unchanged; cell side ~ radius keeps per-cell membership minimal.
- Distances compare as SQUARED integers (dx*dx + dy*dy < r*r): exact,
  overflow-safe for coordinates < 2^31, and portable to any oracle.

The reference has no spatial surface; nearest-stop / stops-within-
radius is the canonical GTFS consumer query over stops.txt
(stop_lat/stop_lon), which this operator serves once coordinates are
projected to integer meters (e.g. scaled web-mercator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_pairs(points: DataFrame, *, id_col: str = "id",
                 x_col: str = "x", y_col: str = "y",
                 radius: int) -> DataFrame:
    """All pairs (a, b) with a.id < b.id and squared euclidean
    distance strictly below radius^2.  Output: (id_a, id_b, dist_sq).

    ``radius`` must be a positive integer; coordinates are integers
    (project floats to a fixed grid first -- exactness of the
    verify predicate is the point).
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    # cast to long up front: with IntegerType inputs the squared
    # distance would wrap at 2^31 (radius over ~15k admits wrong
    # pairs) — the documented overflow guarantee needs 64-bit math
    # for any integer input type.
    p = points.select(F.col(id_col).alias("pid"),
                      F.col(x_col).cast("long").alias("px"),
                      F.col(y_col).cast("long").alias("py"))
    left = p.select(
        "pid", "px", "py",
        (F.col("px") - (F.col("px") % radius)).alias("gx"),
        (F.col("py") - (F.col("py") % radius)).alias("gy"))
    # replicate the right side into its 3x3 cell neighborhood; the
    # left side stays in its own cell, so each candidate pair meets
    # in exactly one (cell, offset) combination.
    off = F.expr("explode(flatten(transform(sequence(-1, 1), "
                 "dx -> transform(sequence(-1, 1), "
                 "dy -> struct(dx, dy)))))")
    right = (p.select(F.col("pid").alias("qid"),
                      F.col("px").alias("qx"),
                      F.col("py").alias("qy"),
                      off.alias("o"))
             .select("qid", "qx", "qy",
                     (F.col("qx") - (F.col("qx") % radius)
                      + F.col("o.dx") * radius).alias("gx"),
                     (F.col("qy") - (F.col("qy") % radius)
                      + F.col("o.dy") * radius).alias("gy")))
    dsq = ((F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
           + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy")))
    return (left.join(right, ["gx", "gy"])
            .filter((F.col("pid") < F.col("qid"))
                    & (dsq < F.lit(int(radius) * int(radius))))
            .select(F.col("pid").alias("id_a"),
                    F.col("qid").alias("id_b"),
                    dsq.alias("dist_sq")))


def nearest_within_radius(points: DataFrame, *, id_col: str = "id",
                          x_col: str = "x", y_col: str = "y",
                          radius: int) -> DataFrame:
    """For every point, its nearest OTHER point within `radius`
    (strictly), or no row if none exists.  Output: (id, nn_id,
    dist_sq) — the spatial as-of join: grid-blocked like radius_pairs
    (each candidate pair meets in exactly one cell-offset
    combination), then a per-point integer argmin with a
    deterministic (dist_sq, nn_id) tiebreak.

    Scale shape: identical to radius_pairs — 3x3 cell-neighborhood
    equi-join, never all-pairs — plus one min_by aggregate keyed by
    the point id.  64-bit math throughout (cast up front)."""
    both = radius_pairs(points, id_col=id_col, x_col=x_col,
                        y_col=y_col, radius=radius)
    # radius_pairs emits each unordered pair once (id_a < id_b);
    # mirror it so EVERY point sees all its neighbors
    mirrored = (both.select(F.col("id_a").alias("pid"),
                            F.col("id_b").alias("nn"),
                            "dist_sq")
                .unionAll(both.select(F.col("id_b").alias("pid"),
                                      F.col("id_a").alias("nn"),
                                      "dist_sq")))
    return (mirrored.groupBy("pid")
            .agg(F.min_by(F.struct("dist_sq", "nn"),
                          F.struct("dist_sq", "nn")).alias("best"))
            .select(F.col("pid").alias("id"),
                    F.col("best.nn").alias("nn_id"),
                    F.col("best.dist_sq").alias("dist_sq")))
