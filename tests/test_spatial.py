"""Grid-blocked spatial radius join: lossless vs brute force, exact
boundary semantics, and the cell equi-join plan shape."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import spatial


def _brute(pts, radius):
    out = set()
    for (i, x1, y1), (j, x2, y2) in itertools.combinations(pts, 2):
        d = (x1 - x2) ** 2 + (y1 - y2) ** 2
        if d < radius * radius:
            a, b = min(i, j), max(i, j)
            out.add((a, b, d))
    return out


@pytest.fixture(scope="module")
def random_points(spark):
    rng = random.Random(20260814)
    pts = [(i, rng.randrange(0, 2000), rng.randrange(0, 2000))
           for i in range(400)]
    return pts, spark.createDataFrame(pts, "id long, x long, y long")


def test_radius_pairs_equals_brute_force(spark, random_points):
    pts, df = random_points
    got = {(r["id_a"], r["id_b"], r["dist_sq"])
           for r in spatial.radius_pairs(df, radius=150).collect()}
    assert got == _brute(pts, 150)


def test_radius_boundary_is_strict_and_cross_cell(spark):
    # (0,0)-(150,0): dist == r -> excluded; (0,0)-(149,0): included
    # even though 149 sits in the neighboring cell; (10,10)-(1000,1000)
    # far -> excluded.
    pts = [(1, 0, 0), (2, 150, 0), (3, 149, 0), (4, 1000, 1000)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r["id_a"], r["id_b"])
           for r in spatial.radius_pairs(df, radius=150).collect()}
    assert got == {(1, 3), (2, 3)}  # |149-150|=1 also within radius


def test_radius_pairs_handles_negative_coords(spark):
    # the truncation grid has a double-width cell straddling zero;
    # coarser cells can't lose pairs -- pin it.
    pts = [(1, -10, 0), (2, 10, 0), (3, -310, 0)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r["id_a"], r["id_b"])
           for r in spatial.radius_pairs(df, radius=100).collect()}
    assert got == {(1, 2)}


def test_radius_pairs_no_int32_overflow(spark):
    """IntegerType coordinates with a large radius: the squared
    distance must be computed in 64-bit (int math wraps at 2^31 for
    radius over ~15k, admitting wrong pairs — round-3 advice)."""
    # dsq = 60000^2 = 3.6e9 > 2^31; wrapped it becomes negative and
    # would pass the `< r^2` filter.
    pts = [(1, 0, 0), (2, 60000, 0)]
    df = spark.createDataFrame(pts, "id int, x int, y int")
    got = spatial.radius_pairs(df, radius=50000).collect()
    assert got == []
    # and a genuinely-close pair at int type still matches exactly
    pts2 = [(1, 0, 0), (2, 49999, 0)]
    df2 = spark.createDataFrame(pts2, "id int, x int, y int")
    rows = spatial.radius_pairs(df2, radius=50000).collect()
    assert [(r["id_a"], r["id_b"], r["dist_sq"]) for r in rows] == \
        [(1, 2, 49999 * 49999)]


def test_radius_join_is_cell_equi_join(spark, random_points):
    """The candidate join must hash on the grid-cell key -- a plan
    that falls back to BroadcastNestedLoop/Cartesian means the engine
    treated the distance predicate as the join condition and the
    operator no longer scales past a single partition."""
    _, df = random_points
    plan = (spatial.radius_pairs(df, radius=150)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "gx" in plan  # cell key reached the join


def test_nearest_within_radius_equals_brute_force(spark, random_points):
    pts, df = random_points
    got = {(r["id"], r["nn_id"], r["dist_sq"]) for r in
           spatial.nearest_within_radius(df, radius=150).collect()}
    want = set()
    for i, x1, y1 in pts:
        best = None
        for j, x2, y2 in pts:
            if i == j:
                continue
            d = (x1 - x2) ** 2 + (y1 - y2) ** 2
            if d < 150 * 150 and (best is None or (d, j) < best):
                best = (d, j)
        if best is not None:
            want.add((i, best[1], best[0]))
    assert got == want and want
