"""Vector math over array<float> embedding columns (SURVEY C2).

All native higher-order functions (zip_with / aggregate) -> executed
JVM-side; no Python UDF in the hot path.  Inputs are cast to double
element-wise before any arithmetic so results are reproducible and
engine-comparable (float accumulation is not).

Scale note (100 TB): these expressions are embarrassingly parallel per
row; the expensive part of similarity search is the candidate join, not
the math - see operators/similarity.py for the broadcast brute-force
vs LSH-bucketed strategies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL for zero-norm inputs: under ANSI mode the bare division
    THROWS on the first all-zero embedding (padding/missing vectors)
    and with ANSI off it yields NaN — which sorts ABOVE every number
    in a descending top-k.  A zero vector has no direction, so NULL
    (which desc-sorts last and fails >= filters) is the only value
    that is both crash-free and ranking-safe."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))
