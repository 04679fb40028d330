"""Hierarchy traversal by pointer doubling (path halving).

Computes, for every node of a parent-pointer forest, its root and its
depth — the distributed replacement for a recursive CTE (`WITH
RECURSIVE` walks one level per step; Spark has no recursive SQL, and
a level-at-a-time loop needs O(depth) shuffles).

Pointer doubling (Wyllie's list-ranking idea, JACM 1979; the
standard Pregel/GraphX trick) squares the jump every round:
``anc <- anc.anc, d <- d + d.anc`` — after r rounds each pointer
spans 2^r parent edges, so a depth-D hierarchy converges in
ceil(log2 D) + 1 self-joins instead of D.

Scale design (100 TB of edges):
- Each round is ONE self-equi-join of the state relation on the
  ancestor key plus a narrow add — no collect, no driver graph.
  localCheckpoint per round cuts the doubling lineage (the iterative-
  Spark trap, same as operators/components.py).
- The convergence probe reads ONE row (`limit(1)`) of the rows that
  still moved, not a full count.
- O(log D) rounds means even a million-deep pathological chain is
  ~20 shuffles; org charts / category trees (D <= 30) converge in 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tree_depths(parents: DataFrame, *, node_col: str = "node",
                parent_col: str = "parent", max_rounds: int = 40,
                checkpoint: bool = True) -> DataFrame:
    """``(node, root, depth)`` for a forest given ``(node, parent)``
    rows; a root is a node whose parent is itself.  Raises if the
    pointer structure has not converged after ``max_rounds`` doubling
    rounds (cycle, or depth > 2^max_rounds)."""
    state = parents.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.when(F.col(parent_col) == F.col(node_col), F.lit(0))
        .otherwise(F.lit(1)).cast("long").alias("d"))
    if checkpoint:
        state = state.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        hop = state.select(F.col("node").alias("anc"),
                           F.col("anc").alias("anc2"),
                           F.col("d").alias("d2"))
        nxt = (state.join(hop, "anc")
               .select("node", F.col("anc2").alias("anc"),
                       (F.col("d") + F.col("d2")).alias("d"),
                       "d2"))
        if checkpoint:
            # lazy: the `moved` count below is the first action and
            # materializes the round — one job per round, not two
            # (scheduler-floor rule, BASELINE.md r07 profile)
            nxt = nxt.localCheckpoint(eager=False)
        moved = nxt.filter(F.col("d2") > 0).limit(1).count()
        state = nxt.drop("d2")
        if moved == 0:
            return state.select("node", F.col("anc").alias("root"),
                                F.col("d").alias("depth"))
    raise RuntimeError(
        f"tree_depths did not converge in {max_rounds} rounds "
        "(cycle in parent pointers, or depth exceeds 2^max_rounds)")
