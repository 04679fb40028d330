"""Pointer-doubling tree depths: reference parity, forests, and the
logarithmic round bound."""

from __future__ import annotations

import pytest

from tp_airflow_gtfs_snowflake_spark.operators.hierarchy import tree_depths


def _ref(parents):
    depth, root = {}, {}

    def walk(n):
        if n in depth:
            return
        p = parents[n]
        if p == n:
            depth[n], root[n] = 0, n
            return
        walk(p)
        depth[n], root[n] = depth[p] + 1, root[p]

    for n in parents:
        walk(n)
    return {n: (root[n], depth[n]) for n in parents}


def _check(spark, parents, max_rounds=40):
    df = spark.createDataFrame(list(parents.items()),
                               "node long, parent long")
    got = {r["node"]: (r["root"], r["depth"])
           for r in tree_depths(df, max_rounds=max_rounds).collect()}
    assert got == _ref(parents)


def test_binary_tree_forest(spark):
    # two trees: binary tree rooted at 1 (nodes 1..30) and a 3-chain
    # rooted at 100
    parents = {n: max(1, n // 2) for n in range(1, 31)}
    parents[1] = 1
    parents.update({100: 100, 101: 100, 102: 101})
    _check(spark, parents)


def test_deep_chain_converges_logarithmically(spark):
    # depth 100 must converge within ceil(log2(100)) + 1 = 8 doubling
    # rounds — the point of pointer doubling vs level-at-a-time
    parents = {n: max(0, n - 1) for n in range(0, 101)}
    parents[0] = 0
    _check(spark, parents, max_rounds=8)


def test_cycle_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    with pytest.raises(RuntimeError, match="converge"):
        tree_depths(df, max_rounds=5)
