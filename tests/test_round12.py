"""Unit tests for the round-12 retraction loader
(operators/incremental.retraction_apply_batch): delta algebra on
planted fixtures plus the at-least-once replay guarantee b161's
docstring claims — a redelivered batch must leave BOTH the adjustment
log and the user state byte-identical (the crash window between the
adjustment write and the checkpoint commit).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators.incremental import (
    retraction_apply_batch)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value_cents long, "
              "ord string")


def _view(spark, adj):
    return {r.event_type: (r.n_users, r.total_cents)
            for r in (spark.read.parquet(adj)
                      .groupBy("event_type")
                      .agg(F.sum("d_users").alias("n_users"),
                           F.sum("d_cents").alias("total_cents"))
                      .filter(F.col("n_users") > 0)
                      .collect())}


def test_retraction_moves_user_across_groups(spark, tmp_path):
    ustate = str(tmp_path / "ustate")
    adj = str(tmp_path / "adj")
    retraction_apply_batch(
        spark, _batch(spark, [(1, "click", 100, "a"),
                              (2, "view", 50, "a")]),
        ustate_path=ustate, adj_path=adj, epoch_id=0)
    assert _view(spark, adj) == {"click": (1, 100), "view": (1, 50)}
    # user 1's newer version moves them click -> view: the click
    # group must be retracted to zero users and drop from the view
    retraction_apply_batch(
        spark, _batch(spark, [(1, "view", 70, "b")]),
        ustate_path=ustate, adj_path=adj, epoch_id=1)
    assert _view(spark, adj) == {"view": (2, 120)}


def test_stale_update_loses_and_emits_nothing(spark, tmp_path):
    ustate = str(tmp_path / "ustate")
    adj = str(tmp_path / "adj")
    retraction_apply_batch(
        spark, _batch(spark, [(1, "click", 100, "b")]),
        ustate_path=ustate, adj_path=adj, epoch_id=0)
    # an OLDER version of user 1 arrives late: must lose everywhere
    retraction_apply_batch(
        spark, _batch(spark, [(1, "error", 999, "a")]),
        ustate_path=ustate, adj_path=adj, epoch_id=1)
    assert _view(spark, adj) == {"click": (1, 100)}
    st = spark.read.parquet(ustate).collect()
    assert [(r.user_id, r.event_type, r.value_cents) for r in st] \
        == [(1, "click", 100)]


def test_retraction_batch_replay_is_noop(spark, tmp_path):
    """At-least-once redelivery: re-applying an already-applied epoch
    must leave the adjustment log and state identical — the strict
    order-key win predicate empties the winners frame, and a dynamic
    overwrite of ZERO rows must touch no existing epoch partition."""
    ustate = str(tmp_path / "ustate")
    adj = str(tmp_path / "adj")
    retraction_apply_batch(
        spark, _batch(spark, [(1, "click", 100, "a"),
                              (2, "view", 50, "a")]),
        ustate_path=ustate, adj_path=adj, epoch_id=0)
    b1 = _batch(spark, [(1, "view", 70, "b"), (3, "error", 10, "b")])
    retraction_apply_batch(spark, b1, ustate_path=ustate,
                           adj_path=adj, epoch_id=1)
    before_view = _view(spark, adj)
    before_adj = sorted(map(tuple, spark.read.parquet(adj).collect()))
    before_state = sorted(map(tuple,
                              spark.read.parquet(ustate).collect()))
    # crash-and-replay: epoch 1 is delivered again verbatim
    retraction_apply_batch(spark, b1, ustate_path=ustate,
                           adj_path=adj, epoch_id=1)
    assert _view(spark, adj) == before_view
    assert sorted(map(tuple,
                      spark.read.parquet(adj).collect())) == before_adj
    assert sorted(map(tuple,
                      spark.read.parquet(ustate).collect())) \
        == before_state


def test_same_group_update_keeps_user_count_stable(spark, tmp_path):
    ustate = str(tmp_path / "ustate")
    adj = str(tmp_path / "adj")
    retraction_apply_batch(
        spark, _batch(spark, [(1, "click", 100, "a")]),
        ustate_path=ustate, adj_path=adj, epoch_id=0)
    # same-group value change: retract(click,-100) + add(click,+130)
    retraction_apply_batch(
        spark, _batch(spark, [(1, "click", 130, "b")]),
        ustate_path=ustate, adj_path=adj, epoch_id=1)
    assert _view(spark, adj) == {"click": (1, 130)}


def test_retraction_randomized_against_model(spark, tmp_path):
    """Seeded-random sequences of upserts (shuffled arrival order,
    duplicate users within a batch, cross-group moves, stale
    redeliveries) — the summed adjustment log must equal a
    from-scratch latest-wins model after EVERY batch."""
    import random

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        ustate = str(tmp_path / f"ustate_{seed}")
        adj = str(tmp_path / f"adj_{seed}")
        groups = ["click", "view", "purchase"]
        # a global stream of versioned updates: (user, grp, val, ord)
        events = [(u, rng.choice(groups), rng.randrange(1, 500),
                   f"{v:04d}")
                  for u in range(8) for v in rng.sample(range(100), 6)]
        rng.shuffle(events)
        model = {}  # user -> (ord, grp, val), latest-wins
        for ep, lo in enumerate(range(0, len(events), 12)):
            batch = events[lo:lo + 12]
            retraction_apply_batch(
                spark, _batch(spark, batch),
                ustate_path=ustate, adj_path=adj, epoch_id=ep)
            for u, g, v, o in batch:
                if u not in model or o > model[u][0]:
                    model[u] = (o, g, v)
            ref = {}
            for o, g, v in model.values():
                n, c = ref.get(g, (0, 0))
                ref[g] = (n + 1, c + v)
            assert _view(spark, adj) == ref, (seed, ep)
