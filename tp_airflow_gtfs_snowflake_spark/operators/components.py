"""Connected components over a near-duplicate pair graph.

Near-dup detection (MinHash/SimHash/Jaccard — operators.dedup) emits
PAIRS; curation needs GROUPS ("keep one doc per component").  This
closes that gap with iterative min-label propagation, the standard
distributed CC algorithm (GraphX/Pregel style; see also the
large-star/small-star variant of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14, which bounds rounds by
O(log^2 n) on adversarial graphs).

Scale design (100 TB):
- Each round is ONE shuffle: propagate labels across edges
  (join on the neighbor key) then min-reduce per node.  No
  collect(), no driver-side graph.
- Rounds needed = graph diameter.  Near-dup components are
  overwhelmingly small cliques/chains (diameter 1-3), so 3-5 rounds
  converge in practice; `max_iter` caps pathological inputs and the
  convergence check is a cheap count on CHANGED labels only.
- `localCheckpoint` each round truncates the lineage so the plan
  does not grow quadratically with iterations (the classic iterative-
  Spark trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "d1",
                         dst: str = "d2", max_iter: int = 20,
                         checkpoint: bool = True) -> DataFrame:
    """Label each node of the undirected pair graph with the MINIMUM
    node id reachable from it (the canonical component id).

    Returns (node, component) for every node that appears in at least
    one edge.  Deterministic: min-label is order-independent.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    # The edge set is re-joined EVERY round; without a materialization
    # here each iteration would recompute the whole upstream pair
    # derivation (shingle explode + LSH + verify join — the expensive
    # part of near-dup edges) from scratch.  One checkpoint makes every
    # round read a compact (a, b) table instead.  LAZY (r08, the c104
    # scheduler-floor treatment extended upfront): round 1's
    # convergence count is the first action and materializes sym and
    # the initial labels as side effects — two fewer job submissions
    # (~100 ms floor each, BASELINE.md r07) for identical state.
    if checkpoint:
        sym = sym.localCheckpoint(eager=False)
    # Start from the cheapest admissible labelling: min(self, direct
    # neighbors).  Saves one full propagation round.
    labels = (sym.groupBy("a")
              .agg(F.least(F.first("a"), F.min("b")).alias("component"))
              .withColumnRenamed("a", "node"))
    if checkpoint:
        labels = labels.localCheckpoint(eager=False)

    # component's type is round-invariant (min of the same column);
    # resolve it ONCE — .dtypes inside the loop forced a full schema
    # analysis of the round's growing plan every iteration (ADVICE r11)
    _ctype = dict(labels.dtypes)["component"]

    # NOTE (r12, measured NEGATIVE — VERDICT r11 task 4 probe): fusing
    # TWO propagation hops per convergence check (count every second
    # round; min-label propagation is idempotent at its fixpoint, so
    # labels stay bit-identical — verified 0 mismatches at
    # sf0.001/0.01) measured jobs c19 15 -> 19 and c119 21 -> 25: the
    # intermediate hop needs its own lazy checkpoint (its consumers'
    # first exchanges differ — propagate join by b vs self-union agg
    # by node — so AQE exchange reuse cannot dedupe an uncut hop and
    # it would compute twice), and under AQE every additional
    # checkpoint boundary replays its shuffle stages as extra jobs at
    # toRdd time, costing MORE jobs than the skipped count saved.
    # One count per hop stays.
    for _ in range(max_iter):
        # candidate for node a: the label of each neighbor b; the
        # node's OWN current label rides along tagged in `old` so the
        # min-agg below yields the new label AND the convergence flag
        # in one pass — no per-round compare join of the new and old
        # label tables (r11 job diet: c19 jobs 18 -> 15, label output
        # proven identical; every node has exactly one self row, so
        # max(old) recovers its previous label exactly).
        cand = (sym.join(labels.withColumnRenamed("node", "b"), "b")
                .select(F.col("a").alias("node"), "component",
                        F.lit(None).cast(_ctype).alias("old")))
        self_rows = labels.select(
            "node", "component", F.col("component").alias("old"))
        flagged = (cand.unionByName(self_rows)
                   .groupBy("node")
                   .agg(F.min("component").alias("component"),
                        F.max("old").alias("old")))
        if checkpoint:
            # LAZY checkpoint: the convergence count below is the
            # first action, so it materializes the round's labels as
            # a side effect — one job per round instead of two (an
            # eager materialization followed by the count).  Each
            # job submission costs ~100 ms of scheduler floor on a
            # loaded container (BASELINE.md r07 profile).
            # Width note (ADVICE r11): the checkpoint stores three
            # columns (node, component, old) instead of two — ~1.5x
            # wider per-round block, accepted for the saved job; if
            # checkpoint memory ever binds at 100 TB, drop `old`
            # before the cut at the cost of re-deriving the flag.
            flagged = flagged.localCheckpoint(eager=False)
        changed = (flagged
                   .filter(F.col("component") != F.col("old"))
                   .limit(1).count())
        labels = flagged.select("node", "component")
        if changed == 0:
            break
    return labels


def dedup_keep_canonical(docs: DataFrame, edges: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Corpus-level near-dup removal: keep exactly one document per
    connected component (the minimum id — the component label itself)
    plus every document that appears in no near-dup pair."""
    comp = connected_components(edges)
    losers = (comp.filter(F.col("node") != F.col("component"))
              .select(F.col("node").alias(id_col)))
    return docs.join(losers, id_col, "left_anti")


def pagerank_int(edges: DataFrame, src: str = "a", dst: str = "b",
                 n_iter: int = 3, checkpoint: bool = True,
                 ckpt_every: int = 4) -> DataFrame:
    """PageRank in EXACT integer (ppm) arithmetic: rank_0 = 1e6 per
    node, rank_{k+1} = 150000 + 85 * sum_in(rank_k div outdeg) div 100
    (damping 0.85 as the 85/100 rational).  Truncating integer
    division at both the per-edge split and the damping step makes the
    fixed point a pure function of the input multiset — any engine
    (Spark `div`, DuckDB `//`) reproduces every rank bit-for-bit,
    which the float `pagerank` above can never promise (iterated
    float sums are order-dependent).

    Centrality ORDER converges within a few ppm of the float ranks
    (each truncation loses < 1 ppm per term); for corpus quality
    weighting — the consumer here — that is the same signal with a
    hard cross-engine correctness check attached.  Same scale shape
    as `pagerank`: per round one edges⋈ranks equi-join plus one
    groupBy(dst) sum.

    `ckpt_every`: lineage is cut every that-many rounds (plus the
    shared inputs up front).  Each eager checkpoint costs a full job
    submission — on a loaded scheduler that floor is ~100 ms/job, so
    per-round cuts dominate wall time for small n_iter (the r07
    profile of c104's drift: 6 checkpoint jobs, GC/deser < 3% of
    task time).  A handful of join+agg rounds is well within
    Catalyst's planning budget; cut only as often as lineage growth
    demands, not every round.

    The three upfront checkpoints stay EAGER deliberately: an r11
    interleaved A/B of the lazy flip measured +6% on c104 at sf0.1
    (3.11 -> 3.30 s min-of-3).  With AQE, a lazy cut still runs every
    shuffle stage at toRdd time and only defers the final stages —
    here that stacks three deferred finals into round 1's first
    action instead of three well-parallelized standalone jobs, and
    the round-1 join becomes the straggler.  Negative result pinned
    so the job-diet sweep doesn't re-try it.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct())
    eo = e.join(e.groupBy("a").agg(F.count("*").alias("outdeg")), "a")
    if checkpoint:
        eo = eo.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1000000).cast("long"))
    for i in range(n_iter):
        contrib = (eo.join(ranks.withColumnRenamed("node", "a"), "a")
                   .select(F.col("b").alias("node"),
                           F.expr("rank div outdeg").alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         (F.lit(150000).cast("long")
                          + F.expr("85 * coalesce(s, 0L) div 100"))
                         .cast("long").alias("rank")))
        if checkpoint and (i + 1) % ckpt_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def label_propagation(edges: DataFrame, src: str = "a", dst: str = "b",
                      n_iter: int = 4,
                      checkpoint: bool = True) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected pair graph, FIXED rounds and a deterministic tiebreak:
    every node starts labelled with its own id, and each round every
    node simultaneously adopts the most frequent label among itself
    plus its neighbors, ties broken by MINIMUM label.

    The vote INCLUDES the node's own current label on purpose: a
    neighbors-only sync vote makes every isolated PAIR — the most
    common near-dup shape — swap labels forever (the classic
    bipartite oscillation; found by this repo's own property test),
    ending wherever the round budget cuts it.  Self-inclusion turns
    the pair into a tie that the min-tiebreak resolves, so pairs and
    cliques converge to the minimum id.

    Fixed-round + min-tiebreak makes the result a pure function of
    the edge multiset — engine- and partitioning-independent, so a
    SQL oracle can unroll the rounds and match bit-for-bit (the
    pagerank_int discipline), and any residual oscillation on larger
    bipartite structures still can't become non-termination.

    Returns (node, label) for every node with at least one edge.
    Scale shape mirrors connected_components: each round is one
    edges⋈labels equi-join, one (node, label) count, and one max_by
    reduce per node — no driver-side graph.  Lineage is cut with a
    LAZY checkpoint EVERY round (not on a ckpt_every cadence): the
    self-inclusive vote references `labels` twice per round (the
    propagate join AND the self row), so the uncut plan DOUBLES per
    round — pointer-doubling-class growth, measured 62 exchanges at
    4 rounds vs 5 with per-round cuts.  eager=False keeps it at one
    job total (scheduler-floor rule, BASELINE.md r07)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    if checkpoint:
        sym = sym.localCheckpoint(eager=False)  # lazy: first action
        # materializes the (possibly expensive) pair derivation once
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for i in range(n_iter):
        cand = (sym.join(labels.withColumnRenamed("node", "b"), "b")
                .select(F.col("a").alias("node"), "label")
                .unionByName(labels))  # self-inclusive vote
        counts = (cand.groupBy("node", "label")
                  .agg(F.count("*").alias("cnt")))
        # most-frequent label, min-label tiebreak: max over the
        # (cnt, -label) struct — exact integers, order-independent
        labels = (counts.groupBy("node")
                  .agg(F.max_by("label",
                                F.struct(F.col("cnt"),
                                         (-F.col("label")).alias("nl")))
                       .alias("label")))
        if checkpoint and i + 1 < n_iter:
            labels = labels.localCheckpoint(eager=False)
    return labels


def pagerank(edges: DataFrame, src: str = "a", dst: str = "b",
             damping: float = 0.85, n_iter: int = 10,
             checkpoint: bool = True,
             ckpt_every: int = 4) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    (node, rank) with ranks normalized so an isolated-free graph sums
    to ~|V| (per-node teleport of (1-d), the GraphX convention).

    Scale shape mirrors connected_components: each iteration is one
    equi-join (edges x ranks, both partitioned on the source key) plus
    one groupBy(dst) sum — two shuffles per round, no driver-side
    state, lineage cut per round.  Dangling-node mass is dropped (the
    standard simplified variant); centrality ORDER, which is what
    corpus-quality weighting consumes, is unaffected.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct())
    # out-degree rides WITH the edge so the loop body joins ranks only
    eo = (e.join(e.groupBy("a").agg(F.count("*").alias("outdeg")), "a"))
    if checkpoint:
        eo = eo.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(n_iter):
        contrib = (eo.join(ranks.withColumnRenamed("node", "a"), "a")
                   .select(F.col("b").alias("node"),
                           (F.col("rank") / F.col("outdeg")).alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping)
                          + F.lit(damping) * F.coalesce("s", F.lit(0.0)))
                         .alias("rank")))
        # lineage is linear in rounds (ranks appears once per round),
        # so cut every ckpt_every rounds — each eager checkpoint is a
        # full job submission (scheduler-floor rule, BASELINE.md r07)
        if checkpoint and (i + 1) % ckpt_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def kcore_peel(edges: DataFrame, k: int = 2, rounds: int = 3,
               src: str = "a", dst: str = "b",
               checkpoint: bool = True) -> DataFrame:
    """`rounds` iterations of k-core peeling over an undirected edge
    list (pass BOTH directions): each round drops every node whose
    current degree is below k, then every edge touching a dropped
    node.  Returns (node, deg) for the survivors with their degree in
    the peeled graph.

    Fixed-round semantics on purpose: the result is a pure function
    of (edges, k, rounds) — engine- and partitioning-independent, so
    a SQL oracle can unroll the rounds and match bit-for-bit (the
    c104 pagerank_int discipline).  On dup graphs (cliques, diameter
    1-3) the fixpoint lands within 2-3 rounds anyway; pathological
    chains peel one layer per round, exactly like the distributed
    algorithm at scale (each round = one degree agg + one semi-join,
    lineage cut per round)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = e.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        e = (e.join(keep, "a", "left_semi")
             .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
             .select("a", "b"))
        if checkpoint:
            e = e.localCheckpoint(eager=True)
    return (e.groupBy("a").agg(F.count("*").alias("deg"))
            .select(F.col("a").alias("node"), "deg"))
