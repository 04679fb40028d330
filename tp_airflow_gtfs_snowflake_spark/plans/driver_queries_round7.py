"""Round-7 registry additions (all value-hash oracled).

Graph: c104 integer PageRank (flips the iterative-rank family to
value-hash), c106 neighborhood-overlap link prediction, c112 k-core
peeling.  Curation: c105 bigram-LM fluency, c108 n-gram novelty,
c109 blocklist gate, c113 near-dup evidence shingles.  Evaluation:
c110 recommender precision@1, c111 IPS/SNIPS off-policy value.
Experimentation: b124 two-proportion z-test, b125 CUPED.  Analytics:
b121 OHLC candles, b122 theta a-not-b, b123 Spearman, b126 MAD
outliers, b127 RFM, b128 peak concurrency (blocked sweep-line),
b129 price/volume bridge, b130 cohort LTV, b131 seasonal indices.

Recurring disciplines: truncating integer arithmetic for anything
iterated or divided; single-row decimal->double combination for
statistics (no accumulation-order float drift); fixed-round
semantics for iterative graph ops so oracles can unroll; blocked
two-pass prefix sums wherever a window would otherwise sort an
unbounded partition.

Reference scope note: the reference pipeline (dags/gtfs_static.py,
dags/gtfs_rt_minutely.py) stops at KPI aggregates; these are charter
extensions in the same spirit as the c-tier curation suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import kmv as _kmv
from tp_airflow_gtfs_snowflake_spark.operators.components import pagerank_int
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
    _duck_shingles, _duck_toks, _spread)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_graph import (
    _EDGES_SQL, _edges)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_round6 import (
    _KMV_SPACE, _KMV_VALS_SQL, _kmv_user_day_hashes)


# ---------------------------------------------------------------------
# c104: integer PageRank — the value-hash twin of c32.
# ---------------------------------------------------------------------

def _duck_pr_iter(prev: str, out: str) -> str:
    """One unrolled integer-PageRank round (mirrors
    operators.components.pagerank_int: per-edge rank//outdeg split,
    then 150000 + 85*sum//100 damping, all truncating division)."""
    return f"""
    {out} AS (
      SELECT n.node,
             CAST(150000 + 85 * COALESCE(c.s, 0) // 100 AS BIGINT) AS rank
      FROM (SELECT a AS node FROM deg) n
      LEFT JOIN (
        SELECT s.b AS node, sum(r.rank // d.outdeg) AS s
        FROM sym s JOIN {prev} r ON r.node = s.a
                   JOIN deg d ON d.a = s.a
        GROUP BY s.b) c ON c.node = n.node)"""


@_register(
    "c104_pagerank_int",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    deg AS (SELECT a, count(*) AS outdeg FROM sym GROUP BY a),
    r0 AS (SELECT a AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
    {_duck_pr_iter('r0', 'r1')},
    {_duck_pr_iter('r1', 'r2')},
    {_duck_pr_iter('r2', 'r3')}
    SELECT CAST(node AS BIGINT) AS doc_id, rank AS rank_ppm FROM r3
    """,
    "LLM-curation: PageRank centrality in EXACT integer-ppm "
    "arithmetic over the symmetrized c08 near-dup graph — the "
    "value-hash twin of the rows-only float c32 (r03 verdict asked "
    "for oracles on the rows-only family wherever one exists; "
    "truncating integer division makes every rank a pure function "
    "of the input multiset, so DuckDB's 3 unrolled rounds reproduce "
    "Spark's loop bit-for-bit).  Same scale shape as c19/c32: one "
    "edges-ranks equi-join + one groupBy(dst) sum per round, "
    "lineage checkpointed; truncation loses <1 ppm per term so the "
    "centrality ORDER matches the float ranks — the signal corpus "
    "weighting actually consumes, now with a hard cross-engine check",
)
def c104_pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("d2").alias("d1"),
                                 F.col("d1").alias("d2")))
    pr = pagerank_int(sym, src="d1", dst="d2", n_iter=3)
    return pr.select(F.col("node").cast("long").alias("doc_id"),
                     F.col("rank").cast("long").alias("rank_ppm"))


# ---------------------------------------------------------------------
# c105: corpus bigram-LM quality score (log-free perplexity sibling).
# ---------------------------------------------------------------------

@_register(
    "c105_bigram_lm_score",
    f"""
    WITH t AS (SELECT doc_id, lang, source, {_duck_toks()} AS toks
               FROM documents),
    b AS (SELECT doc_id, lang, source,
                 list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i+1]) AS bgs
          FROM t WHERE len(toks) >= 2),
    occ AS (SELECT doc_id, lang, source, unnest(bgs) AS bigram FROM b),
    db AS (SELECT doc_id, lang, source, bigram, count(*) AS k
           FROM occ GROUP BY doc_id, lang, source, bigram),
    pc AS (SELECT bigram, count(*) AS c_xy FROM occ GROUP BY bigram),
    uc AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c_xy) AS c_x
           FROM pc GROUP BY string_split(bigram, ' ')[1]),
    sc AS (SELECT d.doc_id, d.lang, d.source,
                  sum(d.k * (p.c_xy * 1000000 // u.c_x)) // sum(d.k)
                    AS score_ppm
           FROM db d JOIN pc p ON p.bigram = d.bigram
           JOIN uc u ON u.w1 = string_split(d.bigram, ' ')[1]
           GROUP BY d.doc_id, d.lang, d.source)
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(score_ppm) AS BIGINT) AS sum_score_ppm,
           CAST(min(score_ppm) AS BIGINT) AS min_score_ppm
    FROM sc GROUP BY lang, source
    """,
    "LLM-curation: language-model-style fluency scoring WITHOUT a "
    "model — each document's mean conditional bigram probability "
    "P(w2|w1) under the corpus's own bigram statistics, in integer "
    "ppm (the log-free sibling of perplexity filtering: natural text "
    "re-uses the corpus's frequent continuations, gibberish and "
    "boilerplate-with-rare-tokens score low).  Corpus counts are two "
    "map-side-combinable aggregates; occurrences collapse to per-doc "
    "(doc, bigram, k) BEFORE the count join-back, so the join's left "
    "side is per-doc distinct bigrams, not raw token positions; the "
    "bigram->count and prefix->count tables are vocabulary-sized "
    "(broadcastable at 100 TB).  Truncating integer division both "
    "engines share makes every per-doc score hash-exact",
)
def c105_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower("text")), " +")
    t = (docs.select("doc_id", "lang", "source", toks.alias("toks"))
         .filter(F.size("toks") >= 2))
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bgs = F.zip_with(F.slice("toks", 1, m), F.slice("toks", 2, m),
                     lambda x, y: F.concat_ws(" ", x, y))
    occ = t.select("doc_id", "lang", "source",
                   F.explode(bgs).alias("bigram"))
    occ = occ.localCheckpoint(eager=True)  # db + pc derive from it
    db = (occ.groupBy("doc_id", "lang", "source", "bigram")
          .agg(F.count("*").alias("k")))
    pc = occ.groupBy("bigram").agg(F.count("*").alias("c_xy"))
    uc = (pc.groupBy(F.split("bigram", " ")[0].alias("w1"))
          .agg(F.sum("c_xy").alias("c_x")))
    sc = (db.withColumn("w1", F.split("bigram", " ")[0])
          .join(pc, "bigram")
          .join(uc, "w1")
          .withColumn("p_ppm", F.expr("c_xy * 1000000L div c_x"))
          .groupBy("doc_id", "lang", "source")
          .agg(F.expr("sum(k * p_ppm) div sum(k)").alias("score_ppm")))
    return (sc.groupBy("lang", "source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("score_ppm").cast("long").alias("sum_score_ppm"),
                 F.min("score_ppm").cast("long").alias("min_score_ppm")))


# ---------------------------------------------------------------------
# b121: OHLC candles (time-series bar aggregation).
# ---------------------------------------------------------------------

@_register(
    "b121_ohlc_candles",
    """
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
             lpad(CAST(event_id AS VARCHAR), 19, '0') AS sk
      FROM events)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           arg_min(value, sk) AS open_v,
           max(value) AS high_v,
           min(value) AS low_v,
           arg_max(value, sk) AS close_v,
           CAST(count(*) AS BIGINT) AS volume
    FROM e GROUP BY event_type, day
    """,
    "time-series bar aggregation: per (event type, day) OHLC candle "
    "— open/close are the values at the first/last event in "
    "(timestamp, event_id) order, high/low are min/max — the "
    "resample-to-bars primitive every monitoring and market pipeline "
    "needs.  ONE partially-aggregatable hash agg (min_by/max_by over "
    "a composite sequence key — the flagship's span idiom), no "
    "window, no sort; outputs are SELECTED doubles (never float "
    "sums), so values are exact in any engine.  The zero-padded "
    "string key exists because DuckDB's arg_min cannot take a "
    "composite ordering key; lexicographic order on the padding "
    "equals (epoch_us, event_id) order",
)
def b121_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sk = F.concat(F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
                  F.lpad(F.col("event_id").cast("string"), 19, "0"))
    d = ev.select("event_type", F.col("ts").cast("date").alias("day"),
                  "value", sk.alias("sk"))
    return (d.groupBy("event_type", "day")
            .agg(F.min_by("value", F.col("sk")).alias("open_v"),
                 F.max("value").alias("high_v"),
                 F.min("value").alias("low_v"),
                 F.max_by("value", F.col("sk")).alias("close_v"),
                 F.count("*").cast("long").alias("volume"))
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "open_v", "high_v", "low_v", "close_v", "volume"))


# ---------------------------------------------------------------------
# c106: neighborhood-overlap link prediction over the dup graph.
# ---------------------------------------------------------------------

@_register(
    "c106_link_prediction",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a),
    cn AS (SELECT s1.a AS u, s2.b AS v, count(*) AS n_common
           FROM sym s1 JOIN sym s2 ON s1.b = s2.a AND s1.a < s2.b
           GROUP BY s1.a, s2.b),
    nc AS (SELECT u, v, n_common,
                  CASE WHEN EXISTS (SELECT 1 FROM edges e
                                    WHERE e.d1 = u AND e.d2 = v)
                       THEN 1 ELSE 0 END AS is_edge
           FROM cn)
    SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(is_edge AS BIGINT) AS is_edge,
           CAST(n_common * 1000000 // (du.d + dv.d - n_common)
                AS BIGINT) AS jaccard_ppm
    FROM nc JOIN deg du ON du.a = u JOIN deg dv ON dv.a = v
    ORDER BY jaccard_ppm DESC, u, v LIMIT 20
    """,
    "graph link prediction / neighborhood-overlap audit over the "
    "near-dup graph: for every node pair sharing at least one "
    "common neighbor, the Jaccard overlap of their neighbor sets "
    "(common-neighbors / |union|, ppm) with an is_edge flag — "
    "non-adjacent high-overlap pairs (is_edge=0) are transitive-"
    "duplicate candidates the pairwise stage never compared (the "
    "classic common-neighbors link-prediction signal and the local "
    "building block of SimRank); adjacent pairs calibrate what "
    "overlap a VERIFIED near-dup pair has.  Shape is the c98 "
    "triangle-count wedge join: sym x sym on the shared middle "
    "node, u<v dedupe orientation, count per pair, then a "
    "left-join edge flag and two broadcast degree lookups.  At "
    "100 TB wedge work is sum(deg^2) — bounded by the near-dup "
    "graph's tiny degrees, never corpus-sized",
)
def c106_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    e = e.localCheckpoint(eager=True)  # reused: wedges + anti + degrees
    sym = e.unionByName(e.select(F.col("d2").alias("d1"),
                                 F.col("d1").alias("d2")))
    s1 = sym.select(F.col("d1").alias("u"), F.col("d2").alias("w"))
    s2 = sym.select(F.col("d1").alias("w"), F.col("d2").alias("v"))
    cand = (s1.join(s2, "w").filter(F.col("u") < F.col("v"))
            .groupBy("u", "v").agg(F.count("*").alias("n_common")))
    flags = (e.select(F.col("d1").alias("u"), F.col("d2").alias("v"))
             .withColumn("is_edge", F.lit(1)))
    nc = (cand.join(flags, ["u", "v"], "left")
          .withColumn("is_edge", F.coalesce("is_edge", F.lit(0))))
    deg = sym.groupBy("d1").agg(F.count("*").alias("d"))
    du = deg.select(F.col("d1").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("d1").alias("v"), F.col("d").alias("dv"))
    return (nc.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
            .select(F.col("u").cast("long").alias("u"),
                    F.col("v").cast("long").alias("v"),
                    F.col("n_common").cast("long").alias("n_common"),
                    F.col("is_edge").cast("long").alias("is_edge"),
                    F.expr("n_common * 1000000 div (du + dv - n_common)")
                    .cast("long").alias("jaccard_ppm"))
            .orderBy(F.desc("jaccard_ppm"), "u", "v").limit(20))


# ---------------------------------------------------------------------
# b122: theta-sketch A-not-B — completes the sketch set algebra.
# ---------------------------------------------------------------------

@_register(
    "b122_kmv_difference_estimate",
    f"""
    WITH {_KMV_VALS_SQL}, th AS (
      SELECT g, CASE WHEN count(*) >= 128
                     THEN max(CASE WHEN rn = 128 THEN h END)
                     ELSE {_KMV_SPACE} END AS theta
      FROM r WHERE rn <= 128 GROUP BY g
    ), ret AS (
      SELECT r.g, r.h FROM r JOIN th USING (g) WHERE r.h < th.theta
    ), spine AS (
      SELECT t1.g AS g1, t2.g AS g2,
             least(t1.theta, t2.theta) AS cth
      FROM th t1 JOIN th t2 ON t1.g <> t2.g
    ), anotb AS (
      SELECT s.g1, s.g2, count(*) AS c
      FROM spine s JOIN ret ra ON ra.g = s.g1
      WHERE ra.h < s.cth
        AND NOT EXISTS (SELECT 1 FROM ret rb
                        WHERE rb.g = s.g2 AND rb.h = ra.h)
      GROUP BY s.g1, s.g2
    ), exco AS (
      SELECT a.g AS g1, b.g AS g2, count(*) AS n_common
      FROM vals a JOIN vals b ON a.v = b.v AND a.g <> b.g
      GROUP BY a.g, b.g
    ), exn AS (SELECT g, count(*) AS n FROM vals GROUP BY g)
    SELECT s.g1 AS g1, s.g2 AS g2,
           CAST(exn.n - coalesce(exco.n_common, 0) AS BIGINT) AS n_exact,
           CAST(coalesce(a.c, 0) * {_KMV_SPACE} // s.cth AS BIGINT)
             AS est_diff
    FROM spine s
    JOIN exn ON exn.g = s.g1
    LEFT JOIN exco ON exco.g1 = s.g1 AND exco.g2 = s.g2
    LEFT JOIN anotb a ON a.g1 = s.g1 AND a.g2 = s.g2
    ORDER BY g1, g2
    """,
    "theta-sketch SET DIFFERENCE (a-not-b) estimate for every "
    "ordered event-type pair vs the exact difference — with b102 "
    "(distinct) and b103 (intersection) this completes the sketch "
    "set algebra of Dasgupta et al.'s theta framework ('how many "
    "user-days does type X have that type Y lacks', answered from "
    "two k=128 sketches without touching raw data).  Retained "
    "hashes of A below the combined theta minus B's retained set, "
    "rescaled by the sampled fraction; portable md5-48 hash + "
    "truncating integer division keep every estimate bit-for-bit "
    "reproducible in the oracle.  The pairwise stage is array math "
    "over |groups|^2 tiny sketch rows",
)
def b122_kmv_difference_estimate(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    vals, hashed = _kmv_user_day_hashes(spark, sf_dir)
    # sk feeds both legs of the non-equi BNLJ below (the c64b
    # stream-vs-broadcast replay shape), but a lazy checkpoint here
    # measured NEUTRAL-to-worse (r11 interleaved A/B: opt lost 4 of
    # 6 pairs, min 0.92 vs 0.88 s) — the replayed post-exchange
    # stages emit <= k rows per (partition, group) partial, so the
    # replay is cheap and the checkpoint barrier costs pipelining.
    sk = _kmv.kmv_sketch(hashed, "g", "h", k=128)
    a = sk.select(F.col("g").alias("g1"), F.col("sketch").alias("sketch_a"))
    b = sk.select(F.col("g").alias("g2"), F.col("sketch").alias("sketch_b"))
    spine = a.join(b, F.col("g1") != F.col("g2"))
    est = (_kmv.with_anotb_estimate(spine, 128)
           .select("g1", "g2",
                   F.col("est_anotb").cast("long").alias("est_diff")))
    va = vals.select(F.col("g").alias("g1"), "v")
    vb = vals.select(F.col("g").alias("g2"), "v")
    common = (va.join(vb, ["v"]).filter(F.col("g1") != F.col("g2"))
              .groupBy("g1", "g2")
              .agg(F.count("*").alias("n_common")))
    n = vals.groupBy(F.col("g").alias("g1")).agg(F.count("*").alias("n"))
    return (est.join(n, "g1")
            .join(common, ["g1", "g2"], "left")
            .select("g1", "g2",
                    (F.col("n") - F.coalesce("n_common", F.lit(0)))
                    .cast("long").alias("n_exact"),
                    "est_diff"))


# ---------------------------------------------------------------------
# c108: n-gram novelty — marginal diversity audit per document.
# ---------------------------------------------------------------------

@_register(
    "c108_ngram_novelty",
    f"""
    WITH t AS (SELECT doc_id, lang, source, {_duck_toks()} AS toks
               FROM documents),
    sh AS (SELECT doc_id, lang, source,
                  unnest({_duck_shingles(3)}) AS sh
           FROM t),
    first AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh),
    per_doc AS (
      SELECT s.doc_id, s.lang, s.source, count(*) AS n_sh,
             sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
               AS n_novel
      FROM sh s JOIN first f ON f.sh = s.sh
      GROUP BY s.doc_id, s.lang, s.source)
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sh) AS BIGINT) AS total_shingles,
           CAST(sum(n_novel) AS BIGINT) AS novel_shingles,
           CAST(sum(n_novel) * 1000000 // sum(n_sh) AS BIGINT)
             AS novelty_ppm
    FROM per_doc GROUP BY lang, source
    """,
    "LLM-curation: corpus NOVELTY audit — per document, the fraction "
    "of its distinct 3-gram shingles whose FIRST occurrence (by "
    "doc_id order) is this document, rolled up per (lang, source) in "
    "ppm.  The marginal-contribution twin of c43's duplicate-n-gram "
    "rate: sources whose novelty collapses are re-crawls/mirrors "
    "adding bytes but no new text — the curation signal for 'stop "
    "ingesting this source'.  min-per-shingle is one map-side-"
    "combinable agg over the shingle table; the join-back is equi on "
    "the shingle key (the c29 segment-dedup shape).  Deterministic: "
    "first-occurrence is a pure min, no order dependence",
)
def c108_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        token_shingles)
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", "lang", "source",
                     F.explode(token_shingles(F.col("text"), 3))
                     .alias("sh"))
    sh = sh.localCheckpoint(eager=True)  # first-occurrence + join-back
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (sh.join(first, "sh")
               .groupBy("doc_id", "lang", "source")
               .agg(F.count("*").alias("n_sh"),
                    F.sum(F.when(F.col("first_doc") == F.col("doc_id"),
                                 1).otherwise(0)).alias("n_novel")))
    return (per_doc.groupBy("lang", "source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_sh").cast("long").alias("total_shingles"),
                 F.sum("n_novel").cast("long").alias("novel_shingles"),
                 F.expr("sum(n_novel) * 1000000 div sum(n_sh)")
                 .cast("long").alias("novelty_ppm")))


# ---------------------------------------------------------------------
# b123: exact Spearman rank correlation, blocked two-pass ranks.
# ---------------------------------------------------------------------

@_register(
    "b123_spearman_corr",
    """
    WITH lc AS (
      SELECT l_orderkey, count(*) AS y FROM lineitem GROUP BY l_orderkey
    ), base AS (
      SELECT o.o_orderpriority AS grp, o.o_totalprice AS x, lc.y
      FROM orders o JOIN lc ON lc.l_orderkey = o.o_orderkey
    ), r AS (
      SELECT grp,
             2 * rank() OVER (PARTITION BY grp ORDER BY x)
               + count(*) OVER (PARTITION BY grp, x) - 1 AS rx,
             2 * rank() OVER (PARTITION BY grp ORDER BY y)
               + count(*) OVER (PARTITION BY grp, y) - 1 AS ry
      FROM base
    ), m AS (
      SELECT grp, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(rx) AS HUGEINT) AS sx,
             CAST(sum(ry) AS HUGEINT) AS sy,
             CAST(sum(rx * ry) AS HUGEINT) AS sxy,
             CAST(sum(rx * rx) AS HUGEINT) AS sxx,
             CAST(sum(ry * ry) AS HUGEINT) AS syy
      FROM r GROUP BY grp
    )
    SELECT grp, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS rho_spearman
    FROM m ORDER BY grp
    """,
    "exact tie-aware SPEARMAN rank correlation per order priority "
    "(order value vs line count) — the rank sibling of b81's exact-"
    "moment Pearson, robust to the monotone-but-nonlinear relations "
    "raw-value correlation misses.  Ranks are DOUBLED average ranks "
    "(2*minrank + ties - 1), kept integer so every moment is exact; "
    "Spark computes them WITHOUT any per-group sort: distinct-value "
    "counts cumsum'd per value-range block in parallel, tiny block "
    "offsets broadcast back (the b47/c94 two-pass pattern), then one "
    "equi join-back and a single map-side-combinable moment agg.  "
    "The rho combination runs ONCE per group row over exact decimal "
    "moments (no accumulation-order float drift), so both engines "
    "produce the identical double.  At 100 TB: two narrow aggs + "
    "broadcast joins, the largest sort is a 500-row block table",
)
def b123_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    base = (li.groupBy("l_orderkey").agg(F.count("*").alias("y"))
            .join(o.select(F.col("o_orderkey").alias("l_orderkey"),
                           F.col("o_orderpriority").alias("grp"),
                           F.col("o_totalprice").alias("x")),
                  "l_orderkey")
            .select("grp", "x", "y"))
    base = base.localCheckpoint(eager=True)  # reused: 2 ranks + join

    def rank2(col: str, block):
        """Doubled average rank per distinct (grp, value): 2*cntlt +
        ties + 1, with the cumulative below-count built block-wise
        (no group-sized sort in any task)."""
        dv = (base.groupBy("grp", F.col(col).alias("v"))
              .agg(F.count("*").alias("c"))
              .withColumn("_b", block(F.col("v"))))
        wloc = (W.partitionBy("grp", "_b").orderBy("v")
                .rowsBetween(W.unboundedPreceding, -1))
        local = dv.withColumn("_lc",
                              F.coalesce(F.sum("c").over(wloc), F.lit(0)))
        bcnt = dv.groupBy("grp", "_b").agg(F.sum("c").alias("_bc"))
        woff = (W.partitionBy("grp").orderBy("_b")
                .rowsBetween(W.unboundedPreceding, -1))
        boff = (bcnt.withColumn(
            "_off", F.coalesce(F.sum("_bc").over(woff), F.lit(0)))
            .select("grp", "_b", "_off"))
        return (local.join(F.broadcast(boff), ["grp", "_b"])
                .select("grp", F.col("v").alias(col),
                        (2 * (F.col("_off") + F.col("_lc"))
                         + F.col("c") + 1).cast("long")
                        .alias(f"r_{col}")))

    rx = rank2("x", lambda v: F.floor(v / 1000).cast("long"))
    ry = rank2("y", lambda v: v.cast("long"))
    j = (base.join(rx, ["grp", "x"]).join(F.broadcast(ry), ["grp", "y"]))
    # moment ADDENDS cast to decimal BEFORE the sum: sum(rx*ry) is
    # bounded by 4n^3, which overflows BIGINT near n ~ 1.3M rows per
    # group under ANSI mode, while the oracle's HUGEINT sums would
    # keep going — the decimal accumulator keeps both sides exact at
    # any group size.
    dec = "decimal(20,0)"
    m = (j.groupBy("grp")
         .agg(F.count("*").alias("n"),
              F.sum(F.col("r_x").cast(dec)).alias("sx"),
              F.sum(F.col("r_y").cast(dec)).alias("sy"),
              F.sum((F.col("r_x") * F.col("r_y")).cast(dec)).alias("sxy"),
              F.sum((F.col("r_x") * F.col("r_x")).cast(dec)).alias("sxx"),
              F.sum((F.col("r_y") * F.col("r_y")).cast(dec)).alias("syy")))
    num = (F.col("n").cast(dec) * F.col("sxy")
           - F.col("sx") * F.col("sy"))
    dxx = (F.col("n").cast(dec) * F.col("sxx")
           - F.col("sx") * F.col("sx"))
    dyy = (F.col("n").cast(dec) * F.col("syy")
           - F.col("sy") * F.col("sy"))
    # all-tied degenerate group -> zero variance -> DuckDB float
    # division yields NULL; mirror with an explicit guard (Spark
    # would emit Infinity/NaN otherwise).
    den = F.sqrt(dxx.cast("double") * dyy.cast("double"))
    rho = F.when(den != 0, num.cast("double") / den)
    return (m.select("grp", F.col("n").cast("long").alias("n"),
                     F.round(rho, 6).alias("rho_spearman"))
            .orderBy("grp"))


# ---------------------------------------------------------------------
# c109: blocklist gate — the word-filter stage of a curation funnel.
# ---------------------------------------------------------------------

_BLOCK_DROP = ("slow",)            # severity 2: drop the document
_BLOCK_FLAG = ("hash", "merge")    # severity 1: keep but flag

_BD_SQL = ", ".join(f"'{w}'" for w in _BLOCK_DROP)
_BF_SQL = ", ".join(f"'{w}'" for w in _BLOCK_FLAG)


@_register(
    "c109_blocklist_gate",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source, {_duck_toks()} AS toks FROM documents
    ), h AS (
      SELECT doc_id, lang, source, len(toks) AS n_toks,
             len(list_filter(toks, x -> x IN ({_BD_SQL}))) AS n_drop_hits,
             len(list_filter(toks, x -> x IN ({_BF_SQL}))) AS n_flag_hits
      FROM t
    ), cls AS (
      SELECT lang, source, n_toks, n_drop_hits, n_flag_hits,
             CASE WHEN n_drop_hits * 1000000 // n_toks >= 60000
                  THEN 'drop'
                  WHEN n_drop_hits > 0 OR n_flag_hits * 1000000
                       // n_toks >= 120000 THEN 'flag'
                  ELSE 'keep' END AS verdict
      FROM h WHERE n_toks > 0
    )
    SELECT lang, source, verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_drop_hits) AS BIGINT) AS drop_hits,
           CAST(sum(n_flag_hits) AS BIGINT) AS flag_hits
    FROM cls GROUP BY lang, source, verdict
    """,
    "LLM-curation: word-BLOCKLIST gate (the toxicity/unsafe-content "
    "filter stage every production corpus pipeline runs before "
    "model-based scoring): two severity tiers — drop-tier terms "
    "remove a document when their density crosses 6% of tokens, "
    "flag-tier terms quarantine it for review at 12% — with "
    "per-(lang, source, verdict) accounting so the funnel's loss is "
    "auditable per source (the c16 PII-scrub discipline applied to "
    "content policy).  Pure narrow map over the token array "
    "(list-membership against literal term sets, integer-ppm "
    "densities) + one hash agg: zero joins, zero shuffles beyond "
    "the final combine — trivially scale-safe at 100 TB",
)
def c109_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower("text")), " +")
    drop_arr = F.array(*[F.lit(w) for w in _BLOCK_DROP])
    flag_arr = F.array(*[F.lit(w) for w in _BLOCK_FLAG])
    h = (docs.select(
        "lang", "source", toks.alias("toks"))
        .select("lang", "source", F.size("toks").alias("n_toks"),
                F.size(F.filter("toks",
                                lambda x: F.array_contains(drop_arr, x)))
                .alias("n_drop_hits"),
                F.size(F.filter("toks",
                                lambda x: F.array_contains(flag_arr, x)))
                .alias("n_flag_hits"))
        .filter(F.col("n_toks") > 0))
    verdict = (F.when(F.expr("n_drop_hits * 1000000 div n_toks") >= 60000,
                      "drop")
               .when((F.col("n_drop_hits") > 0)
                     | (F.expr("n_flag_hits * 1000000 div n_toks")
                        >= 120000), "flag")
               .otherwise("keep"))
    return (h.withColumn("verdict", verdict)
            .groupBy("lang", "source", "verdict")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_drop_hits").cast("long").alias("drop_hits"),
                 F.sum("n_flag_hits").cast("long").alias("flag_hits")))


# ---------------------------------------------------------------------
# b124: two-proportion A/B test from exact counts.
# ---------------------------------------------------------------------

@_register(
    "b124_ab_proportion_test",
    """
    WITH u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                            || ':ab'), 1, 15))::BIGINT
                       % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchase,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS n_error
      FROM events GROUP BY user_id
    ), c AS (
      SELECT arm, count(*) AS n,
             sum(CASE WHEN n_purchase > n_error THEN 1 ELSE 0 END)
               AS conv
      FROM u GROUP BY arm
    ), w AS (
      SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
      FROM c a JOIN c b ON a.arm = 'A' AND b.arm = 'B'
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
           CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
           round((CAST(conv_a AS DOUBLE) / n_a
                  - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
    FROM w
    """,
    "experimentation analytics: two-proportion z-test between "
    "deterministic hash-assigned arms (the c17 portable-md5 split "
    "applied to experiment bucketing — assignment is reproducible "
    "across engines and re-runs, the property real experiment "
    "platforms require).  Conversion = user's purchases exceed "
    "errors; counts roll up exactly, rates ship as integer ppm, and "
    "the pooled z statistic is ONE row of double math over exact "
    "integers (the b123 single-row-combination discipline: no "
    "accumulation-order drift, both engines produce the identical "
    "double).  Two map-side-combinable aggs over events — nothing "
    "here grows with corpus size except the per-user rollup",
)
def b124_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        portable_hash64)
    ev = _t(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("n_purchase"),
              F.sum(F.when(F.col("event_type") == "error", 1)
                    .otherwise(0)).alias("n_error"))
         .withColumn("arm", F.when(
             F.pmod(portable_hash64(
                 F.concat(F.col("user_id").cast("string"),
                          F.lit(":ab"))), F.lit(2)) == 0,
             "A").otherwise("B")))
    c = (u.groupBy("arm")
         .agg(F.count("*").alias("n"),
              F.sum(F.when(F.col("n_purchase") > F.col("n_error"), 1)
                    .otherwise(0)).alias("conv")))
    a = (c.filter(F.col("arm") == "A")
         .select(F.col("n").alias("n_a"), F.col("conv").alias("conv_a")))
    b = (c.filter(F.col("arm") == "B")
         .select(F.col("n").alias("n_b"), F.col("conv").alias("conv_b")))
    w = a.crossJoin(F.broadcast(b))
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") \
        / (F.col("n_a") + F.col("n_b")).cast("double")
    # degenerate pooled rate (0 or 1 conversions everywhere) zeroes
    # the denominator: DuckDB float division emits NULL, Spark would
    # emit Infinity — guard so both agree.
    zden = F.sqrt(pool * (F.lit(1.0) - pool)
                  * (F.lit(1.0) / F.col("n_a")
                     + F.lit(1.0) / F.col("n_b")))
    z = F.when(zden != 0,
               (F.col("conv_a").cast("double") / F.col("n_a")
                - F.col("conv_b").cast("double") / F.col("n_b")) / zden)
    return w.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.expr("conv_a * 1000000 div n_a").cast("long")
        .alias("rate_a_ppm"),
        F.expr("conv_b * 1000000 div n_b").cast("long")
        .alias("rate_b_ppm"),
        F.round(z, 6).alias("z_stat"))


# ---------------------------------------------------------------------
# c110: ranking-metric evaluation of a co-occurrence recommender.
# ---------------------------------------------------------------------

@_register(
    "c110_recsys_eval",
    """
    WITH pl AS (
      SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p,
             o2.o_orderdate AS d, o2.o_orderpriority AS grp
      FROM lineitem l JOIN orders o2 ON o2.o_orderkey = l.l_orderkey
    ), train AS (SELECT o, p FROM pl WHERE d <  DATE '1997-01-01'),
    test  AS (SELECT o, p, grp FROM pl WHERE d >= DATE '1997-01-01'),
    co AS (
      SELECT a.p AS p1, b.p AS p2, count(*) AS c
      FROM train a JOIN train b ON a.o = b.o AND a.p <> b.p
      GROUP BY a.p, b.p
    ), top1 AS (
      SELECT p1, p2 AS rec FROM (
        SELECT p1, p2, row_number() OVER (
          PARTITION BY p1 ORDER BY c DESC, p2) AS rn
        FROM co) WHERE rn = 1
    ), cases AS (
      SELECT t.o, t.grp, t.p, top1.rec,
             CASE WHEN EXISTS (SELECT 1 FROM test t2
                               WHERE t2.o = t.o AND t2.p = top1.rec)
                  THEN 1 ELSE 0 END AS hit
      FROM test t JOIN top1 ON top1.p1 = t.p
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n_cases,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS hit_ppm
    FROM cases GROUP BY grp
    """,
    "recommender EVALUATION harness: temporal-split precision@1 of a "
    "co-purchase recommender — train co-occurrence counts on orders "
    "before the split date, recommend each part's top-1 partner "
    "(deterministic tiebreak: count desc then part id, the b42 "
    "grouped-top-k-over-a-pre-aggregate shape), score on later "
    "orders by whether the recommended partner appears in the same "
    "basket, hit rate ppm per order priority.  The leakage-free "
    "temporal split is the c42 discipline applied to implicit "
    "feedback.  Scale: pair generation is the c98 per-basket array "
    "slice (never a corpus self-join), the rank window runs over "
    "per-part partner counts (degree-bounded), and scoring is one "
    "equi join + an array membership per case",
)
def c110_recsys_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pl = (li.select(F.col("l_orderkey").alias("o"),
                    F.col("l_partkey").alias("p")).distinct()
          .join(o.select(F.col("o_orderkey").alias("o"),
                         F.col("o_orderdate").alias("d"),
                         F.col("o_orderpriority").alias("grp")), "o"))
    split = F.lit("1997-01-01").cast("date")
    train = pl.filter(F.col("d") < split).select("o", "p")
    test = pl.filter(F.col("d") >= split).select("o", "p", "grp")
    # basket pairs via per-order sorted arrays (both directions kept:
    # co-occurrence is symmetric but top-1 is per SOURCE part)
    arr = train.groupBy("o").agg(F.sort_array(F.collect_set("p"))
                                 .alias("ps"))
    pairs = arr.select(F.explode(F.expr(
        "flatten(transform(ps, x -> transform("
        "filter(ps, y -> y != x), y -> struct(x AS p1, y AS p2))))"
    )).alias("e")).select("e.p1", "e.p2")
    co = pairs.groupBy("p1", "p2").agg(F.count("*").alias("c"))
    top1 = (co.withColumn("rn", F.row_number().over(
        W.partitionBy("p1").orderBy(F.desc("c"), F.asc("p2"))))
        .filter(F.col("rn") == 1)
        .select("p1", F.col("p2").alias("rec")))
    # each test order carries its part set once; hit = membership
    basket = test.groupBy("o").agg(F.collect_set("p").alias("parts"))
    cases = (test.join(top1, test.p == top1.p1)
             .join(basket, "o")
             .withColumn("hit",
                         F.array_contains("parts", F.col("rec"))
                         .cast("int")))
    return (cases.groupBy("grp")
            .agg(F.count("*").cast("long").alias("n_cases"),
                 F.sum("hit").cast("long").alias("n_hits"),
                 F.expr("sum(hit) * 1000000 div count(*)")
                 .cast("long").alias("hit_ppm")))


# ---------------------------------------------------------------------
# c111: off-policy (counterfactual) evaluation — IPS and SNIPS.
# ---------------------------------------------------------------------

# assumed logging-policy propensities in TENTHS (integer rationals so
# the importance weights 10/p stay exact integers in both engines)
_IPS_P_TENTHS = {"view": 4, "click": 2, "purchase": 1, "signup": 1,
                 "error": 2}

_IPS_CASE_SQL = ("CASE event_type " + " ".join(
    f"WHEN '{a}' THEN {p}" for a, p in _IPS_P_TENTHS.items())
    + " ELSE 10 END")


@_register(
    "c111_offpolicy_ips_eval",
    f"""
    WITH log AS (
      SELECT event_type, user_id,
             CAST(floor(value * 100) AS BIGINT) AS r_cents,
             {_IPS_CASE_SQL} AS p_tenths,
             CASE WHEN user_id % 2 = 1 THEN 'click' ELSE 'view' END
               AS target_action
      FROM events
    ), w AS (
      SELECT target_action,
             CASE WHEN event_type = target_action
                  THEN 10 // p_tenths ELSE 0 END AS wgt,
             r_cents
      FROM log
    )
    SELECT target_action, CAST(count(*) AS BIGINT) AS n_logged,
           CAST(sum(CASE WHEN wgt > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           CAST(sum(wgt * r_cents) // count(*) AS BIGINT)
             AS ips_value_cents,
           CAST(sum(wgt * r_cents) // nullif(sum(wgt), 0) AS BIGINT)
             AS snips_value_cents
    FROM w GROUP BY target_action
    """,
    "counterfactual / off-policy evaluation (Horvitz-Thompson IPS "
    "and self-normalized SNIPS): estimate what a TARGET policy "
    "(recommend 'click' to odd users, 'view' to even) would have "
    "earned from logged interactions collected under a different "
    "logging policy — the standard bandit-feedback evaluation every "
    "recommendation/ads pipeline runs before an online test.  "
    "Propensities are integer TENTHS so importance weights 10/p are "
    "exact integers; rewards are floor-cents; both estimators reduce "
    "to integer sums + one truncating division — bit-for-bit "
    "reproducible (float r/p sums would be accumulation-order-"
    "dependent at 1000 executors; the integer form cannot drift).  "
    "One narrow map + one map-side-combinable agg, zero joins",
)
def c111_offpolicy_ips_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = F.lit(10)
    for a, t in _IPS_P_TENTHS.items():
        p = F.when(F.col("event_type") == a, t).otherwise(p)
    log = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("r_cents"),
        p.alias("p_tenths"),
        F.when(F.col("user_id") % 2 == 1, "click").otherwise("view")
        .alias("target_action"))
    w = log.select(
        "target_action",
        F.when(F.col("event_type") == F.col("target_action"),
               F.expr("10 div p_tenths")).otherwise(F.lit(0))
        .alias("wgt"),
        "r_cents")
    return (w.groupBy("target_action")
            .agg(F.count("*").cast("long").alias("n_logged"),
                 F.sum(F.when(F.col("wgt") > 0, 1).otherwise(0))
                 .cast("long").alias("n_matched"),
                 F.expr("sum(wgt * r_cents) div count(*)")
                 .cast("long").alias("ips_value_cents"),
                 F.expr("sum(wgt * r_cents) div nullif(sum(wgt), 0)")
                 .cast("long").alias("snips_value_cents")))


# ---------------------------------------------------------------------
# b125: CUPED variance-reduced experiment readout.
# ---------------------------------------------------------------------

@_register(
    "b125_cuped_adjustment",
    """
    WITH u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                            || ':ab'), 1, 15))::BIGINT
                       % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             sum(CASE WHEN event_type = 'purchase'
                       AND ts < TIMESTAMP '2024-01-16'
                      THEN CAST(floor(value * 100) AS BIGINT)
                      ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'purchase'
                       AND ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(floor(value * 100) AS BIGINT)
                      ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ), g AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(y * y) AS HUGEINT) AS syy
      FROM u
    ), a AS (
      SELECT arm, count(*) AS n_arm, sum(x) AS sx_arm, sum(y) AS sy_arm
      FROM u GROUP BY arm
    )
    SELECT arm, CAST(n_arm AS BIGINT) AS n_users,
           CAST(sy_arm AS BIGINT) AS sum_y_cents,
           round(CAST(sy_arm AS DOUBLE) / n_arm, 6) AS mean_y,
           round(CAST(sy_arm AS DOUBLE) / n_arm
                 - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                    / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                   * (CAST(sx_arm AS DOUBLE) / n_arm
                      - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)),
                 6) AS mean_y_cuped,
           round(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                 * CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                 / (CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
                    * CAST(g.n * g.syy - g.sy * g.sy AS DOUBLE)), 6)
             AS rho2
    FROM a CROSS JOIN g ORDER BY arm
    """,
    "experimentation analytics: CUPED variance reduction (Deng et "
    "al., WSDM 2013) — adjust each arm's experiment-period purchase "
    "metric by the pre-period covariate (theta = cov(x,y)/var(x)), "
    "shrinking variance by the squared correlation rho2 so smaller "
    "effects clear significance with the same traffic.  By linearity "
    "the adjusted MEAN needs only per-arm integer sums (never a "
    "per-user adjusted value), so the whole readout is two exact "
    "integer aggregates + single-row double combinations (the "
    "b123/b124 discipline: HUGEINT moments on the oracle side, "
    "decimal(38,0) on Spark's, identical IEEE doubles out).  Hash-"
    "assigned arms as in b124; at 100 TB this is one per-user rollup "
    "+ two tiny aggregates",
)
def b125_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        portable_hash64)
    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.floor(F.col("value") * 100).cast("long")
    is_p = F.col("event_type") == "purchase"
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(is_p & (F.col("ts") < split), cents)
                    .otherwise(0)).alias("x"),
              F.sum(F.when(is_p & (F.col("ts") >= split), cents)
                    .otherwise(0)).alias("y"))
         .withColumn("arm", F.when(
             F.pmod(portable_hash64(
                 F.concat(F.col("user_id").cast("string"),
                          F.lit(":ab"))), F.lit(2)) == 0,
             "A").otherwise("B")))
    u = u.localCheckpoint(eager=True)  # reused: global moments + arms
    # addends cast to decimal BEFORE summing: sum(x*y) over per-user
    # cents products overflows a BIGINT accumulator near ~10M users
    # under ANSI mode while the oracle's HUGEINT sums sail on.
    dec = "decimal(20,0)"
    g = u.agg(F.count("*").cast(dec).alias("n"),
              F.sum(F.col("x").cast(dec)).alias("sx"),
              F.sum(F.col("y").cast(dec)).alias("sy"),
              F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
              F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
              F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"))
    a = (u.groupBy("arm")
         .agg(F.count("*").alias("n_arm"),
              F.sum("x").alias("sx_arm"), F.sum("y").alias("sy_arm")))
    j = a.crossJoin(F.broadcast(g))
    cov = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx")
            - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy")
            - F.col("sy") * F.col("sy")).cast("double")
    # zero pre-period variance -> DuckDB float division emits NULL;
    # mirror explicitly (Spark would emit Infinity/NaN).
    theta = F.when(varx != 0, cov / varx)
    rho2 = F.when(varx * vary != 0, cov * cov / (varx * vary))
    mean_y = F.col("sy_arm").cast("double") / F.col("n_arm")
    dx = (F.col("sx_arm").cast("double") / F.col("n_arm")
          - F.col("sx").cast("double") / F.col("n").cast("double"))
    return (j.select("arm",
                     F.col("n_arm").cast("long").alias("n_users"),
                     F.col("sy_arm").cast("long").alias("sum_y_cents"),
                     F.round(mean_y, 6).alias("mean_y"),
                     F.round(mean_y - theta * dx, 6).alias("mean_y_cuped"),
                     F.round(rho2, 6).alias("rho2"))
            .orderBy("arm"))


# ---------------------------------------------------------------------
# b126: robust (median/MAD) outlier detection, histogram-collapsed.
# ---------------------------------------------------------------------

@_register(
    "b126_mad_outliers",
    """
    WITH v AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ), med AS (
      SELECT event_type, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS m
      FROM v GROUP BY event_type
    ), dev AS (
      SELECT v.event_type, v.cents, abs(v.cents - med.m) AS d, med.m
      FROM v JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, CAST(quantile_disc(d, 0.5) AS BIGINT) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(any_value(dev.m) AS BIGINT) AS median_cents,
           CAST(any_value(mad.mad) AS BIGINT) AS mad_cents,
           CAST(sum(CASE WHEN dev.d * 10000 > 3 * 14826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN dev.d * 10000 > 3 * 14826 * mad.mad
                         THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS outlier_ppm  -- = n_outliers*1e6//n
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type ORDER BY dev.event_type
    """,
    "robust anomaly detection: per event type, median and MAD "
    "(median absolute deviation) in exact integer cents, flagging "
    "values beyond the standard 3 * 1.4826 * MAD robust-z fence — "
    "the outlier rule that survives the contamination that corrupts "
    "b31's mean/stddev fence (one fat-finger spike inflates a "
    "stddev; the median shrugs).  The 1.4826 consistency constant "
    "rides as the integer comparison d*10000 > 3*14826*MAD — no "
    "float thresholds.  Spark computes BOTH medians from value "
    "HISTOGRAMS (groupBy(type, cents) first — the b77 collapse): "
    "every window runs over the bounded distinct-value table, never "
    "the raw rows, so group row-count is irrelevant at 100 TB.  "
    "Oracle uses quantile_disc over raw rows (the b75-verified "
    "rank-(n+1)/2 equivalence)",
)
def b126_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type",
                  F.floor(F.col("value") * 100).cast("long")
                  .alias("cents"))
    v = v.localCheckpoint(eager=True)  # histogram + dev join reuse

    def hist_median(df, val_col):
        """Exact discrete median from a (group, value, count)
        histogram: cumulative counts over the bounded distinct-value
        table, pick rank (n+1) div 2."""
        h = df.groupBy("event_type", val_col).agg(
            F.count("*").alias("c"))
        wcum = (W.partitionBy("event_type").orderBy(val_col)
                .rowsBetween(W.unboundedPreceding, 0))
        cum = h.withColumn("cum", F.sum("c").over(wcum))
        n = df.groupBy("event_type").agg(F.count("*").alias("n"))
        return (cum.join(F.broadcast(n), "event_type")
                .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
                .groupBy("event_type")
                .agg(F.min(val_col).alias("m")))

    med = hist_median(v, "cents")
    dev = (v.join(F.broadcast(med), "event_type")
           .withColumn("d", F.abs(F.col("cents") - F.col("m"))))
    mad = (hist_median(dev.select("event_type",
                                  F.col("d").alias("cents")), "cents")
           .withColumnRenamed("m", "mad"))
    out = (F.col("d") * 10000 > 3 * 14826 * F.col("mad")).cast("int")
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.first("m").cast("long").alias("median_cents"),
                 F.first("mad").cast("long").alias("mad_cents"),
                 F.sum(out).cast("long").alias("n_outliers"))
            .withColumn("outlier_ppm",
                        F.expr("n_outliers * 1000000 div n")
                        .cast("long"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------
# c112: k-core peeling over the near-dup graph.
# ---------------------------------------------------------------------

def _duck_peel(prev: str, out: str, k: int) -> str:
    """One unrolled peeling round (mirrors components.kcore_peel):
    drop nodes with degree < k, then edges touching them."""
    return f"""
    d_{out} AS (SELECT a, count(*) AS c FROM {prev} GROUP BY a),
    k_{out} AS (SELECT a FROM d_{out} WHERE c >= {k}),
    {out} AS (
      SELECT e.a, e.b FROM {prev} e
      JOIN k_{out} x ON x.a = e.a
      JOIN k_{out} y ON y.a = e.b)"""


@_register(
    "c112_kcore_peeling",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    e0 AS (SELECT a, b FROM sym),
    {_duck_peel('e0', 'e1', 2)},
    {_duck_peel('e1', 'e2', 2)},
    {_duck_peel('e2', 'e3', 2)}
    SELECT CAST(a AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS deg
    FROM e3 GROUP BY a
    """,
    "graph 2-CORE of the near-dup graph via 3 peeling rounds "
    "(Matula-Beck / Batagelj-Zaversnik, distributed form): each "
    "round drops nodes with degree < 2 and their incident edges — "
    "survivors are the densely-interlinked cluster hearts, the docs "
    "whose duplication is structural (template farms, mirror rings) "
    "rather than a single accidental pair; dedup keeps ONE of those "
    "with high confidence while degree-1 fringe pairs merit review "
    "(the c93 density audit's actionable sibling).  FIXED-round "
    "semantics on purpose — the result is a pure function of "
    "(edges, k, rounds), so the oracle unrolls the rounds and "
    "matches bit-for-bit (the c104 discipline; clique-y dup graphs "
    "hit the fixpoint in 1-2 rounds anyway).  Each round is one "
    "degree agg + two semi-joins, lineage cut per round — the same "
    "per-round shape the algorithm has at 100 TB",
)
def c112_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.components import (
        kcore_peel)
    e = _edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("d2").alias("d1"),
                                 F.col("d1").alias("d2")))
    out = kcore_peel(sym, k=2, rounds=3, src="d1", dst="d2")
    return out.select(F.col("node").cast("long").alias("doc_id"),
                      F.col("deg").cast("long").alias("deg"))


# ---------------------------------------------------------------------
# b127: RFM customer segmentation with literal band edges.
# ---------------------------------------------------------------------

@_register(
    "b127_rfm_segmentation",
    """
    WITH p AS (
      SELECT user_id,
             max(CAST(ts AS DATE)) AS last_day,
             count(*) AS freq,
             sum(CAST(floor(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), mx AS (SELECT max(CAST(ts AS DATE)) AS asof_day FROM events),
    s AS (
      SELECT user_id,
             CASE WHEN date_diff('day', last_day, asof_day) <= 3 THEN 3
                  WHEN date_diff('day', last_day, asof_day) <= 7 THEN 2
                  ELSE 1 END AS r_score,
             CASE WHEN freq >= 20 THEN 3
                  WHEN freq >= 10 THEN 2 ELSE 1 END AS f_score,
             CASE WHEN cents >= 200000 THEN 3
                  WHEN cents >= 80000 THEN 2 ELSE 1 END AS m_score
      FROM p CROSS JOIN mx
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_users
    FROM s GROUP BY r_score, f_score, m_score
    """,
    "RFM customer segmentation (recency / frequency / monetary), the "
    "workhorse of CRM analytics: one per-user purchase rollup, "
    "scored 1-3 per dimension against LITERAL band edges (fixed "
    "business thresholds — the b86 Benford rule: constants live in "
    "the query text on both sides, so the segmentation is exact and "
    "auditable; the data-driven quantile-edge variant is b83's "
    "machinery).  Recency anchors on the corpus max date via a "
    "1-row broadcast.  One map-side-combinable rollup + one tiny "
    "agg — nothing grows with corpus size except the per-user "
    "aggregate",
)
def b127_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .groupBy("user_id")
         .agg(F.max(F.col("ts").cast("date")).alias("last_day"),
              F.count("*").alias("freq"),
              F.sum(F.floor(F.col("value") * 100).cast("long"))
              .alias("cents")))
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("asof_day"))
    s = (p.crossJoin(F.broadcast(mx))
         .withColumn("rd", F.datediff("asof_day", "last_day"))
         .select(
             F.when(F.col("rd") <= 3, 3).when(F.col("rd") <= 7, 2)
             .otherwise(1).cast("long").alias("r_score"),
             F.when(F.col("freq") >= 20, 3)
             .when(F.col("freq") >= 10, 2)
             .otherwise(1).cast("long").alias("f_score"),
             F.when(F.col("cents") >= 200000, 3)
             .when(F.col("cents") >= 80000, 2)
             .otherwise(1).cast("long").alias("m_score")))
    return (s.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("long").alias("n_users")))


# ---------------------------------------------------------------------
# b128: peak concurrency per day, blocked sweep-line.
# ---------------------------------------------------------------------

@_register(
    "b128_peak_concurrency",
    """
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), d AS (
      SELECT day, s AS us, 1 AS delta, user_id FROM iv
      UNION ALL
      SELECT day, e AS us, -1 AS delta, user_id FROM iv
    ), sweep AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day
                              ORDER BY us, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM d
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM sweep GROUP BY day
    """,
    "peak concurrency (occupancy) per day: each user's daily "
    "activity interval [first event, last event] contributes +1/-1 "
    "delta events, and the classic sweep-line running sum's maximum "
    "is the answer (meeting-at-a-point counts as overlap: +1 sorts "
    "before -1 at equal timestamps — the tiebreak is explicit so "
    "both engines sweep identically).  Spark runs the sweep WITHOUT "
    "a day-sized sort in any task: local running sums per (day, "
    "hour-block) window in parallel + tiny per-day block offsets "
    "cumsum'd and broadcast back (the b107 two-pass distributed "
    "prefix-sum, applied to the interval-stabbing problem) — at "
    "100 TB the widest sort is one hour-block of delta rows.  "
    "Intervals never cross days by construction, so days shard "
    "perfectly",
)
def b128_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    iv = (ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
          .agg(F.min(F.unix_micros("ts")).alias("s"),
               F.max(F.unix_micros("ts")).alias("e")))
    d = (iv.select("day", F.col("s").alias("us"),
                   F.lit(1).alias("delta"), "user_id")
         .unionByName(iv.select("day", F.col("e").alias("us"),
                                F.lit(-1).alias("delta"), "user_id"))
         .withColumn("_b", F.expr("us div 3600000000")))
    d = d.localCheckpoint(eager=True)  # local sweep + block sums
    wloc = (W.partitionBy("day", "_b")
            .orderBy(F.col("us"), F.desc("delta"), F.col("user_id"))
            .rowsBetween(W.unboundedPreceding, 0))
    local = d.withColumn("_run", F.sum("delta").over(wloc))
    bsum = d.groupBy("day", "_b").agg(F.sum("delta").alias("_bs"))
    woff = (W.partitionBy("day").orderBy("_b")
            .rowsBetween(W.unboundedPreceding, -1))
    boff = (bsum.withColumn("_off",
                            F.coalesce(F.sum("_bs").over(woff), F.lit(0)))
            .select("day", "_b", "_off"))
    sweep = (local.join(F.broadcast(boff), ["day", "_b"])
             .withColumn("conc", F.col("_off") + F.col("_run")))
    return (sweep.groupBy("day")
            .agg(F.max("conc").cast("long").alias("peak_concurrency"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "peak_concurrency"))


# ---------------------------------------------------------------------
# b129: price/volume bridge (revenue variance decomposition).
# ---------------------------------------------------------------------

@_register(
    "b129_price_volume_bridge",
    """
    WITH y AS (
      SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
             sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
               AS rev_cents,
             sum(CAST(l.l_quantity AS BIGINT)) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
      GROUP BY p.p_brand, year(l.l_shipdate)
    ), w AS (
      SELECT a.brand,
             a.rev_cents AS rev0, b.rev_cents AS rev1,
             a.qty AS q0, b.qty AS q1,
             a.rev_cents // a.qty AS px0
      FROM y a JOIN y b ON a.brand = b.brand
      WHERE a.yr = 1996 AND b.yr = 1997
    )
    SELECT brand,
           CAST(rev1 - rev0 AS BIGINT) AS delta_cents,
           CAST((q1 - q0) * px0 AS BIGINT) AS volume_effect_cents,
           CAST((rev1 - rev0) - (q1 - q0) * px0 AS BIGINT)
             AS price_mix_effect_cents
    FROM w ORDER BY brand
    """,
    "FP&A price/volume bridge: decompose each brand's year-over-year "
    "revenue delta into a VOLUME effect ((Q1-Q0) at the base-year "
    "unit price) and the residual PRICE/MIX effect — the waterfall "
    "chart every revenue review runs.  Base unit price is truncating "
    "integer cents-per-unit (the spec'd convention, identical in "
    "both engines), so the decomposition reconciles EXACTLY: volume "
    "+ price/mix = delta by construction, in integer cents.  One "
    "fact scan with a pushed year filter + broadcast part join + "
    "one (brand, year) rollup; the bridge itself is a self-join on "
    "the tiny brand-year aggregate",
)
def b129_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    y = (li.filter(F.year("l_shipdate").isin(1996, 1997))
         .join(F.broadcast(pt.select("p_partkey", "p_brand")),
               li.l_partkey == pt.p_partkey)
         .groupBy(F.col("p_brand").alias("brand"),
                  F.year("l_shipdate").alias("yr"))
         .agg(F.sum(F.floor(F.col("l_extendedprice") * 100)
                    .cast("long")).alias("rev_cents"),
              F.sum(F.col("l_quantity").cast("long")).alias("qty")))
    a = (y.filter(F.col("yr") == 1996)
         .select("brand", F.col("rev_cents").alias("rev0"),
                 F.col("qty").alias("q0"),
                 F.expr("rev_cents div qty").alias("px0")))
    b = (y.filter(F.col("yr") == 1997)
         .select("brand", F.col("rev_cents").alias("rev1"),
                 F.col("qty").alias("q1")))
    return (a.join(b, "brand")
            .select("brand",
                    (F.col("rev1") - F.col("rev0")).cast("long")
                    .alias("delta_cents"),
                    ((F.col("q1") - F.col("q0")) * F.col("px0"))
                    .cast("long").alias("volume_effect_cents"),
                    ((F.col("rev1") - F.col("rev0"))
                     - (F.col("q1") - F.col("q0")) * F.col("px0"))
                    .cast("long").alias("price_mix_effect_cents"))
            .orderBy("brand"))


# ---------------------------------------------------------------------
# b130: cohort LTV (cumulative revenue by cohort age).
# ---------------------------------------------------------------------

@_register(
    "b130_cohort_ltv",
    """
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), wk AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01', cohort_day) // 7
                  AS BIGINT) AS cohort_week
      FROM first_seen
    ), rev AS (
      SELECT e.user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE))
                  // 7 AS BIGINT) AS week,
             CAST(floor(e.value * 100) AS BIGINT) AS cents
      FROM events e WHERE e.event_type = 'purchase'
    ), per AS (
      SELECT w.cohort_week, r.week - w.cohort_week AS age_weeks,
             sum(r.cents) AS cents
      FROM rev r JOIN wk w ON w.user_id = r.user_id
      GROUP BY w.cohort_week, r.week - w.cohort_week
    ), sz AS (
      SELECT cohort_week, count(*) AS n_users FROM wk GROUP BY cohort_week
    )
    SELECT p.cohort_week, p.age_weeks,
           CAST(sz.n_users AS BIGINT) AS n_users,
           CAST(sum(p.cents) OVER (PARTITION BY p.cohort_week
                                   ORDER BY p.age_weeks
                                   ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_cents,
           CAST(sum(p.cents) OVER (PARTITION BY p.cohort_week
                                   ORDER BY p.age_weeks
                                   ROWS UNBOUNDED PRECEDING)
                // sz.n_users AS BIGINT) AS ltv_per_user_cents
    FROM per p JOIN sz ON sz.cohort_week = p.cohort_week
    """,
    "cohort LTV curves: users cohorted by first-seen week, purchase "
    "revenue accumulated by cohort AGE, divided by cohort size — the "
    "lifetime-value companion of b30's retention triangle (retention "
    "says who comes back; LTV says what they're worth, the number "
    "acquisition spend is judged against).  The cumulative window "
    "runs over the (cohort, age) AGGREGATE — a few hundred rows "
    "regardless of corpus size — never raw purchases; the heavy "
    "work is one first-seen rollup + one broadcast-joined revenue "
    "rollup, both map-side combinable.  Integer cents + truncating "
    "per-user division keep every cell exact",
)
def b130_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    wk = (ev.groupBy("user_id")
          .agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
          .select("user_id",
                  F.expr("datediff(cohort_day, date'2024-01-01') div 7")
                  .cast("long").alias("cohort_week")))
    rev = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id",
                   F.expr("cast(datediff(cast(ts as date), "
                          "date'2024-01-01') div 7 as bigint)")
                   .alias("week"),
                   F.floor(F.col("value") * 100).cast("long")
                   .alias("cents")))
    per = (rev.join(wk, "user_id")
           .groupBy("cohort_week",
                    (F.col("week") - F.col("cohort_week"))
                    .alias("age_weeks"))
           .agg(F.sum("cents").alias("cents")))
    sz = wk.groupBy("cohort_week").agg(F.count("*").alias("n_users"))
    wcum = (W.partitionBy("cohort_week").orderBy("age_weeks")
            .rowsBetween(W.unboundedPreceding, 0))
    return (per.join(F.broadcast(sz), "cohort_week")
            .withColumn("cum_cents", F.sum("cents").over(wcum))
            .select("cohort_week", "age_weeks",
                    F.col("n_users").cast("long").alias("n_users"),
                    F.col("cum_cents").cast("long").alias("cum_cents"),
                    F.expr("cum_cents div n_users").cast("long")
                    .alias("ltv_per_user_cents")))


# ---------------------------------------------------------------------
# c113: near-dup evidence — rarest shared shingles per verified pair.
# ---------------------------------------------------------------------

@_register(
    "c113_neardup_evidence",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_duck_shingles(3)}) AS sh FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
    shared AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, a.sh
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    ), common AS (
      SELECT d1, d2, count(*) AS n_common FROM shared GROUP BY d1, d2
    ), pairs AS (
      SELECT c.d1, c.d2, c.n_common
      FROM common c
      JOIN sizes x ON x.doc_id = c.d1
      JOIN sizes y ON y.doc_id = c.d2
      WHERE c.n_common * 1.0 / (x.n_sh + y.n_sh - c.n_common) >= 0.5
    ), ranked AS (
      SELECT s.d1, s.d2, s.sh, df.df,
             row_number() OVER (PARTITION BY s.d1, s.d2
                                ORDER BY df.df, s.sh) AS rn
      FROM shared s JOIN df ON df.sh = s.sh
      JOIN pairs p ON p.d1 = s.d1 AND p.d2 = s.d2
    )
    SELECT CAST(r.d1 AS BIGINT) AS d1, CAST(r.d2 AS BIGINT) AS d2,
           CAST(p.n_common AS BIGINT) AS n_common,
           r.sh AS evidence_shingle, CAST(r.df AS BIGINT) AS shingle_df,
           CAST(r.rn AS BIGINT) AS evidence_rank
    FROM ranked r JOIN pairs p ON p.d1 = r.d1 AND p.d2 = r.d2
    WHERE r.rn <= 3
    """,
    "dedup EXPLAINABILITY: for every verified near-dup pair (the c08 "
    "exact-Jaccard edge set), the 3 RAREST shared shingles as "
    "human-auditable evidence — rare shared phrases are what "
    "convinces a reviewer two docs genuinely overlap (ubiquitous "
    "shingles prove nothing), the audit trail a deletion pipeline "
    "owes its operators before discarding data.  Rarity = corpus "
    "document frequency (already computed for the prefix-filter "
    "path); deterministic (df, shingle) tiebreak; top-3 via grouped "
    "top-k over each pair's shared-shingle list — all joins equi on "
    "the shingle or pair key, bounded by the verified-pair set",
)
def c113_neardup_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from tp_airflow_gtfs_snowflake_spark.operators import dedup as D
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    sh = D._shingle_rows(docs, "doc_id", "text", 3)
    sh = sh.localCheckpoint(eager=True)  # shared + df + sizes reuse
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df = sh.groupBy("sh").agg(F.count("*").alias("df"))
    a = sh.select(F.col("doc_id").alias("d1"), "sh")
    b = sh.select(F.col("doc_id").alias("d2"), "sh")
    shared = a.join(b, "sh").filter(F.col("d1") < F.col("d2"))
    common = shared.groupBy("d1", "d2").agg(
        F.count("*").alias("n_common"))
    pairs = (common
             .join(sizes.select(F.col("doc_id").alias("d1"),
                                F.col("n_sh").alias("n1")), "d1")
             .join(sizes.select(F.col("doc_id").alias("d2"),
                                F.col("n_sh").alias("n2")), "d2")
             .filter(F.col("n_common")
                     / (F.col("n1") + F.col("n2") - F.col("n_common"))
                     >= 0.5)
             .select("d1", "d2", "n_common"))
    ranked = (shared.join(F.broadcast(pairs), ["d1", "d2"])
              .join(df, "sh")
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("d1", "d2").orderBy("df", "sh")))
              .filter(F.col("rn") <= 3))
    return ranked.select(
        F.col("d1").cast("long").alias("d1"),
        F.col("d2").cast("long").alias("d2"),
        F.col("n_common").cast("long").alias("n_common"),
        F.col("sh").alias("evidence_shingle"),
        F.col("df").cast("long").alias("shingle_df"),
        F.col("rn").cast("long").alias("evidence_rank"))


# ---------------------------------------------------------------------
# b131: seasonal indices (ratio-to-moving-average, integer ppm).
# ---------------------------------------------------------------------

@_register(
    "b131_seasonal_index",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY CAST(ts AS DATE)
    ), ma AS (
      SELECT day, y,
             sum(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING) AS s7,
             count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS n7
      FROM d
    ), ratio AS (
      SELECT dayofweek(day) AS dow,
             y * 1000000 * n7 // s7 AS r_ppm
      FROM ma WHERE n7 = 7
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(r_ppm) // count(*) AS BIGINT) AS seasonal_index_ppm
    FROM ratio GROUP BY dow ORDER BY dow
    """,
    "classical seasonal decomposition, step 1: ratio-to-moving-"
    "average day-of-week indices — each full-window day's count "
    "divided by its centered 7-day moving average (both integers: "
    "y*1e6*n // sum), averaged per weekday.  Index > 1e6 = that "
    "weekday runs above trend; the multiplicative seasonality b119's "
    "seasonal-naive forecast implicitly assumes, now measured.  All "
    "windows run over the DAILY aggregate (bounded rows/partition "
    "at any corpus size); the daily rollup is the only corpus-scale "
    "work.  DuckDB dayofweek 0=Sunday mirrored via Spark dayofweek-1",
)
def b131_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    d = (ev.groupBy(F.col("ts").cast("date").alias("day"))
         .agg(F.count("*").alias("y")))
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    ma = (d.withColumn("s7", F.sum("y").over(w7))
          .withColumn("n7", F.count("*").over(w7))
          .filter(F.col("n7") == 7))
    ratio = ma.select((F.dayofweek("day") - 1).cast("long").alias("dow"),
                      F.expr("y * 1000000 * n7 div s7").alias("r_ppm"))
    return (ratio.groupBy("dow")
            .agg(F.count("*").cast("long").alias("n_days"),
                 F.expr("sum(r_ppm) div count(*)").cast("long")
                 .alias("seasonal_index_ppm"))
            .orderBy("dow"))


# ---------------------------------------------------------------------
# b132: daily utilization — union-of-intervals length via sweep-line.
# ---------------------------------------------------------------------

@_register(
    "b132_interval_union_utilization",
    """
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), d AS (
      SELECT day, s AS us, 1 AS delta, user_id FROM iv
      UNION ALL
      SELECT day, e AS us, -1 AS delta, user_id FROM iv
    ), sweep AS (
      SELECT day, us, delta,
             sum(delta) OVER (PARTITION BY day
                              ORDER BY us, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS conc,
             lead(us) OVER (PARTITION BY day
                            ORDER BY us, delta DESC, user_id) AS nxt
      FROM d
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(CASE WHEN conc > 0 THEN nxt - us ELSE 0 END)
                // 1000000 AS BIGINT) AS covered_seconds
    FROM sweep WHERE nxt IS NOT NULL
    GROUP BY day
    """,
    "union-of-intervals coverage per day: total seconds during which "
    "AT LEAST ONE user was active (overlaps counted once) — the "
    "utilization/occupancy-duration companion of b128's peak (same "
    "sweep, different consumer: between consecutive sweep events, "
    "time is covered iff the running concurrency is positive, so "
    "coverage = sum of positive-concurrency segment lengths).  Same "
    "scale shape as b128: the sweep's windows shard by day here "
    "(oracle spec form); Spark mirrors the spec because the "
    "segment-length join needs the NEXT event — at 100 TB the "
    "hour-block refinement from b128 applies identically (carry "
    "block-boundary sentinels), documented rather than duplicated.  "
    "Explicit (us, delta desc, user) tiebreak keeps both engines' "
    "sweeps identical",
)
def b132_interval_union_utilization(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    iv = (ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
          .agg(F.min(F.unix_micros("ts")).alias("s"),
               F.max(F.unix_micros("ts")).alias("e")))
    d = (iv.select("day", F.col("s").alias("us"),
                   F.lit(1).alias("delta"), "user_id")
         .unionByName(iv.select("day", F.col("e").alias("us"),
                                F.lit(-1).alias("delta"), "user_id")))
    w = (W.partitionBy("day")
         .orderBy(F.col("us"), F.desc("delta"), F.col("user_id")))
    sweep = (d.withColumn("conc", F.sum("delta").over(
        w.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("nxt", F.lead("us").over(w)))
    return (sweep.filter(F.col("nxt").isNotNull())
            .groupBy("day")
            .agg(F.expr("sum(case when conc > 0 then nxt - us "
                        "else 0 end) div 1000000")
                 .cast("long").alias("covered_seconds"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "covered_seconds"))


# ---------------------------------------------------------------------
# c114: dedup impact on the language mixture.
# ---------------------------------------------------------------------

@_register(
    "c114_dedup_mixture_shift",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node),
    losers AS (SELECT node FROM comp WHERE node <> component_id),
    pre AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    post AS (
      SELECT lang, count(*) AS n FROM documents
      WHERE doc_id NOT IN (SELECT node FROM losers)
      GROUP BY lang
    ), tot AS (
      SELECT (SELECT sum(n) FROM pre) AS np,
             (SELECT sum(n) FROM post) AS nq
    )
    SELECT pre.lang,
           CAST(pre.n AS BIGINT) AS n_before,
           CAST(post.n AS BIGINT) AS n_after,
           CAST(pre.n * 1000000 // tot.np AS BIGINT) AS share_before_ppm,
           CAST(post.n * 1000000 // tot.nq AS BIGINT) AS share_after_ppm,
           CAST(post.n * 1000000 // tot.nq
                - pre.n * 1000000 // tot.np AS BIGINT) AS shift_ppm
    FROM pre JOIN post USING (lang) CROSS JOIN tot
    """,
    "LLM-curation: does dedup SKEW the language mixture?  Per "
    "language, corpus share (ppm) before and after component-level "
    "near-dup removal and the shift — duplication is never uniform "
    "across languages/sources, so naive dedup silently re-weights "
    "the training mixture (the bias c75's inverse-dup weighting "
    "corrects; this table MEASURES it first).  Reuses the c19 "
    "component labelling; both mixture profiles are one aggregate "
    "each; the loser set stays a broadcast anti join",
)
def c114_dedup_mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.components import (
        dedup_keep_canonical)
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    docs = docs.localCheckpoint(eager=True)  # pre + post + edges reuse
    pre = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    kept = dedup_keep_canonical(docs, _edges(spark, sf_dir))
    post = kept.groupBy("lang").agg(F.count("*").alias("n_after"))
    np_ = pre.agg(F.sum("n_before").alias("np"))
    nq = post.agg(F.sum("n_after").alias("nq"))
    return (pre.join(post, "lang")
            .crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nq))
            .select("lang",
                    F.col("n_before").cast("long").alias("n_before"),
                    F.col("n_after").cast("long").alias("n_after"),
                    F.expr("n_before * 1000000 div np").cast("long")
                    .alias("share_before_ppm"),
                    F.expr("n_after * 1000000 div nq").cast("long")
                    .alias("share_after_ppm"),
                    F.expr("n_after * 1000000 div nq "
                           "- n_before * 1000000 div np").cast("long")
                    .alias("shift_ppm")))


# ---------------------------------------------------------------------
# b133: Neyman allocation for stratified sampling.
# ---------------------------------------------------------------------

@_register(
    "b133_neyman_allocation",
    """
    WITH s AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(floor(value * 100) AS BIGINT)) AS sx,
             sum(CAST(floor(value * 100) AS BIGINT)
                 * CAST(floor(value * 100) AS BIGINT)) AS sxx
      FROM events GROUP BY event_type
    ), w AS (
      SELECT event_type, n,
             CAST(floor(sqrt(CAST(
               (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
               // (CAST(n AS HUGEINT) * n) AS DOUBLE))) AS BIGINT)
               AS sd_cents
      FROM s
    ), t AS (
      SELECT sum(n * sd_cents) AS denom FROM w
    ), alloc AS (
      SELECT w.event_type, w.n, w.sd_cents,
             1000 * w.n * w.sd_cents // nullif(t.denom, 0) AS base,
             (1000 * w.n * w.sd_cents) % nullif(t.denom, 0) AS rem
      FROM w CROSS JOIN t
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, event_type) AS rk,
             (SELECT 1000 - sum(base) FROM alloc) AS leftover
      FROM alloc
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_stratum,
           CAST(sd_cents AS BIGINT) AS sd_cents,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS sample_size
    FROM ranked ORDER BY event_type
    """,
    "survey-sampling design: NEYMAN ALLOCATION of a 1000-row eval "
    "sample across event-type strata — each stratum gets budget "
    "proportional to N_h * S_h (big AND variable strata deserve more "
    "samples; the minimum-variance allocation for a fixed budget).  "
    "S_h = floor(sqrt(exact integer variance in cents)) — sqrt is "
    "IEEE-correctly-rounded in both engines so the floor is "
    "portable; variance comes from exact HUGEINT/decimal moments "
    "(the b123 discipline).  Fractional seats settle by largest "
    "remainder (the c45/b91 apportionment idiom) so the total "
    "reconciles to exactly 1000.  One map-side-combinable moment agg "
    "+ arithmetic over a 5-row table",
)
def b133_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    s = (ev.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum(cents).alias("sx"),
              F.sum(cents * cents).alias("sxx")))
    dec = "decimal(20,0)"
    var = F.expr(
        f"cast((cast(n as {dec}) * sxx - cast(sx as {dec}) * sx) "
        f"div (cast(n as {dec}) * n) as double)")
    w = s.select("event_type", "n",
                 F.floor(F.sqrt(var)).cast("long").alias("sd_cents"))
    t = w.agg(F.sum(F.col("n") * F.col("sd_cents")).alias("denom"))
    alloc = (w.crossJoin(F.broadcast(t))
             .withColumn("base",
                         F.expr("1000 * n * sd_cents div nullif(denom, 0)"))
             .withColumn("rem", F.expr("(1000 * n * sd_cents) % nullif(denom, 0)")))
    tot = alloc.agg((F.lit(1000) - F.sum("base")).alias("leftover"))
    ranked = (alloc.crossJoin(F.broadcast(tot))
              .withColumn("rk", F.row_number().over(
                  W.orderBy(F.desc("rem"), F.col("event_type")))))
    return (ranked.select(
        "event_type", F.col("n").cast("long").alias("n_stratum"),
        F.col("sd_cents").cast("long").alias("sd_cents"),
        (F.col("base")
         + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long").alias("sample_size"))
        .orderBy("event_type"))
