"""Round-18 registry additions (built in the r10 session).

Five operators a 100 TB curation/analytics deployment runs that the
registry did not yet cover, each exact-integer oracle-checked:

- c146: HEAPS'-LAW vocabulary-growth audit — vocabulary size at
  doubling doc-prefix checkpoints plus the per-doubling growth
  ratios.  This is the measurement that prices every
  "vocabulary-bounded collect" assumption the engine makes (BPE
  vocab literals, dictionary-encoding audits, global word spines):
  Heaps' law V(n) = K * n^beta says vocabulary keeps growing at
  100 TB, and the doubling ratio IS 2^beta without ever taking a
  log (log-free posture, c90 Zipf precedent).

- c147: PMI COLLOCATION mining — top-k adjacent word pairs by
  pointwise mutual information, expressed as the exact integer lift
  c_xy*N*1e6/(c_x*c_y) (exp(PMI) in ppm — monotone in PMI, so the
  ranking is identical and no log/float enters the plan).  The
  phrase-mining pass that seeds tokenizer merges and stop-phrase
  lists.

- c148: keyword-TAXONOMY tagging — broadcast keyword->topic
  dictionary, per-doc topic hit counts, deterministic primary-topic
  argmax, corpus-level topic shares.  The domain-mix measurement
  step every data-mixture recipe starts from (c34 resamples a given
  mixture; c148 is where the mixture column comes from).

- b181: T-CLOSENESS audit — completes the privacy trio (b80
  k-anonymity, b138 l-diversity): per quasi-identifier group, the
  earth-mover's distance between the group's ordered
  sensitive-attribute distribution and the global one, in exact
  truncating integer ppm (EMD over ordered categories = mean
  |cumulative difference|).

- b182: SESSIONIZATION-THRESHOLD selection audit — b29 hard-codes a
  30-minute gap; this query prices the whole threshold grid from
  the observed inter-event gap distribution (the c141/c123 posture:
  measure the parameter's cost curve before committing the
  pipeline): per candidate threshold, sessions created, gaps split,
  sessions-per-user.

- c149: GOOD-TURING unseen-mass audit — the count-of-counts
  histogram with the Good-Turing adjusted counts r* =
  (r+1)*N_{r+1}/N_r in exact integer ppm.  The r=1 row's mass_ppm
  IS the Good-Turing estimate of the probability mass of
  never-seen vocabulary — the complement of c146: Heaps says how
  fast vocabulary grows, Good-Turing says how much token mass the
  unseen tail will carry (the OOV-rate number a tokenizer/LM
  deployment budgets against).

- b183: CONVERSION-HAZARD (Kaplan-Meier ingredients) — per lag-day
  risk set, conversions, right-censored exits, and the discrete
  hazard in exact integer ppm for the signup->purchase funnel.
  b33's funnel counts who converted; this measures WHEN, with
  censoring handled the way survival analysis requires (users who
  never converted stay in the risk set until the study horizon) —
  the log-free integer core of a KM curve.

Reference contract: none of this exists in the reference (its
analytic surface is the KPI list, README.md:116-129); the tier
re-expresses public curation/privacy/phrase-mining designs as
oracle-checked relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
    _duck_toks, _spread)


# ---------------------------------------------------------------------
# c146: Heaps'-law vocabulary growth at doubling prefixes
# ---------------------------------------------------------------------

# Doubling grid over doc_id prefixes: level k covers doc_id in
# [lo, hi) with hi = 2^k; the first level absorbs [0, 16).  14
# doubling levels reach 128k docs — beyond every test SF — and a
# final catch-all level [2^17, 2^62) absorbs any corpus beyond the
# grid (ADVICE r10: without it, docs past 2^17 were silently
# EXCLUDED from every cumulative count, and oracle parity could not
# catch the truncation since both engines shared the grid).  The
# catch-all's ratio rows are a ">=2x tail", not a doubling; levels
# with no new docs are dropped in the final projection, so the grid
# needs no per-SF tuning.
_HP_LEVELS = ([(k, 0 if k == 4 else 2 ** (k - 1), 2 ** k)
               for k in range(4, 18)]
              + [(18, 2 ** 17, 2 ** 62)])
_HP_GRID_SQL = ", ".join(f"({k}, {lo}, {hi})" for k, lo, hi in _HP_LEVELS)


@_register(
    "c146_heaps_law_vocab_growth",
    f"""
    WITH g(lvl, lo, hi) AS (VALUES {_HP_GRID_SQL}),
    d AS (SELECT doc_id, len({_duck_toks()}) AS n_toks FROM documents),
    w AS (SELECT w, min(doc_id) AS fd
          FROM (SELECT doc_id, unnest({_duck_toks()}) AS w
                FROM documents)
          GROUP BY w),
    dl AS (SELECT lvl, count(*) AS nd, sum(n_toks) AS nt
           FROM d JOIN g ON doc_id >= lo AND doc_id < hi GROUP BY lvl),
    wl AS (SELECT lvl, count(*) AS nw
           FROM w JOIN g ON fd >= lo AND fd < hi GROUP BY lvl),
    c AS (SELECT g.lvl, g.hi, coalesce(dl.nd, 0) AS nd,
                 sum(coalesce(dl.nd, 0)) OVER
                   (ORDER BY g.lvl ROWS UNBOUNDED PRECEDING) AS n_docs,
                 sum(coalesce(dl.nt, 0)) OVER
                   (ORDER BY g.lvl ROWS UNBOUNDED PRECEDING) AS n_tokens,
                 sum(coalesce(wl.nw, 0)) OVER
                   (ORDER BY g.lvl ROWS UNBOUNDED PRECEDING) AS vocab
          FROM g LEFT JOIN dl USING (lvl) LEFT JOIN wl USING (lvl)),
    k AS (SELECT lvl, hi, n_docs, n_tokens, vocab,
                 lag(vocab) OVER (ORDER BY lvl) AS pv,
                 lag(n_tokens) OVER (ORDER BY lvl) AS pt
          FROM c WHERE nd > 0)
    SELECT CAST(lvl AS BIGINT) AS lvl,
           CAST(hi AS BIGINT) AS hi_docs,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           CAST(vocab * 1000000 // pv AS BIGINT) AS vocab_ratio_ppm,
           CAST(n_tokens * 1000000 // pt AS BIGINT) AS token_ratio_ppm
    FROM k ORDER BY lvl
    """,
    "HEAPS'-LAW vocabulary-growth audit: distinct-vocabulary size at "
    "doubling doc_id-prefix checkpoints, with per-doubling vocab and "
    "token growth ratios in exact truncating integer ppm.  "
    "vocab_ratio ~ 2^beta when tokens double, so beta is read off "
    "the ratio column without a single log or float (c90's log-free "
    "Zipf posture).  This measurement prices every vocab-bounded "
    "collect the engine relies on (BPE vocab literals, b179 global "
    "dictionaries, word spines): sublinear ratios (<2e6 ppm) mean "
    "those stay bounded at 100 TB; ratios pinned at 2e6 ppm mean a "
    "key-space redesign.  Scale shape: ONE corpus pass builds "
    "per-word first-occurrence (vocab-scaled) and per-doc token "
    "counts; the doubling grid is a 14-row literal broadcast, and "
    "everything after the two grid-bucketed aggregates runs on <=14 "
    "rows (SP-ordering reviewed).",
)
def c146_heaps_law_vocab_growth(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.lower("text")), " +").alias("toks"))
    grid = F.broadcast(
        spark.createDataFrame(_HP_LEVELS, "lvl int, lo long, hi long"))
    d = docs.select("doc_id", F.size("toks").alias("n_toks"))
    w = (docs.select("doc_id", F.explode("toks").alias("w"))
         .groupBy("w").agg(F.min("doc_id").alias("fd")))
    dl = (d.join(grid, (d.doc_id >= grid.lo) & (d.doc_id < grid.hi))
          .groupBy("lvl").agg(F.count("*").alias("nd"),
                              F.sum("n_toks").alias("nt")))
    wl = (w.join(grid, (w.fd >= grid.lo) & (w.fd < grid.hi))
          .groupBy("lvl").agg(F.count("*").alias("nw")))
    cum = W.orderBy("lvl").rowsBetween(W.unboundedPreceding, 0)
    c = (grid.join(F.broadcast(dl), "lvl", "left")
         .join(F.broadcast(wl), "lvl", "left")
         .select("lvl", "hi",
                 F.coalesce("nd", F.lit(0)).alias("nd"),
                 F.sum(F.coalesce("nd", F.lit(0))).over(cum)
                 .alias("n_docs"),
                 F.sum(F.coalesce("nt", F.lit(0))).over(cum)
                 .alias("n_tokens"),
                 F.sum(F.coalesce("nw", F.lit(0))).over(cum)
                 .alias("vocab")))
    lg = W.orderBy("lvl")
    k = (c.filter(F.col("nd") > 0)
         .select("lvl", "hi", "n_docs", "n_tokens", "vocab",
                 F.lag("vocab").over(lg).alias("pv"),
                 F.lag("n_tokens").over(lg).alias("pt")))
    return (k.select(
        F.col("lvl").cast("long").alias("lvl"),
        F.col("hi").cast("long").alias("hi_docs"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.expr("vocab * 1000000 div pv").cast("long")
        .alias("vocab_ratio_ppm"),
        F.expr("n_tokens * 1000000 div pt").cast("long")
        .alias("token_ratio_ppm"))
        .orderBy("lvl"))


# ---------------------------------------------------------------------
# c147: PMI collocations (exact integer lift, log-free PMI ranking)
# ---------------------------------------------------------------------

_PMI_MIN_C = 3      # minimum bigram occurrences before scoring
_PMI_TOPK = 50


@_register(
    "c147_pmi_collocations",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
           FROM (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
                 FROM t)),
    uni AS (SELECT w, count(*) AS cw
            FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
    n AS (SELECT sum(cw) AS n FROM uni),
    bgc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY w1, w2
            HAVING count(*) >= {_PMI_MIN_C})
    SELECT w1, w2,
           CAST(c_xy AS BIGINT) AS c_xy,
           CAST(u1.cw AS BIGINT) AS c_x,
           CAST(u2.cw AS BIGINT) AS c_y,
           CAST(CAST(c_xy AS HUGEINT) * n.n * 1000000
                // (CAST(u1.cw AS HUGEINT) * u2.cw) AS BIGINT)
             AS lift_ppm
    FROM bgc JOIN uni u1 ON u1.w = w1
             JOIN uni u2 ON u2.w = w2
             CROSS JOIN n
    ORDER BY lift_ppm DESC, w1, w2 LIMIT {_PMI_TOPK}
    """,
    "PMI COLLOCATION mining: top-k adjacent word pairs by pointwise "
    "mutual information, ranked via the exact integer lift "
    "c_xy*N*1e6/(c_x*c_y) = exp(PMI) in ppm — monotone in PMI, so "
    "the ranking is exact while the plan stays log-free and "
    "float-free (c54's posture, upgraded from frequency to "
    "association strength).  The phrase-mining pass that seeds "
    "tokenizer merge lists and stop-phrase filters.  Scale shape: "
    "ONE corpus pass emits in-doc adjacent pairs via zip_with (no "
    "positional self-join), a min-count HAVING prunes the candidate "
    "pair table before both unigram joins (Zipf: singletons dominate "
    "pairs), the unigram table is vocabulary-bounded, and the final "
    "ranking is TakeOrdered(k) — no global sort materializes.",
)
def c147_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), " +").alias("toks"))
    pairs = toks.select(F.explode(F.expr(
        "zip_with(slice(toks, 1, size(toks) - 1), "
        "slice(toks, 2, size(toks) - 1), "
        "(a, b) -> struct(a AS w1, b AS w2))")).alias("p")
    ).select("p.w1", "p.w2")
    uni = (toks.select(F.explode("toks").alias("w"))
           .groupBy("w").agg(F.count("*").alias("cw")))
    ntot = uni.agg(F.sum("cw").alias("n"))
    bgc = (pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
           .filter(F.col("c_xy") >= _PMI_MIN_C))
    u1 = uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c_x")
    u2 = uni.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c_y")
    return (bgc.join(u1, "w1").join(u2, "w2")
            .crossJoin(F.broadcast(ntot))
            .select("w1", "w2",
                    F.col("c_xy").cast("long").alias("c_xy"),
                    F.col("c_x").cast("long").alias("c_x"),
                    F.col("c_y").cast("long").alias("c_y"),
                    # 128-bit (DECIMAL(38,0) / HUGEINT in the oracle)
                    # intermediates: c_xy*n*1e6 <= n^2*1e6 overflows
                    # int64 past ~1e8 corpus tokens with a hot bigram
                    # (ADVICE r10); decimal keeps the lift exact to
                    # ~1e16 tokens in both engines.
                    F.expr(
                        "CAST(CAST(c_xy AS DECIMAL(38,0)) * n * 1000000"
                        " div (CAST(c_x AS DECIMAL(38,0)) * c_y)"
                        " AS BIGINT)")
                    .alias("lift_ppm"))
            .orderBy(F.desc("lift_ppm"), "w1", "w2")
            .limit(_PMI_TOPK))


# ---------------------------------------------------------------------
# c148: keyword-taxonomy tagging (broadcast dictionary, deterministic
#       primary-topic argmax, corpus topic shares)
# ---------------------------------------------------------------------

# Each keyword maps to exactly ONE topic (flat taxonomy; a real
# deployment loads this from a curated table — the plan shape is
# identical).
_TAXONOMY = [
    ("scan", "execution"), ("join", "execution"), ("merge", "execution"),
    ("sort", "execution"), ("filter", "execution"), ("hash", "execution"),
    ("agg", "execution"), ("group", "execution"),
    ("table", "storage"), ("row", "storage"), ("column", "storage"),
    ("key", "storage"), ("part", "storage"), ("batch", "storage"),
    ("stream", "streaming"), ("window", "streaming"),
    ("vector", "streaming"),
    ("spark", "core"), ("query", "core"), ("data", "core"),
    ("value", "core"),
]
_TAX_SQL = ", ".join(f"('{k}', '{t}')" for k, t in _TAXONOMY)


@_register(
    "c148_taxonomy_keyword_tagging",
    f"""
    WITH tax(kw, topic) AS (VALUES {_TAX_SQL}),
    t AS (SELECT doc_id, unnest({_duck_toks()}) AS w FROM documents),
    hits AS (SELECT doc_id, topic, count(*) AS cnt
             FROM t JOIN tax ON w = kw GROUP BY doc_id, topic),
    win AS (SELECT doc_id, topic, cnt
            FROM (SELECT doc_id, topic, cnt,
                         row_number() OVER (PARTITION BY doc_id
                             ORDER BY cnt DESC, topic) AS rn
                  FROM hits) WHERE rn = 1),
    lab AS (SELECT d.doc_id, coalesce(w.topic, 'untagged') AS topic,
                   coalesce(w.cnt, 0) AS cnt
            FROM documents d LEFT JOIN win w USING (doc_id)),
    tot AS (SELECT topic, sum(cnt) AS total_hits FROM hits
            GROUP BY topic),
    nd AS (SELECT count(*) AS n FROM documents)
    SELECT lab.topic,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 1000000 // any_value(nd.n) AS BIGINT)
             AS share_ppm,
           CAST(sum(lab.cnt) AS BIGINT) AS primary_hits,
           CAST(coalesce(any_value(tot.total_hits), 0) AS BIGINT)
             AS total_hits
    FROM lab CROSS JOIN nd
    LEFT JOIN tot ON tot.topic = lab.topic
    GROUP BY lab.topic ORDER BY lab.topic
    """,
    "keyword-TAXONOMY tagging: a broadcast keyword->topic dictionary "
    "joined against the token stream, per-doc topic hit counts, a "
    "deterministic primary-topic argmax (count desc, topic asc — no "
    "plan-order tie), and corpus-level topic shares with an explicit "
    "'untagged' bucket.  This is the measurement a data-mixture "
    "recipe starts from (c34 resamples a GIVEN mixture; c148 "
    "produces the mixture column).  Scale shape: the dictionary is a "
    "literal broadcast (curated taxonomies are KB-scale), the token "
    "join prunes to keyword hits before any shuffle, the argmax "
    "window is partitioned by doc_id (never global), and the final "
    "relation is |topics|+1 rows.",
)
def c148_taxonomy_keyword_tagging(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tax = F.broadcast(
        spark.createDataFrame(_TAXONOMY, "kw string, topic string"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), " +")).alias("w"))
    hits = (toks.join(tax, toks.w == tax.kw)
            .groupBy("doc_id", "topic").agg(F.count("*").alias("cnt")))
    rn = W.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("topic"))
    win = (hits.withColumn("rn", F.row_number().over(rn))
           .filter(F.col("rn") == 1).drop("rn"))
    lab = (docs.select("doc_id").join(win, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("topic", F.lit("untagged")).alias("topic"),
                   F.coalesce("cnt", F.lit(0)).alias("cnt")))
    tot = hits.groupBy("topic").agg(F.sum("cnt").alias("total_hits"))
    nd = docs.agg(F.count("*").alias("n"))
    return (lab.crossJoin(F.broadcast(nd))
            .join(tot, "topic", "left")
            .groupBy("topic")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.expr("count(*) * 1000000 div any_value(n)")
                 .cast("long").alias("share_ppm"),
                 F.sum("cnt").cast("long").alias("primary_hits"),
                 F.coalesce(F.any_value("total_hits"), F.lit(0))
                 .cast("long").alias("total_hits"))
            .orderBy("topic"))


# ---------------------------------------------------------------------
# b181: t-closeness audit (EMD over ordered sensitive buckets)
# ---------------------------------------------------------------------

_TC_BUCKET = 50_000        # o_totalprice bucket width (10 buckets)
_TC_THRESH = 150_000       # t threshold in ppm


@_register(
    "b181_t_closeness_audit",
    f"""
    WITH j AS (
      SELECT n_name, c_mktsegment,
             CAST(floor(o_totalprice / {_TC_BUCKET}) AS BIGINT) AS bkt
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    cells AS (SELECT n_name, c_mktsegment, bkt, count(*) AS cnt
              FROM j GROUP BY 1, 2, 3),
    grp AS (SELECT n_name, c_mktsegment, sum(cnt) AS n_grp
            FROM cells GROUP BY 1, 2),
    gb AS (SELECT bkt, sum(cnt) AS gcnt FROM cells GROUP BY bkt),
    gt AS (SELECT sum(gcnt) AS n, count(*) AS m FROM gb),
    p AS (SELECT g.n_name, g.c_mktsegment, g.n_grp, b.bkt,
                 coalesce(c.cnt, 0) * 1000000 // g.n_grp
                 - b.gcnt * 1000000 // t.n AS dppm,
                 t.m
          FROM grp g CROSS JOIN gb b CROSS JOIN gt t
          LEFT JOIN cells c ON c.n_name = g.n_name
                AND c.c_mktsegment = g.c_mktsegment AND c.bkt = b.bkt),
    cum AS (SELECT n_name, c_mktsegment, n_grp, m,
                   sum(dppm) OVER (PARTITION BY n_name, c_mktsegment
                       ORDER BY bkt ROWS UNBOUNDED PRECEDING) AS cd
            FROM p)
    SELECT n_name, c_mktsegment,
           CAST(any_value(n_grp) AS BIGINT) AS n_rows,
           CAST(sum(abs(cd)) // greatest(any_value(m) - 1, 1)
                AS BIGINT) AS t_ppm,
           CASE WHEN sum(abs(cd)) // greatest(any_value(m) - 1, 1)
                     > {_TC_THRESH} THEN 'breach' ELSE 'ok' END
             AS verdict
    FROM cum GROUP BY n_name, c_mktsegment
    ORDER BY n_name, c_mktsegment
    """,
    "T-CLOSENESS audit — completes the privacy trio (b80 k-anonymity "
    "counts group sizes, b138 l-diversity counts distinct sensitive "
    "values, t-closeness bounds the DISTRIBUTIONAL leak): per "
    "quasi-identifier group (nation x market segment), the "
    "earth-mover's distance between the group's ordered "
    "sensitive-bucket distribution (order-value bands) and the "
    "global one, in exact truncating integer ppm.  EMD over ordered "
    "categories = mean absolute cumulative difference — windows "
    "partitioned per group over the bucket spine, no float, no "
    "global window.  Scale shape: one fact pass builds (group, "
    "bucket) cells; every relation after that is |groups| x "
    "|buckets| (QI taxonomies are small by definition — a "
    "high-cardinality QI has no k-anonymity to audit).",
)
def b181_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    j = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .join(nation, cust.c_nationkey == nation.n_nationkey)
         .select("n_name", "c_mktsegment",
                 F.floor(F.col("o_totalprice") / _TC_BUCKET)
                 .cast("long").alias("bkt")))
    # NOTE (r11, measured): cells feeds four consumers, but its OWN
    # aggregate exchange is the identical subtree in all four, so AQE
    # exchange reuse already computes the fact join + shuffle once; a
    # lazy cut here regressed 12% at sf0.1 (interleaved A/B), reverted.
    cells = (j.groupBy("n_name", "c_mktsegment", "bkt")
             .agg(F.count("*").alias("cnt")))
    grp = (cells.groupBy("n_name", "c_mktsegment")
           .agg(F.sum("cnt").alias("n_grp")))
    gb = cells.groupBy("bkt").agg(F.sum("cnt").alias("gcnt"))
    gt = gb.agg(F.sum("gcnt").alias("n"), F.count("*").alias("m"))
    p = (grp.crossJoin(F.broadcast(gb)).crossJoin(F.broadcast(gt))
         .join(cells, ["n_name", "c_mktsegment", "bkt"], "left")
         .select("n_name", "c_mktsegment", "n_grp", "bkt", "m",
                 (F.expr("coalesce(cnt, 0) * 1000000 div n_grp")
                  - F.expr("gcnt * 1000000 div n")).alias("dppm")))
    cw = (W.partitionBy("n_name", "c_mktsegment").orderBy("bkt")
          .rowsBetween(W.unboundedPreceding, 0))
    cum = p.select("n_name", "c_mktsegment", "n_grp", "m",
                   F.sum("dppm").over(cw).alias("cd"))
    return (cum.groupBy("n_name", "c_mktsegment")
            .agg(F.any_value("n_grp").cast("long").alias("n_rows"),
                 # greatest(m-1, 1): if the data collapses into a
                 # single global bucket the EMD denominator is 0 and
                 # a NULL t_ppm would read as an 'ok' verdict in a
                 # privacy audit (ADVICE r10) — with m=1 every
                 # group's distribution equals the global one, so
                 # t_ppm=0 is also the correct answer.
                 F.expr("sum(abs(cd)) div greatest(any_value(m) - 1,"
                        " 1)")
                 .cast("long").alias("t_ppm"))
            .select("n_name", "c_mktsegment", "n_rows", "t_ppm",
                    F.when(F.col("t_ppm") > _TC_THRESH, "breach")
                    .otherwise("ok").alias("verdict"))
            .orderBy("n_name", "c_mktsegment"))


# ---------------------------------------------------------------------
# b182: sessionization-threshold selection audit
# ---------------------------------------------------------------------

# Candidate gap thresholds (seconds) -> half-open gap bands
# [lo, hi) in MICROSECONDS; band 0 is the sub-threshold floor and is
# dropped from the output (it is not a candidate).
_ST_THRESH_S = [1800, 3600, 14400, 43200, 86400, 172800]
_ST_BANDS = [(i, (0 if i == 0 else _ST_THRESH_S[i - 1] * 1_000_000),
              (_ST_THRESH_S[i] * 1_000_000 if i < len(_ST_THRESH_S)
               else 10 ** 18))
             for i in range(len(_ST_THRESH_S) + 1)]
_ST_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _ST_BANDS)


@_register(
    "b182_session_threshold_audit",
    f"""
    WITH g(band, lo_us, hi_us) AS (VALUES {_ST_BANDS_SQL}),
    e AS (SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events),
    gp AS (SELECT gap FROM e WHERE gap IS NOT NULL),
    bc AS (SELECT band, count(*) AS c
           FROM gp JOIN g ON gap >= lo_us AND gap < hi_us
           GROUP BY band),
    s AS (SELECT g.band, g.lo_us,
                 sum(coalesce(bc.c, 0)) OVER
                   (ORDER BY g.band DESC ROWS UNBOUNDED PRECEDING)
                   AS n_breaks
          FROM g LEFT JOIN bc USING (band)),
    u AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    ng AS (SELECT count(*) AS n_gaps FROM gp)
    SELECT CAST(lo_us // 1000000 AS BIGINT) AS thr_s,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(n_breaks AS BIGINT) AS n_breaks,
           CAST(n_users + n_breaks AS BIGINT) AS n_sessions,
           CAST(n_breaks * 1000000 // n_gaps AS BIGINT) AS split_ppm,
           CAST((n_users + n_breaks) * 1000 // n_users AS BIGINT)
             AS sessions_per_user_milli
    FROM s CROSS JOIN u CROSS JOIN ng
    WHERE band >= 1 ORDER BY thr_s
    """,
    "SESSIONIZATION-THRESHOLD selection audit: b29 hard-codes a "
    "30-minute gap; this prices the whole candidate grid from the "
    "observed inter-event gap distribution before the pipeline "
    "commits (the c141/c123 posture: measure the parameter's cost "
    "curve, then choose).  Per candidate threshold: sessions "
    "created, gaps split, split fraction and sessions-per-user in "
    "exact integer ppm/milli.  A knee in n_sessions(T) is the "
    "natural session gap; a flat curve means the threshold is "
    "arbitrary and downstream session KPIs are artifacts.  Split "
    "convention: a gap equal to a candidate threshold counts as a "
    "break for that threshold (gap >= T, half-open bands [lo, hi)) — "
    "b29's sessionizer splits on gap > T, so a gap landing exactly "
    "on a boundary is priced here as split; with microsecond gaps "
    "and second-grained candidates the boundary set is measure-zero "
    "in practice, and the convention is pinned identically in both "
    "engines (ADVICE r10: documented, not silently divergent).  "
    "Scale "
    "shape: ONE pass computes per-user lag gaps (the same single "
    "user_id shuffle b29 pays), each gap lands in exactly one "
    "half-open band of a literal broadcast grid, and every relation "
    "after the band count is |bands| rows (SP-ordering reviewed).",
)
def b182_session_threshold_audit(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    lw = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (ev.select(
        (F.unix_micros("ts")
         - F.unix_micros(F.lag("ts").over(lw))).alias("gap"))
        .filter(F.col("gap").isNotNull()))
    grid = F.broadcast(spark.createDataFrame(
        _ST_BANDS, "band int, lo_us long, hi_us long"))
    bc = (gaps.join(grid, (gaps.gap >= grid.lo_us)
                    & (gaps.gap < grid.hi_us))
          .groupBy("band").agg(F.count("*").alias("c")))
    sw = W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, 0)
    s = (grid.join(F.broadcast(bc), "band", "left")
         .select("band", "lo_us",
                 F.sum(F.coalesce("c", F.lit(0))).over(sw)
                 .alias("n_breaks")))
    u = ev.agg(F.countDistinct("user_id").alias("n_users"))
    ng = gaps.agg(F.count("*").alias("n_gaps"))
    return (s.crossJoin(F.broadcast(u)).crossJoin(F.broadcast(ng))
            .filter(F.col("band") >= 1)
            .select(F.expr("lo_us div 1000000").cast("long")
                    .alias("thr_s"),
                    F.col("n_gaps").cast("long").alias("n_gaps"),
                    F.col("n_breaks").cast("long").alias("n_breaks"),
                    (F.col("n_users") + F.col("n_breaks")).cast("long")
                    .alias("n_sessions"),
                    F.expr("n_breaks * 1000000 div n_gaps").cast("long")
                    .alias("split_ppm"),
                    F.expr("(n_users + n_breaks) * 1000 div n_users")
                    .cast("long").alias("sessions_per_user_milli"))
            .orderBy("thr_s"))


# ---------------------------------------------------------------------
# c149: Good-Turing count-of-counts / unseen-mass audit
# ---------------------------------------------------------------------

_GT_MAX_R = 10       # explicit frequency classes 1..10; 11 = ">10"


@_register(
    "c149_good_turing_unseen_mass",
    f"""
    WITH w AS (SELECT w, count(*) AS cw
               FROM (SELECT unnest({_duck_toks()}) AS w FROM documents)
               GROUP BY w),
    n AS (SELECT sum(cw) AS n FROM w),
    coc AS (SELECT CASE WHEN cw > {_GT_MAX_R} THEN {_GT_MAX_R + 1}
                        ELSE cw END AS r_class,
                   count(*) AS n_words, sum(cw) AS mass
            FROM w GROUP BY 1)
    SELECT CAST(c.r_class AS BIGINT) AS r_class,
           CAST(c.n_words AS BIGINT) AS n_words,
           CAST(c.mass AS BIGINT) AS mass,
           CAST(c.mass * 1000000 // n.n AS BIGINT) AS mass_ppm,
           CAST(CASE WHEN c.r_class <= {_GT_MAX_R - 1}
                     THEN (c.r_class + 1) * nx.n_words * 1000000
                          // c.n_words END AS BIGINT) AS gt_rstar_ppm
    FROM coc c LEFT JOIN coc nx ON nx.r_class = c.r_class + 1
    CROSS JOIN n
    ORDER BY r_class
    """,
    "GOOD-TURING unseen-mass audit: the count-of-counts histogram "
    "(frequency classes 1..10 plus a '>10' tail) with per-class "
    "token-mass shares and the Good-Turing adjusted count r* = "
    "(r+1)*N_(r+1)/N_r, all in exact truncating integer ppm.  The "
    "r=1 row's mass_ppm IS the GT estimate of the probability mass "
    "of never-seen vocabulary — the OOV-rate number a tokenizer/LM "
    "deployment budgets against, and the complement of c146 (Heaps "
    "prices vocabulary GROWTH, GT prices the unseen TAIL's mass).  "
    "Scale shape: one corpus pass to vocabulary-scaled word counts, "
    "then an 11-row count-of-counts relation; the r->r+1 adjacency "
    "is an equi-self-join on the 11-row table — no window, no "
    "float, no log.",
)
def c149_good_turing_unseen_mass(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = (docs.select(F.explode(
        F.split(F.trim(F.lower("text")), " +")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("cw")))
    n = w.agg(F.sum("cw").alias("n"))
    coc = (w.groupBy(
        F.when(F.col("cw") > _GT_MAX_R, _GT_MAX_R + 1)
        .otherwise(F.col("cw")).alias("r_class"))
        .agg(F.count("*").alias("n_words"), F.sum("cw").alias("mass")))
    nx = (coc.select((F.col("r_class") - 1).alias("r_class"),
                     F.col("n_words").alias("nx_words")))
    return (coc.join(F.broadcast(nx), "r_class", "left")
            .crossJoin(F.broadcast(n))
            .select(F.col("r_class").cast("long").alias("r_class"),
                    F.col("n_words").cast("long").alias("n_words"),
                    F.col("mass").cast("long").alias("mass"),
                    F.expr("mass * 1000000 div n").cast("long")
                    .alias("mass_ppm"),
                    F.when(F.col("r_class") <= _GT_MAX_R - 1,
                           F.expr("(r_class + 1) * nx_words * 1000000 "
                                  "div n_words"))
                    .cast("long").alias("gt_rstar_ppm"))
            .orderBy("r_class"))


# ---------------------------------------------------------------------
# b183: conversion hazard (Kaplan-Meier ingredients with censoring)
# ---------------------------------------------------------------------

_KM_DAY_US = 86_400_000_000


@_register(
    "b183_conversion_hazard",
    f"""
    WITH su AS (SELECT user_id, min(ts) AS su FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    mx AS (SELECT max(ts) AS c FROM events),
    pu AS (SELECT e.user_id, min(e.ts) AS pu
           FROM events e JOIN su ON e.user_id = su.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= su.su
           GROUP BY e.user_id),
    lab AS (SELECT su.user_id,
                   CASE WHEN pu.pu IS NOT NULL
                        THEN (epoch_us(pu.pu) - epoch_us(su.su))
                             // {_KM_DAY_US}
                        ELSE (epoch_us(mx.c) - epoch_us(su.su))
                             // {_KM_DAY_US} END AS lag_d,
                   CASE WHEN pu.pu IS NOT NULL THEN 1 ELSE 0 END
                     AS conv
            FROM su LEFT JOIN pu ON su.user_id = pu.user_id
            CROSS JOIN mx),
    cell AS (SELECT lag_d, sum(conv) AS n_conv,
                    count(*) - sum(conv) AS n_cens,
                    count(*) AS n_all
             FROM lab GROUP BY lag_d),
    tot AS (SELECT count(*) AS n FROM lab),
    s AS (SELECT lag_d, n_conv, n_cens,
                 n - coalesce(sum(n_all) OVER (ORDER BY lag_d
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_at_risk
          FROM cell CROSS JOIN tot)
    SELECT CAST(lag_d AS BIGINT) AS lag_d,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_conv AS BIGINT) AS n_converted,
           CAST(n_cens AS BIGINT) AS n_censored,
           CAST(n_conv * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
    FROM s ORDER BY lag_d
    """,
    "CONVERSION-HAZARD audit (the Kaplan-Meier ingredients): for the "
    "signup->purchase funnel, per lag-day: the risk set (signed-up "
    "users neither converted nor censored before that day), "
    "conversions, right-censored exits (users who never purchased "
    "leave the risk set at the study horizon, NOT at zero — the "
    "censoring correction naive time-to-convert averages get wrong), "
    "and the discrete hazard d/n in exact integer ppm.  b33 counts "
    "WHO converted; this measures WHEN, log-free (the KM survival "
    "product is a cumulative transform of exactly these columns).  "
    "Scale shape: per-user first-signup/first-purchase aggregates "
    "(one shuffle each on user_id), a |lag-days| cell table "
    "(calendar-bounded, SP-ordering reviewed), and the risk set as "
    "total minus a prefix sum — never a per-user window over facts.",
)
def b183_conversion_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    su = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("su")))
    mx = ev.agg(F.max("ts").alias("c"))
    pu = (ev.filter(F.col("event_type") == "purchase")
          .join(su, "user_id")
          .filter(F.col("ts") >= F.col("su"))
          .groupBy("user_id").agg(F.min("ts").alias("pu")))
    lab = (su.join(pu, "user_id", "left")
           .crossJoin(F.broadcast(mx))
           .select(F.when(
               F.col("pu").isNotNull(),
               F.expr(f"(unix_micros(pu) - unix_micros(su)) "
                      f"div {_KM_DAY_US}"))
               .otherwise(F.expr(
                   f"(unix_micros(c) - unix_micros(su)) "
                   f"div {_KM_DAY_US}")).alias("lag_d"),
               F.when(F.col("pu").isNotNull(), 1).otherwise(0)
               .alias("conv")))
    cell = (lab.groupBy("lag_d")
            .agg(F.sum("conv").alias("n_conv"),
                 (F.count("*") - F.sum("conv")).alias("n_cens"),
                 F.count("*").alias("n_all")))
    # risk-set total from the |lag-days| cells, not a second pass
    # over lab: count(*) over lab == sum(n_all) over cell exactly,
    # and cell's aggregate exchange is shared with the spine by AQE
    # reuse (r11, interleaved A/B -18%; adding localCheckpoints to
    # su/cell was neutral-to-worse and is deliberately omitted)
    tot = cell.agg(F.sum("n_all").alias("n"))
    pw = (W.orderBy("lag_d")
          .rowsBetween(W.unboundedPreceding, -1))
    s = (cell.crossJoin(F.broadcast(tot))
         .select("lag_d", "n_conv", "n_cens",
                 (F.col("n")
                  - F.coalesce(F.sum("n_all").over(pw), F.lit(0)))
                 .alias("n_at_risk")))
    return (s.select(
        F.col("lag_d").cast("long").alias("lag_d"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_conv").cast("long").alias("n_converted"),
        F.col("n_cens").cast("long").alias("n_censored"),
        F.expr("n_conv * 1000000 div n_at_risk").cast("long")
        .alias("hazard_ppm"))
        .orderBy("lag_d"))
