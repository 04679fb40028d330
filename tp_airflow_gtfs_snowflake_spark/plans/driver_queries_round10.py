"""Round-10 registry additions (driver round 5, closing batch).

Model-eval, operator-semantics, and distribution-audit queries that
close gaps the earlier tiers left open:

- b149 ECE calibration bins: the standard model-calibration audit
  (reliability diagram) for a monotone score, computed without any
  float ratio — midrank-CDF confidence and per-bin gaps in integer
  ppm.  Complements b124 (proportion z-test) and c111 (off-policy
  eval) on the eval tier.
- b150 Simpson-reversal audit: does the pooled difference between two
  customer segments reverse inside individual nations?  The classic
  mix-shift trap b129 decomposes is here DETECTED per stratum.
- b151 as-of join with tolerance + nearest direction: pandas
  merge_asof(direction='nearest', tolerance=...) semantics, which b14
  (backward-only) does not cover.
- b152 interval union coverage: merge overlapping per-user intervals
  (gaps-and-islands with a running max) and report covered seconds —
  the interval-set union primitive b36 (overlap join) and b38 (SCD2)
  both stop short of.
- c129 edit-distance verify on blocked candidates: Levenshtein as the
  dedup-tier verify filter (exact-distance analog of c08's n-gram
  Jaccard), on ascii-normalized prefixes so char-vs-byte semantics
  agree across engines.
- c130 Jensen-Shannon divergence between per-language unigram
  distributions — the distribution-distance upgrade of c73's total
  variation (TV needs no logs; JSD is what data-mixture papers
  report).  Add-one smoothing over the union vocabulary.
- c131 cluster purity + mutual information of an axis-sign embedding
  bucketing vs gold labels — the clustering-quality eval (purity /
  MI) over the embeddings table, complementing c127 (kNN label
  consistency) and c91 (ANN recall).

Reference parity: the reference computes punctuality KPIs as
Snowflake views (README "KPIs" list, dags/gtfs_kpis_daily.py); these
queries extend the same reconstructed analytics surface to the eval /
audit tier the charter grades alongside SURVEY §2.

Oracle discipline (see plans/driver_queries.py module docstring):
BIGINT casts on integer outputs, integer-ppm ratios, float math only
in ONE per-row expression over exact-integer inputs (int->double is
exact below 2^53; IEEE +,/ are correctly rounded, so both engines see
bit-identical doubles and the only cross-engine risk is a sub-ulp ln
difference landing exactly on a rounding boundary — probability
~1e-12 per row at the 1e-9 grid used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)

# ---------------------------------------------------------------------
# b149: ECE calibration bins (reliability diagram, integer ppm)
# ---------------------------------------------------------------------


@_register(
    "b149_ece_calibration_bins",
    """
    WITH hist AS (
      SELECT n_chars,
             count(*) AS cnt,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
      FROM documents GROUP BY n_chars
    ), ranked AS (
      SELECT cnt, pos,
             (2 * coalesce(sum(cnt) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt) * 1000000
             // (2 * sum(cnt) OVER ()) AS conf_ppm
      FROM hist
    )
    SELECT CAST(conf_ppm // 100000 AS BIGINT) AS bin,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(sum(pos) * 1000000 // sum(cnt) AS BIGINT)
             AS mean_label_ppm,
           CAST(sum(conf_ppm * cnt) // sum(cnt) AS BIGINT)
             AS mean_conf_ppm,
           CAST(abs(sum(pos) * 1000000 // sum(cnt)
                    - sum(conf_ppm * cnt) // sum(cnt)) AS BIGINT)
             AS gap_ppm
    FROM ranked GROUP BY 1 ORDER BY bin
    """,
    "Expected-calibration-error audit (reliability diagram): a "
    "monotone 'model' scores each document with the midrank CDF of "
    "n_chars as its confidence that lang='en'; per decile-of-"
    "confidence bin the mean predicted confidence is compared with "
    "the observed label rate, all in integer ppm (no float ratio "
    "anywhere).  The |conf - acc| gap per bin IS the reliability "
    "diagram; the n-weighted sum of gaps is ECE.  Scale shape: one "
    "groupBy(n_chars) histogram shuffle over the corpus, then the "
    "midrank window and binning run on |distinct n_chars| aggregated "
    "rows (b77's histogram trick) — never a global sort of raw rows.",
)
def b149_ece_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hist = (docs.groupBy("n_chars")
            .agg(F.count("*").alias("cnt"),
                 F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
                 .alias("pos")))
    w_cum = (W.orderBy("n_chars")
             .rowsBetween(W.unboundedPreceding, -1))
    w_all = W.orderBy("n_chars").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    ranked = hist.select(
        "cnt", "pos",
        ((2 * F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
          + F.col("cnt")) * F.lit(1000000)).alias("num"),
        (2 * F.sum("cnt").over(w_all)).alias("den"),
    ).select("cnt", "pos", F.expr("num div den").alias("conf_ppm"))
    return (ranked
            .groupBy(F.expr("conf_ppm div 100000").cast("long")
                     .alias("bin"))
            .agg(F.sum("cnt").cast("long").alias("n_docs"),
                 F.expr("sum(pos) * 1000000 div sum(cnt)").cast("long")
                 .alias("mean_label_ppm"),
                 F.expr("sum(conf_ppm * cnt) div sum(cnt)").cast("long")
                 .alias("mean_conf_ppm"),
                 F.expr("abs(sum(pos) * 1000000 div sum(cnt) "
                        "- sum(conf_ppm * cnt) div sum(cnt))")
                 .cast("long").alias("gap_ppm"))
            .orderBy("bin"))


# ---------------------------------------------------------------------
# b150: Simpson-reversal audit (pooled vs per-stratum difference)
# ---------------------------------------------------------------------

_SEG_A, _SEG_B = "BUILDING", "MACHINERY"


@_register(
    "b150_simpson_reversal_audit",
    f"""
    WITH j AS (
      SELECT n.n_name,
             c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hi
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), per_nation AS (
      SELECT n_name,
             sum(CASE WHEN seg = '{_SEG_A}' THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN seg = '{_SEG_A}' THEN hi ELSE 0 END) AS hi_a,
             sum(CASE WHEN seg = '{_SEG_B}' THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN seg = '{_SEG_B}' THEN hi ELSE 0 END) AS hi_b
      FROM j GROUP BY n_name
    ), pooled AS (
      SELECT sum(hi_a) * 1000000 // sum(n_a) AS pooled_a_ppm,
             sum(hi_b) * 1000000 // sum(n_b) AS pooled_b_ppm
      FROM per_nation
    )
    SELECT n_name,
           CAST(hi_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
           CAST(hi_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
           CAST(pooled_a_ppm AS BIGINT) AS pooled_a_ppm,
           CAST(pooled_b_ppm AS BIGINT) AS pooled_b_ppm,
           CAST(CASE WHEN sign(hi_a * 1000000 // n_a
                             - hi_b * 1000000 // n_b)
                      * sign(pooled_a_ppm - pooled_b_ppm) = -1
                     THEN 1 ELSE 0 END AS BIGINT) AS reversed
    FROM per_nation CROSS JOIN pooled
    WHERE n_a > 0 AND n_b > 0
    ORDER BY n_name
    """,
    "Simpson's-paradox detector: the pooled high-priority-rate "
    f"difference between the {_SEG_A} and {_SEG_B} customer segments "
    "is compared with the same difference inside every nation; a "
    "stratum whose sign flips against the pooled sign is flagged "
    "(reversed=1) — the mix-shift trap b129 decomposes is here "
    "detected per stratum, all rates in integer ppm.  Scale shape: "
    "one fact-dim join tree (orders |><| customer |><| broadcast "
    "nation), one groupBy(nation) conditional agg; the pooled rates "
    "re-aggregate the |nations| rows and return as a broadcast "
    "1-row cross join — the fact shuffles once.",
)
def b150_simpson_reversal_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B)))
    nation = _t(spark, sf_dir, "nation")
    j = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation),
               cust.c_nationkey == nation.n_nationkey)
         .select("n_name",
                 F.col("c_mktsegment").alias("seg"),
                 F.when(F.col("o_orderpriority")
                        .isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
                 .alias("hi")))
    # |nations| rows: materialize once so the pooled re-aggregate and
    # the main branch don't each rescan the orders/customer join.
    per_nation = (j.groupBy("n_name").agg(
        F.sum(F.when(F.col("seg") == _SEG_A, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("seg") == _SEG_A, F.col("hi")).otherwise(0))
        .alias("hi_a"),
        F.sum(F.when(F.col("seg") == _SEG_B, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("seg") == _SEG_B, F.col("hi")).otherwise(0))
        .alias("hi_b"))).localCheckpoint(eager=False)
    pooled = per_nation.agg(
        F.expr("sum(hi_a) * 1000000 div sum(n_a)").alias("pooled_a_ppm"),
        F.expr("sum(hi_b) * 1000000 div sum(n_b)").alias("pooled_b_ppm"))
    return (per_nation.crossJoin(F.broadcast(pooled))
            .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
            .select(
                "n_name",
                F.expr("hi_a * 1000000 div n_a").cast("long")
                .alias("rate_a_ppm"),
                F.expr("hi_b * 1000000 div n_b").cast("long")
                .alias("rate_b_ppm"),
                F.col("pooled_a_ppm").cast("long"),
                F.col("pooled_b_ppm").cast("long"),
                F.when(
                    F.signum(F.expr("hi_a * 1000000 div n_a "
                                    "- hi_b * 1000000 div n_b"))
                    * F.signum(F.col("pooled_a_ppm")
                               - F.col("pooled_b_ppm")) == -1,
                    1).otherwise(0).cast("long").alias("reversed"))
            .orderBy("n_name"))


# ---------------------------------------------------------------------
# b151: as-of join, tolerance + direction='nearest'
# ---------------------------------------------------------------------

_ASOF_TOL_US = 600 * 1_000_000  # 10 minutes


@_register(
    "b151_asof_tolerance_nearest",
    f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ep
      FROM events WHERE event_type = 'error'
    ), p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ep
      FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id,
           CAST(CASE
             WHEN b.pid IS NOT NULL AND (f.pid IS NULL
                  OR e.ep - b.pep <= f.pep - e.ep) THEN b.pid
             ELSE f.pid END AS BIGINT) AS matched_id,
           CAST(CASE
             WHEN b.pid IS NOT NULL AND (f.pid IS NULL
                  OR e.ep - b.pep <= f.pep - e.ep) THEN b.pep - e.ep
             ELSE f.pep - e.ep END AS BIGINT) AS dt_us,
           CASE
             WHEN b.pid IS NOT NULL AND (f.pid IS NULL
                  OR e.ep - b.pep <= f.pep - e.ep) THEN 'backward'
             WHEN f.pid IS NOT NULL THEN 'forward'
           END AS direction
    FROM e
    LEFT JOIN LATERAL (
      SELECT p.event_id AS pid, p.ep AS pep FROM p
      WHERE p.user_id = e.user_id AND p.ep <= e.ep
        AND e.ep - p.ep <= {_ASOF_TOL_US}
      ORDER BY p.ep DESC, p.event_id DESC LIMIT 1) b ON TRUE
    LEFT JOIN LATERAL (
      SELECT p.event_id AS pid, p.ep AS pep FROM p
      WHERE p.user_id = e.user_id AND p.ep > e.ep
        AND p.ep - e.ep <= {_ASOF_TOL_US}
      ORDER BY p.ep ASC, p.event_id ASC LIMIT 1) f ON TRUE
    ORDER BY e.event_id
    """,
    "As-of join with TOLERANCE and direction='nearest' (pandas "
    "merge_asof semantics b14's backward-only union trick does not "
    "cover): every error event matches its nearest same-user "
    "purchase within +/-10 min, preferring backward on |dt| ties; "
    "tie-breaks inside a direction are (latest, max id) backward / "
    "(earliest, min id) forward; unmatched errors survive with NULLs "
    "(left semantics).  Implementation is the sort-merge shape that "
    "scales: ONE union of both event sets, ONE window per direction "
    "partitioned by user (conditional last-struct carry-forward over "
    "(ts, tag, id) order), ZERO point-lookup joins — the oracle's "
    "per-row LATERAL rescan is exactly the O(n*m) plan this operator "
    "exists to avoid at 100 TB.",
)
def b151_asof_tolerance_nearest(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    both = (ev.filter(F.col("event_type").isin("error", "purchase"))
            .select("user_id", "event_id",
                    F.unix_micros("ts").alias("ep"),
                    F.when(F.col("event_type") == "purchase", 0)
                    .otherwise(1).alias("tag")))
    w_b = (W.partitionBy("user_id")
           .orderBy("ep", "tag", "event_id")
           .rowsBetween(W.unboundedPreceding, 0))
    w_f = (W.partitionBy("user_id")
           .orderBy(F.desc("ep"), F.desc("tag"), F.desc("event_id"))
           .rowsBetween(W.unboundedPreceding, 0))
    pstruct = F.when(F.col("tag") == 0,
                     F.struct(F.col("ep").alias("pep"),
                              F.col("event_id").alias("pid")))
    cand = (both
            .withColumn("b", F.last(pstruct, ignorenulls=True).over(w_b))
            .withColumn("f", F.last(pstruct, ignorenulls=True).over(w_f))
            .filter(F.col("tag") == 1))
    b_ok = (F.col("b").isNotNull()
            & (F.col("ep") - F.col("b.pep") <= _ASOF_TOL_US))
    f_ok = (F.col("f").isNotNull()
            & (F.col("f.pep") - F.col("ep") <= _ASOF_TOL_US))
    pick_b = b_ok & (~f_ok | (F.col("ep") - F.col("b.pep")
                              <= F.col("f.pep") - F.col("ep")))
    return (cand.select(
        "event_id",
        F.when(pick_b, F.col("b.pid"))
        .when(f_ok, F.col("f.pid")).cast("long").alias("matched_id"),
        F.when(pick_b, F.col("b.pep") - F.col("ep"))
        .when(f_ok, F.col("f.pep") - F.col("ep")).cast("long")
        .alias("dt_us"),
        F.when(pick_b, F.lit("backward"))
        .when(f_ok, F.lit("forward")).alias("direction"))
        .orderBy("event_id"))


# ---------------------------------------------------------------------
# b152: interval union coverage (merge overlapping intervals)
# ---------------------------------------------------------------------


@_register(
    "b152_interval_union_coverage",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts)
               + CAST(floor("value" * 60) AS BIGINT) * 1000000 AS e_us
      FROM events WHERE event_type = 'view'
    ), flagged AS (
      SELECT user_id, event_id, s_us, e_us,
             CASE WHEN s_us > coalesce(max(e_us) OVER (
                    PARTITION BY user_id
                    ORDER BY s_us, e_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS is_new
      FROM iv
    ), islands AS (
      SELECT user_id, s_us, e_us,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us,
               event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    ), merged AS (
      SELECT user_id, island,
             max(e_us) - min(s_us) AS cov_us,
             count(*) AS n_iv
      FROM islands GROUP BY user_id, island
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(cov_us) // 1000000 AS BIGINT) AS covered_s
    FROM merged GROUP BY user_id
    ORDER BY covered_s DESC, user_id LIMIT 25
    """,
    "Interval-set UNION: per-user view intervals [ts, ts + value "
    "minutes) are merged wherever they overlap or touch "
    "(gaps-and-islands: a running max(end) window per user flags "
    "island starts, a cumulative sum numbers islands) and the total "
    "COVERED seconds + merged-island count are reported for the 25 "
    "most-covered users — the interval-union primitive b36 (overlap "
    "join) and b38 (SCD2 intervals) both stop short of.  Scale "
    "shape: both windows are partitioned by user_id (no global "
    "sort), the merge is two shuffles (user window, user+island "
    "agg) and the final top-25 compiles to TakeOrderedAndProject.  "
    "The island cumulative sum orders by (s_us, e_us, event_id) — "
    "deterministic even on full duplicate intervals, where is_new "
    "is 0 for every copy so the island id is tie-order-invariant.",
)
def b152_interval_union_coverage(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    iv = (ev.filter(F.col("event_type") == "view")
          .select("user_id", "event_id",
                  F.unix_micros("ts").alias("s_us"),
                  (F.unix_micros("ts")
                   + F.floor(F.col("value") * 60) * F.lit(1000000))
                  .alias("e_us")))
    w_prev = (W.partitionBy("user_id")
              .orderBy("s_us", "e_us", "event_id")
              .rowsBetween(W.unboundedPreceding, -1))
    w_cum = (W.partitionBy("user_id")
             .orderBy("s_us", "e_us", "event_id")
             .rowsBetween(W.unboundedPreceding, 0))
    flagged = iv.withColumn(
        "is_new",
        F.when(F.col("s_us")
               > F.coalesce(F.max("e_us").over(w_prev),
                            F.lit(-(2 ** 63))), 1).otherwise(0))
    islands = flagged.withColumn("island", F.sum("is_new").over(w_cum))
    merged = (islands.groupBy("user_id", "island")
              .agg((F.max("e_us") - F.min("s_us")).alias("cov_us"),
                   F.count("*").alias("n_iv")))
    return (merged.groupBy("user_id")
            .agg(F.sum("n_iv").cast("long").alias("n_intervals"),
                 F.count("*").cast("long").alias("n_islands"),
                 F.expr("sum(cov_us) div 1000000").cast("long")
                 .alias("covered_s"))
            .withColumn("user_id", F.col("user_id").cast("long"))
            .select("user_id", "n_intervals", "n_islands", "covered_s")
            .orderBy(F.desc("covered_s"), "user_id").limit(25))


# ---------------------------------------------------------------------
# c129: edit-distance verify on blocked candidate pairs
# ---------------------------------------------------------------------


@_register(
    "c129_edit_distance_verify",
    """
    WITH d AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS t
      FROM documents
    ), k AS (
      SELECT doc_id, t, substr(t, 1, 16) AS blk FROM d
      WHERE length(t) >= 16
    )
    SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
           CAST(b.doc_id AS BIGINT) AS doc_b,
           CAST(levenshtein(substr(a.t, 1, 160), substr(b.t, 1, 160))
                AS BIGINT) AS lev
    FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
    ORDER BY lev, doc_a, doc_b LIMIT 100
    """,
    "Edit-distance VERIFY for the dedup tier: candidate pairs are "
    "blocked on a shared 16-char ascii-normalized prefix (equi-join, "
    "never all-pairs) and scored with exact Levenshtein on the first "
    "160 normalized chars — the character-exact analog of c08's "
    "n-gram Jaccard verify.  Ascii normalization (strip every "
    "non-[a-z0-9 ] char) makes Spark's UTF-16 char semantics and "
    "DuckDB's byte semantics coincide.  Scale shape: the O(L^2) "
    "dynamic program runs ONLY on blocked candidates (25 pairs per "
    "10k docs here) on a 160-char cap, and the top-100 by (lev, ids) "
    "compiles to TakeOrderedAndProject.",
)
def c129_edit_distance_verify(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", "").alias("t"))
    k = (d.filter(F.length("t") >= 16)
         .withColumn("blk", F.substring("t", 1, 16)))
    a = k.select(F.col("doc_id").alias("doc_a"),
                 F.col("t").alias("ta"), "blk")
    b = k.select(F.col("doc_id").alias("doc_b"),
                 F.col("t").alias("tb"), "blk")
    return (a.join(b, "blk")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select(F.col("doc_a").cast("long"),
                    F.col("doc_b").cast("long"),
                    F.levenshtein(F.substring("ta", 1, 160),
                                  F.substring("tb", 1, 160))
                    .cast("long").alias("lev"))
            .orderBy("lev", "doc_a", "doc_b").limit(100))


# ---------------------------------------------------------------------
# c130: Jensen-Shannon divergence between language unigram models
# ---------------------------------------------------------------------

_LANGS = ("de", "en", "es", "fr", "zh")
_LANG_PAIRS = [(a, b) for i, a in enumerate(_LANGS)
               for b in _LANGS[i + 1:]]


def _jsd_oracle() -> str:
    cnt_cases_a = " ".join(
        f"WHEN pr.lang_a = '{lng}' THEN cnt_{lng}" for lng in _LANGS)
    cnt_cases_b = " ".join(
        f"WHEN pr.lang_b = '{lng}' THEN cnt_{lng}" for lng in _LANGS)
    tot_cases_a = " ".join(
        f"WHEN pr.lang_a = '{lng}' THEN n_{lng}" for lng in _LANGS)
    tot_cases_b = " ".join(
        f"WHEN pr.lang_b = '{lng}' THEN n_{lng}" for lng in _LANGS)
    cnt_cols = ", ".join(
        f"sum(CASE WHEN lang = '{lng}' THEN 1 ELSE 0 END) AS cnt_{lng}"
        for lng in _LANGS)
    tot_cols = ", ".join(f"sum(cnt_{lng}) AS n_{lng}" for lng in _LANGS)
    pair_rows = ", ".join(f"('{a}', '{b}')" for a, b in _LANG_PAIRS)
    return f"""
    WITH tok AS (
      SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
             AS tk
      FROM documents
    ), counts AS (
      SELECT tk, {cnt_cols}
      FROM tok WHERE length(tk) >= 2 GROUP BY tk
    ), totals AS (
      SELECT {tot_cols}, count(*) AS v FROM counts
    ), pairs(lang_a, lang_b) AS (VALUES {pair_rows}),
    contrib AS (
      SELECT pr.lang_a, pr.lang_b,
             (CASE {cnt_cases_a} END + 1)
               / CAST(CASE {tot_cases_a} END + t.v AS DOUBLE) AS p,
             (CASE {cnt_cases_b} END + 1)
               / CAST(CASE {tot_cases_b} END + t.v AS DOUBLE) AS q,
             CASE {tot_cases_a} END AS n_a,
             CASE {tot_cases_b} END AS n_b,
             t.v AS v
      FROM counts CROSS JOIN totals t CROSS JOIN pairs pr
    )
    SELECT lang_a, lang_b,
           CAST(sum(CAST(round((0.5 * p * ln(2.0 * p / (p + q))
                    + 0.5 * q * ln(2.0 * q / (p + q))) * 1000000000.0)
               AS BIGINT)) AS BIGINT) AS jsd_nanonats,
           CAST(min(n_a) AS BIGINT) AS n_tok_a,
           CAST(min(n_b) AS BIGINT) AS n_tok_b,
           CAST(min(v) AS BIGINT) AS vocab
    FROM contrib GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b
    """


@_register(
    "c130_jsd_lang_divergence",
    _jsd_oracle(),
    "Jensen-Shannon divergence between every pair of per-language "
    "unigram distributions (add-one smoothing over the union "
    "vocabulary) — the log-based distribution distance data-mixture "
    "papers report, upgrading c73's total-variation screen.  "
    "Value-hash discipline: token counts and totals are exact "
    "integers; p and q are single IEEE divisions of exact ints "
    "(correctly rounded, bit-identical both engines); each token's "
    "JSD contribution is ONE per-row float expression rounded to "
    "integer nanonats BEFORE the cross-row sum, so the sum is "
    "integer and order-independent.  Scale shape: one explode + "
    "groupBy(token) conditional agg over the corpus (the same "
    "5-column pivot c103 uses), a broadcast 1-row totals join, and "
    "a 10-way constant pair explode on vocab rows — the fact "
    "shuffles once, |pairs| is fixed at langs-choose-2.",
)
def c130_jsd_lang_divergence(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tk"))
    # Vocab-sized table consumed by BOTH the totals aggregate and the
    # pair explode: materialize once so the corpus explode+groupBy
    # isn't recomputed per consumer (c124's localCheckpoint trick).
    counts = (tok.filter(F.length("tk") >= 2)
              .groupBy("tk")
              .agg(*[F.sum(F.when(F.col("lang") == lng, 1).otherwise(0))
                     .alias(f"cnt_{lng}") for lng in _LANGS])
              .localCheckpoint(eager=False))
    totals = counts.agg(
        *[F.sum(f"cnt_{lng}").alias(f"n_{lng}") for lng in _LANGS],
        F.count("*").alias("v"))
    pair_structs = F.array(*[
        F.struct(F.lit(a).alias("lang_a"), F.lit(b).alias("lang_b"),
                 F.col(f"cnt_{a}").alias("cnt_a"),
                 F.col(f"cnt_{b}").alias("cnt_b"),
                 F.col(f"n_{a}").alias("n_a"),
                 F.col(f"n_{b}").alias("n_b"))
        for a, b in _LANG_PAIRS])
    exploded = (counts.crossJoin(F.broadcast(totals))
                .select(F.explode(pair_structs).alias("pr"), "v")
                .select("pr.lang_a", "pr.lang_b", "pr.cnt_a", "pr.cnt_b",
                        "pr.n_a", "pr.n_b", "v"))
    p = (F.col("cnt_a") + 1) / (F.col("n_a") + F.col("v")).cast("double")
    q = (F.col("cnt_b") + 1) / (F.col("n_b") + F.col("v")).cast("double")
    contrib = F.round((0.5 * p * F.log(2.0 * p / (p + q))
                       + 0.5 * q * F.log(2.0 * q / (p + q)))
                      * 1000000000.0).cast("long")
    return (exploded
            .select("lang_a", "lang_b", contrib.alias("c"),
                    "n_a", "n_b", "v")
            .groupBy("lang_a", "lang_b")
            .agg(F.sum("c").cast("long").alias("jsd_nanonats"),
                 F.min("n_a").cast("long").alias("n_tok_a"),
                 F.min("n_b").cast("long").alias("n_tok_b"),
                 F.min("v").cast("long").alias("vocab"))
            .orderBy("lang_a", "lang_b"))


# ---------------------------------------------------------------------
# c131: cluster purity + mutual information vs gold labels
# ---------------------------------------------------------------------


@_register(
    "c131_cluster_purity_mi",
    """
    WITH assigned AS (
      SELECT CAST(4 * CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
             + 2 * CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END
             + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS cluster,
             label
      FROM embeddings
    ), cells AS (
      SELECT cluster, label, count(*) AS n_cl
      FROM assigned GROUP BY cluster, label
    ), tot AS (
      SELECT sum(n_cl) AS n FROM cells
    ), marg AS (
      SELECT cluster, label, n_cl,
             sum(n_cl) OVER (PARTITION BY cluster) AS n_c,
             sum(n_cl) OVER (PARTITION BY label) AS n_l,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_cl DESC, label) AS rk
      FROM cells
    ), scored AS (
      SELECT m.cluster, m.label, m.n_cl, m.n_c, m.rk,
             CAST(round((CAST(m.n_cl AS DOUBLE) / CAST(t.n AS DOUBLE))
                  * ln((CAST(t.n AS DOUBLE) * CAST(m.n_cl AS DOUBLE))
                       / (CAST(m.n_c AS DOUBLE)
                          * CAST(m.n_l AS DOUBLE)))
                  * 1000000000.0) AS BIGINT) AS mi9
      FROM marg m CROSS JOIN tot t
    )
    SELECT cluster,
           CAST(min(n_c) AS BIGINT) AS n,
           CAST(min(CASE WHEN rk = 1 THEN label END) AS BIGINT)
             AS top_label,
           CAST(min(CASE WHEN rk = 1 THEN n_cl END) AS BIGINT)
             AS top_cnt,
           CAST(min(CASE WHEN rk = 1 THEN n_cl END) * 1000000
                // min(n_c) AS BIGINT) AS purity_ppm,
           CAST(sum(mi9) AS BIGINT) AS mi_nanonats
    FROM scored GROUP BY cluster ORDER BY cluster
    """,
    "Clustering-quality eval over the embeddings table: vectors are "
    "bucketed by the sign pattern of their first three coordinates "
    "(a deterministic axis-SRP clustering, the exact float "
    "comparison agreeing bit-for-bit across engines) and scored "
    "against gold labels with per-cluster PURITY (majority-label "
    "share, integer ppm, ties to the smallest label) and the "
    "cluster's MUTUAL-INFORMATION contribution sum_cells (n_cl/N) "
    "ln(N n_cl / (n_c n_l)) — each cell's term is ONE per-row float "
    "expression over exact-integer marginals rounded to nanonats "
    "before summing.  Complements c127 (kNN label consistency) and "
    "c91 (ANN recall) on the embedding-QA tier.  Scale shape: one "
    "groupBy(cluster,label) contingency shuffle over the corpus; "
    "marginals, argmax and MI all run on the |clusters|x|labels| "
    "contingency table (~80 rows at any corpus size).",
)
def c131_cluster_purity_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    sign = (4 * F.when(F.element_at("embedding", 1) > 0, 1).otherwise(0)
            + 2 * F.when(F.element_at("embedding", 2) > 0, 1).otherwise(0)
            + F.when(F.element_at("embedding", 3) > 0, 1).otherwise(0))
    # |clusters|x|labels| contingency (~80 rows): materialize once so
    # the N total and the main branch don't each rescan the corpus.
    cells = (emb.select(sign.cast("long").alias("cluster"), "label")
             .groupBy("cluster", "label").agg(F.count("*").alias("n_cl"))
             .localCheckpoint(eager=False))
    tot = cells.agg(F.sum("n_cl").alias("n"))
    w_c = W.partitionBy("cluster")
    w_l = W.partitionBy("label")
    w_rk = W.partitionBy("cluster").orderBy(F.desc("n_cl"), "label")
    marg = (cells
            .withColumn("n_c", F.sum("n_cl").over(w_c))
            .withColumn("n_l", F.sum("n_cl").over(w_l))
            .withColumn("rk", F.row_number().over(w_rk)))
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    scored = (marg.crossJoin(F.broadcast(tot))
              .withColumn(
                  "mi9",
                  F.round((nd("n_cl") / nd("n"))
                          * F.log((nd("n") * nd("n_cl"))
                                  / (nd("n_c") * nd("n_l")))
                          * 1000000000.0).cast("long")))
    return (scored.groupBy("cluster")
            .agg(F.min("n_c").cast("long").alias("n"),
                 F.min(F.when(F.col("rk") == 1, F.col("label")))
                 .cast("long").alias("top_label"),
                 F.min(F.when(F.col("rk") == 1, F.col("n_cl")))
                 .cast("long").alias("top_cnt"),
                 F.expr("min(CASE WHEN rk = 1 THEN n_cl END) * 1000000 "
                        "div min(n_c)").cast("long").alias("purity_ppm"),
                 F.sum("mi9").cast("long").alias("mi_nanonats"))
            .orderBy("cluster"))


# ---------------------------------------------------------------------
# b153: portable HyperLogLog — register-level, fully value-oracled
# ---------------------------------------------------------------------

_HLL_M = 64          # registers (b = 6 bucket bits)
_HLL_RANK_BITS = 42  # 48-bit portable hash minus 6 bucket bits
_HLL_ALPHA = 0.709   # alpha_64 (Flajolet et al. 2007, m = 64)


@_register(
    "b153_hll_portable_sketch",
    f"""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)),
                  1, 12) AS BIGINT) AS hv
      FROM events
    ), ranked AS (
      SELECT day,
             hv // {2 ** _HLL_RANK_BITS} AS bucket,
             {_HLL_RANK_BITS + 1}
               - CASE WHEN hv % {2 ** _HLL_RANK_BITS} = 0 THEN 1
                      ELSE length(bin(hv % {2 ** _HLL_RANK_BITS})) END
               AS m
      FROM h
    ), partials AS (
      SELECT day, bucket, max(m) AS r FROM ranked GROUP BY day, bucket
    ), regs AS (
      SELECT bucket, max(r) AS rr FROM partials GROUP BY bucket
    ), summary AS (
      SELECT count(*) AS n_present,
             sum(CAST(1 AS BIGINT) << ({_HLL_RANK_BITS} - rr))
               AS s_present,
             (SELECT count(DISTINCT day) FROM partials) AS n_partials
      FROM regs
    ), exact AS (
      SELECT count(DISTINCT user_id) AS n_exact FROM events
    ), rawed AS (
      SELECT n_partials, n_present, n_exact,
             CAST({_HLL_ALPHA * _HLL_M * _HLL_M
                   * (2.0 ** _HLL_RANK_BITS)!r} AS DOUBLE)
               / (CAST(s_present AS DOUBLE)
                  + ({_HLL_M} - n_present)
                    * CAST({2 ** _HLL_RANK_BITS} AS DOUBLE)) AS raw
      FROM summary CROSS JOIN exact
    ), est AS (
      SELECT n_partials, n_present, n_exact,
             CAST(round(CASE
               WHEN raw <= {2.5 * _HLL_M!r} AND n_present < {_HLL_M}
               THEN CAST({_HLL_M} AS DOUBLE)
                    * ln(CAST({_HLL_M} AS DOUBLE)
                         / ({_HLL_M} - n_present))
               ELSE raw
             END) AS BIGINT) AS est
      FROM rawed
    )
    SELECT CAST(n_partials AS BIGINT) AS n_partials,
           CAST(n_present AS BIGINT) AS n_registers,
           CAST(est AS BIGINT) AS distinct_est,
           CAST(n_exact AS BIGINT) AS distinct_exact,
           CAST(abs(est - n_exact) * 1000000 // n_exact AS BIGINT)
             AS err_ppm
    FROM est
    """,
    "Portable HyperLogLog, register-level and fully VALUE-ORACLED — "
    "flips the 'HLL is irreducibly rows-only' posture of b41 (which "
    "wraps Spark's native datasketches binary): with the md5-48 "
    "portable hash, bucket = top 6 bits, rank = leading zeros of the "
    "low 42 bits (exact via length(bin(x)) — identical minimal-width "
    "semantics both engines), every register value reproduces in "
    "DuckDB.  The query builds PER-DAY register partials (the "
    "mergeable shard state), max-merges them into the corpus sketch, "
    "applies alpha_64 bias correction with the standard small-range "
    "linear-counting switch, and audits the estimate against the "
    "exact distinct count in err_ppm.  All register sums are exact "
    "integers (sum of 2^(42-r) <= 64*2^42 < 2^54); the only float "
    "math is ONE final-row expression.  Scale shape: rows shuffle "
    "once into (day, bucket) partials (|days| x 64 rows); the merge "
    "and estimate run on <= 64 rows — at 100 TB the partials ARE the "
    "incremental state b41 documents, and a new day's data touches "
    "only its own 64-row partial.  The exact-count branch exists "
    "only for the audit; production reads the sketch alone.",
)
def b153_hll_portable_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.kmv import portable_hash48
    ev = _t(spark, sf_dir, "events")
    two_r = 2 ** _HLL_RANK_BITS
    hv = portable_hash48(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")))
    ranked = (ev
              .select(F.col("ts").cast("date").alias("day"),
                      hv.alias("hv"))
              .select("day",
                      F.expr(f"hv div {two_r}").alias("bucket"),
                      (F.lit(_HLL_RANK_BITS + 1)
                       - F.when(F.expr(f"hv % {two_r}") == 0, 1)
                       .otherwise(F.length(F.bin(F.expr(f"hv % {two_r}")))))
                      .alias("m")))
    partials = (ranked.groupBy("day", "bucket")
                .agg(F.max("m").alias("r")))
    # |days| x 64 rows: materialize once — the register merge and the
    # n_partials count both consume it.
    partials = partials.localCheckpoint(eager=False)
    regs = partials.groupBy("bucket").agg(F.max("r").alias("rr"))
    summary = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, cast({_HLL_RANK_BITS} - rr "
                     "as int))")).alias("s_present"))
    n_partials = partials.agg(
        F.countDistinct("day").alias("n_partials"))
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    raw = (F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * (2.0 ** _HLL_RANK_BITS))
           / (F.col("s_present").cast("double")
              + (F.lit(_HLL_M) - F.col("n_present"))
              * F.lit(2.0 ** _HLL_RANK_BITS)))
    est = F.round(
        F.when((raw <= 2.5 * _HLL_M) & (F.col("n_present") < _HLL_M),
               F.lit(float(_HLL_M))
               * F.log(F.lit(float(_HLL_M))
                       / (F.lit(_HLL_M) - F.col("n_present"))
                       .cast("double")))
        .otherwise(raw)).cast("long")
    return (summary.crossJoin(F.broadcast(n_partials))
            .crossJoin(F.broadcast(exact))
            .select(F.col("n_partials").cast("long"),
                    F.col("n_present").cast("long").alias("n_registers"),
                    est.alias("distinct_est"),
                    F.col("n_exact").cast("long").alias("distinct_exact"))
            .withColumn(
                "err_ppm",
                F.expr("abs(distinct_est - distinct_exact) * 1000000 "
                       "div distinct_exact").cast("long")))


# ---------------------------------------------------------------------
# b154: sliding-window distinct via portable HLL register merge
# ---------------------------------------------------------------------


@_register(
    "b154_sliding_hll_distinct",
    f"""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)),
                  1, 12) AS BIGINT) AS hv,
             user_id
      FROM events
    ), ranked AS (
      SELECT day, user_id,
             hv // {2 ** _HLL_RANK_BITS} AS bucket,
             {_HLL_RANK_BITS + 1}
               - CASE WHEN hv % {2 ** _HLL_RANK_BITS} = 0 THEN 1
                      ELSE length(bin(hv % {2 ** _HLL_RANK_BITS})) END
               AS m
      FROM h
    ), partials AS (
      SELECT day, bucket, max(m) AS r FROM ranked GROUP BY day, bucket
    ), spine AS (
      SELECT DISTINCT day FROM partials
    ), win AS (
      SELECT d.day, p.bucket, max(p.r) AS rr
      FROM spine d JOIN partials p
        ON p.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day, p.bucket
    ), summary AS (
      SELECT day, count(*) AS n_present,
             sum(CAST(1 AS BIGINT) << ({_HLL_RANK_BITS} - rr))
               AS s_present
      FROM win GROUP BY day
    ), exact AS (
      SELECT d.day, count(DISTINCT r.user_id) AS n_exact
      FROM spine d JOIN ranked r
        ON r.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
    ), rawed AS (
      SELECT s.day, s.n_present, e.n_exact,
             CAST({_HLL_ALPHA * _HLL_M * _HLL_M
                   * (2.0 ** _HLL_RANK_BITS)!r} AS DOUBLE)
               / (CAST(s.s_present AS DOUBLE)
                  + ({_HLL_M} - s.n_present)
                    * CAST({2 ** _HLL_RANK_BITS} AS DOUBLE)) AS raw
      FROM summary s JOIN exact e ON e.day = s.day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(n_present AS BIGINT) AS n_registers,
           CAST(round(CASE
             WHEN raw <= {2.5 * _HLL_M!r} AND n_present < {_HLL_M}
             THEN CAST({_HLL_M} AS DOUBLE)
                  * ln(CAST({_HLL_M} AS DOUBLE)
                       / ({_HLL_M} - n_present))
             ELSE raw
           END) AS BIGINT) AS distinct_est,
           CAST(n_exact AS BIGINT) AS distinct_exact
    FROM rawed ORDER BY day
    """,
    "Trailing-7-day distinct users per day from MERGED portable-HLL "
    "register partials — the value-oracled flip of b49's native-"
    "sketch sliding distinct (same b153 register construction: "
    "md5-48 hash, 64 registers, alpha_64 + linear-counting switch).  "
    "Rows reduce ONCE to |days| x 64 per-day register partials; every "
    "day's trailing window is a max-merge of <= 7 x 64 partial rows "
    "against the |days| spine — no rescan of raw rows per window, "
    "which is the entire point of mergeable sketch state at 100 TB "
    "(the exact-count branch exists only for the per-day err audit "
    "and IS the O(7x) rescan the sketch path replaces).  All "
    "register sums are exact integers; the only float math is one "
    "final per-day expression.",
)
def b154_sliding_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.kmv import portable_hash48
    ev = _t(spark, sf_dir, "events")
    two_r = 2 ** _HLL_RANK_BITS
    hv = portable_hash48(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")))
    ranked = (ev
              .select(F.col("ts").cast("date").alias("day"),
                      F.col("user_id"), hv.alias("hv"))
              .select("day", "user_id",
                      F.expr(f"hv div {two_r}").alias("bucket"),
                      (F.lit(_HLL_RANK_BITS + 1)
                       - F.when(F.expr(f"hv % {two_r}") == 0, 1)
                       .otherwise(F.length(F.bin(F.expr(f"hv % {two_r}")))))
                      .alias("m")))
    partials = (ranked.groupBy("day", "bucket")
                .agg(F.max("m").alias("r"))
                .localCheckpoint(eager=False))  # |days| x 64; spine + window reuse it
    spine = partials.select("day").distinct()
    win = (F.broadcast(spine.select(F.col("day").alias("wday")))
           .join(partials,
                 (F.col("day") >= F.date_sub(F.col("wday"), 6))
                 & (F.col("day") <= F.col("wday")))
           .groupBy("wday", "bucket").agg(F.max("r").alias("rr")))
    summary = (win.groupBy("wday")
               .agg(F.count("*").alias("n_present"),
                    F.sum(F.expr(f"shiftleft(1L, cast({_HLL_RANK_BITS} "
                                 "- rr as int))")).alias("s_present")))
    exact = (F.broadcast(spine.select(F.col("day").alias("wday")))
             .join(ranked.select("day", "user_id"),
                   (F.col("day") >= F.date_sub(F.col("wday"), 6))
                   & (F.col("day") <= F.col("wday")))
             .groupBy("wday")
             .agg(F.countDistinct("user_id").alias("n_exact")))
    raw = (F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * (2.0 ** _HLL_RANK_BITS))
           / (F.col("s_present").cast("double")
              + (F.lit(_HLL_M) - F.col("n_present"))
              * F.lit(2.0 ** _HLL_RANK_BITS)))
    est = F.round(
        F.when((raw <= 2.5 * _HLL_M) & (F.col("n_present") < _HLL_M),
               F.lit(float(_HLL_M))
               * F.log(F.lit(float(_HLL_M))
                       / (F.lit(_HLL_M) - F.col("n_present"))
                       .cast("double")))
        .otherwise(raw)).cast("long")
    return (summary.join(exact, "wday")
            .select(F.col("wday").cast("string").alias("day"),
                    F.col("n_present").cast("long").alias("n_registers"),
                    est.alias("distinct_est"),
                    F.col("n_exact").cast("long").alias("distinct_exact"))
            .orderBy("day"))
