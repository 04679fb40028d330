"""Round-19 registry additions (built in the r11 session).

Seven operators a 100 TB curation/analytics deployment runs that the
registry did not yet cover, each exact-integer oracle-checked:

- b184: WATERMARK-DELAY selection audit — replays Spark Structured
  Streaming's batch-boundary watermark semantics over the event log
  (arrival order = ingest id, watermark = running max event time of
  completed batches minus delay) and prices a candidate delay grid
  by late-drop fraction.  The b182 posture (measure the parameter's
  cost curve before committing the pipeline) applied to the one
  streaming parameter every `withWatermark` deployment hard-codes.

- b185: one-pass COLUMN PROFILE — per-column row/null/distinct
  counts and min/max over the fact table in a single scan, unpivoted
  to the long (column, metric) form every lakehouse catalog ships.
  The stats-collection pass that feeds CBO estimates (b163) and
  zone-map audits (b162).

- b186: HLL HIERARCHY ROLLUP — per-nation portable-HLL registers
  built ONCE from the fact, then max-merged up the
  nation -> region -> global hierarchy without rescanning rows: the
  re-aggregatable-sketch property that makes distinct-count cubes
  affordable at 100 TB (b153 proved the register construction; b154
  merged across time; this merges across a dimension hierarchy,
  with the exact rollup as the per-level audit).

- c150: DEDUP-THRESHOLD sensitivity curve — for a grid of Jaccard
  thresholds, the exact number of duplicate pairs, docs removed
  (keep-lowest-doc_id rule) and tokens removed.  Prices the one
  number every near-dup pipeline hard-codes (c06's 0.7) from the
  observed pair-similarity distribution: collision-driven exact
  Jaccard (c08's shape) -> per-pair max threshold band -> suffix
  cumsum over the |grid| table.

- c151: CONTEXT-WINDOW PACKING audit — the GPT-style
  concatenate-and-split packing (docs in doc_id order, split every
  W tokens) priced for a grid of window sizes: windows produced,
  docs straddling a boundary, mean fragments per doc.  The
  pre-training batching decision (bigger W = fewer boundary-broken
  docs but longer attention rows), computed from one distributed
  prefix sum (b107's two-pass block-offset form — no global sort).

- c152: STRATIFIED SPLIT BALANCE audit — deterministic hash-based
  train/val/test assignment (portable md5-48, the engine's seedless
  split that any system can reproduce), then per-language split
  shares vs the global 80/10/10 in exact ppm with the max absolute
  deviation.  The "did the split preserve the mixture" gate run
  before any training job trusts a split column.

- c153: VOCABULARY COVERAGE curve — token mass covered by the top-k
  most frequent words for a doubling k grid: the tokenizer
  vocab-budget decision (complements c146 Heaps growth and c149
  Good-Turing unseen mass — this one says what a FIXED budget buys).

Reference contract: none of this exists in the reference (its
analytic surface is the KPI list, README.md:116-129); the tier
re-expresses public streaming/lakehouse/curation designs as
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
# b184: watermark-delay selection audit (streaming lateness pricing)
# ---------------------------------------------------------------------

# Arrival micro-batches: event_id ranges of _WM_BATCH events (ingest
# id IS the arrival order; a real deployment reads batch ids off the
# checkpoint log).  Candidate watermark delays in seconds; an event
# is late-dropped under delay D iff its event time is more than D
# behind the watermark high-mark of the PREVIOUS completed batch
# (Spark advances the watermark at batch boundaries, so in-batch
# disorder never drops).
_WM_BATCH = 4096
_WM_DELAYS_S = [0, 1, 10, 60, 600, 3600]
_WM_GRID = [(i, _WM_DELAYS_S[i] * 1_000_000,
             (_WM_DELAYS_S[i + 1] * 1_000_000
              if i + 1 < len(_WM_DELAYS_S) else 10 ** 18))
            for i in range(len(_WM_DELAYS_S))]
_WM_GRID_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _WM_GRID)


@_register(
    "b184_watermark_delay_audit",
    f"""
    WITH g(band, lo_us, hi_us) AS (VALUES {_WM_GRID_SQL}),
    e AS (SELECT event_id // {_WM_BATCH} AS batch,
                 epoch_us(ts) AS ts_us
          FROM events),
    bm AS (SELECT batch, max(ts_us) AS mx FROM e GROUP BY batch),
    wm AS (SELECT batch,
                  max(mx) OVER (ORDER BY batch
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm_us
           FROM bm),
    lat AS (SELECT wm_us - ts_us AS lateness_us
            FROM e JOIN wm USING (batch)
            WHERE wm_us IS NOT NULL AND wm_us > ts_us),
    bc AS (SELECT band, count(*) AS c
           FROM lat JOIN g ON lateness_us > lo_us
                          AND lateness_us <= hi_us
           GROUP BY band),
    s AS (SELECT g.band, g.lo_us,
                 sum(coalesce(bc.c, 0)) OVER
                   (ORDER BY g.band DESC ROWS UNBOUNDED PRECEDING)
                   AS n_late
          FROM g LEFT JOIN bc USING (band)),
    n AS (SELECT count(*) AS n_events FROM events)
    SELECT CAST(lo_us // 1000000 AS BIGINT) AS delay_s,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_late AS BIGINT) AS n_late,
           CAST(n_late * 1000000 // n_events AS BIGINT) AS late_ppm
    FROM s CROSS JOIN n ORDER BY delay_s
    """,
    "WATERMARK-DELAY selection audit: replays Structured Streaming's "
    "batch-boundary watermark over the event log (arrival order = "
    "ingest id sliced into fixed micro-batches; watermark entering "
    "batch k = max event time over batches < k, the same "
    "advance-at-batch-end rule `withWatermark` implements) and "
    "prices a candidate delay grid by exact late-drop counts: an "
    "event is dropped under delay D iff lateness = wm - ts > D.  "
    "The b182 posture (measure the parameter's cost curve, then "
    "choose) for the one streaming parameter every deployment "
    "hard-codes; the knee of late_ppm(D) is the natural delay, and "
    "a flat curve means state-retention cost buys nothing.  Scale "
    "shape: ONE pass buckets events into |batches| rows, the "
    "running-max window runs on that tiny table (broadcast back), "
    "each late event lands in exactly ONE half-open lateness band "
    "of a literal grid, and the per-delay suffix cumsum runs on "
    "|grid| rows (SP-ordering reviewed) — the grid never multiplies "
    "the fact.",
)
def b184_watermark_delay_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(F.expr(f"event_id div {_WM_BATCH}").alias("batch"),
                  F.unix_micros("ts").alias("ts_us"))
    bm = e.groupBy("batch").agg(F.max("ts_us").alias("mx"))
    wm = bm.select(
        "batch",
        F.max("mx").over(W.orderBy("batch")
                         .rowsBetween(W.unboundedPreceding, -1))
        .alias("wm_us"))
    lat = (e.join(F.broadcast(wm), "batch")
           .filter(F.col("wm_us").isNotNull()
                   & (F.col("wm_us") > F.col("ts_us")))
           .select((F.col("wm_us") - F.col("ts_us"))
                   .alias("lateness_us")))
    grid = F.broadcast(spark.createDataFrame(
        _WM_GRID, "band int, lo_us long, hi_us long"))
    bc = (lat.join(grid, (lat.lateness_us > grid.lo_us)
                   & (lat.lateness_us <= grid.hi_us))
          .groupBy("band").agg(F.count("*").alias("c")))
    sw = W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, 0)
    s = (grid.join(F.broadcast(bc), "band", "left")
         .select("band", "lo_us",
                 F.sum(F.coalesce("c", F.lit(0))).over(sw)
                 .alias("n_late")))
    n = ev.agg(F.count("*").alias("n_events"))
    return (s.crossJoin(F.broadcast(n))
            .select(F.expr("lo_us div 1000000").cast("long")
                    .alias("delay_s"),
                    F.col("n_events").cast("long").alias("n_events"),
                    F.col("n_late").cast("long").alias("n_late"),
                    F.expr("n_late * 1000000 div n_events")
                    .cast("long").alias("late_ppm"))
            .orderBy("delay_s"))


# ---------------------------------------------------------------------
# b185: one-pass column profile (catalog stats collection)
# ---------------------------------------------------------------------


@_register(
    "b185_column_profile",
    """
    WITH l AS (
      SELECT l_orderkey,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
             l_returnflag, l_linestatus,
             CAST(l_shipdate AS DATE) AS sd
      FROM lineitem
    ), p AS (
      SELECT count(*) AS n,
             count(l_orderkey) AS nn_ok, count(DISTINCT l_orderkey)
               AS nd_ok, min(l_orderkey) AS mn_ok,
               max(l_orderkey) AS mx_ok,
             count(qty) AS nn_q, count(DISTINCT qty) AS nd_q,
               min(qty) AS mn_q, max(qty) AS mx_q,
             count(price_c) AS nn_p, count(DISTINCT price_c) AS nd_p,
               min(price_c) AS mn_p, max(price_c) AS mx_p,
             count(l_returnflag) AS nn_rf,
               count(DISTINCT l_returnflag) AS nd_rf,
               min(l_returnflag) AS mn_rf, max(l_returnflag) AS mx_rf,
             count(l_linestatus) AS nn_ls,
               count(DISTINCT l_linestatus) AS nd_ls,
               min(l_linestatus) AS mn_ls, max(l_linestatus) AS mx_ls,
             count(sd) AS nn_sd, count(DISTINCT sd) AS nd_sd,
               min(sd) AS mn_sd, max(sd) AS mx_sd
      FROM l
    )
    SELECT col, CAST(n AS BIGINT) AS n_rows,
           CAST(n - nn AS BIGINT) AS n_null,
           CAST(nd AS BIGINT) AS n_distinct, mn AS min_v, mx AS max_v
    FROM (
      SELECT 'l_orderkey' AS col, n, nn_ok AS nn, nd_ok AS nd,
             CAST(mn_ok AS VARCHAR) AS mn, CAST(mx_ok AS VARCHAR) AS mx
        FROM p
      UNION ALL
      SELECT 'l_quantity', n, nn_q, nd_q,
             CAST(mn_q AS VARCHAR), CAST(mx_q AS VARCHAR) FROM p
      UNION ALL
      SELECT 'l_price_cents', n, nn_p, nd_p,
             CAST(mn_p AS VARCHAR), CAST(mx_p AS VARCHAR) FROM p
      UNION ALL
      SELECT 'l_returnflag', n, nn_rf, nd_rf, mn_rf, mx_rf FROM p
      UNION ALL
      SELECT 'l_linestatus', n, nn_ls, nd_ls, mn_ls, mx_ls FROM p
      UNION ALL
      SELECT 'l_shipdate', n, nn_sd, nd_sd,
             CAST(mn_sd AS VARCHAR), CAST(mx_sd AS VARCHAR) FROM p
    ) ORDER BY col
    """,
    "one-pass COLUMN PROFILE: per-column row/null/distinct counts "
    "and min/max over the fact table in a SINGLE scan, unpivoted to "
    "the long (column, metric) catalog form — the stats-collection "
    "pass that feeds CBO cardinality estimates (b163), zone-map "
    "audits (b162) and every ANALYZE TABLE a lakehouse runs.  Scale "
    "shape: one wide aggregate over one scan; the multi-column "
    "DISTINCT counts expand the input k-ways (Spark's Expand "
    "operator — the standard exact plan), and the unpivot runs on a "
    "1-row relation.  At 100 TB the exact NDVs swap for the b153 "
    "HLL registers (one pass, no Expand) — the AUDIT keeps the "
    "exact form so the oracle can value-check it; the plan shape "
    "(single scan, long-form output) is identical.",
)
def b185_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long")
        .alias("price_c"),
        "l_returnflag", "l_linestatus",
        F.col("l_shipdate").cast("date").alias("sd"))
    cols = [("l_orderkey", "l_orderkey"), ("l_quantity", "qty"),
            ("l_price_cents", "price_c"), ("l_returnflag",
                                           "l_returnflag"),
            ("l_linestatus", "l_linestatus"), ("l_shipdate", "sd")]
    aggs = [F.count("*").alias("n")]
    for label, c in cols:
        aggs += [F.count(c).alias(f"nn_{label}"),
                 F.countDistinct(c).alias(f"nd_{label}"),
                 F.min(c).cast("string").alias(f"mn_{label}"),
                 F.max(c).cast("string").alias(f"mx_{label}")]
    p = li.agg(*aggs)
    rows = [p.select(F.lit(label).alias("col"),
                     F.col("n").cast("long").alias("n_rows"),
                     (F.col("n") - F.col(f"nn_{label}")).cast("long")
                     .alias("n_null"),
                     F.col(f"nd_{label}").cast("long")
                     .alias("n_distinct"),
                     F.col(f"mn_{label}").alias("min_v"),
                     F.col(f"mx_{label}").alias("max_v"))
            for label, _ in cols]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("col")


# ---------------------------------------------------------------------
# b186: HLL hierarchy rollup (sketch re-aggregation up a dimension)
# ---------------------------------------------------------------------

_HR_RANK_BITS = 42   # b153 geometry: 48-bit hash minus 6 bucket bits
_HR_M = 64
_HR_ALPHA = 0.709


def _hr_est_sql(np: str, sp: str) -> str:
    """Shared estimator expression (ppm-free float->round, identical
    to b153/b154): alpha*m^2*2^rank_bits / (s + (m-n)*2^rank_bits),
    linear counting below 2.5m when registers are unsaturated."""
    raw = (f"CAST({_HR_ALPHA * _HR_M * _HR_M * (2.0 ** _HR_RANK_BITS)!r}"
           f" AS DOUBLE) / (CAST({sp} AS DOUBLE)"
           f" + ({_HR_M} - {np}) * CAST({2 ** _HR_RANK_BITS} AS DOUBLE))")
    return (f"CAST(round(CASE WHEN {raw} <= {2.5 * _HR_M!r}"
            f" AND {np} < {_HR_M}"
            f" THEN CAST({_HR_M} AS DOUBLE)"
            f" * ln(CAST({_HR_M} AS DOUBLE) / ({_HR_M} - {np}))"
            f" ELSE {raw} END) AS BIGINT)")


@_register(
    "b186_hll_hierarchy_rollup",
    f"""
    WITH f AS (
      SELECT n.n_name, r.r_name,
             CAST('0x' || substr(md5('u:' || CAST(o.o_custkey
                  AS VARCHAR)), 1, 12) AS BIGINT) AS hv,
             o.o_custkey
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ), ranked AS (
      SELECT n_name, r_name, o_custkey,
             hv // {2 ** _HR_RANK_BITS} AS bucket,
             {_HR_RANK_BITS + 1}
               - CASE WHEN hv % {2 ** _HR_RANK_BITS} = 0 THEN 1
                      ELSE length(bin(hv % {2 ** _HR_RANK_BITS})) END
               AS m
      FROM f
    ), partials AS (
      SELECT n_name, r_name, bucket, max(m) AS r
      FROM ranked GROUP BY n_name, r_name, bucket
    ), lv AS (
      SELECT 'nation' AS lvl, n_name AS name, bucket, max(r) AS rr
        FROM partials GROUP BY n_name, bucket
      UNION ALL
      SELECT 'region', r_name, bucket, max(r)
        FROM partials GROUP BY r_name, bucket
      UNION ALL
      SELECT 'global', '*', bucket, max(r) FROM partials
        GROUP BY bucket
    ), summ AS (
      SELECT lvl, name, count(*) AS np,
             sum(CAST(1 AS BIGINT) << ({_HR_RANK_BITS} - rr)) AS sp
      FROM lv GROUP BY lvl, name
    ), ex AS (
      SELECT 'nation' AS lvl, n_name AS name,
             count(DISTINCT o_custkey) AS n_exact
        FROM f GROUP BY n_name
      UNION ALL
      SELECT 'region', r_name, count(DISTINCT o_custkey)
        FROM f GROUP BY r_name
      UNION ALL
      SELECT 'global', '*', count(DISTINCT o_custkey) FROM f
    )
    SELECT s.lvl AS level, s.name,
           {_hr_est_sql('s.np', 's.sp')} AS distinct_est,
           CAST(e.n_exact AS BIGINT) AS distinct_exact,
           CAST(abs({_hr_est_sql('s.np', 's.sp')} - e.n_exact)
                * 1000000 // e.n_exact AS BIGINT) AS err_ppm
    FROM summ s JOIN ex e ON e.lvl = s.lvl AND e.name = s.name
    ORDER BY 1, 2
    """,
    "HLL HIERARCHY ROLLUP: per-(nation, bucket) portable-HLL "
    "register partials built ONCE from the orders fact, then "
    "max-merged up nation -> region -> global WITHOUT rescanning "
    "rows — the re-aggregatable-sketch property that makes "
    "distinct-count cubes affordable at 100 TB (a naive rollup "
    "recomputes count(DISTINCT) per level = one full shuffle per "
    "level; registers merge with a |nations| x 64-row aggregate).  "
    "b153 proved the register construction, b154 merged across "
    "time windows; this merges across a dimension hierarchy, with "
    "the exact per-level distinct as the audit column (the exact "
    "branch IS the cost the sketch path replaces).  Scale shape: "
    "one fact pass -> |nations| x 64 partial rows (lazily "
    "checkpointed; three level merges consume them), every merge "
    "runs on register-sized relations, dims broadcast.",
)
def b186_hll_hierarchy_rollup(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.kmv import (
        portable_hash48)
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    two_r = 2 ** _HR_RANK_BITS
    f = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .join(nation, cust.c_nationkey == nation.n_nationkey)
         .join(region, nation.n_regionkey == region.r_regionkey)
         .select("n_name", "r_name", "o_custkey",
                 portable_hash48(
                     F.concat(F.lit("u:"),
                              F.col("o_custkey").cast("string")))
                 .alias("hv"))
         # f feeds the register partials AND three different-key
         # exact countDistinct branches — four distinct subtrees, so
         # without a cut the orders x customer join replays four
         # times (AQE reuse only dedupes identical subtrees).  Lazy:
         # one join pass, |orders| x 4 narrow rows (r11 job diet).
         .localCheckpoint(eager=False))
    ranked = f.select(
        "n_name", "r_name", "o_custkey",
        F.expr(f"hv div {two_r}").alias("bucket"),
        (F.lit(_HR_RANK_BITS + 1)
         - F.when(F.expr(f"hv % {two_r}") == 0, 1)
         .otherwise(F.length(F.bin(F.expr(f"hv % {two_r}")))))
        .alias("m"))
    partials = (ranked.groupBy("n_name", "r_name", "bucket")
                .agg(F.max("m").alias("r"))
                .localCheckpoint(eager=False))
    lv = (partials.groupBy(F.lit("nation").alias("lvl"),
                           F.col("n_name").alias("name"), "bucket")
          .agg(F.max("r").alias("rr"))
          .unionAll(partials.groupBy(F.lit("region").alias("lvl"),
                                     F.col("r_name").alias("name"),
                                     "bucket")
                    .agg(F.max("r").alias("rr")))
          .unionAll(partials.groupBy(F.lit("global").alias("lvl"),
                                     F.lit("*").alias("name"),
                                     "bucket")
                    .agg(F.max("r").alias("rr"))))
    summ = (lv.groupBy("lvl", "name")
            .agg(F.count("*").alias("np"),
                 F.sum(F.expr(f"shiftleft(1L, cast({_HR_RANK_BITS}"
                              " - rr as int))")).alias("sp")))
    ex = (f.groupBy(F.lit("nation").alias("lvl"),
                    F.col("n_name").alias("name"))
          .agg(F.countDistinct("o_custkey").alias("n_exact"))
          .unionAll(f.groupBy(F.lit("region").alias("lvl"),
                              F.col("r_name").alias("name"))
                    .agg(F.countDistinct("o_custkey")
                         .alias("n_exact")))
          .unionAll(f.groupBy(F.lit("global").alias("lvl"),
                              F.lit("*").alias("name"))
                    .agg(F.countDistinct("o_custkey")
                         .alias("n_exact"))))
    est = F.expr(_hr_est_sql("np", "sp"))
    return (summ.join(ex, ["lvl", "name"])
            .select(F.col("lvl").alias("level"), "name",
                    est.alias("distinct_est"),
                    F.col("n_exact").cast("long")
                    .alias("distinct_exact"),
                    F.expr(f"abs({_hr_est_sql('np', 'sp')} - n_exact)"
                           " * 1000000 div n_exact").cast("long")
                    .alias("err_ppm"))
            .orderBy("level", "name"))


# ---------------------------------------------------------------------
# c150: dedup-threshold sensitivity curve (pricing the Jaccard knob)
# ---------------------------------------------------------------------

# Candidate Jaccard thresholds in ppm -> half-open bands [lo, hi);
# the last band's hi exceeds 1e6 so exact duplicates (J = 1.0) land
# in it.  A pair/doc in band b counts toward every threshold <= its
# similarity, so per-threshold totals are a suffix cumsum over the
# |grid| table (the b182 banding shape).
_DT_THRESH_PPM = [500_000, 600_000, 700_000, 800_000, 900_000]
_DT_BANDS = [(i, _DT_THRESH_PPM[i],
              (_DT_THRESH_PPM[i + 1] if i + 1 < len(_DT_THRESH_PPM)
               else 1_000_001))
             for i in range(len(_DT_THRESH_PPM))]
_DT_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _DT_BANDS)


def _dt_oracle() -> str:
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
        _duck_shingles)
    return f"""
    WITH g(band, lo, hi) AS (VALUES {_DT_BANDS_SQL}),
    t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_duck_shingles(3)}) AS sh FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                      count(*) AS n_common
               FROM sh a JOIN sh b
                 ON a.sh = b.sh AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id),
    p AS (SELECT d1, d2,
                 n_common * 1000000
                   // (x.n_sh + y.n_sh - n_common) AS jppm
          FROM common JOIN sizes x ON x.doc_id = d1
                      JOIN sizes y ON y.doc_id = d2
          WHERE n_common * 1000000
                  // (x.n_sh + y.n_sh - n_common) >= {_DT_THRESH_PPM[0]}),
    pb AS (SELECT band, count(*) AS c
           FROM p JOIN g ON jppm >= lo AND jppm < hi GROUP BY band),
    dmax AS (SELECT d2 AS doc_id, max(jppm) AS mj FROM p GROUP BY d2),
    dtok AS (SELECT doc_id, len(toks) AS n_toks FROM t),
    db AS (SELECT band, count(*) AS nd, sum(n_toks) AS nt
           FROM dmax JOIN g ON mj >= lo AND mj < hi
                     JOIN dtok USING (doc_id)
           GROUP BY band),
    tot AS (SELECT count(*) AS n_docs FROM dtok),
    s AS (SELECT g.band, g.lo,
                 sum(coalesce(pb.c, 0)) OVER
                   (ORDER BY g.band DESC ROWS UNBOUNDED PRECEDING)
                   AS n_pairs,
                 sum(coalesce(db.nd, 0)) OVER
                   (ORDER BY g.band DESC ROWS UNBOUNDED PRECEDING)
                   AS n_removed,
                 sum(coalesce(db.nt, 0)) OVER
                   (ORDER BY g.band DESC ROWS UNBOUNDED PRECEDING)
                   AS toks_removed
          FROM g LEFT JOIN pb USING (band) LEFT JOIN db USING (band))
    SELECT CAST(lo AS BIGINT) AS thr_ppm,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_removed AS BIGINT) AS n_docs_removed,
           CAST(toks_removed AS BIGINT) AS n_tokens_removed,
           CAST(n_removed * 1000000 // n_docs AS BIGINT)
             AS removed_doc_ppm
    FROM s CROSS JOIN tot ORDER BY thr_ppm
    """


@_register(
    "c150_dedup_threshold_curve",
    _dt_oracle(),
    "DEDUP-THRESHOLD sensitivity curve: for a grid of Jaccard "
    "thresholds, the EXACT duplicate-pair count, docs removed under "
    "the keep-lowest-doc_id rule, and tokens removed — pricing the "
    "one number every near-dup pipeline hard-codes (c06's 0.7) from "
    "the observed pair-similarity distribution instead of folklore "
    "(the c141/b182 measure-then-choose posture applied to the dedup "
    "knob itself).  Scale shape: pairs come from the exact "
    "PREFIX-FILTERED join (c29b's All-Pairs shape — candidates touch "
    "only each doc's globally-rarest shingles, no hot-shingle "
    "blowup) at the LOWEST grid threshold; each pair lands in one "
    "similarity band, each removed doc in one max-similarity band, "
    "and every per-threshold total is a suffix cumsum over the "
    "|grid| table — the fact is scanned once, the curve costs "
    "|grid| rows.  The oracle replays the same pair set via the "
    "brute-force inverted-index spec (c08), so the curve is "
    "value-checked bit-for-bit; similarity is exact integer ppm.",
)
def c150_dedup_threshold_curve(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs)
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    pairs = prefix_filtered_jaccard_pairs(
        docs, "doc_id", "text", n=3,
        threshold=_DT_THRESH_PPM[0] / 1_000_000, keep_sizes=True)
    p = pairs.select(
        "d1", "d2",
        F.expr("n_common * 1000000 div (n1 + n2 - n_common)")
        .alias("jppm")).filter(F.col("jppm") >= _DT_THRESH_PPM[0])
    p = p.localCheckpoint(eager=False)  # pair bands + doc bands
    grid = F.broadcast(spark.createDataFrame(
        _DT_BANDS, "band int, lo long, hi long"))
    pb = (p.join(grid, (p.jppm >= grid.lo) & (p.jppm < grid.hi))
          .groupBy("band").agg(F.count("*").alias("c")))
    dmax = p.groupBy(F.col("d2").alias("doc_id")) \
        .agg(F.max("jppm").alias("mj"))
    dtok = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), " +")).alias("n_toks"))
    db = (dmax.join(grid, (dmax.mj >= grid.lo) & (dmax.mj < grid.hi))
          .join(dtok, "doc_id")
          .groupBy("band").agg(F.count("*").alias("nd"),
                               F.sum("n_toks").alias("nt")))
    tot = dtok.agg(F.count("*").alias("n_docs"))
    sw = W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, 0)
    s = (grid.join(F.broadcast(pb), "band", "left")
         .join(F.broadcast(db), "band", "left")
         .select("band", "lo",
                 F.sum(F.coalesce("c", F.lit(0))).over(sw)
                 .alias("n_pairs"),
                 F.sum(F.coalesce("nd", F.lit(0))).over(sw)
                 .alias("n_removed"),
                 F.sum(F.coalesce("nt", F.lit(0))).over(sw)
                 .alias("toks_removed")))
    return (s.crossJoin(F.broadcast(tot))
            .select(F.col("lo").cast("long").alias("thr_ppm"),
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("n_removed").cast("long")
                    .alias("n_docs_removed"),
                    F.col("toks_removed").cast("long")
                    .alias("n_tokens_removed"),
                    F.expr("n_removed * 1000000 div n_docs")
                    .cast("long").alias("removed_doc_ppm"))
            .orderBy("thr_ppm"))


# ---------------------------------------------------------------------
# c151: context-window packing audit (concat-and-split pricing)
# ---------------------------------------------------------------------

_CP_WINDOWS = [512, 2048, 8192]
_CP_W_SQL = ", ".join(f"({w})" for w in _CP_WINDOWS)


@_register(
    "c151_context_packing_audit",
    f"""
    WITH ws(wsz) AS (VALUES {_CP_W_SQL}),
    d AS (SELECT doc_id, len({_duck_toks()}) AS w FROM documents),
    c AS (SELECT doc_id, w,
                 sum(w) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM d),
    f AS (SELECT wsz, w,
                 (cum - 1) // wsz - (cum - w) // wsz + 1 AS frags
          FROM c CROSS JOIN ws),
    tot AS (SELECT sum(w) AS total, count(*) AS nd FROM d)
    SELECT CAST(wsz AS BIGINT) AS window_tokens,
           CAST((total + wsz - 1) // wsz AS BIGINT) AS n_windows,
           CAST(count(*) FILTER (WHERE frags > 1) AS BIGINT)
             AS n_docs_straddling,
           CAST(count(*) FILTER (WHERE frags > 1) * 1000000 // nd
                AS BIGINT) AS straddle_ppm,
           CAST(sum(frags) * 1000 // nd AS BIGINT)
             AS frags_per_doc_milli
    FROM f CROSS JOIN tot
    GROUP BY wsz, total, nd ORDER BY window_tokens
    """,
    "CONTEXT-WINDOW PACKING audit: the GPT-style concatenate-and-"
    "split packing (docs in doc_id order, boundaries every W tokens) "
    "priced for a window-size grid — windows produced, docs "
    "straddling a boundary (their loss sees a mid-document break), "
    "and mean fragments per doc in exact integer milli.  The "
    "pre-training batching decision: bigger W packs fewer broken "
    "docs but costs quadratic attention; this curve is the data "
    "half of that trade-off, measured instead of assumed.  Scale "
    "shape: the global token prefix-sum is b107's TWO-PASS "
    "distributed form (per-block cumsums + block-offset broadcast — "
    "no task holds a global sort); the window grid is a 3-row "
    "literal broadcast, and per-doc fragment counts reduce straight "
    "to |grid| rows.",
)
def c151_context_packing_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), " +")).alias("w"))
    blk = d.withColumn("_b", F.expr("doc_id div 1024"))
    local = blk.withColumn(
        "_lc", F.sum("w").over(W.partitionBy("_b").orderBy("doc_id")
                               .rowsBetween(W.unboundedPreceding, 0)))
    btot = blk.groupBy("_b").agg(F.sum("w").alias("_bt"))
    boff = btot.select(
        "_b",
        F.coalesce(F.sum("_bt").over(
            W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"))
    c = (local.join(F.broadcast(boff), "_b")
         .select("w", (F.col("_lc") + F.col("_off")).alias("cum")))
    ws = F.broadcast(spark.createDataFrame(
        [(w,) for w in _CP_WINDOWS], "wsz long"))
    tot = d.agg(F.sum("w").alias("total"), F.count("*").alias("nd"))
    f = c.crossJoin(ws).select(
        "wsz",
        (F.expr("(cum - 1) div wsz") - F.expr("(cum - w) div wsz")
         + 1).alias("frags"))
    return (f.groupBy("wsz")
            .agg(F.sum((F.col("frags") > 1).cast("long"))
                 .alias("n_straddling"),
                 F.sum("frags").alias("sum_frags"))
            .crossJoin(F.broadcast(tot))
            .select(F.col("wsz").cast("long").alias("window_tokens"),
                    F.expr("(total + wsz - 1) div wsz").cast("long")
                    .alias("n_windows"),
                    F.col("n_straddling").cast("long")
                    .alias("n_docs_straddling"),
                    F.expr("n_straddling * 1000000 div nd")
                    .cast("long").alias("straddle_ppm"),
                    F.expr("sum_frags * 1000 div nd").cast("long")
                    .alias("frags_per_doc_milli"))
            .orderBy("window_tokens"))


# ---------------------------------------------------------------------
# c152: stratified split balance audit (hash split vs global mixture)
# ---------------------------------------------------------------------

_SS_TRAIN, _SS_VAL = 800, 900   # per-mille cutoffs: 80/10/10


@_register(
    "c152_stratified_split_audit",
    f"""
    WITH d AS (
      SELECT lang,
             CAST('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)),
                  1, 12) AS BIGINT) % 1000 AS bkt
      FROM documents
    ), s AS (
      SELECT lang,
             CASE WHEN bkt < {_SS_TRAIN} THEN 'train'
                  WHEN bkt < {_SS_VAL} THEN 'val'
                  ELSE 'test' END AS split
      FROM d
    ), pl AS (
      SELECT lang, count(*) AS n,
             count(*) FILTER (WHERE split = 'train') AS n_train,
             count(*) FILTER (WHERE split = 'val') AS n_val,
             count(*) FILTER (WHERE split = 'test') AS n_test
      FROM s GROUP BY lang
    ), g AS (
      SELECT count(*) AS gn,
             count(*) FILTER (WHERE split = 'train') AS g_train,
             count(*) FILTER (WHERE split = 'val') AS g_val,
             count(*) FILTER (WHERE split = 'test') AS g_test
      FROM s
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_val AS BIGINT) AS n_val,
           CAST(n_test AS BIGINT) AS n_test,
           CAST(greatest(
             abs(n_train * 1000000 // n - g_train * 1000000 // gn),
             abs(n_val * 1000000 // n - g_val * 1000000 // gn),
             abs(n_test * 1000000 // n - g_test * 1000000 // gn))
             AS BIGINT) AS max_dev_ppm
    FROM pl CROSS JOIN g ORDER BY lang
    """,
    "STRATIFIED SPLIT BALANCE audit: deterministic hash-based "
    "train/val/test assignment (portable md5-48 of the doc id mod "
    "1000 -> 80/10/10 per-mille cutoffs — the seedless split any "
    "engine can reproduce byte-for-byte, the same portable-hash "
    "family as b153/c124), then per-language split shares vs the "
    "global shares in exact truncating ppm with the max absolute "
    "deviation per stratum.  The 'did the split preserve the "
    "mixture' gate run before any training job trusts a split "
    "column: a large max_dev_ppm on a small stratum is exactly how "
    "low-resource languages silently vanish from validation sets.  "
    "Scale shape: ONE doc pass -> |lang| x |split| cells; "
    "everything after is |lang| rows with a 1-row global broadcast.",
)
def c152_stratified_split_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.kmv import (
        portable_hash48)
    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "lang",
        (portable_hash48(F.concat(F.lit("s:"),
                                  F.col("doc_id").cast("string")))
         % 1000).alias("bkt")).select(
        "lang",
        F.when(F.col("bkt") < _SS_TRAIN, "train")
        .when(F.col("bkt") < _SS_VAL, "val")
        .otherwise("test").alias("split"))
    pl = (s.groupBy("lang")
          .agg(F.count("*").alias("n"),
               F.sum((F.col("split") == "train").cast("long"))
               .alias("n_train"),
               F.sum((F.col("split") == "val").cast("long"))
               .alias("n_val"),
               F.sum((F.col("split") == "test").cast("long"))
               .alias("n_test")))
    g = (s.agg(F.count("*").alias("gn"),
               F.sum((F.col("split") == "train").cast("long"))
               .alias("g_train"),
               F.sum((F.col("split") == "val").cast("long"))
               .alias("g_val"),
               F.sum((F.col("split") == "test").cast("long"))
               .alias("g_test")))
    return (pl.crossJoin(F.broadcast(g))
            .select("lang", F.col("n").cast("long").alias("n_docs"),
                    F.col("n_train").cast("long").alias("n_train"),
                    F.col("n_val").cast("long").alias("n_val"),
                    F.col("n_test").cast("long").alias("n_test"),
                    F.greatest(
                        F.abs(F.expr("n_train * 1000000 div n")
                              - F.expr("g_train * 1000000 div gn")),
                        F.abs(F.expr("n_val * 1000000 div n")
                              - F.expr("g_val * 1000000 div gn")),
                        F.abs(F.expr("n_test * 1000000 div n")
                              - F.expr("g_test * 1000000 div gn")))
                    .cast("long").alias("max_dev_ppm"))
            .orderBy("lang"))


# ---------------------------------------------------------------------
# c153: vocabulary coverage curve (what a fixed vocab budget buys)
# ---------------------------------------------------------------------

_VC_KS = [1000, 2000, 4000, 8000, 16000, 32000]
_VC_BANDS = [(i, (0 if i == 0 else _VC_KS[i - 1]), _VC_KS[i])
             for i in range(len(_VC_KS))]
_VC_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _VC_BANDS)


@_register(
    "c153_vocab_coverage_curve",
    f"""
    WITH g(band, lo, hi) AS (VALUES {_VC_BANDS_SQL}),
    u AS (SELECT w, count(*) AS cnt
          FROM (SELECT unnest({_duck_toks()}) AS w FROM documents)
          GROUP BY w),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rn
          FROM u),
    bs AS (SELECT band, sum(cnt) AS c
           FROM r JOIN g ON rn > lo AND rn <= hi GROUP BY band),
    tot AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM u),
    s AS (SELECT g.band, g.hi,
                 sum(coalesce(bs.c, 0)) OVER
                   (ORDER BY g.band ROWS UNBOUNDED PRECEDING)
                   AS covered
          FROM g LEFT JOIN bs USING (band))
    SELECT CAST(hi AS BIGINT) AS k,
           CAST(vocab AS BIGINT) AS vocab_size,
           CAST(covered AS BIGINT) AS covered_tokens,
           CAST(covered * 1000000 // total AS BIGINT) AS coverage_ppm
    FROM s CROSS JOIN tot ORDER BY k
    """,
    "VOCABULARY COVERAGE curve: token mass covered by the top-k most "
    "frequent words for a doubling k grid — the tokenizer vocab-"
    "budget decision, measured (complements c146: Heaps says how "
    "fast vocabulary GROWS; c149 says how much mass the unseen tail "
    "carries; this says what a FIXED budget buys today).  "
    "coverage_ppm(k) flattening marks the budget where more vocab "
    "buys nothing and subword splitting takes over.  Scale shape: "
    "ONE corpus pass -> vocabulary-sized counts; the global "
    "frequency rank is a window over the vocab table (vocab-bounded "
    "— the quantity c146 audits; SP-ordering reviewed), each word "
    "lands in one rank band of a literal grid, and the cumulative "
    "coverage runs on |grid| rows.",
)
def c153_vocab_coverage_curve(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    u = (docs.select(F.explode(
        F.split(F.trim(F.lower("text")), " +")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("cnt")))
    r = u.select(
        "cnt", F.row_number().over(W.orderBy(F.desc("cnt"), "w"))
        .alias("rn"))
    grid = F.broadcast(spark.createDataFrame(
        _VC_BANDS, "band int, lo long, hi long"))
    bs = (r.join(grid, (r.rn > grid.lo) & (r.rn <= grid.hi))
          .groupBy("band").agg(F.sum("cnt").alias("c")))
    tot = u.agg(F.sum("cnt").alias("total"),
                F.count("*").alias("vocab"))
    cw = W.orderBy("band").rowsBetween(W.unboundedPreceding, 0)
    s = (grid.join(F.broadcast(bs), "band", "left")
         .select("band", "hi",
                 F.sum(F.coalesce("c", F.lit(0))).over(cw)
                 .alias("covered")))
    return (s.crossJoin(F.broadcast(tot))
            .select(F.col("hi").cast("long").alias("k"),
                    F.col("vocab").cast("long").alias("vocab_size"),
                    F.col("covered").cast("long")
                    .alias("covered_tokens"),
                    F.expr("covered * 1000000 div total").cast("long")
                    .alias("coverage_ppm"))
            .orderBy("k"))


# ---------------------------------------------------------------------
# b187: SCD2 late-arrival repair audit (what late data costs a
#       dimension-history build)
# ---------------------------------------------------------------------

# Arrival split: the last tenth of the ingest-id space is the "late
# batch" that arrives after the SCD2 history (b38's builder) has been
# built from the on-time rows.  The repair rebuilds ONLY the affected
# users (those with >= 1 late row) and the audit diffs their interval
# sets before/after — the measurement that decides between
# append-only loading and a MERGE-based repair job.
_LA_NUM, _LA_DEN = 9, 10


@_register(
    "b187_scd2_late_arrival_repair",
    f"""
    WITH mx AS (SELECT (max(event_id) + 1) * {_LA_NUM} // {_LA_DEN}
                  AS cutoff FROM events),
    aff AS (SELECT DISTINCT user_id
            FROM events CROSS JOIN mx WHERE event_id >= cutoff),
    base_ev AS (SELECT e.user_id, e.event_type, e.ts, e.event_id
                FROM events e CROSS JOIN mx
                JOIN aff USING (user_id)
                WHERE e.event_id < cutoff),
    full_ev AS (SELECT e.user_id, e.event_type, e.ts, e.event_id
                FROM events e JOIN aff USING (user_id)),
    base_iv AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS f,
             coalesce(epoch_us(lead(ts) OVER
               (PARTITION BY user_id ORDER BY ts)), -1) AS t
      FROM (SELECT user_id, event_type, ts
            FROM (SELECT user_id, event_type, ts,
                         lag(event_type) OVER
                           (PARTITION BY user_id ORDER BY ts,
                            event_id) AS p
                  FROM base_ev)
            WHERE p IS NULL OR event_type <> p)),
    full_iv AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS f,
             coalesce(epoch_us(lead(ts) OVER
               (PARTITION BY user_id ORDER BY ts)), -1) AS t
      FROM (SELECT user_id, event_type, ts
            FROM (SELECT user_id, event_type, ts,
                         lag(event_type) OVER
                           (PARTITION BY user_id ORDER BY ts,
                            event_id) AS p
                  FROM full_ev)
            WHERE p IS NULL OR event_type <> p)),
    d AS (SELECT coalesce(b.event_type, r.event_type) AS event_type,
                 CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS add_,
                 CASE WHEN r.user_id IS NULL THEN 1 ELSE 0 END AS rem_
          FROM base_iv b
          FULL OUTER JOIN full_iv r
            ON r.user_id = b.user_id AND r.event_type = b.event_type
           AND r.f = b.f AND r.t = b.t)
    SELECT event_type,
           CAST(count(*) FILTER (WHERE rem_ = 0 AND add_ = 0)
                + count(*) FILTER (WHERE rem_ = 1) AS BIGINT)
             AS n_base,
           CAST(count(*) FILTER (WHERE rem_ = 0) AS BIGINT)
             AS n_repaired,
           CAST(count(*) FILTER (WHERE add_ = 1) AS BIGINT) AS n_added,
           CAST(count(*) FILTER (WHERE rem_ = 1) AS BIGINT)
             AS n_removed
    FROM d GROUP BY event_type ORDER BY event_type
    """,
    "SCD2 LATE-ARRIVAL repair audit: the last tenth of the ingest-id "
    "space arrives AFTER the dimension history (b38's lag/lead "
    "builder) was built from on-time rows; the repair rebuilds "
    "intervals for the affected users only and this audit diffs "
    "their interval sets — per changed-attribute value: intervals "
    "in the base build, after repair, added and removed.  A high "
    "removed count means late rows land MID-history (splitting "
    "closed versions — append-only loading is silently wrong and a "
    "MERGE repair is mandatory); removed ~ 0 means late rows only "
    "extend current versions and cheap appends suffice — the "
    "decision this audit exists to make.  Scale shape: the arrival "
    "cutoff is a 1-row broadcast; both interval builds run b38's "
    "per-user windows on the SAME user_id partitioning restricted "
    "to affected users (a broadcast semi-join prune); the diff is "
    "a full-outer equi-join on interval identity, and the output "
    "is |event types| rows.",
)
def b187_scd2_late_arrival_repair(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.expr(
        f"(max(event_id) + 1) * {_LA_NUM} div {_LA_DEN}")
        .alias("cutoff"))
    evc = ev.crossJoin(F.broadcast(mx))
    aff = (evc.filter(F.col("event_id") >= F.col("cutoff"))
           .select("user_id").distinct())
    pruned = evc.join(F.broadcast(aff), "user_id")

    def intervals(rows):
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        starts = (rows.select(
            "user_id", "event_type", "ts",
            F.lag("event_type").over(w).alias("p"))
            .filter(F.col("p").isNull()
                    | (F.col("event_type") != F.col("p"))))
        w2 = W.partitionBy("user_id").orderBy("ts")
        return starts.select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("f"),
            F.coalesce(F.unix_micros(F.lead("ts").over(w2)),
                       F.lit(-1)).alias("t"))

    base_iv = intervals(pruned.filter(F.col("event_id")
                                      < F.col("cutoff")))
    full_iv = intervals(pruned)
    b, r = base_iv.alias("b"), full_iv.alias("r")
    d = (b.join(r, (F.col("r.user_id") == F.col("b.user_id"))
                & (F.col("r.event_type") == F.col("b.event_type"))
                & (F.col("r.f") == F.col("b.f"))
                & (F.col("r.t") == F.col("b.t")), "full_outer")
         .select(F.coalesce("b.event_type", "r.event_type")
                 .alias("event_type"),
                 F.col("b.user_id").isNull().cast("int").alias("add_"),
                 F.col("r.user_id").isNull().cast("int").alias("rem_")))
    return (d.groupBy("event_type")
            .agg((F.sum(((F.col("rem_") == 0) & (F.col("add_") == 0))
                        .cast("long"))
                  + F.sum((F.col("rem_") == 1).cast("long")))
                 .cast("long").alias("n_base"),
                 F.sum((F.col("rem_") == 0).cast("long")).cast("long")
                 .alias("n_repaired"),
                 F.sum((F.col("add_") == 1).cast("long")).cast("long")
                 .alias("n_added"),
                 F.sum((F.col("rem_") == 1).cast("long")).cast("long")
                 .alias("n_removed"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------
# c154: temperature-sampling mixture weights (exact integer isqrt)
# ---------------------------------------------------------------------

# T=2 temperature sampling: source weight proportional to n^(1/T) =
# isqrt(n).  The float-free trick: floor(sqrt(n)) seeded from double
# sqrt and corrected by +-1 integer comparisons, exact in both
# engines for any int64 count.
_TS_ISQRT = ("(CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT)"
             " + CASE WHEN (CAST(floor(sqrt(CAST({n} AS DOUBLE)))"
             "   AS BIGINT) + 1) * (CAST(floor(sqrt(CAST({n} AS"
             " DOUBLE))) AS BIGINT) + 1) <= {n} THEN 1 ELSE 0 END"
             " - CASE WHEN CAST(floor(sqrt(CAST({n} AS DOUBLE)))"
             "   AS BIGINT) * CAST(floor(sqrt(CAST({n} AS DOUBLE)))"
             "   AS BIGINT) > {n} THEN 1 ELSE 0 END)")


@_register(
    "c154_temperature_mixture_weights",
    f"""
    WITH s AS (SELECT source, count(*) AS n FROM documents
               GROUP BY source),
    w AS (SELECT source, n, {_TS_ISQRT.format(n='n')} AS wgt FROM s),
    tot AS (SELECT sum(n) AS nd, sum(wgt) AS tw FROM w)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(wgt AS BIGINT) AS weight,
           CAST(n * 1000000 // nd AS BIGINT) AS raw_share_ppm,
           CAST(wgt * 1000000 // tw AS BIGINT) AS sampled_share_ppm,
           CAST((nd * wgt // tw) * 1000000 // n AS BIGINT)
             AS resample_ratio_ppm
    FROM w CROSS JOIN tot ORDER BY source
    """,
    "TEMPERATURE-SAMPLING mixture weights (T = 2): per-source "
    "sampling weight proportional to n^(1/T) = isqrt(n) — the "
    "standard multilingual/multi-source rebalancing (raw-proportion "
    "sampling starves small sources; uniform over-trains them; "
    "T = 2 is the published middle ground) computed EXACTLY: "
    "isqrt seeds from double sqrt and corrects by +-1 integer "
    "comparisons, so the plan stays float-exact in both engines at "
    "any count (a raw floor(sqrt(n)) is off-by-one near perfect "
    "squares under double rounding).  Output: raw vs sampled share "
    "and the resample ratio (>1e6 ppm = upsample) per source — the "
    "table a mixture recipe (c34's input) is built from.  Scale "
    "shape: ONE pass to |sources| counts; everything after runs on "
    "|sources| rows with a 1-row broadcast total.",
)
def c154_temperature_mixture_weights(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count("*").alias("n"))
    w = s.select("source", "n",
                 F.expr(_TS_ISQRT.format(n="n")).alias("wgt"))
    tot = w.agg(F.sum("n").alias("nd"), F.sum("wgt").alias("tw"))
    return (w.crossJoin(F.broadcast(tot))
            .select("source", F.col("n").cast("long").alias("n_docs"),
                    F.col("wgt").cast("long").alias("weight"),
                    F.expr("n * 1000000 div nd").cast("long")
                    .alias("raw_share_ppm"),
                    F.expr("wgt * 1000000 div tw").cast("long")
                    .alias("sampled_share_ppm"),
                    F.expr("(nd * wgt div tw) * 1000000 div n")
                    .cast("long").alias("resample_ratio_ppm"))
            .orderBy("source"))
