"""Round-4 additions: arbitrary GROUPING SETS, time-weighted average,
OHLC bucket rollup, integer least-squares trend, MAD outlier fences,
graph triangle census, duplicate-span flagging, and a bigram
corpus-frequency LM proxy.

Analytics (b64-b68):
- b64: arbitrary GROUPING SETS — b16/b17 cover ROLLUP/CUBE; the
  general form ((a,b),(b),()) is NOT a rollup of its own columns and
  exercises Spark's Expand operator with a hand-picked set list.
- b65: time-weighted average (TimescaleDB `time_weight` analogue) —
  irregular samples weighted by their holding duration, the correct
  mean for sensor/price series; last sample of each group carries no
  weight (no successor).  One window + one aggregate.
- b66: OHLC candlestick rollup (first/last/min/max per bucket).  The
  Spark side is ONE hash aggregate via min_by/max_by over a
  (ts, event_id) struct key — no window, map-side combinable; the
  oracle uses the textbook double-row_number window form.
- b67: per-group linear trend as INTEGER least squares — slope from
  (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²) over exact BIGINT moment sums on a
  daily pre-aggregate; ppm scaling + truncating div keep both engines
  bit-identical (no float accumulation order to disagree on).
- b68: median-absolute-deviation outlier fence — exact interpolated
  median (Spark `percentile` == DuckDB `quantile_cont`, both
  (n−1)·p), MAD via a second aggregate over |x−med|, then a ±3·MAD
  count.  Two aggregate passes + one broadcast join-back per stage;
  halves of integer cents are exact in doubles, so no fp drift.

Curation / graph (c52-c54):
- c52: triangle census + global clustering coefficient over the c08
  near-dup graph — triangles via the oriented 3-way equi-join on
  d1<d2<d3 edges (each triangle counted exactly once), wedges from
  the degree sequence; the standard "is my dup graph clumpy or
  chained" diagnostic before choosing a canonicalization strategy.
- c53: duplicate-span flagging (Lee et al. 2022 "Deduplicating
  Training Data Makes Language Models Better" — exact substring
  dedup, here at fixed n=5 token grain): global 5-gram occurrence
  counts (> 1 occurrence anywhere = duplicated), each hit flags its
  5-token span, spans merge per doc via the gaps-and-islands running
  max; reports flagged-token ppm + merged-island count per doc.
- c54: bigram corpus-frequency score — a log-free stand-in for the
  CCNet/KenLM perplexity filter: docs whose bigrams are globally
  rare (mean corpus count low, singleton ppm high) are flagged the
  same way high-perplexity docs are.  Integer sums, oracle-exact.

Engine-parity conventions follow driver_queries: BIGINT casts,
floor(value*100) integer cents, truncating `div`/`//` (verified to
agree on negatives), identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tp_airflow_gtfs_snowflake_spark.operators import dedup as D
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    REGISTRY, _register, _t)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
    _duck_toks, _spread)


@_register(
    "b64_grouping_sets",
    """
    SELECT event_type,
           CAST(isodow(ts) AS BIGINT) AS iso_dow,
           CAST(grouping(event_type) AS BIGINT) AS g_type,
           CAST(grouping(isodow(ts)) AS BIGINT) AS g_dow,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY GROUPING SETS ((event_type, isodow(ts)), (isodow(ts)), ())
    """,
    "arbitrary GROUPING SETS ((type,dow),(dow),()) — not a rollup of "
    "its own columns (the (event_type) stratum is deliberately "
    "absent), so it exercises the explicit set-list Expand path.  "
    "Physically one Expand (3x input) + one hash aggregate; at 100 TB "
    "prefer computing the finest stratum once and re-aggregating the "
    "coarser strata from it when the finest group count is small",
)
def b64_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "iso_dow", (F.weekday("ts") + 1).cast("long"))
    return (ev.groupingSets([["event_type", "iso_dow"], ["iso_dow"], []],
                            "event_type", "iso_dow")
            .agg(F.grouping("event_type").cast("long").alias("g_type"),
                 F.grouping("iso_dow").cast("long").alias("g_dow"),
                 F.count("*").cast("long").alias("n_events"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .cast("long").alias("value_cents"))
            .select("event_type", "iso_dow", "g_type", "g_dow",
                    "n_events", "value_cents"))


@_register(
    "b65_time_weighted_avg",
    """
    WITH e AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) // 1000000 AS es, event_id
      FROM events
    ), seg AS (
      SELECT event_type, event_date, cents,
             lead(es) OVER (PARTITION BY event_type, event_date
                            ORDER BY es, event_id) - es AS dur_s
      FROM e
    )
    SELECT event_type, event_date,
           CAST(sum(dur_s) AS BIGINT) AS dur_sum_s,
           CAST(sum(cents * dur_s) AS BIGINT) AS weighted_sum,
           CAST(sum(cents * dur_s) // nullif(sum(dur_s), 0) AS BIGINT)
             AS twa_cents
    FROM seg WHERE dur_s IS NOT NULL
    GROUP BY event_type, event_date
    """,
    "time-weighted average over irregular samples (TimescaleDB "
    "time_weight 'LOCF' analogue): each sample holds until the next "
    "one in its (type, day) partition; the last sample has no "
    "successor and drops out.  ONE window (lead) + one map-side- "
    "combinable aggregate; epoch seconds + integer cents keep every "
    "product exact.  At 100 TB the window partitions by (type, day) "
    "so state is bounded per partition and days parallelize",
)
def b65_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("unix_micros(ts) div 1000000").alias("es"), "event_id")
    w = W.partitionBy("event_type", "event_date").orderBy("es", "event_id")
    seg = ev.withColumn("dur_s", F.lead("es").over(w) - F.col("es"))
    return (seg.filter(F.col("dur_s").isNotNull())
            .groupBy("event_type", "event_date")
            .agg(F.sum("dur_s").cast("long").alias("dur_sum_s"),
                 F.sum(F.col("cents") * F.col("dur_s")).cast("long")
                 .alias("weighted_sum"),
                 F.expr("sum(cents * dur_s) div nullif(sum(dur_s), 0)")
                 .cast("long").alias("twa_cents")))


@_register(
    "b66_ohlc",
    """
    WITH e AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
             CAST(floor(value * 100) AS BIGINT) AS cents, ts, event_id
      FROM events
    ), w AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, event_date
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, event_date
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, event_date,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
             AS close_cents,
           CAST(count(*) AS BIGINT) AS n_events
    FROM w GROUP BY event_type, event_date
    """,
    "OHLC candlestick rollup per (type, day).  Spark side is ONE "
    "two-phase aggregate — open/close via min_by/max_by over a "
    "(ts, event_id) struct key (deterministic under ts ties), "
    "high/low plain min/max — no window, map-side combinable, one "
    "shuffle of a handful of longs per group.  (The struct ordering "
    "key lands it on SortAggregate — struct in the agg buffer can't "
    "hash-aggregate — but the sort is by group keys within "
    "partitions, not a per-group data sort.)  The oracle is the "
    "textbook double-row_number window form — same result, but it "
    "sorts 100% of the rows per partition; that delta IS the scale "
    "argument for min_by",
)
def b66_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.struct("ts", "event_id").alias("ord"))
    return (ev.groupBy("event_type", "event_date")
            .agg(F.expr("min_by(cents, ord)").cast("long").alias("open_cents"),
                 F.max("cents").cast("long").alias("high_cents"),
                 F.min("cents").cast("long").alias("low_cents"),
                 F.expr("max_by(cents, ord)").cast("long")
                 .alias("close_cents"),
                 F.count("*").cast("long").alias("n_events")))


@_register(
    "b67_integer_trend",
    """
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n, sx, sy, sxy, sxx,
           CAST(CAST(sign(n * sxy - sx * sy) AS BIGINT)
                * (1000000 * abs(n * sxy - sx * sy)
                   // nullif(n * sxx - sx * sx, 0)) AS BIGINT)
             AS slope_cents_ppm
    FROM m
    """,
    "per-group linear trend (daily-revenue slope) as INTEGER least "
    "squares: the five moment sums (n, Σx, Σy, Σxy, Σx²) are exact "
    "BIGINTs over a daily pre-aggregate, slope = ppm-scaled "
    "(n·Σxy−ΣxΣy)/(n·Σx²−(Σx)²) with sign·abs-div so truncation "
    "agrees across engines on negative slopes.  regr_slope exists in "
    "both engines but sums doubles — partition-order-dependent at "
    "scale; moment sums are associative/commutative in ℤ, so the "
    "map-side combine is exact no matter how 100 TB is partitioned",
)
def b67_integer_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long").alias("x"))
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long"))
             .cast("long").alias("y")))
    m = (daily.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.withColumn(
        "slope_cents_ppm",
        (F.signum(num).cast("long")
         * F.expr("1000000 * abs(n * sxy - sx * sy) "
                  "div nullif(n * sxx - sx * sx, 0)")).cast("long"))


@_register(
    "b68_mad_outliers",
    """
    WITH e AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ), med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
      FROM e GROUP BY event_type
    ), mad AS (
      SELECT e.event_type,
             quantile_cont(abs(e.cents - m.med_cents), 0.5) AS mad_cents
      FROM e JOIN med m USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_type, m.med_cents, d.mad_cents,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (abs(e.cents - m.med_cents)
                                 > 3 * d.mad_cents) AS BIGINT)
             AS n_outliers,
           CAST(count(*) FILTER (abs(e.cents - m.med_cents)
                                 > 3 * d.mad_cents)
                * 1000000 // count(*) AS BIGINT) AS outlier_ppm
    FROM e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    GROUP BY e.event_type, m.med_cents, d.mad_cents
    """,
    "median-absolute-deviation outlier fence (robust alternative to "
    "b31's mean±3σ: immune to the outliers it hunts).  Exact "
    "interpolated median — Spark `percentile` and DuckDB "
    "`quantile_cont` both compute the (n−1)·p rule, and integer-cent "
    "halves are exact doubles, so no fp drift.  Three aggregate "
    "passes over the fact with the tiny per-type medians BROADCAST "
    "back between passes; at 100 TB swap the exact percentile for "
    "approx_percentile partials and keep the same plan shape",
)
def b68_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long")
        .alias("cents"))
    med = (e.groupBy("event_type")
           .agg(F.expr("percentile(cents, 0.5)").alias("med_cents")))
    with_med = e.join(F.broadcast(med), "event_type")
    mad = (with_med.groupBy("event_type")
           .agg(F.expr("percentile(abs(cents - med_cents), 0.5)")
                .alias("mad_cents")))
    dev = F.abs(F.col("cents") - F.col("med_cents"))
    return (with_med.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med_cents", "mad_cents")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.count_if(dev > 3 * F.col("mad_cents")).cast("long")
                 .alias("n_outliers"),
                 F.expr("count_if(abs(cents - med_cents) > 3 * mad_cents) "
                        "* 1000000 div count(*)").cast("long")
                 .alias("outlier_ppm")))


def _duck_edges(threshold: float = 0.5) -> str:
    """Near-dup edge CTE chain (mirrors dedup.ngram_jaccard_pairs at
    n=3): emits `e(d1, d2)` with d1 < d2."""
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
        _duck_shingles)
    return f"""
    t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_duck_shingles(3)}) AS sh FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
               FROM sh a JOIN sh b
                 ON a.sh = b.sh AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id),
    e AS (SELECT d1, d2 FROM common
            JOIN sizes x ON x.doc_id = d1 JOIN sizes y ON y.doc_id = d2
          WHERE n_common * 1.0 / (x.n_sh + y.n_sh - n_common)
                >= {threshold})
    """


@_register(
    "c52_triangle_census",
    f"""
    WITH {_duck_edges(0.5)},
    deg AS (SELECT d, count(*) AS dg FROM (
              SELECT d1 AS d FROM e UNION ALL SELECT d2 FROM e)
            GROUP BY d),
    tri AS (SELECT count(*) AS n FROM e e1
            JOIN e e2 ON e2.d1 = e1.d2
            JOIN e e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2)
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_linked_docs,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT sum(dg * (dg - 1) // 2) FROM deg) AS BIGINT)
             AS n_wedges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
           CAST(3 * (SELECT n FROM tri) * 1000000
                // nullif((SELECT sum(dg * (dg - 1) // 2) FROM deg), 0)
                AS BIGINT) AS clustering_ppm
    """,
    "triangle census + global clustering coefficient (3·tri/wedges) "
    "over the c08 near-dup graph.  Triangles via the oriented 3-way "
    "equi-join on d1<d2 edges — each triangle (a<b<c) matches exactly "
    "once, no /6 correction, no cartesian; wedges from the degree "
    "sequence alone.  The clumpy-vs-chained diagnostic that decides "
    "whether c19's connected components will produce giant clusters.  "
    "At 100 TB: orient edges low-degree-first instead of by id "
    "(classic heavy-hitter bound) and the same join computes it",
)
def c52_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    e = (D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
         .select("d1", "d2"))
    deg = (e.select(F.col("d1").alias("d"))
           .unionByName(e.select(F.col("d2").alias("d")))
           .groupBy("d").agg(F.count("*").alias("dg")))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (e1.join(e2, F.col("e2.d1") == F.col("e1.d2"))
           .join(e3, (F.col("e3.d1") == F.col("e1.d1"))
                 & (F.col("e3.d2") == F.col("e2.d2")))
           .agg(F.count("*").alias("n")))
    wedges = deg.agg(F.expr("sum(dg * (dg - 1) div 2)").alias("w"))
    return (docs.agg(F.count("*").cast("long").alias("n_docs"))
            .crossJoin(F.broadcast(
                deg.agg(F.count("*").cast("long").alias("n_linked_docs"))))
            .crossJoin(F.broadcast(
                e.agg(F.count("*").cast("long").alias("n_edges"))))
            .crossJoin(F.broadcast(
                wedges.select(F.col("w").cast("long").alias("n_wedges"))))
            .crossJoin(F.broadcast(
                tri.select(F.col("n").cast("long").alias("n_triangles"))))
            .withColumn("clustering_ppm",
                        F.expr("3 * n_triangles * 1000000 "
                               "div nullif(n_wedges, 0)").cast("long")))


@_register(
    "c53_dup_span_flagging",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    pos AS (SELECT doc_id, unnest(range(1, len(toks) - 3)) AS i, toks
            FROM t),
    occ AS (SELECT doc_id, i,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     || ' ' || toks[i+3] || ' ' || toks[i+4] AS sh
            FROM pos),
    dup AS (SELECT sh FROM occ GROUP BY sh HAVING count(*) > 1),
    spans AS (SELECT o.doc_id, o.i AS s, o.i + 4 AS f
              FROM occ o JOIN dup d ON d.sh = o.sh),
    cov AS (SELECT DISTINCT doc_id, unnest(range(s, f + 1)) AS p
            FROM spans),
    isl AS (SELECT doc_id, s,
                   max(f) OVER (PARTITION BY doc_id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pme
            FROM spans),
    per_doc AS (
      SELECT t.doc_id, len(t.toks) AS n_tokens,
             (SELECT count(*) FROM cov c WHERE c.doc_id = t.doc_id)
               AS n_flagged,
             (SELECT count(*) FILTER (pme IS NULL OR s > pme)
              FROM isl i WHERE i.doc_id = t.doc_id) AS n_islands
      FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_flagged AS BIGINT) AS n_flagged,
           CAST(n_islands AS BIGINT) AS n_islands,
           CAST(n_flagged * 1000000 // n_tokens AS BIGINT)
             AS flagged_ppm
    FROM per_doc
    """,
    "duplicate-span flagging (Lee et al. 2022 exact-substring dedup "
    "at 5-token grain): any 5-gram occurring >1 time ANYWHERE in the "
    "corpus flags its span; per-doc spans merge via the "
    "gaps-and-islands running-max window.  Physically: one "
    "posexplode + one global 5-gram count (the only full shuffle) + "
    "a semi-join back, then per-doc windows over the tiny flagged "
    "set.  At 100 TB the 5-gram count is the standard hash-partition "
    "pass (CityHash the gram first so keys are fixed-width), and "
    "span merge stays per-doc-local — the exact layout Lee et al.'s "
    "suffix-array pass replaces only when the grain must be variable",
)
def c53_dup_span_flagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), " +").alias("toks"))
    occ = toks.select(
        "doc_id", F.size("toks").alias("n_tokens"),
        F.posexplode(F.expr(
            "CASE WHEN size(toks) >= 5 THEN "
            "transform(sequence(1, size(toks) - 4), "
            "i -> concat_ws(' ', slice(toks, i, 5))) "
            "ELSE array() END")).alias("i0", "sh")
    ).select("doc_id", "n_tokens", (F.col("i0") + 1).alias("s"), "sh")
    dup = occ.groupBy("sh").agg(F.count("*").alias("c")).filter("c > 1")
    spans = (occ.join(dup.select("sh"), "sh")
             .select("doc_id", "s", (F.col("s") + 4).alias("f")))
    cov = (spans.select("doc_id",
                        F.explode(F.sequence("s", "f")).alias("p"))
           .distinct()
           .groupBy("doc_id").agg(F.count("*").alias("n_flagged")))
    w = (W.partitionBy("doc_id").orderBy("s")
         .rowsBetween(W.unboundedPreceding, -1))
    isl = (spans.withColumn("pme", F.max("f").over(w))
           .groupBy("doc_id")
           .agg(F.count_if(F.col("pme").isNull()
                           | (F.col("s") > F.col("pme")))
                .alias("n_islands")))
    base = toks.select("doc_id", F.size("toks").alias("n_tokens"))
    return (base.join(cov, "doc_id", "left").join(isl, "doc_id", "left")
            .select("doc_id", F.col("n_tokens").cast("long"),
                    F.coalesce("n_flagged", F.lit(0)).cast("long")
                    .alias("n_flagged"),
                    F.coalesce("n_islands", F.lit(0)).cast("long")
                    .alias("n_islands"),
                    F.expr("coalesce(n_flagged, 0) * 1000000 "
                           "div n_tokens").cast("long")
                    .alias("flagged_ppm")))


@_register(
    "c54_bigram_lm_score",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  toks[i] || ' ' || toks[i+1] AS bg
           FROM (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
                 FROM t)),
    cnt AS (SELECT bg, count(*) AS c FROM bg GROUP BY bg)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(c.c) AS BIGINT) AS freq_sum,
           CAST(sum(c.c) // count(*) AS BIGINT) AS mean_freq,
           CAST(count(*) FILTER (c.c = 1) AS BIGINT) AS n_singletons,
           CAST(count(*) FILTER (c.c = 1) * 1000000 // count(*)
                AS BIGINT) AS singleton_ppm
    FROM bg b JOIN cnt c ON c.bg = b.bg
    GROUP BY b.doc_id
    """,
    "bigram corpus-frequency score — log-free proxy for the "
    "CCNet/KenLM perplexity filter: per-doc mean global frequency of "
    "its bigram OCCURRENCES plus singleton ppm (bigrams seen nowhere "
    "else).  Low mean_freq / high singleton_ppm ≈ high perplexity "
    "under a corpus-trained LM, computed with two shuffles (global "
    "bigram count, join-back + per-doc agg) and zero floats.  At "
    "100 TB: hash the bigram to a fixed-width key before the count "
    "and cache the heavy head of the count table as a broadcast "
    "(Zipf: the top 1% of bigrams covers most occurrences)",
)
def c54_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), " +").alias("toks"))
    bg = toks.select(
        "doc_id",
        F.explode(F.expr(
            "zip_with(slice(toks, 1, size(toks) - 1), "
            "slice(toks, 2, size(toks) - 1), "
            "(a, b) -> concat(a, ' ', b))")).alias("bg"))
    cnt = bg.groupBy("bg").agg(F.count("*").alias("c"))
    return (bg.join(cnt, "bg")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum("c").cast("long").alias("freq_sum"),
                 F.expr("sum(c) div count(*)").cast("long")
                 .alias("mean_freq"),
                 F.count_if(F.col("c") == 1).cast("long")
                 .alias("n_singletons"),
                 F.expr("count_if(c = 1) * 1000000 div count(*)")
                 .cast("long").alias("singleton_ppm")))


@_register(
    "b69_set_ops_all",
    """
    SELECT user_id, 'except_all' AS op FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT user_id, 'intersect_all' AS op FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) — b18 "
    "covers the DISTINCT variants; the ALL forms preserve "
    "multiplicity (a user with 3 clicks and 1 purchase survives "
    "except_all twice) and compile to a completely different physical "
    "shape: count-per-side aggregate + generate(replicate) instead of "
    "a dedup shuffle.  One shuffle on the join key either way; at "
    "100 TB the pre-count shrinks the replicate input to distinct "
    "keys so the generate never amplifies the shuffle",
)
def b69_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return (clicks.exceptAll(buys).withColumn("op", F.lit("except_all"))
            .unionByName(clicks.intersectAll(buys)
                         .withColumn("op", F.lit("intersect_all"))))


@_register(
    "b70_null_safe_join",
    """
    WITH a AS (
      SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 100 END
               AS k, CAST(count(*) AS BIGINT) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), b AS (
      SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 100 END
               AS k, CAST(count(*) AS BIGINT) AS n_views
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT a.k, a.n_clicks, b.n_views
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    "null-safe equi join (<=> / IS NOT DISTINCT FROM): the NULL "
    "stratum matches the NULL stratum instead of silently dropping "
    "out — the semantic Snowflake spells EQUAL_NULL and the classic "
    "fix for joining on nullable dimension keys.  Catalyst treats "
    "<=> as a HASH-PARTITIONABLE join key (EqualNullSafe is an equi "
    "condition), so this stays a shuffled hash join, NOT a nested- "
    "loop — the property that makes nullable-key joins viable at "
    "100 TB; pinned by a plan gate",
)
def b70_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = (F.when(F.col("user_id") % 7 == 0, F.lit(None).cast("long"))
         .otherwise(F.col("user_id") % 100))
    a = (ev.filter(F.col("event_type") == "click")
         .groupBy(k.alias("k"))
         .agg(F.count("*").cast("long").alias("n_clicks")))
    b = (ev.filter(F.col("event_type") == "view")
         .groupBy(k.alias("k"))
         .agg(F.count("*").cast("long").alias("n_views")))
    return (a.join(b, a["k"].eqNullSafe(b["k"]))
            .select(a["k"].alias("k"), "n_clicks", "n_views"))


@_register(
    "c55_ngram_novelty",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    occ AS (SELECT doc_id,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     || ' ' || toks[i+3] || ' ' || toks[i+4] AS sh
            FROM (SELECT doc_id, unnest(range(1, len(toks) - 3)) AS i,
                         toks
                  FROM t)),
    firsts AS (SELECT sh, min(doc_id) AS first_doc FROM occ GROUP BY sh)
    SELECT o.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (f.first_doc < o.doc_id) AS BIGINT)
             AS n_seen_before,
           CAST((count(*) - count(*) FILTER (f.first_doc < o.doc_id))
                * 1000000 // count(*) AS BIGINT) AS novelty_ppm
    FROM occ o JOIN firsts f ON f.sh = o.sh
    GROUP BY o.doc_id
    """,
    "per-doc n-gram NOVELTY in ingestion order (doc_id as arrival "
    "time): the fraction of a doc's 5-gram occurrences whose gram was "
    "never seen in any earlier doc — the 'is the crawl still finding "
    "new text' curve dataset builders watch to decide when a source "
    "is mined out.  Same two-shuffle shape as c54 (global min-doc per "
    "gram, join back, per-doc agg); at 100 TB the firsts table is "
    "the only global state and min(doc_id) is map-side combinable",
)
def c55_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), " +").alias("toks"))
    occ = toks.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(toks) >= 5 THEN "
            "transform(sequence(1, size(toks) - 4), "
            "i -> concat_ws(' ', slice(toks, i, 5))) "
            "ELSE array() END")).alias("sh"))
    firsts = occ.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (occ.join(firsts, "sh")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_grams"),
                 F.count_if(F.col("first_doc") < F.col("doc_id"))
                 .cast("long").alias("n_seen_before"),
                 F.expr("(count(*) - count_if(first_doc < doc_id)) "
                        "* 1000000 div count(*)").cast("long")
                 .alias("novelty_ppm")))


@_register(
    "c56_cluster_cohesion",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
               FROM embeddings),
    c AS (SELECT vec_id AS cent_id, emb AS cemb FROM e WHERE vec_id < 8),
    asg AS (SELECT vec_id, emb, cent_id FROM (
              SELECT e.vec_id, e.emb, c.cent_id,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.emb, c.cemb), 6)
                                DESC, c.cent_id) AS rn
              FROM e CROSS JOIN c) WHERE rn = 1),
    sizes AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vecs
              FROM asg GROUP BY cent_id),
    p AS (SELECT a.cent_id,
                 CAST(round(list_cosine_similarity(a.emb, b.emb)
                            * 1000000) AS BIGINT) AS cos_micro
          FROM asg a JOIN asg b
            ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
    agg AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(cos_micro) AS BIGINT) AS s
            FROM p GROUP BY cent_id)
    SELECT z.cent_id, z.n_vecs,
           CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(a.s // a.n_pairs AS BIGINT) AS mean_cos_ppm
    FROM sizes z LEFT JOIN agg a USING (cent_id)
    """,
    "embedding cluster cohesion: mean pairwise cosine INSIDE each IVF "
    "cell — the SemDeDup-style diagnostic separating tight duplicate "
    "clusters (cohesion near 1e6 ppm: safe to keep one) from loose "
    "topical cells (keep all).  Reuses the zero-exchange ivf_assign, "
    "then the same per-cell self-join as c10; cosines are rounded to "
    "integer micro-units BEFORE summing so the mean is exact integer "
    "math (a double sum would be partition-order-dependent).  At "
    "100 TB: sub_blocks splits hot cells exactly as in "
    "cell_blocked_neardup",
)
def c56_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.functions.vectors import cosine
    from tp_airflow_gtfs_snowflake_spark.operators import similarity as SIM
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    asg = SIM.ivf_assign(emb, n_cents=8)
    sizes = (asg.groupBy("cent_id")
             .agg(F.count("*").cast("long").alias("n_vecs")))
    a = asg.select("cent_id", F.col("vec_id").alias("d1"),
                   F.col("embedding").alias("e1"))
    b = asg.select("cent_id", F.col("vec_id").alias("d2"),
                   F.col("embedding").alias("e2"))
    pairs = (a.join(b, ["cent_id"])
             .filter(F.col("d1") < F.col("d2"))
             .select("cent_id",
                     F.round(cosine(F.col("e1"), F.col("e2")) * 1000000)
                     .cast("long").alias("cos_micro")))
    agg = (pairs.groupBy("cent_id")
           .agg(F.count("*").cast("long").alias("n_pairs"),
                F.sum("cos_micro").cast("long").alias("s")))
    return (sizes.join(agg, "cent_id", "left")
            .select(sizes["cent_id"], "n_vecs",
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.expr("s div n_pairs").cast("long")
                    .alias("mean_cos_ppm")))


@_register(
    "b71_tuple_in_semi",
    """
    SELECT l.l_linestatus, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM lineitem r
      WHERE r.l_returnflag = 'R'
        AND r.l_partkey = l.l_partkey AND r.l_suppkey = l.l_suppkey)
    GROUP BY l.l_linestatus
    """,
    "multi-column IN subquery — (a, b) IN (SELECT a, b ...) must "
    "compile to ONE semi join on the composite key, not a per-row "
    "probe or an exists-per-column pair.  The 'lines whose "
    "(part, supplier) pair has ever been returned' shape; at 100 TB "
    "the subquery side dedups BEFORE the join (aggregate under the "
    "semi join keeps the build side at distinct-pairs size)",
)
def b71_tuple_in_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_b71_lineitem")
    return spark.sql("""
        SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM _b71_lineitem
        WHERE (l_partkey, l_suppkey) IN (
          SELECT l_partkey, l_suppkey FROM _b71_lineitem
          WHERE l_returnflag = 'R')
        GROUP BY l_linestatus
    """)


@_register(
    "b72_cumulative_distinct_users",
    """
    WITH f AS (
      SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
      FROM events GROUP BY user_id
    ), d AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_distinct_users
    FROM d
    """,
    "running COUNT(DISTINCT) rewrite: count(DISTINCT user) OVER "
    "(ORDER BY day) is unsupported/unscalable in both engines, so the "
    "standard factoring is first-touch per user (one agg), daily new "
    "counts (tiny agg), then a running sum over the handful of days — "
    "the cumulative-reach curve with NO distinct state in the window. "
    " At 100 TB the only full-data pass is the per-user min, "
    "map-side combinable; the window runs over ~365 rows",
)
def b72_cumulative_distinct_users(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = (ev.groupBy("user_id")
         .agg(F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day")))
    d = f.groupBy("day").agg(F.count("*").cast("long").alias("new_users"))
    w = (W.orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return d.withColumn("cum_distinct_users",
                        F.sum("new_users").over(w).cast("long"))


@_register(
    "c57_length_percentile_filter",
    """
    WITH q AS (
      SELECT lang, quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.lang, q.lo, q.hi,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (d.n_chars BETWEEN q.lo AND q.hi)
                AS BIGINT) AS n_kept,
           CAST(sum(d.n_chars) FILTER (d.n_chars BETWEEN q.lo AND q.hi)
                AS BIGINT) AS kept_chars
    FROM documents d JOIN q USING (lang)
    GROUP BY d.lang, q.lo, q.hi
    """,
    "per-language length-band filter (drop the tails outside "
    "[p5, p95]) — the C4/Gopher 'too short / too long' rule with "
    "data-derived thresholds instead of constants.  Exact "
    "interpolated percentiles per language (5 groups) BROADCAST back "
    "to the corpus; integer char counts make the band edges exact "
    "half-integers in both engines.  At 100 TB: approx_percentile "
    "partials for the thresholds, same broadcast join-back",
)
def c57_length_percentile_filter(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q = (docs.groupBy("lang")
         .agg(F.expr("percentile(n_chars, 0.05)").alias("lo"),
              F.expr("percentile(n_chars, 0.95)").alias("hi")))
    kept = F.col("n_chars").between(F.col("lo"), F.col("hi"))
    return (docs.join(F.broadcast(q), "lang")
            .groupBy("lang", "lo", "hi")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.count_if(kept).cast("long").alias("n_kept"),
                 F.sum(F.when(kept, F.col("n_chars"))).cast("long")
                 .alias("kept_chars")))


@_register(
    "c58_source_embedding_drift",
    """
    WITH j AS (
      SELECT d.source, e.vec_id, e.embedding::DOUBLE[] AS emb
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (
      SELECT source, i.i AS dim,
             CAST(floor(emb[i.i] * 1000000) AS BIGINT) AS qv
      FROM j, (SELECT unnest(range(1, 65)) AS i) i
    ), per AS (
      SELECT source, dim, sum(qv) AS s_dim FROM q GROUP BY source, dim
    ), gl AS (
      SELECT dim, sum(qv) AS g_dim FROM q GROUP BY dim
    )
    SELECT p.source,
           CAST(floor(1000000.0
                * CAST(sum(p.s_dim * g.g_dim) AS DOUBLE)
                / (sqrt(CAST(sum(p.s_dim * p.s_dim) AS DOUBLE))
                   * sqrt(CAST(sum(g.g_dim * g.g_dim) AS DOUBLE))))
                AS BIGINT) AS centroid_cos_ppm
    FROM per p JOIN gl g USING (dim)
    GROUP BY p.source
    """,
    "per-source embedding drift: cosine between each source's "
    "centroid and the global centroid — the 'is this feed "
    "semantically off-distribution' check run before mixing a new "
    "crawl into training data.  Micro-quantized integer sums per "
    "(source, dim) make every aggregate exact (HUGEINT in DuckDB, "
    "long in Spark — products bounded by 64·(1e8)·(1e10) « 2^63), so "
    "the single double expression at the end sees IDENTICAL inputs "
    "in both engines.  Two aggregates over a 64×|docs| posexplode + "
    "a broadcast join of the 64-row global vector; at 100 TB the "
    "explode is the only wide pass and combines map-side",
)
def c58_source_embedding_drift(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = docs.join(emb, docs["doc_id"] == emb["vec_id"])
    q = j.select(
        "source",
        (F.posexplode(F.col("embedding"))).alias("dim0", "v")
    ).select("source", (F.col("dim0") + 1).alias("dim"),
             F.floor(F.col("v").cast("double") * 1000000)
             .cast("long").alias("qv"))
    per = q.groupBy("source", "dim").agg(F.sum("qv").alias("s_dim"))
    glob = q.groupBy("dim").agg(F.sum("qv").alias("g_dim"))
    return (per.join(F.broadcast(glob), "dim")
            .groupBy("source")
            .agg(F.floor(
                F.lit(1000000.0)
                * F.sum(F.col("s_dim") * F.col("g_dim")).cast("double")
                / (F.sqrt(F.sum(F.col("s_dim") * F.col("s_dim"))
                          .cast("double"))
                   * F.sqrt(F.sum(F.col("g_dim") * F.col("g_dim"))
                            .cast("double"))))
                .cast("long").alias("centroid_cos_ppm")))
