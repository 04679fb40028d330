"""Round-14 registry additions (built in the r08 session, enter the
driver window in r09 behind the r08 cohort).

- b168: exact single-changepoint detection (binary segmentation's
  first split) over the daily event-revenue series — argmax of the
  between-group variance gain, computed from prefix sums so every
  candidate split is evaluated from O(1) aggregates.
- b169: partition-transform planning audit — the Iceberg/Delta
  partition-spec decision (day(ts) vs hash-bucket vs category) scored
  on partition count, size skew, and pruning selectivity for a
  declared workload predicate.
- c138: greedy max-coverage corpus selection (facility-location-style
  data selection): k rounds of "pick the document covering the most
  not-yet-covered shingles" — the classic submodular selection
  primitive behind coverage-driven training-data curation.

Reference contract: none of these exist in the reference (its
analytic surface is the KPI list, README.md:116-129); they extend the
charter's lakehouse-maintenance and LLM-curation tiers with public
designs (Iceberg partition transforms; binary segmentation, Scott &
Knott 1974; greedy max-coverage, Nemhauser et al. 1978).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)


# ---------------------------------------------------------------------
# b168: exact single changepoint over the daily revenue series
# ---------------------------------------------------------------------


@_register(
    "b168_changepoint_binary_segmentation",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ), pre AS (
      SELECT day, cents,
             sum(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS s1,
             row_number() OVER (ORDER BY day) AS n1,
             sum(cents) OVER () AS st,
             count(*) OVER () AS nt
      FROM daily
    ), cand AS (
      SELECT strftime(day, '%Y-%m-%d') AS split_day,
             CAST(n1 AS BIGINT) AS n_before,
             CAST(nt - n1 AS BIGINT) AS n_after,
             CAST(s1 AS BIGINT) AS sum_before_cents,
             CAST(st - s1 AS BIGINT) AS sum_after_cents,
             round(CAST(s1 * (nt - n1) - (st - s1) * n1 AS DOUBLE)
                   * CAST(s1 * (nt - n1) - (st - s1) * n1 AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * (nt - n1) * nt), 3)
               AS gain
      FROM pre WHERE n1 < nt
    ), ranked AS (
      SELECT *, max(gain) OVER () AS best FROM cand
    )
    SELECT split_day, n_before, n_after,
           sum_before_cents, sum_after_cents, gain,
           CAST(CASE WHEN gain = best AND split_day =
                  min(CASE WHEN gain = best THEN split_day END) OVER ()
                THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM ranked ORDER BY split_day
    """,
    "EXACT SINGLE-CHANGEPOINT detection (the first split of binary "
    "segmentation, Scott & Knott 1974) over the daily event-revenue "
    "series: for every candidate split k the between-group variance "
    "gain  (S1*n2 - S2*n1)^2 / (n1*n2*n)  is computed from PREFIX "
    "SUMS, so all |days|-1 candidates cost one running-sum window "
    "over the daily aggregate — never a per-split rescan.  Sums stay "
    "exact BIGINT cents; only the final ranking ratio is IEEE double "
    "(identical op sequence in both engines, rounded to 3dp; the "
    "min-day tiebreak pins equal-gain ties).  Output is the full "
    "candidate relation with the argmax flagged — the audit view a "
    "monitoring pipeline thresholds on.  Scale shape: the fact "
    "collapses to |days| rows in ONE aggregate; the prefix window is "
    "single-partition over that calendar-bounded relation (reviewed "
    "in _SP_ORDERING_REVIEWED); at 100 TB the same plan holds with "
    "day -> (series, day) and the window partitioned by series.",
)
def b168_changepoint_binary_segmentation(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
                  .cast("long").alias("cents")))
    wo = W.orderBy("day")
    pre = daily.select(
        "day", "cents",
        F.sum("cents").over(
            wo.rowsBetween(W.unboundedPreceding, 0)).alias("s1"),
        F.row_number().over(wo).alias("n1"),
        F.sum("cents").over(
            W.rowsBetween(W.unboundedPreceding,
                          W.unboundedFollowing)).alias("st"),
        F.count("*").over(
            W.rowsBetween(W.unboundedPreceding,
                          W.unboundedFollowing)).alias("nt"))
    cand = (pre.filter(F.col("n1") < F.col("nt"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("split_day"),
                    F.col("n1").cast("long").alias("n_before"),
                    (F.col("nt") - F.col("n1")).cast("long")
                    .alias("n_after"),
                    F.col("s1").cast("long").alias("sum_before_cents"),
                    (F.col("st") - F.col("s1")).cast("long")
                    .alias("sum_after_cents"),
                    F.round(
                        F.expr("CAST(s1 * (nt - n1) - (st - s1) * n1 "
                               "AS DOUBLE)")
                        * F.expr("CAST(s1 * (nt - n1) - (st - s1) * n1 "
                                 "AS DOUBLE)")
                        / F.expr("CAST(n1 AS DOUBLE) * (nt - n1) * nt"),
                        3).alias("gain")))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = cand.withColumn("best", F.max("gain").over(wall))
    first_best = F.min(F.when(F.col("gain") == F.col("best"),
                              F.col("split_day"))).over(wall)
    return (ranked.withColumn(
        "is_best",
        F.when((F.col("gain") == F.col("best"))
               & (F.col("split_day") == first_best), 1)
        .otherwise(0).cast("long"))
        .drop("best")
        .orderBy("split_day"))


# ---------------------------------------------------------------------
# b169: partition-transform planning audit
# ---------------------------------------------------------------------

_PT_LO = "2024-01-08"
_PT_HI = "2024-01-15"          # [lo, hi): a 7-day workload window
_PT_BUCKETS = 16


def _pt_audit_sql(transform: str, part: str) -> str:
    return f"""
      SELECT '{transform}' AS transform,
             CAST(count(*) AS BIGINT) AS n_partitions,
             CAST(sum(cnt) AS BIGINT) AS rows_total,
             CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT)
               AS max_part_ppm,
             CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS parts_touched,
             CAST(sum(CASE WHEN hits > 0 THEN cnt ELSE 0 END)
                  * 1000000 // sum(cnt) AS BIGINT) AS scan_ppm,
             CAST(sum(hits) * 1000000
                  // greatest(sum(CASE WHEN hits > 0 THEN cnt
                                  ELSE 0 END), 1) AS BIGINT)
               AS scan_precision_ppm
      FROM (
        SELECT {part} AS part, count(*) AS cnt,
               sum(CASE WHEN ts >= TIMESTAMP '{_PT_LO}'
                         AND ts < TIMESTAMP '{_PT_HI}'
                    THEN 1 ELSE 0 END) AS hits
        FROM events GROUP BY 1)
    """


@_register(
    "b169_partition_transform_audit",
    f"""
    SELECT * FROM ({_pt_audit_sql('bucket16_user',
                                  f'user_id % {_PT_BUCKETS}')})
    UNION ALL
    SELECT * FROM ({_pt_audit_sql('day_ts', 'CAST(ts AS DATE)')})
    UNION ALL
    SELECT * FROM ({_pt_audit_sql('type', 'event_type')})
    ORDER BY transform
    """,
    "PARTITION-TRANSFORM planning audit — the Iceberg partition-spec "
    "/ Delta partition-column decision, scored before any data is "
    "laid out: three candidate transforms (day(ts), "
    f"{_PT_BUCKETS}-way user-id bucket, event-type category) are "
    "each evaluated with ONE narrow aggregate producing the "
    "per-partition manifest (count + workload-predicate hits), then "
    "audited on partition count, size skew (largest-partition ppm), "
    "and pruning behavior for a declared 7-day time-range workload: "
    "parts_touched / scan_ppm (how much data a pruned scan still "
    "reads) and scan_precision_ppm (how much of the scanned data "
    "actually matches).  day(ts) prunes the time workload to "
    "exactly its week at precision 1e6; the bucket and category "
    "transforms touch every partition — the audit makes that "
    "trade-off a number instead of a guess.  Scale shape: each "
    "candidate costs one aggregate to |partitions| rows; nothing "
    "data-scaled survives the first GROUP BY, and the audit is "
    "exactly the dry-run a table-format migration runs per candidate "
    "spec before committing a 100 TB rewrite.",
)
def b169_partition_transform_audit(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("ts", "user_id", "event_type")
    lo = F.lit(_PT_LO).cast("timestamp")
    hi = F.lit(_PT_HI).cast("timestamp")

    def audit(part_col, transform: str) -> DataFrame:
        parts = (ev.groupBy(part_col.alias("part"))
                 .agg(F.count("*").alias("cnt"),
                      F.sum(F.when((F.col("ts") >= lo)
                                   & (F.col("ts") < hi), 1)
                            .otherwise(0)).alias("hits")))
        touched = F.col("hits") > 0
        return (parts.agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.sum("cnt").cast("long").alias("rows_total"),
            F.expr("max(cnt) * 1000000 div sum(cnt)").cast("long")
            .alias("max_part_ppm"),
            F.sum(F.when(touched, 1).otherwise(0)).cast("long")
            .alias("parts_touched"),
            F.expr("sum(CASE WHEN hits > 0 THEN cnt ELSE 0 END) "
                   "* 1000000 div sum(cnt)").cast("long")
            .alias("scan_ppm"),
            F.expr("sum(hits) * 1000000 div greatest(sum(CASE WHEN "
                   "hits > 0 THEN cnt ELSE 0 END), 1)").cast("long")
            .alias("scan_precision_ppm"))
            .select(F.lit(transform).alias("transform"), "*"))

    return (audit(F.col("user_id") % _PT_BUCKETS, "bucket16_user")
            .unionByName(audit(F.to_date("ts"), "day_ts"))
            .unionByName(audit(F.col("event_type"), "type"))
            .orderBy("transform"))


# ---------------------------------------------------------------------
# c138: greedy max-coverage corpus selection
# ---------------------------------------------------------------------

_MC_K = 5


def _mc_round_sql(i: int) -> str:
    """Round i: pick the doc with the largest not-yet-covered shingle
    gain (tiebreak min doc_id), then extend the covered set."""
    prev_cov = (f"cov{i - 1}" if i > 1 else
                "(SELECT NULL AS sh WHERE 1 = 0)")
    prev_picks = " UNION ALL ".join(
        f"SELECT doc_id FROM p{j}" for j in range(1, i)) or \
        "SELECT NULL AS doc_id WHERE 1 = 0"
    return f"""
    g{i} AS (
      SELECT s.doc_id, count(*) AS gain
      FROM sh s
      WHERE s.sh NOT IN (SELECT sh FROM {prev_cov})
        AND s.doc_id NOT IN ({prev_picks})
      GROUP BY s.doc_id
    ), p{i} AS (
      SELECT doc_id, gain FROM g{i}
      ORDER BY gain DESC, doc_id LIMIT 1
    ), cov{i} AS (
      SELECT sh FROM {prev_cov}
      UNION
      SELECT s.sh FROM sh s JOIN p{i} USING (doc_id)
    )"""


@_register(
    "c138_greedy_max_coverage_selection",
    f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), ' +') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS sh
      FROM t WHERE len(toks) >= 3
    ), tot AS (SELECT count(DISTINCT sh) AS n FROM sh)
    {"".join("," + _mc_round_sql(i) for i in range(1, _MC_K + 1))}
    SELECT * FROM (
      {" UNION ALL ".join(
          f'''SELECT {i} AS pick_rank,
                     CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(gain AS BIGINT) AS gain,
                     CAST((SELECT count(*) FROM cov{i}) * 1000000
                          // (SELECT n FROM tot) AS BIGINT)
                       AS coverage_ppm
              FROM p{i}''' for i in range(1, _MC_K + 1))})
    ORDER BY pick_rank
    """,
    "GREEDY MAX-COVERAGE corpus selection — the submodular data-"
    "selection primitive (Nemhauser et al. 1978: the greedy pick is "
    "a (1-1/e)-approximation of the optimal k-subset): "
    f"{_MC_K} rounds of 'take the document covering the most "
    "not-yet-covered 3-gram shingles' (tiebreak min doc_id), "
    "reporting each pick's marginal gain and the cumulative corpus "
    "coverage ppm — how coverage-driven curation picks seed/eval "
    "subsets.  Scale shape: the shingle relation builds once and is "
    "reused every round (lazy checkpoint — cut lineage, no rescan); "
    "each round is one broadcast anti-join against the covered set "
    "(bounded: shingles of at most k picked docs), one groupBy(doc), "
    "and a TakeOrdered(1); the single-row argmax collect per round "
    "is k-bounded driver state, the same posture as the BPE merge "
    "loop.  The covered set stays k-doc-bounded so the broadcast "
    "never grows with the corpus.",
)
def c138_greedy_max_coverage_selection(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        _shingle_rows)
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
        _spread)

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    # distinct (doc, shingle) rows, built once, reused k+1 times
    sh = (_shingle_rows(docs, "doc_id", "text", 3)
          .distinct().localCheckpoint(eager=False))
    total = sh.select("sh").distinct().count()

    picked: list[int] = []
    out_rows = []
    covered = 0
    for rank in range(1, _MC_K + 1):
        remaining = sh.filter(~F.col("doc_id").isin(picked)) \
            if picked else sh
        cov = (sh.filter(F.col("doc_id").isin(picked))
               .select("sh").distinct()) if picked else None
        gains = remaining if cov is None else remaining.join(
            F.broadcast(cov), "sh", "left_anti")
        top = (gains.groupBy("doc_id")
               .agg(F.count("*").alias("gain"))
               .orderBy(F.desc("gain"), "doc_id")
               .limit(1).collect())  # 1 row: k-bounded driver state
        if not top:
            break
        doc_id, gain = int(top[0]["doc_id"]), int(top[0]["gain"])
        picked.append(doc_id)
        covered += gain
        out_rows.append((rank, doc_id, gain,
                         covered * 1_000_000 // total))
    return spark.createDataFrame(
        out_rows,
        "pick_rank int, doc_id long, gain long, coverage_ppm long")
