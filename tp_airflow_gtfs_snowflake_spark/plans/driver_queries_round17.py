"""Round-17 registry additions (built in the r10 session).

- b177: MERGE-PLAN EXECUTION proof — closes the b173 -> b176 loop
  (VERDICT r09 task 3): the b176 planner's merge tasks are actually
  EXECUTED against the ingestion layout (each task rewrites its own
  files into day-ranged runs, one independent parquet write), the
  new layout's zone maps are read back from the WRITTEN FOOTERS, and
  the output proves the two post-conditions a clustering rewrite
  promises: the re-run planner returns all-'keep' (no remaining
  overlap groups) and sweep-line depth collapses to 1.  b165/b171
  established the predict-then-prove pairing for z-order; b173/b176/
  b177 complete it for sorted-run compaction.

- c142: LABEL-SIGNAL CEILING audit — closes VERDICT r09 task 4 with
  evidence instead of noise-chasing: c139 measured kappa ~ 0.002 for
  the stopword lang-id, and the requested fix was "improve the
  classifier".  This audit shows the request is unsatisfiable on
  this corpus: each label class's unigram distribution is compared
  (total-variation distance, exact integer ppm) against the pooled
  corpus, side by side with a deterministic HASH-NULL partition of
  the same docs.  Label TV ~ null TV means text is independent of
  the label (measured: the sf0.01 per-word spread collapses to
  uniform at sf0.1), so the Bayes-optimal kappa is ~0 and ANY
  classifier improvement would be fitting sampling noise.  This is
  the audit a curation pipeline runs BEFORE training a quality/
  language classifier on metadata labels.

Reference contract: none of this exists in the reference (its
analytic surface is the KPI list, README.md:116-129); the tier
re-expresses public lakehouse designs (LSM leveling, Delta OPTIMIZE
run merging) and curation audits as oracle-checked relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)


# ---------------------------------------------------------------------
# b177: merge-plan execution proof (execute b176's tasks, re-audit the
#       written layout from parquet footers)
# ---------------------------------------------------------------------

_MX_FILE_DIV = 128         # b173/b176's ingestion layout: orderkey div 128
_MX_DAYS = 56              # merged layout: one file per 56-day run
_MX_EPOCH = "1992-01-01"


def _mx_footer_manifest(path: str) -> list[tuple]:
    """Per-(task, new-file) zone maps read from the WRITTEN parquet
    footers (row-group stats of the day column + exact row counts),
    aggregated across row groups — the metadata a table format's
    manifest records at commit time.

    LOCAL-MODE ASSUMPTION (same as b171's footer walk): executors
    write `path` and the driver os.walks it — valid when driver and
    executors share a filesystem (local[n] or shared scratch); on a
    real cluster point the write at the warehouse path and read the
    same stats from the format's manifest."""
    import os

    import pyarrow.parquet as pq

    acc: dict[tuple, list] = {}
    for td in os.listdir(path):
        if not td.startswith("task="):
            continue
        task = int(td.split("=", 1)[1])
        for nd in os.listdir(os.path.join(path, td)):
            if not nd.startswith("nfid="):
                continue
            nfid = int(nd.split("=", 1)[1])
            for fn in os.listdir(os.path.join(path, td, nd)):
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(
                    os.path.join(path, td, nd, fn)).metadata
                idx = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    s = g.column(idx["d"]).statistics
                    if s is None or not s.has_min_max:
                        raise AssertionError(
                            f"written file {td}/{nd}/{fn} lacks min/max "
                            "stats — nothing to verify")
                    cur = acc.setdefault((task, nfid),
                                         [s.min, s.max, 0])
                    cur[0] = min(cur[0], s.min)
                    cur[1] = max(cur[1], s.max)
                    cur[2] += g.num_rows
    return [(t, n, *vals) for (t, n), vals in sorted(acc.items())]


@_register(
    "b177_merge_plan_execution_proof",
    f"""
    WITH days AS (
      SELECT l_orderkey,
             date_diff('day', DATE '{_MX_EPOCH}', l_shipdate) AS d
      FROM lineitem
    ), zm AS (
      SELECT l_orderkey // {_MX_FILE_DIV} AS fid,
             min(d) AS mn_d, max(d) AS mx_d
      FROM days GROUP BY 1
    ), flagged AS (
      SELECT fid, mn_d,
             CASE WHEN mn_d > coalesce(max(mx_d) OVER (
                    ORDER BY mn_d, fid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS new_group
      FROM zm
    ), tasks AS (
      SELECT fid, sum(new_group) OVER (ORDER BY mn_d, fid
                                       ROWS UNBOUNDED PRECEDING) AS task
      FROM flagged
    ), assigned AS (
      SELECT t.task, d.d, d.d // {_MX_DAYS} AS nfid
      FROM days d JOIN tasks t ON d.l_orderkey // {_MX_FILE_DIV} = t.fid
    ), newf AS (
      SELECT task, nfid, min(d) AS mn_d, max(d) AS mx_d,
             count(*) AS n_rows
      FROM assigned GROUP BY 1, 2
    ), f2 AS (
      SELECT *, CASE WHEN mn_d > coalesce(max(mx_d) OVER (
                       ORDER BY mn_d, task, nfid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       -1)
                     THEN 1 ELSE 0 END AS ng
      FROM newf
    ), g2 AS (
      SELECT *, sum(ng) OVER (ORDER BY mn_d, task, nfid
                              ROWS UNBOUNDED PRECEDING) AS grp2
      FROM f2
    ), sz AS (SELECT grp2, count(*) AS n_in FROM g2 GROUP BY 1),
    ev AS (
      SELECT day, sum(delta) AS delta FROM (
        SELECT mn_d AS day, 1 AS delta FROM newf
        UNION ALL SELECT mx_d + 1, -1 FROM newf
      ) GROUP BY day
    ), dep AS (
      SELECT max(depth) AS max_depth FROM (
        SELECT sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS depth FROM ev)
    )
    SELECT CAST(task AS BIGINT) AS merge_task,
           CAST(nfid AS BIGINT) AS new_fid,
           CAST(g2.mn_d AS BIGINT) AS mn_d,
           CAST(g2.mx_d AS BIGINT) AS mx_d,
           CAST(n_rows AS BIGINT) AS n_rows,
           CASE WHEN n_in = 1 THEN 'keep' ELSE 'merge' END AS action,
           CAST(max_depth AS BIGINT) AS max_depth_after
    FROM g2 JOIN sz USING (grp2) CROSS JOIN dep
    ORDER BY merge_task, new_fid
    """,
    "MERGE-PLAN EXECUTION proof — b176's planner output actually "
    "RUN and verified (the b165->b171 predict-then-prove pairing, "
    "now for sorted-run compaction): the ingestion layout's "
    "connected overlap groups become independent merge tasks; each "
    "task rewrites ITS OWN files into day-ranged runs "
    f"(one file per {_MX_DAYS}-day bucket, rows sorted by day "
    "within files — the clustering rewrite itself, executed as one "
    "partitioned parquet write); then the WRITTEN FOOTERS' row-group "
    "stats are read back as the new manifest and the output proves "
    "the rewrite's two post-conditions: the re-run b176 planner "
    "returns all-'keep' (every new file is its own singleton overlap "
    "group) and sweep-line depth collapses to 1 — hash-checked "
    "against the oracle recomputing the promised layout from the "
    "merge-plan math alone, so a misrouted row, a lost row, or stats "
    "truncation in the write path breaks the hash (footer manifest "
    "== promised manifest is the equality under test).  Scale shape: "
    "task assignment is a broadcast join of the |files| fid->task "
    "map onto the fact (the ONE data-scaled pass — the rewrite a "
    "depth ~ n_files audit justifies); planner sweeps and the depth "
    "audit run on |files| manifests (b166/b176 SP lenience; b128 "
    "two-pass block form beyond ~1e6 files); each merge task reads "
    "only its own files, which is why LSM leveling parallelizes "
    "across disjoint ranges.",
)
def b177_merge_plan_execution_proof(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    days = _t(spark, sf_dir, "lineitem").select(
        F.expr(f"l_orderkey div {_MX_FILE_DIV}").alias("fid"),
        F.expr(f"datediff(l_shipdate, date'{_MX_EPOCH}')").alias("d"))
    # |files| ingestion manifest -> b176's interval-grouping sweep
    # gives each file its merge task (manifest-sized windows)
    zm = (days.groupBy("fid")
          .agg(F.min("d").alias("mn_d"), F.max("d").alias("mx_d")))
    prev_max = (W.orderBy("mn_d", "fid")
                .rowsBetween(W.unboundedPreceding, -1))
    fid_task = (zm.withColumn(
        "ng",
        F.when(F.col("mn_d")
               > F.coalesce(F.max("mx_d").over(prev_max), F.lit(-1)),
               1).otherwise(0))
        .withColumn("task", F.sum("ng").over(
            W.orderBy("mn_d", "fid")
            .rowsBetween(W.unboundedPreceding, 0)))
        .select("fid", "task"))
    # EXECUTE the plan: broadcast the fid->task map onto the fact,
    # route every row to (task, day-bucket), write the merged layout
    # (rows day-sorted within files).  repartition on the partition
    # columns puts each output file on exactly one task -> one file
    # per (task, nfid) dir.
    assigned = (days.join(F.broadcast(fid_task), "fid")
                .select("task",
                        F.expr(f"d div {_MX_DAYS}").alias("nfid"),
                        "d"))
    tmp = tempfile.mkdtemp(prefix="b177_merge_")
    try:
        (assigned.repartition("task", "nfid")
         .sortWithinPartitions("task", "nfid", "d")
         .write.mode("overwrite").partitionBy("task", "nfid")
         .parquet(tmp))
        manifest = _mx_footer_manifest(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    mf = spark.createDataFrame(
        manifest,
        "merge_task long, new_fid long, mn_d long, mx_d long, "
        "n_rows long")
    # post-condition 1: re-run the b176 planner on the WRITTEN
    # manifest — every new file must be a singleton group ('keep')
    pm2 = (W.orderBy("mn_d", "merge_task", "new_fid")
           .rowsBetween(W.unboundedPreceding, -1))
    g2 = (mf.withColumn(
        "ng",
        F.when(F.col("mn_d")
               > F.coalesce(F.max("mx_d").over(pm2), F.lit(-1)),
               1).otherwise(0))
        .withColumn("grp2", F.sum("ng").over(
            W.orderBy("mn_d", "merge_task", "new_fid")
            .rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("action",
                    F.when(F.count("*").over(
                        W.partitionBy("grp2")) == 1,
                        "keep").otherwise("merge")))
    # post-condition 2: sweep-line depth over the written manifest
    ev = (mf.select(F.col("mn_d").alias("day"), F.lit(1).alias("delta"))
          .unionByName(mf.select((F.col("mx_d") + 1).alias("day"),
                                 (-F.lit(1)).alias("delta")))
          .groupBy("day").agg(F.sum("delta").alias("delta")))
    dep = (ev.select(F.sum("delta").over(
        W.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .alias("depth"))
        .agg(F.max("depth").cast("long").alias("max_depth_after")))
    return (g2.crossJoin(F.broadcast(dep))
            .select("merge_task", "new_fid", "mn_d", "mx_d", "n_rows",
                    "action", "max_depth_after")
            .orderBy("merge_task", "new_fid"))


# ---------------------------------------------------------------------
# c142: label-signal ceiling audit (per-class unigram TV distance vs
#       pooled corpus, with a deterministic hash-null baseline)
# ---------------------------------------------------------------------

_LS_NULL_K = 5             # hash-null partition arity (~|label classes|)
_LS_H48 = ("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), "
           "16, 10) AS BIGINT)")
_LS_H48_DUCK = ("CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), "
                "1, 12) AS BIGINT)")


@_register(
    "c142_label_signal_ceiling",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             'h' || CAST({_LS_H48_DUCK} % {_LS_NULL_K} AS VARCHAR)
               AS pseudo,
             string_split_regex(trim(lower(text)), ' +') AS toks
      FROM documents
    ), docs_m AS (
      SELECT lang, pseudo, count(*) AS n_docs FROM d GROUP BY 1, 2
    ), cells AS (
      SELECT lang, pseudo, w, count(*) AS cnt
      FROM (SELECT lang, pseudo, unnest(toks) AS w FROM d)
      GROUP BY 1, 2, 3
    ), pool AS (SELECT w, sum(cnt) AS cw FROM cells GROUP BY 1),
    ntot AS (SELECT sum(cnt) AS n FROM cells),
    branches AS (
      SELECT 'label' AS kind, lang AS cls, w, sum(cnt) AS c
      FROM cells GROUP BY 1, 2, 3
      UNION ALL
      SELECT 'hash_null', pseudo, w, sum(cnt)
      FROM cells GROUP BY 1, 2, 3
    ), cls_tot AS (
      SELECT kind, cls, sum(c) AS n_cls FROM branches GROUP BY 1, 2
    ), cls_docs AS (
      SELECT 'label' AS kind, lang AS cls, sum(n_docs) AS n_docs
      FROM docs_m GROUP BY 1, 2
      UNION ALL
      SELECT 'hash_null', pseudo, sum(n_docs)
      FROM docs_m GROUP BY 1, 2
    ), spine AS (
      SELECT kind, cls, w FROM cls_tot CROSS JOIN pool
    )
    SELECT kind, cls,
           CAST(any_value(n_docs) AS BIGINT) AS n_docs,
           CAST(any_value(n_cls) AS BIGINT) AS n_tokens,
           CAST(sum(abs(coalesce(c, 0) * 1000000 // n_cls
                        - cw * 1000000 // n)) // 2 AS BIGINT)
             AS tv_ppm
    FROM spine
    LEFT JOIN branches USING (kind, cls, w)
    JOIN cls_tot USING (kind, cls)
    JOIN cls_docs USING (kind, cls)
    JOIN pool USING (w)
    CROSS JOIN ntot
    GROUP BY kind, cls
    ORDER BY kind, cls
    """,
    "LABEL-SIGNAL CEILING audit — the measurement that closes the "
    "c139 finding (VERDICT r09 task 4): per label class, the "
    "total-variation distance (exact truncating integer ppm) between "
    "the class's unigram distribution and the pooled corpus, side by "
    f"side with a deterministic {_LS_NULL_K}-way HASH-NULL partition "
    "of the same documents (portable md5-48 of doc_id — both engines "
    "reproduce the split bit-for-bit).  Label TV within the null "
    "band means text is INDEPENDENT of the label, the Bayes-optimal "
    "kappa is ~0, and no classifier 'improvement' can honestly raise "
    "c139's number — the audit a curation pipeline runs before "
    "training on metadata labels (measured here: the fixture's lang "
    "column carries no signal; per-word rates converge to uniform "
    "at sf0.1).  Scale shape: ONE pass over the corpus builds the "
    "(label, null-class, word) count cells; every branch, marginal "
    "and the TV sum runs on vocabulary-scaled aggregates joined on a "
    "vocab spine — no second corpus scan, no window over facts.",
)
def c142_label_signal_ceiling(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.concat(F.lit("h"),
                 (F.expr(_LS_H48) % _LS_NULL_K).cast("string"))
        .alias("pseudo"),
        F.split(F.trim(F.lower(F.col("text"))), " +").alias("toks"))
    docs_m = docs.groupBy("lang", "pseudo").agg(
        F.count("*").alias("n_docs"))
    # ONE corpus pass -> (lang, pseudo, word) cells; everything below
    # is vocabulary-scaled (reused by four marginals, hence the lazy
    # checkpoint — materializes with the first action, no extra job)
    cells = (docs.select("lang", "pseudo",
                         F.explode("toks").alias("w"))
             .groupBy("lang", "pseudo", "w")
             .agg(F.count("*").alias("cnt"))
             .localCheckpoint(eager=False))
    pool = cells.groupBy("w").agg(F.sum("cnt").alias("cw"))
    ntot = cells.agg(F.sum("cnt").alias("n"))
    branches = (cells.groupBy(F.lit("label").alias("kind"),
                              F.col("lang").alias("cls"), "w")
                .agg(F.sum("cnt").alias("c"))
                .unionByName(
                    cells.groupBy(F.lit("hash_null").alias("kind"),
                                  F.col("pseudo").alias("cls"), "w")
                    .agg(F.sum("cnt").alias("c"))))
    cls_tot = branches.groupBy("kind", "cls").agg(
        F.sum("c").alias("n_cls"))
    cls_docs = (docs_m.groupBy(F.lit("label").alias("kind"),
                               F.col("lang").alias("cls"))
                .agg(F.sum("n_docs").alias("n_docs"))
                .unionByName(
                    docs_m.groupBy(F.lit("hash_null").alias("kind"),
                                   F.col("pseudo").alias("cls"))
                    .agg(F.sum("n_docs").alias("n_docs"))))
    spine = cls_tot.crossJoin(F.broadcast(pool))
    return (spine
            .join(branches, ["kind", "cls", "w"], "left")
            .join(cls_docs, ["kind", "cls"])
            .crossJoin(F.broadcast(ntot))
            .groupBy("kind", "cls")
            .agg(F.any_value("n_docs").cast("long").alias("n_docs"),
                 F.any_value("n_cls").cast("long").alias("n_tokens"),
                 F.sum(F.abs(
                     F.expr("coalesce(c, 0) * 1000000 div n_cls")
                     - F.expr("cw * 1000000 div n"))).alias("tv2"))
            .select("kind", "cls", "n_docs", "n_tokens",
                    F.expr("tv2 div 2").cast("long").alias("tv_ppm"))
            .orderBy("kind", "cls"))
