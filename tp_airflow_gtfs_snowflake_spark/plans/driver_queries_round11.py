"""Round-11 registry additions (driver round 6).

b155 gives the custom Python DataSource stream reader
(sources/py_datasource.py, GtfsRtSnapshotStreamReader) the same hard
driver signal b134 gave the file-source ingest path: a checkpoint
restart across the reference's PATTERN/PURGE landing lifecycle
(dags/gtfs_rt_minutely.py:225-257 — snapshots land, are loaded, then
purged; a producer retry may re-deliver an already-loaded name).  The
r05 ADVICE fixed a latestOffset clamp in exactly this path; this query
makes that class of regression flip a value hash:

- phase 1 lands 4 JSON-lines snapshot files (vp_01..04), an
  availableNow micro-batch ingest writes them to an epoch-partitioned
  sink;
- the landing dir is then PURGED (all files deleted) and the stream
  restarts from the same checkpoint over the EMPTY dir — a reader
  whose latestOffset regresses below the committed name-watermark
  here poisons the checkpoint;
- phase 2 re-delivers an already-ingested name (vp_02, verbatim
  content) alongside 4 new files (vp_05..08) and restarts again.
  Exactly-once requires the re-delivered vp_02 to be skipped (its
  name is <= the watermark) and each new file to land once; any
  re-admission lands under a fresh ingest epoch and doubles counts.

The oracle is plain batch SQL over events: it matches iff the sink
holds every source row exactly once.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)

_B155_LINE_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value_cents", T.LongType()),
    T.StructField("ts_us", T.LongType()),
])


def _b155_export_snapshots(ev: DataFrame, export_dir: str) -> dict:
    """Render events as 8 JSON-lines snapshot files (fidx = event_id %
    8) in ONE Spark job: repartition(8, fidx) puts each fidx in
    exactly one task, so partitionBy(fidx) writes exactly one part
    file per directory — no driver-side row materialization."""
    lines = ev.select(
        (F.col("event_id") % 8).alias("fidx"),
        F.to_json(F.struct(
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 100).cast("long")
            .alias("value_cents"),
            F.unix_micros("ts").alias("ts_us"),
        )).alias("value"))
    (lines.repartition(8, "fidx")
     .write.partitionBy("fidx").text(export_dir))
    parts = {}
    for k in range(8):
        d = os.path.join(export_dir, f"fidx={k}")
        files = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(files) == 1, (d, files)
        parts[k] = os.path.join(d, files[0])
    return parts


@_register(
    "b155_streaming_datasource_restart",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT event_id % 8) AS BIGINT) AS n_src_files,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Exactly-once ingest through the CUSTOM Python DataSource stream "
    "reader (format gtfs_rt_snapshots) across checkpoint restarts, a "
    "full landing PURGE, and a re-delivered already-ingested file "
    "name — the reference's PATTERN/PURGE snapshot lifecycle "
    "(dags/gtfs_rt_minutely.py:225-257) made driver-hash-checkable.  "
    "events is rendered as 8 JSON-lines snapshots; phase 1 ingests "
    "vp_01..04, the dir is purged and the "
    "stream restarted over the EMPTY dir (latestOffset must not "
    "regress below the committed name-watermark), then vp_02 is "
    "re-delivered verbatim alongside new vp_05..08.  The sink is "
    "epoch-partitioned (dynamic overwrite), so any replay or "
    "re-admission lands under a fresh epoch and doubles n_events — "
    "the oracle (batch SQL over events) matches iff every row landed "
    "exactly once.  Scale shape: snapshot payloads are only ever read "
    "executor-side (one InputPartition per file); the driver sees "
    "names, never bytes.",
)
def b155_streaming_datasource_restart(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.sources import py_datasource
    py_datasource.register(spark)

    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="b155_pyds_")
    landing = os.path.join(base, "landing")
    export = os.path.join(base, "export")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing)
    parts = _b155_export_snapshots(ev, export)

    def land(k: int, name: str) -> None:
        shutil.copyfile(parts[k], os.path.join(landing, name))

    def run() -> None:
        # No maxFilesPerBatch: under availableNow the engine snapshots
        # latestOffset() ONCE as the drain target, so a capped reader
        # stops after a single capped batch per run (files are picked
        # up by the next run, but this query asserts full drain per
        # phase).  The cap path is exercised by pytest instead.
        stream = (spark.readStream.format("gtfs_rt_snapshots")
                  .option("path", landing).load())

        def write(batch: DataFrame, epoch_id: int) -> None:
            rows = (batch
                    .select(F.explode(F.split("feed_json", "\n"))
                            .alias("line"))
                    .filter(F.length("line") > 0)
                    .select(F.from_json("line", _B155_LINE_SCHEMA)
                            .alias("r"))
                    .select("r.*"))
            (rows.withColumn("ingest_epoch",
                             F.lit(int(epoch_id)).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("ingest_epoch").parquet(sink))

        q = (stream.writeStream.foreachBatch(write)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # phase 1: vp_01..04
    for k in range(4):
        land(k, f"vp_{k + 1:02d}.json")
    run()
    # PURGE (the reference deletes loaded snapshots) + restart over
    # the empty dir: the committed name-watermark must survive
    for f in os.listdir(landing):
        os.remove(os.path.join(landing, f))
    run()
    # phase 2: producer retry re-delivers vp_02 verbatim + 4 new files
    land(1, "vp_02.json")
    for k in range(4, 8):
        land(k, f"vp_{k + 1:02d}.json")
    run()

    return (spark.read.parquet(sink)
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("user_id").cast("long")
                 .alias("n_users"),
                 F.countDistinct(F.col("event_id") % 8).cast("long")
                 .alias("n_src_files"),
                 F.sum("value_cents").cast("long").alias("value_cents"),
                 F.max("ts_us").cast("long").alias("max_ts_us"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------
# b156: MIPS with Cauchy-Schwarz norm pruning (exact, integer grid)
# ---------------------------------------------------------------------


@_register(
    "b156_mips_norm_pruned_topk",
    """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 50) AS BIGINT)
                    * ((1 + vec_id % 15) * (1 + vec_id % 15))) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             list_sum(list_transform(v, x -> x * x)) AS nsq
      FROM e
    ), q AS (
      SELECT vec_id AS q_id, v AS qv, nsq AS q_nsq
      FROM n WHERE vec_id < 5
    ), seeds AS (
      SELECT vec_id, v FROM n ORDER BY nsq DESC, vec_id LIMIT 50
    ), seed_dots AS (
      SELECT q.q_id, s.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> s.v[i] * q.qv[i])) AS ip
      FROM seeds s, q
    ), lb AS (
      SELECT q_id, ip AS l FROM (
        SELECT q_id, ip,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY ip DESC, vec_id) AS rn
        FROM seed_dots) WHERE rn = 10
    ), cand AS (
      SELECT q.q_id, n.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> n.v[i] * q.qv[i])) AS ip
      FROM n JOIN q ON true JOIN lb ON lb.q_id = q.q_id
      WHERE lb.l < 0 OR n.nsq * q.q_nsq >= lb.l * lb.l
    ), stats AS (
      SELECT q_id, count(*) AS n_scanned FROM cand GROUP BY q_id
    ), ranked AS (
      SELECT q_id, vec_id, ip,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY ip DESC, vec_id) AS rn
      FROM cand
    )
    SELECT r.q_id AS q_id, r.vec_id AS vec_id,
           CAST(r.ip AS BIGINT) AS ip,
           CAST(r.rn AS BIGINT) AS rank,
           CAST(s.n_scanned AS BIGINT) AS n_scanned
    FROM ranked r JOIN stats s ON s.q_id = r.q_id
    WHERE r.rn <= 10
    ORDER BY q_id, rank
    """,
    "Exact maximum-inner-product search (MIPS) top-10 for 5 query "
    "vectors with CAUCHY-SCHWARZ NORM PRUNING — the two-phase bound "
    "that makes exact MIPS tractable at corpus scale: phase 1 scores "
    "a small deterministic seed set (the 50 highest-norm vectors) to obtain a "
    "lower bound L (the seeds' 10th-best dot); phase 2 computes dots "
    "ONLY for vectors whose norm product can beat it (nsq_v * nsq_q "
    ">= L^2, since ip <= |v||q|), which any excluded vector provably "
    "cannot.  Embeddings quantize to a c26c-style integer grid "
    "(round(x*50)) and are scaled by a deterministic per-vector "
    "weight (1 + vec_id % 15)^2 — MIPS (as opposed to cosine ANN) "
    "is the retrieval problem precisely when norms vary "
    "(popularity-scaled recommender item vectors), and the weight "
    "reproduces that regime; phase-1 seeds are the 50 highest-norm "
    "vectors (TakeOrdered), the high-yield probe set.  Every dot, "
    "norm and bound is exact int64 on both engines (bound products "
    "~2e14 << 2^63); measured pruning at sf0.01: 27-34% of the "
    "corpus never reaches the dot product.  n_scanned audits the "
    "pruning rate per query.  Scale shape: norms are a narrow map "
    "stored beside the vectors; phase 2 is a broadcast of 5 (query, "
    "bound) rows against the corpus scan with the dot computed only "
    "on bound survivors, then TakeOrdered per query — the classic "
    "norm-filtered exact-MIPS plan.",
)
def b156_mips_norm_pruned_topk(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    w = (F.lit(1) + F.col("vec_id") % 15) * (F.lit(1) + F.col("vec_id") % 15)
    qi = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.round(x * 50).cast("long") * w)
    n = emb.select(
        "vec_id", qi.alias("v")).select(
        "vec_id", "v",
        F.aggregate("v", F.lit(0).cast("long"),
                    lambda acc, x: acc + x * x).alias("nsq"))
    q = (n.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("nsq").alias("q_nsq")))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0).cast("long"),
                           lambda acc, x: acc + x)

    # phase-1 seeds: the 50 highest-norm vectors (TakeOrdered — the
    # cheap high-yield probe set, since high-norm vectors dominate
    # large inner products in a variable-norm corpus)
    seeds = (n.orderBy(F.desc("nsq"), "vec_id").limit(50)
             .select("vec_id", "v")
             .crossJoin(F.broadcast(q))
             .select("q_id", "vec_id",
                     dot(F.col("v"), F.col("qv")).alias("ip")))
    w_topk = W.partitionBy("q_id").orderBy(F.desc("ip"), "vec_id")
    lb = (seeds.withColumn("rn", F.row_number().over(w_topk))
          .filter(F.col("rn") == 10)
          .select("q_id", F.col("ip").alias("l")))
    bounds = F.broadcast(q.join(lb, "q_id"))
    cand = (n.crossJoin(bounds)
            .filter((F.col("l") < 0)
                    | (F.col("nsq") * F.col("q_nsq")
                       >= F.col("l") * F.col("l")))
            .select("q_id", "vec_id",
                    dot(F.col("v"), F.col("qv")).alias("ip")))
    cand = cand.localCheckpoint(eager=False)  # ranked + stats both consume it
    stats = cand.groupBy("q_id").agg(
        F.count("*").cast("long").alias("n_scanned"))
    return (cand.withColumn("rn", F.row_number().over(w_topk))
            .filter(F.col("rn") <= 10)
            .join(F.broadcast(stats), "q_id")
            .select("q_id", "vec_id", F.col("ip").cast("long").alias("ip"),
                    F.col("rn").cast("long").alias("rank"), "n_scanned")
            .orderBy("q_id", "rank"))


# ---------------------------------------------------------------------
# b157: shuffle-skew audit + salt-factor recommendation
# ---------------------------------------------------------------------

_B157_H = 32  # modeled shuffle partition count


@_register(
    "b157_skew_salt_audit",
    f"""
    WITH k AS (
      SELECT event_type, count(*) AS n
      FROM events GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total FROM k
    ), keyed AS (
      SELECT event_type, n,
             CAST('0x' || substr(md5('k:' || event_type), 1, 12)
                  AS BIGINT) % {_B157_H} AS part,
             CAST(greatest(1::BIGINT,
                      (n * {_B157_H} + total - 1) // total)
                  AS BIGINT) AS salt
      FROM k, tot
    ), unsalted AS (
      SELECT max(load) AS max_load FROM (
        SELECT part, sum(n) AS load FROM keyed GROUP BY part)
    ), shards AS (
      SELECT event_type, salt, j.j,
             n // salt + CASE WHEN j.j < n % salt THEN 1 ELSE 0 END
               AS shard_n,
             CAST('0x' || substr(md5('k:' || event_type || '#'
                  || CAST(j.j AS VARCHAR)), 1, 12) AS BIGINT)
               % {_B157_H} AS part
      FROM keyed, lateral (SELECT unnest(range(0, salt)) AS j) j
    ), salted AS (
      SELECT max(load) AS max_load FROM (
        SELECT part, sum(shard_n) AS load FROM shards GROUP BY part)
    )
    SELECT k.event_type,
           CAST(k.n AS BIGINT) AS n_rows,
           CAST(keyed.salt AS BIGINT) AS salt_factor,
           CAST(u.max_load * 1000000 // t.total AS BIGINT)
             AS max_load_unsalted_ppm,
           CAST(s.max_load * 1000000 // t.total AS BIGINT)
             AS max_load_salted_ppm
    FROM k JOIN keyed USING (event_type),
         unsalted u, salted s, tot t
    ORDER BY k.event_type
    """,
    "Shuffle-skew audit with a SALT-FACTOR recommendation — the "
    "scale-engineering calculation behind every 'salting for skew' "
    "decision, run as a query: per groupBy key (event_type), the "
    "modeled hash-partition assignment (portable md5-48 % 32) gives "
    "the max partition load without salting; the recommended salt = "
    "ceil(key_rows * H / total) splits each key into near-equal "
    "shards re-hashed on (key, salt), and the same model gives the "
    "post-salting max load.  All integer (loads in ppm of total).  "
    "Scale shape: ONE hash agg collapses the corpus to |keys| rows; "
    "every remaining step (shard explode, partition-load sums) runs "
    "on |keys| x salt rows — the audit a 100 TB job would run BEFORE "
    "choosing its shuffle strategy, costing one pass.  The hot-key "
    "diagnosis mirrors AQE skew-join detection, but ahead of time "
    "and for aggregations rather than joins.",
)
def b157_skew_salt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.kmv import portable_hash48
    ev = _t(spark, sf_dir, "events")
    h = _B157_H
    k = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    k = k.localCheckpoint(eager=False)  # tiny (|keys| rows); 4 branches consume it
    tot = k.agg(F.sum("n").alias("total"))
    keyed = (k.crossJoin(F.broadcast(tot))
             .select("event_type", "n", "total",
                     (portable_hash48(F.concat(F.lit("k:"),
                                               F.col("event_type")))
                      % h).alias("part"),
                     F.greatest(
                         F.lit(1).cast("long"),
                         F.expr(f"(n * {h} + total - 1) div total"))
                     .alias("salt")))
    unsalted = (keyed.groupBy("part").agg(F.sum("n").alias("load"))
                .agg(F.max("load").alias("max_load_u")))
    shards = (keyed
              .select("event_type", "n", "salt",
                      F.explode(F.sequence(F.lit(0),
                                           F.col("salt") - 1)).alias("j"))
              .select(
                  (portable_hash48(F.concat(
                      F.lit("k:"), F.col("event_type"), F.lit("#"),
                      F.col("j").cast("string"))) % h).alias("part"),
                  (F.expr("n div salt")
                   + F.when(F.col("j") < F.expr("n % salt"), 1)
                   .otherwise(0)).alias("shard_n")))
    salted = (shards.groupBy("part").agg(F.sum("shard_n").alias("load"))
              .agg(F.max("load").alias("max_load_s")))
    return (keyed
            .crossJoin(F.broadcast(unsalted))
            .crossJoin(F.broadcast(salted))
            .select("event_type",
                    F.col("n").cast("long").alias("n_rows"),
                    F.col("salt").cast("long").alias("salt_factor"),
                    F.expr("max_load_u * 1000000 div total").cast("long")
                    .alias("max_load_unsalted_ppm"),
                    F.expr("max_load_s * 1000000 div total").cast("long")
                    .alias("max_load_salted_ppm"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------
# b158: incremental aggregate maintenance with retractions
# ---------------------------------------------------------------------


@_register(
    "b158_incremental_agg_retraction",
    """
    WITH latest AS (
      SELECT event_type, value_cents FROM (
        SELECT user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS value_cents,
               row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(value_cents) AS BIGINT) AS total_cents
    FROM latest GROUP BY event_type ORDER BY event_type
    """,
    "Incremental materialized-view maintenance WITH RETRACTIONS: the "
    "view is sum-of-each-user's-LATEST-value per event_type — the "
    "metric class (latest-wins upserts feeding an aggregate) where "
    "naive append-only increments are WRONG, because a user's new "
    "version must retract their previous contribution, possibly from "
    "a DIFFERENT group.  The engine maintains the view "
    "incrementally: base = events with event_id % 4 != 0 aggregated "
    "once; the delta (event_id % 4 = 0) yields +1/-1 user-count and "
    "+v/-v sum ADJUSTMENTS only for users whose latest row changes "
    "(retract from the old row's type, add to the winner's type); "
    "final = base aggregate unioned with adjustments and re-summed.  "
    "The oracle recomputes the view FROM SCRATCH over all events — "
    "it matches iff the delta algebra (retract/add pairing, "
    "latest-wins tiebreak ts DESC, event_id DESC) is exact.  Scale "
    "shape: the delta path touches |delta users| state rows via one "
    "equi-join against the base latest-per-user state (itself "
    "incrementally maintainable), never rescanning the base facts — "
    "the standard streaming-matview algebra (additive groups with "
    "retractions).",
)
def b158_incremental_agg_retraction(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", "user_id", "event_type",
                  F.floor(F.col("value") * 100).cast("long")
                  .alias("value_cents"),
                  F.unix_micros("ts").alias("ts_us")))
    base = ev.filter(F.col("event_id") % 4 != 0)
    delta = ev.filter(F.col("event_id") % 4 == 0)

    def latest_per_user(df: DataFrame) -> DataFrame:
        w = W.partitionBy("user_id").orderBy(F.desc("ts_us"),
                                             F.desc("event_id"))
        return (df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "event_type", "value_cents",
                        "ts_us", "event_id"))

    # the maintained state: base latest-per-user + its aggregate
    base_state = latest_per_user(base).localCheckpoint(eager=False)
    base_agg = (base_state.groupBy("event_type")
                .agg(F.count("*").alias("d_users"),
                     F.sum("value_cents").alias("d_cents")))

    # delta processing: one equi-join of delta-latest against state
    delta_latest = latest_per_user(delta)
    joined = (delta_latest.alias("d")
              .join(base_state.alias("b"), "user_id", "left"))
    delta_wins = ((F.col("b.event_id").isNull())
                  | (F.col("d.ts_us") > F.col("b.ts_us"))
                  | ((F.col("d.ts_us") == F.col("b.ts_us"))
                     & (F.col("d.event_id") > F.col("b.event_id"))))
    # winners feed BOTH the retract and the add branch — checkpoint
    # the |changed users| rows so the delta facts are scanned once
    winners = (joined.filter(delta_wins)
               .select(F.col("d.event_type").alias("new_type"),
                       F.col("d.value_cents").alias("new_cents"),
                       F.col("b.event_type").alias("old_type"),
                       F.col("b.value_cents").alias("old_cents"))
               .localCheckpoint(eager=False))
    # retraction rows (old contribution out) + addition rows (new in)
    retract = (winners.filter(F.col("old_type").isNotNull())
               .select(F.col("old_type").alias("event_type"),
                       F.lit(-1).alias("d_users"),
                       (-F.col("old_cents")).alias("d_cents")))
    add = (winners
           .select(F.col("new_type").alias("event_type"),
                   F.lit(1).alias("d_users"),
                   F.col("new_cents").alias("d_cents")))
    return (base_agg.unionByName(retract).unionByName(add)
            .groupBy("event_type")
            .agg(F.sum("d_users").cast("long").alias("n_users"),
                 F.sum("d_cents").cast("long").alias("total_cents"))
            .filter(F.col("n_users") > 0)
            .orderBy("event_type"))


# ---------------------------------------------------------------------
# c132: exact average precision (ranking eval, blocked ranks)
# ---------------------------------------------------------------------


@_register(
    "c132_average_precision",
    """
    WITH scored AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ), ranked AS (
      SELECT pos,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r,
             sum(pos) OVER (ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos
      FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN pos = 1
                         THEN cum_pos * 1000000 // r ELSE 0 END)
                // sum(pos) AS BIGINT) AS ap_ppm
    FROM ranked
    """,
    "Exact average precision (AP / area under the PR curve at "
    "positive ranks) of a monotone 'model' (score = n_chars, tie "
    "break doc_id) against the lang='en' label — the ranking-eval "
    "twin of b149's calibration bins; integer-ppm precision at every "
    "positive rank, truncating mean over positives.  The ORACLE uses "
    "the textbook global-window form; the ENGINE computes identical "
    "ranks WITHOUT a global sort: rank(d) = (# docs with higher "
    "n_chars, from a broadcast score-histogram cumulative) + (# docs "
    "tied on n_chars with doc_id <= d, a doc-partitioned window), "
    "and cum_pos decomposes the same way — the b123 blocked-rank "
    "discipline, so the plan survives a corpus whose global sort "
    "would be the bottleneck.  One histogram shuffle + one "
    "tie-partitioned window; the final AP is a single aggregate.",
)
def c132_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", "n_chars",
                    F.when(F.col("lang") == "en", 1).otherwise(0)
                    .alias("pos")))
    docs = docs.localCheckpoint(eager=False)  # histogram + rank join share it
    hist = (docs.groupBy("n_chars")
            .agg(F.count("*").alias("cnt"), F.sum("pos").alias("pcnt")))
    w_hi = (W.orderBy(F.desc("n_chars"))
            .rowsBetween(W.unboundedPreceding, -1))
    cums = hist.select(
        "n_chars",
        F.coalesce(F.sum("cnt").over(w_hi), F.lit(0)).alias("n_higher"),
        F.coalesce(F.sum("pcnt").over(w_hi), F.lit(0)).alias("p_higher"))
    w_tie = (W.partitionBy("n_chars").orderBy("doc_id")
             .rowsBetween(W.unboundedPreceding, 0))
    ranked = (docs.join(F.broadcast(cums), "n_chars")
              .select("pos",
                      (F.col("n_higher")
                       + F.count("*").over(w_tie)).alias("r"),
                      (F.col("p_higher")
                       + F.sum("pos").over(w_tie)).alias("cum_pos")))
    return ranked.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.expr("sum(CASE WHEN pos = 1 THEN cum_pos * 1000000 div r "
               "ELSE 0 END) div sum(pos)").cast("long").alias("ap_ppm"))


# ---------------------------------------------------------------------
# b159: q-digest quantile sketch (deterministic, mergeable)
# ---------------------------------------------------------------------

_QD_L = 16                 # tree depth: leaves = value domain [0, 2^16)
_QD_U = 1 << _QD_L         # universe size (value_cents clamps to U-1)
_QD_K = 256                # compression parameter: node cap = n div k
                           # (rank error eps = log2(U)/k = 6.25%)
_QD_PCTS = (1, 5, 25, 50, 75, 95, 99)


def _qd_compress_dict(cur: dict, thr: int) -> dict:
    """Level-synchronous bottom-up q-digest compress over heap-id
    counts (leaf ids in [U, 2U)); exact integer math mirroring the
    oracle's unrolled per-level CTEs.  The input dict is copied at
    entry — callers (and the property tests) may reuse their dict
    after compressing."""
    cur = dict(cur)
    for lv in range(_QD_L, 0, -1):
        lo, hi = 1 << lv, 1 << (lv + 1)
        fams: dict = {}
        for nid, c in cur.items():
            if lo <= nid < hi:
                pid = nid >> 1
                fams[pid] = fams.get(pid, 0) + c
        for pid, cs in fams.items():
            tot_cnt = cs + cur.get(pid, 0)
            if tot_cnt <= thr:
                for child in (2 * pid, 2 * pid + 1):
                    cur.pop(child, None)
                cur[pid] = tot_cnt
    return cur


def _qd_ub(nid: int) -> int:
    return ((nid + 1) << (_QD_L - (nid.bit_length() - 1))) - 1 - _QD_U


def _qdigest_oracle() -> str:
    """Unrolled bottom-up q-digest compression as chained CTEs: one
    (fam, dec, cur) stage per tree level, leaf level L down to the
    root's children — the literal Shrivastava et al. 2004 compress
    loop, replayed level-synchronously (identical to the engine's
    iteration order).  Every per-level CTE is MATERIALIZED: each
    level references its predecessor three times, so DuckDB's
    default CTE inlining would re-expand the chain 3^L times."""
    stages = []
    for lv in range(_QD_L, 0, -1):
        lo, hi = 1 << lv, 1 << (lv + 1)
        stages.append(f"""
    f{lv} AS MATERIALIZED (
      SELECT id // 2 AS pid, sum(cnt) AS cs
      FROM c{lv} WHERE id >= {lo} AND id < {hi} GROUP BY pid
    ), d{lv} AS MATERIALIZED (
      SELECT f.pid, f.cs + coalesce(p.cnt, 0) AS tot
      FROM f{lv} f LEFT JOIN c{lv} p ON p.id = f.pid
    ), c{lv - 1} AS MATERIALIZED (
      SELECT id, cnt FROM c{lv}
      WHERE NOT (id >= {lo} AND id < {hi})
        AND id NOT IN (SELECT pid FROM d{lv}
                       WHERE tot <= (SELECT thr FROM tot))
      UNION ALL
      SELECT pid AS id, tot AS cnt FROM d{lv}
      WHERE tot <= (SELECT thr FROM tot)
      UNION ALL
      SELECT c.id, c.cnt FROM c{lv} c JOIN d{lv} d ON d.pid = c.id // 2
      WHERE c.id >= {lo} AND c.id < {hi}
        AND d.tot > (SELECT thr FROM tot)
    )""")
    pct_rows = ", ".join(f"({p})" for p in _QD_PCTS)
    return f"""
    WITH hist AS MATERIALIZED (
      SELECT greatest(0, least(CAST(floor(value * 100) AS BIGINT),
                               {_QD_U - 1})) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY v
    ), tot AS MATERIALIZED (
      SELECT sum(cnt) AS n, sum(cnt) // {_QD_K} AS thr FROM hist
    ), c{_QD_L} AS MATERIALIZED (
      SELECT v + {_QD_U} AS id, cnt FROM hist
    ),{",".join(stages)},
    digest AS (
      SELECT id, cnt,
             ((id + 1) << ({_QD_L} - (length(bin(id)) - 1)))
               - 1 - {_QD_U} AS ub
      FROM c0
    ), cum AS (
      SELECT ub, sum(cnt) OVER (ORDER BY ub, id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM digest
    ), pcts(pct) AS (VALUES {pct_rows}),
    ranks AS (
      SELECT pct, (pct * t.n + 99) // 100 AS rk FROM pcts, tot t
    ), est AS (
      SELECT r.pct, min(cum.ub) AS qd FROM ranks r JOIN cum
        ON cum.c >= r.rk GROUP BY r.pct
    ), hcum AS (
      SELECT v, sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM hist
    ), exact AS (
      SELECT r.pct, min(hcum.v) AS xv FROM ranks r JOIN hcum
        ON hcum.c >= r.rk GROUP BY r.pct
    ), nn AS (SELECT count(*) AS n_nodes FROM digest)
    SELECT CAST(e.pct AS BIGINT) AS pct,
           CAST(e.qd AS BIGINT) AS qdigest_cents,
           CAST(x.xv AS BIGINT) AS exact_cents,
           CAST(e.qd - x.xv AS BIGINT) AS err_cents,
           CAST(nn.n_nodes AS BIGINT) AS n_nodes
    FROM est e JOIN exact x ON x.pct = e.pct, nn
    ORDER BY pct
    """


@_register(
    "b159_qdigest_quantiles",
    _qdigest_oracle(),
    "Q-DIGEST quantile sketch (Shrivastava et al. 2004) — the last "
    "classic mergeable sketch the portable family was missing "
    "(after KMV b102, Misra-Gries c38, Count-Min b141, Bloom b144, "
    "HLL b153/b154): deterministic, so fully value-oracled.  Leaf "
    f"histogram over value_cents clamped to [0, {_QD_U}); bottom-up "
    "level-synchronous compression folds a sibling pair plus its "
    f"parent into the parent while the family total <= n div "
    f"{_QD_K}, bounding the stored digest to O(k log U) nodes with "
    "rank error <= n log(U)/k; quantile queries walk the nodes in "
    "(upper-bound, depth) order and report the first ub whose "
    "cumulative count reaches ceil(p*n/100).  The audit columns "
    "compare each sketch quantile against the exact percentile from "
    "the uncompressed histogram (err_cents is the actual rank-error "
    "realization; n_nodes is the state the sketch would ship).  "
    "Scale shape: ONE corpus pass collapses rows to <= U histogram "
    "buckets (the mergeable per-shard state — partial histograms "
    "sum); the compression loop then runs on that bounded state in "
    "a SINGLE Arrow task (the kmv_partials discipline: Python only "
    "ever touches k-bounded sketch state, never corpus rows), and "
    "the quantile walk is a window over <= O(k log U) nodes.  At "
    "100 TB only the first aggregation touches data; the digest "
    "itself is bytes.",
)
def b159_qdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    hist = (ev.select(
        F.greatest(F.lit(0), F.least(
            F.floor(F.col("value") * 100).cast("long"),
            F.lit(_QD_U - 1))).alias("v"))
        .groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False))  # audit branch + digest build share it
    tot = (hist.agg(F.sum("cnt").alias("n")).localCheckpoint(eager=False))

    def _compress(pdf: pd.DataFrame) -> pd.DataFrame:
        cur = {int(v) + _QD_U: int(c)
               for v, c in zip(pdf["v"], pdf["cnt"])}
        cur = _qd_compress_dict(cur, sum(cur.values()) // _QD_K)
        ids = sorted(cur)
        return pd.DataFrame({"id": ids, "cnt": [cur[i] for i in ids],
                             "ub": [_qd_ub(i) for i in ids]})

    digest = (hist.groupBy(F.lit(1).alias("g"))
              .applyInPandas(_compress, "id long, cnt long, ub long")
              .localCheckpoint(eager=False))  # cum walk + n_nodes share it
    # global windows below run on sketch-sized relations (O(k log U)
    # nodes / <= U histogram buckets), never a raw scan
    cum = digest.select(
        "ub", F.sum("cnt").over(
            W.orderBy("ub", F.desc("id"))
            .rowsBetween(W.unboundedPreceding, 0)).alias("c"))
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _QD_PCTS])).alias("pct"))
    ranks = (pcts.crossJoin(F.broadcast(tot.select("n")))
             .select("pct", F.expr("(pct * n + 99) div 100").alias("rk")))
    est = (F.broadcast(ranks).join(cum, F.col("c") >= F.col("rk"))
           .groupBy("pct").agg(F.min("ub").alias("qd")))
    hcum = hist.select(
        "v", F.sum("cnt").over(
            W.orderBy("v").rowsBetween(W.unboundedPreceding, 0))
        .alias("c"))
    exact = (F.broadcast(ranks).join(hcum, F.col("c") >= F.col("rk"))
             .groupBy("pct").agg(F.min("v").alias("xv")))
    n_nodes = digest.agg(F.count("*").alias("n_nodes"))
    return (est.join(exact, "pct")
            .crossJoin(F.broadcast(n_nodes))
            .select(F.col("pct").cast("long"),
                    F.col("qd").cast("long").alias("qdigest_cents"),
                    F.col("xv").cast("long").alias("exact_cents"),
                    (F.col("qd") - F.col("xv")).cast("long")
                    .alias("err_cents"),
                    F.col("n_nodes").cast("long"))
            .orderBy("pct"))


# ---------------------------------------------------------------------
# b160: trailing-window quantiles via merged q-digest histograms
# ---------------------------------------------------------------------

_QD_WIN_PCTS = (50, 95)


def _sliding_qdigest_oracle() -> str:
    """Per-window unrolled q-digest compression: the b159 CTE chain
    with every stage keyed by wday (anti-join instead of NOT IN so
    the absorbed-parent exclusion composes with the window key)."""
    stages = []
    for lv in range(_QD_L, 0, -1):
        lo, hi = 1 << lv, 1 << (lv + 1)
        stages.append(f"""
    f{lv} AS MATERIALIZED (
      SELECT wday, id // 2 AS pid, sum(cnt) AS cs
      FROM c{lv} WHERE id >= {lo} AND id < {hi} GROUP BY wday, pid
    ), d{lv} AS MATERIALIZED (
      SELECT f.wday, f.pid, f.cs + coalesce(p.cnt, 0) AS tot_cnt,
             t.thr
      FROM f{lv} f
      LEFT JOIN c{lv} p ON p.wday = f.wday AND p.id = f.pid
      JOIN tot t ON t.wday = f.wday
    ), c{lv - 1} AS MATERIALIZED (
      SELECT c.wday, c.id, c.cnt FROM c{lv} c
      LEFT JOIN (SELECT wday, pid FROM d{lv} WHERE tot_cnt <= thr) m
        ON m.wday = c.wday AND m.pid = c.id
      WHERE NOT (c.id >= {lo} AND c.id < {hi}) AND m.pid IS NULL
      UNION ALL
      SELECT wday, pid AS id, tot_cnt AS cnt FROM d{lv}
      WHERE tot_cnt <= thr
      UNION ALL
      SELECT c.wday, c.id, c.cnt
      FROM c{lv} c JOIN d{lv} d
        ON d.wday = c.wday AND d.pid = c.id // 2
      WHERE c.id >= {lo} AND c.id < {hi} AND d.tot_cnt > thr
    )""")
    pct_rows = ", ".join(f"({p})" for p in _QD_WIN_PCTS)
    return f"""
    WITH dh AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day,
             greatest(0, least(CAST(floor(value * 100) AS BIGINT),
                               {_QD_U - 1})) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY day, v
    ), spine AS MATERIALIZED (
      SELECT DISTINCT day AS wday FROM dh
    ), mh AS MATERIALIZED (
      SELECT s.wday, d.v, CAST(sum(d.cnt) AS BIGINT) AS cnt
      FROM spine s JOIN dh d ON d.day BETWEEN s.wday - 6 AND s.wday
      GROUP BY s.wday, d.v
    ), tot AS MATERIALIZED (
      SELECT wday, sum(cnt) AS n, sum(cnt) // {_QD_K} AS thr
      FROM mh GROUP BY wday
    ), c{_QD_L} AS MATERIALIZED (
      SELECT wday, v + {_QD_U} AS id, cnt FROM mh
    ),{",".join(stages)},
    digest AS MATERIALIZED (
      SELECT wday, id, cnt,
             ((id + 1) << ({_QD_L} - (length(bin(id)) - 1)))
               - 1 - {_QD_U} AS ub
      FROM c0
    ), cum AS (
      SELECT wday, ub, sum(cnt) OVER (PARTITION BY wday
               ORDER BY ub, id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM digest
    ), pcts(pct) AS (VALUES {pct_rows}),
    ranks AS (
      SELECT t.wday, p.pct, (p.pct * t.n + 99) // 100 AS rk
      FROM tot t, pcts p
    ), est AS (
      SELECT r.wday, r.pct, min(cum.ub) AS qd
      FROM ranks r JOIN cum ON cum.wday = r.wday AND cum.c >= r.rk
      GROUP BY r.wday, r.pct
    ), hcum AS (
      SELECT wday, v, sum(cnt) OVER (PARTITION BY wday ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM mh
    ), exact AS (
      SELECT r.wday, r.pct, min(h.v) AS xv
      FROM ranks r JOIN hcum h ON h.wday = r.wday AND h.c >= r.rk
      GROUP BY r.wday, r.pct
    ), nn AS (
      SELECT wday, count(*) AS n_nodes FROM digest GROUP BY wday
    )
    SELECT CAST(e.wday AS VARCHAR) AS day,
           CAST(e.pct AS BIGINT) AS pct,
           CAST(e.qd AS BIGINT) AS qdigest_cents,
           CAST(x.xv AS BIGINT) AS exact_cents,
           CAST(nn.n_nodes AS BIGINT) AS n_nodes
    FROM est e
    JOIN exact x ON x.wday = e.wday AND x.pct = e.pct
    JOIN nn ON nn.wday = e.wday
    ORDER BY day, pct
    """


@_register(
    "b160_sliding_qdigest",
    _sliding_qdigest_oracle(),
    "Trailing-7-day p50/p95 per day from MERGED q-digest state — the "
    "windowed companion b154 gave the HLL (same shape: per-day "
    "partials, window merge, one estimate per day).  The mergeable "
    "state is the per-day value histogram (q-digest merge = sum "
    "counts, then re-compress); each day's trailing window sums "
    "<= 7 per-day histograms against a broadcast spine, compresses "
    "the merged state once per window in a grouped Arrow task, and "
    "reads p50/p95 off the digest with the exact windowed quantile "
    "as the per-day audit — the 'trailing p95 latency without "
    "rescanning raw rows' query every metrics pipeline ships.  "
    "Scale shape: raw rows reduce ONCE to (day, value) histogram "
    "partials; everything downstream is histogram-sized, keyed and "
    "partitioned by window day (no global windows).  The oracle "
    "replays per-window compression as the b159 unrolled CTE chain "
    "keyed by wday.",
)
def b160_sliding_qdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    dayhist = (ev.select(
        F.col("ts").cast("date").alias("day"),
        F.greatest(F.lit(0), F.least(
            F.floor(F.col("value") * 100).cast("long"),
            F.lit(_QD_U - 1))).alias("v"))
        .groupBy("day", "v").agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False))  # mergeable per-day histogram partials
    spine = dayhist.select(F.col("day").alias("wday")).distinct()
    merged = (F.broadcast(spine)
              .join(dayhist,
                    (F.col("day") >= F.date_sub(F.col("wday"), 6))
                    & (F.col("day") <= F.col("wday")))
              .groupBy("wday", "v")
              .agg(F.sum("cnt").cast("long").alias("cnt"))
              .localCheckpoint(eager=False))  # digest build + exact audit share it

    def _compress_win(pdf: pd.DataFrame) -> pd.DataFrame:
        wday = pdf["wday"].iloc[0]
        cur = {int(v) + _QD_U: int(c)
               for v, c in zip(pdf["v"], pdf["cnt"])}
        cur = _qd_compress_dict(cur, sum(cur.values()) // _QD_K)
        ids = sorted(cur)
        return pd.DataFrame(
            {"wday": [wday] * len(ids), "id": ids,
             "cnt": [cur[i] for i in ids],
             "ub": [_qd_ub(i) for i in ids]})

    digest = (merged.groupBy("wday")
              .applyInPandas(_compress_win,
                             "wday date, id long, cnt long, ub long")
              .localCheckpoint(eager=False))  # cum walk + per-day n_nodes share it
    cum = digest.select(
        "wday", "ub", F.sum("cnt").over(
            W.partitionBy("wday").orderBy("ub", F.desc("id"))
            .rowsBetween(W.unboundedPreceding, 0)).alias("c"))
    tot = merged.groupBy("wday").agg(F.sum("cnt").alias("n"))
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _QD_WIN_PCTS]))
        .alias("pct"))
    ranks = (tot.crossJoin(F.broadcast(pcts))
             .select("wday", "pct",
                     F.expr("(pct * n + 99) div 100").alias("rk")))
    est = (cum.join(F.broadcast(ranks), "wday")
           .filter(F.col("c") >= F.col("rk"))
           .groupBy("wday", "pct").agg(F.min("ub").alias("qd")))
    hcum = merged.select(
        "wday", "v", F.sum("cnt").over(
            W.partitionBy("wday").orderBy("v")
            .rowsBetween(W.unboundedPreceding, 0)).alias("c"))
    exact = (hcum.join(F.broadcast(ranks), "wday")
             .filter(F.col("c") >= F.col("rk"))
             .groupBy("wday", "pct").agg(F.min("v").alias("xv")))
    nn = digest.groupBy("wday").agg(F.count("*").alias("n_nodes"))
    return (est.join(exact, ["wday", "pct"])
            .join(F.broadcast(nn), "wday")
            .select(F.col("wday").cast("string").alias("day"),
                    F.col("pct").cast("long"),
                    F.col("qd").cast("long").alias("qdigest_cents"),
                    F.col("xv").cast("long").alias("exact_cents"),
                    F.col("n_nodes").cast("long"))
            .orderBy("day", "pct"))
