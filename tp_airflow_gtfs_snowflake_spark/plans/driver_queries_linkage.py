"""Record-linkage + mergeable-sketch batch.

- c27: blocked fuzzy matching (operators/fuzzy.py) — the entity-
  resolution pass over part names; DuckDB's levenshtein agrees with
  Spark's (unit-cost edits), so the oracle is exact.
- b41: per-day HLL sketch partials unioned to a corpus distinct —
  the MERGEABLE-aggregate pattern (Apache DataSketches, public): at
  100 TB you persist one tiny sketch per partition/day and answer
  any-date-range distincts by unioning sketches, never rescanning.
  DuckDB's HLL differs, so this is a rows-only registry entry; the
  binding invariant (union-of-partials == single-shot sketch,
  estimate near exact) is pinned by tests/test_round2c.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import fuzzy
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _register, _t


@_register(
    "c27_fuzzy_match_profile",
    """
    WITH t AS (SELECT p_partkey AS rid, p_name AS nm,
                      split_part(p_name, ' ', 1) || '|'
                        || CAST(len(string_split(p_name, ' ')) AS VARCHAR)
                        AS bk
               FROM part),
    pairs AS (
      SELECT a.rid AS id_a, b.rid AS id_b, levenshtein(a.nm, b.nm) AS d
      FROM t a JOIN t b ON a.bk = b.bk AND a.rid < b.rid
      WHERE levenshtein(a.nm, b.nm) BETWEEN 1 AND 3),
    sym AS (SELECT id_a AS rid, d FROM pairs
            UNION ALL
            SELECT id_b AS rid, d FROM pairs),
    prof AS (SELECT rid, count(*) AS n_matches, min(d) AS nearest
             FROM sym GROUP BY rid)
    SELECT t.rid, CAST(coalesce(prof.n_matches, 0) AS BIGINT) AS n_matches,
           CAST(prof.nearest AS BIGINT) AS nearest_dist
    FROM t LEFT JOIN prof USING (rid)
    """,
    "entity resolution by blocked fuzzy matching: levenshtein(1..3) "
    "pairs restricted to records sharing a (first token, token count) "
    "block key — an equi-join with a JVM-side distance, never O(n²); "
    "per-record profile keeps zero-match records.  The blocking key "
    "is the operator's recall contract, same as the LSH families",
)
def c27_fuzzy_match_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return fuzzy.fuzzy_match_profile(part, id_col="p_partkey",
                                     name_col="p_name", max_dist=3)


@_register(
    "b41_hll_partial_union", None,
    "mergeable distinct-count sketches: one HLL partial per day "
    "(groupBy + hll_sketch_agg), then hll_union_agg collapses the "
    "partials to the corpus-wide distinct estimate WITHOUT rescanning "
    "rows — the pre-aggregated pattern for any-range distinct queries "
    "over 100 TB.  rows-only check (DuckDB's HLL is a different "
    "sketch); union-of-partials == single-shot and near-exactness are "
    "pinned by tests/test_round2c.py.  b153_hll_portable_sketch is "
    "the fully value-oracled twin: same register/merge semantics on "
    "the portable md5-48 hash, every register reproduced in DuckDB",
)
def b41_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    partials = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
                .agg(F.hll_sketch_agg("user_id").alias("sk"),
                     F.count("*").cast("long").alias("n_rows")))
    return (partials.agg(
        F.count("*").cast("long").alias("n_partials"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long")
        .alias("distinct_users_est")))


@_register(
    "c04c_variant_json",
    """
    SELECT event_type AS etype,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_u,
           round(sum(value), 2) AS sum_val,
           CAST(max(event_id) AS BIGINT) AS max_eid
    FROM events GROUP BY event_type
    """,
    "Spark 4 VARIANT ingestion: a nested JSON document is parsed ONCE "
    "into the binary-shredded variant encoding (parse_json), then "
    "typed paths come out via variant_get — unlike get_json_object "
    "(c04), which re-parses the string per extraction.  The oracle "
    "computes the same aggregates from the base columns, so any "
    "encode/decode drift in the variant round-trip fails the hash.  "
    "At 100 TB variant is the semi-structured scale path: parse cost "
    "paid once at ingest, extractions are binary field reads",
)
def c04c_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    doc = F.to_json(F.struct(
        F.col("user_id").alias("u"), F.col("value").alias("v"),
        F.col("event_type").alias("t"),
        F.struct(F.col("event_id").alias("id")).alias("meta")))
    v = ev.select(F.parse_json(doc).alias("var"))
    return (v.select(
        F.variant_get("var", "$.t", "string").alias("etype"),
        F.variant_get("var", "$.u", "long").alias("u"),
        F.variant_get("var", "$.v", "double").alias("val"),
        F.variant_get("var", "$.meta.id", "long").alias("eid"))
        .groupBy("etype")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("u").cast("long").alias("sum_u"),
             F.round(F.sum("val"), 2).alias("sum_val"),
             F.max("eid").cast("long").alias("max_eid")))


@_register(
    "c28_negative_sampling",
    """
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    anchors AS (
      SELECT d.doc_id, d.lang, gs.j,
             (d.doc_id * 7919 + (gs.j + 1) * 104729)
               % (SELECT n_docs FROM n) AS neg_id
      FROM documents d,
           (SELECT unnest(generate_series(0, 3)) AS j) gs)
    SELECT a.doc_id, CAST(a.j AS BIGINT) AS j,
           CAST(a.neg_id AS BIGINT) AS neg_id,
           d2.lang AS neg_lang,
           CAST(d2.n_chars AS BIGINT) AS neg_n_chars,
           (d2.lang = a.lang) AS same_lang
    FROM anchors a JOIN documents d2 ON a.neg_id = d2.doc_id
    WHERE a.neg_id <> a.doc_id
    """,
    "contrastive-training negative sampling: K=4 deterministic "
    "pseudo-random negatives per anchor via an affine hash mod corpus "
    "size (reproducible across engines, runs and cluster sizes — no "
    "rand()), then a join fetches negative features.  explode(K) is a "
    "narrow map; the fetch join shuffles K x corpus on neg_id — the "
    "honest cost of materializing negative features at 100 TB "
    "(sample-then-join, never join-then-sample)",
)
def c28_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.select(F.count("*").alias("n_docs"))
    anchors = (docs.select("doc_id", "lang")
               .crossJoin(F.broadcast(n_docs))
               .select("doc_id", "lang",
                       F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
                       F.col("n_docs"))
               .withColumn("neg_id",
                           (F.col("doc_id") * 7919
                            + (F.col("j") + 1) * 104729) % F.col("n_docs"))
               .filter(F.col("neg_id") != F.col("doc_id")))
    d2 = docs.select(F.col("doc_id").alias("neg_id"),
                     F.col("lang").alias("neg_lang"),
                     F.col("n_chars").alias("neg_n_chars"))
    return (anchors.join(d2, "neg_id")
            .select("doc_id", F.col("j").cast("long").alias("j"),
                    F.col("neg_id").cast("long").alias("neg_id"),
                    "neg_lang",
                    F.col("neg_n_chars").cast("long").alias("neg_n_chars"),
                    (F.col("neg_lang") == F.col("lang")).alias("same_lang")))
