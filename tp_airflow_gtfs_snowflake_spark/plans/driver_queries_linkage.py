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
    "pinned by tests/test_round2c.py",
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
