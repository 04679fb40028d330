"""Graph-shaped curation queries: near-duplicate components and
component-level dedup.  The edge set is the c08 exact n-gram Jaccard
pair graph (threshold 0.5), so both engines derive identical edges;
the DuckDB oracle closes it with WITH RECURSIVE while Spark runs the
distributed min-label propagation from operators.components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import dedup as D
from tp_airflow_gtfs_snowflake_spark.operators.components import (
    connected_components, dedup_keep_canonical)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _register, _t
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
    _duck_shingles, _duck_toks, _spread)

_EDGES_SQL = f"""
      t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
      sh AS (SELECT doc_id, unnest({_duck_shingles(3)}) AS sh FROM t),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
                 FROM sh a JOIN sh b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id),
      edges AS (
        SELECT d1, d2 FROM common
          JOIN sizes x ON x.doc_id = d1
          JOIN sizes y ON y.doc_id = d2
        WHERE n_common * 1.0 / (x.n_sh + y.n_sh - n_common) >= 0.5),
      sym AS (SELECT d1 AS a, d2 AS b FROM edges
              UNION ALL
              SELECT d2, d1 FROM edges),
      reach AS (
        SELECT a AS node, a AS r FROM sym
        UNION
        SELECT s.a, r.r FROM reach r JOIN sym s ON s.b = r.node)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r12, measured NEGATIVE — VERDICT r11 task 3 probe): swapping
    # this for prefix_filtered_jaccard_pairs (the c29b/c150 PPJoin
    # shape) produces IDENTICAL edges and c19 labels (exceptAll 0/0,
    # 0 label mismatches at sf0.1 AND sf1) but is 3x slower at sf0.1
    # (interleaved min 10.36 vs 3.35 s) and ~30x slower at sf1
    # (894/944 vs 25.5/36.6 s): this corpus' shuffled-token documents
    # make most 3-gram shingles globally RARE, so the frequency-rank
    # prefix barely shrinks any doc's index set while the global-freq
    # aggregate + two row_number windows add two full shingle passes.
    # Prefix filtering pays only when hot shingles dominate collision
    # counts (its c150 home).  c19's sf1 wall re-measured at
    # 25.5-36.6 s (~11x at 10x data) — the r11 sweep's 41 s / "17x"
    # was host drift, not plan superlinearity.
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return (D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                  threshold=0.5)
            .select("d1", "d2"))


@_register(
    "c19_dup_components",
    f"""
    WITH RECURSIVE {_EDGES_SQL}
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(min(r) AS BIGINT) AS component_id
    FROM reach GROUP BY node
    """,
    "LLM-curation: connected components over the near-dup pair graph "
    "(c08 Jaccard>=0.5 edges) via distributed min-label propagation — "
    "one shuffle per round, rounds = component diameter (1-3 for dup "
    "clusters), lineage checkpointed per round.  The oracle computes "
    "the same closure with a recursive CTE.  Turns pairwise dedup "
    "output into keep-one-per-group decisions",
)
def c19_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = connected_components(_edges(spark, sf_dir))
    return comp.select(F.col("node").cast("long").alias("doc_id"),
                       F.col("component").cast("long")
                       .alias("component_id"))


@_register(
    "c19b_component_dedup",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node),
    losers AS (SELECT node FROM comp WHERE node <> component_id)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id NOT IN (SELECT node FROM losers)
    GROUP BY lang
    """,
    "LLM-curation: corpus after component-level dedup — keep the "
    "canonical (min-id) doc per near-dup component plus all "
    "unpaired docs; per-language survivor counts.  The loser set is "
    "tiny relative to the corpus, so the final filter is a broadcast "
    "anti join against 100 TB of documents",
)
def c19b_component_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    kept = dedup_keep_canonical(docs, _edges(spark, sf_dir))
    return (kept.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.length("text").cast("long")).cast("long")
                 .alias("total_chars")))


@_register(
    "c32_pagerank_centrality", None,
    "LLM-curation: PageRank centrality over the near-dup/similarity "
    "graph (symmetrized c08 edges) as a corpus quality-weighting "
    "signal (web-scale curation weights documents by link centrality). "
    "RETIRED from the driver window: superseded as a checkable "
    "surface by c104_pagerank_int (value-hash integer-ppm twin on the "
    "same graph, driver-green r04); kept as the float reference.  "
    "Fixed 10 iterations, two shuffles per round, lineage checkpointed "
    "— same iterative discipline as c19.  rows-only check (iterated "
    "float sums can't hash-match a SQL oracle); invariants — rank-sum "
    "conservation, chain/star orderings, 2-node symmetry — are pinned "
    "in tests/test_operators_extra.py",
)
def c32_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.components import pagerank
    e = _edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("d2").alias("d1"),
                                 F.col("d1").alias("d2")))
    pr = pagerank(sym, src="d1", dst="d2", n_iter=10)
    return pr.select(F.col("node").cast("long").alias("doc_id"),
                     F.round("rank", 6).alias("rank"))


@_register(
    "c37_dup_cluster_sizes",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node)
    SELECT CAST(n_members AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM (SELECT component_id, count(*) AS n_members
          FROM comp GROUP BY component_id)
    GROUP BY n_members
    """,
    "LLM-curation: duplication profile — the size distribution of "
    "near-dup clusters ('how duplicated is my corpus', the first "
    "number a dedup run reports).  Two tiny aggregates on top of the "
    "c19 component labelling; all heavy lifting is the shared edge "
    "derivation + min-label propagation",
)
def c37_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = connected_components(_edges(spark, sf_dir))
    return (comp.groupBy("component")
            .agg(F.count("*").alias("n_members"))
            .groupBy(F.col("n_members").cast("long").alias("cluster_size"))
            .agg(F.count("*").cast("long").alias("n_clusters")))


@_register(
    "c42_leakage_free_split",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node),
    keyed AS (
      SELECT d.doc_id, d.lang,
             COALESCE(c.component_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ), split AS (
      SELECT doc_id, lang, group_id,
             CASE WHEN ('0x' || substr(md5(CAST(group_id AS VARCHAR)
                                            || ':split'), 1, 15))::BIGINT
                       % 10 < 8
                  THEN 'train' ELSE 'val' END AS split
      FROM keyed
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT group_id) AS BIGINT) AS n_groups
    FROM split GROUP BY split
    """,
    "LLM-curation: leakage-free train/val split — the split key is "
    "the near-dup COMPONENT id (docs with no near-dup use their own "
    "id), hashed deterministically, so near-duplicates can never "
    "straddle the boundary and inflate eval scores.  Composes the "
    "c19 component labelling with c17's portable hash-split; the "
    "per-doc decision is a broadcast join against the (tiny) "
    "component map plus a narrow hash — trivial at 100 TB.  The "
    "no-straddling invariant is pinned by pytest",
)
def c42_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.dedup import (
        portable_hash64)
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    comp = connected_components(_edges(spark, sf_dir)) \
        .withColumnRenamed("node", "doc_id")
    keyed = (docs.join(F.broadcast(comp), "doc_id", "left")
             .withColumn("group_id",
                         F.coalesce("component", "doc_id")))
    split = F.when(
        F.pmod(portable_hash64(
            F.concat(F.col("group_id").cast("string"), F.lit(":split"))),
            F.lit(10)) < 8, "train").otherwise("val")
    return (keyed.withColumn("split", split)
            .groupBy("split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.countDistinct("group_id").cast("long")
                 .alias("n_groups")))


@_register(
    "c49_quality_canonical_dedup",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node),
    keyed AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             COALESCE(c.component_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY group_id
                 ORDER BY n_chars DESC, doc_id) AS rn
      FROM keyed
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM ranked WHERE rn = 1
    GROUP BY lang
    """,
    "LLM-curation: QUALITY-aware canonical selection — keep the "
    "longest (highest-content) document per near-dup cluster instead "
    "of c19b's min-id convention (the keeper choice real pipelines "
    "make: dedup should discard the truncated copies, not the id-"
    "unlucky ones).  max-per-group over the component labelling via "
    "one bounded window; unpaired docs are their own group",
)
def c49_quality_canonical_dedup(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    from pyspark.sql.window import Window as W
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    comp = connected_components(_edges(spark, sf_dir)) \
        .withColumnRenamed("node", "doc_id")
    keyed = (docs.join(F.broadcast(comp), "doc_id", "left")
             .withColumn("group_id", F.coalesce("component", "doc_id")))
    w = W.partitionBy("group_id").orderBy(F.desc("n_chars"),
                                          F.asc("doc_id"))
    return (keyed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars")))


@_register(
    "c93_component_density_audit",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    comp AS (SELECT node, min(r) AS component_id FROM reach
             GROUP BY node),
    sizes2 AS (SELECT component_id, count(*) AS n_nodes
               FROM comp GROUP BY component_id),
    ec AS (SELECT c.component_id, count(*) AS n_edges
           FROM edges e JOIN comp c ON c.node = e.d1
           GROUP BY c.component_id)
    SELECT component_id, CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_edges * 2000000 // (n_nodes * (n_nodes - 1))
                AS BIGINT) AS density_ppm
    FROM sizes2 JOIN ec USING (component_id)
    ORDER BY component_id
    """,
    "dedup-cluster QUALITY audit: per near-dup component, node "
    "count, edge count and graph density (edges over possible "
    "pairs, ppm).  Density 1e6 = a clique (every member verified "
    "similar to every other — safe to keep one); low density = a "
    "CHAIN grown by transitive merging, where keep-one-per-"
    "component silently discards documents never directly compared "
    "— the known failure mode of connected-component dedup that "
    "this table quantifies before anyone deletes data.  Edge "
    "counts join the pair table to the component labelling; "
    "components are c19's propagation",
)
def c93_component_density_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)  # reused: CC + count
    comp = connected_components(edges).withColumnRenamed("node", "d1")
    sizes = (comp.groupBy("component")
             .agg(F.count("*").alias("n_nodes")))
    ec = (edges.join(comp, "d1")
          .groupBy("component").agg(F.count("*").alias("n_edges")))
    return (sizes.join(ec, "component")
            .select(F.col("component").cast("long")
                    .alias("component_id"),
                    F.col("n_nodes").cast("long").alias("n_nodes"),
                    F.col("n_edges").cast("long").alias("n_edges"),
                    F.expr("n_edges * 2000000 "
                           "div (n_nodes * (n_nodes - 1))")
                    .cast("long").alias("density_ppm"))
            .orderBy("component_id"))
