"""Round-13 registry additions (driver round 8).

Lakehouse-maintenance planning tier — at 100 TB, table maintenance IS
a first-class workload, and each of these runs its decision loop on
the file MANIFEST (|files| rows), never the data:

- b165: Z-ORDER clustering audit — the multi-dimensional layout
  question behind Delta OPTIMIZE ZORDER / Iceberg sort orders,
  quantified: zone-map skip rates for a 2-D predicate under a
  Morton-interleaved layout vs a single-column linear layout.
- b166: small-file COMPACTION planner — ordered cumulative-size bin
  packing of a file manifest into target-sized rewrite groups (the
  planner loop inside Delta OPTIMIZE / Iceberg rewrite_data_files).
- b167: merge-on-read DELETE-VECTOR maintenance audit — per-file
  deleted fraction and the rewrite-vs-keep-DV decision (Iceberg v2
  positional deletes / Delta deletion vectors).

Plus two extensions of existing families (VERDICT r07 task 8):

- c136: CROSS-DOCUMENT suffix-LCP — c135's repeated-span detector
  lifted from within-source to across-document adjacency, the
  suffix-array pass exact-substring training-data dedup is built on
  (Lee et al., "Deduplicating Training Data Makes Language Models
  Better", ACL'22 — the ExactSubstr suffix-array method).
- c137: synchronous LABEL PROPAGATION communities over the near-dup
  pair graph — fixed-round, integer-deterministic (min-label
  tiebreak), the lightweight community-detection companion to the
  c19 components / c119 modularity family.

Reference contract: the reference's analytic surface (README.md:
116-129 KPI list) has no lakehouse layer — this tier extends the
charter's 100 TB training-data-pipeline mandate, citing public
designs (Delta OPTIMIZE, Iceberg maintenance actions) rather than
reference files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    _register, _t)


# ---------------------------------------------------------------------
# b165: Z-order clustering audit (zone-map skipping under a 2-D
#       predicate: Morton layout vs linear single-column layout)
# ---------------------------------------------------------------------

_ZO_BITS = 8                     # per-dimension bucket resolution
_ZO_B = 1 << _ZO_BITS            # 256 buckets per dimension
_ZO_FILE_DIV = 512               # 65536 z-values / 512 -> 128 z-range files
_ZO_LIN_DIV = 2                  # 256 x-buckets / 2   -> 128 linear files
_ZO_Q = 64                       # predicate: x < 64 AND y < 64 (~1/16)


def _morton(x: str, y: str, div: str) -> str:
    """Bit-interleave two {_ZO_BITS}-bit bucket ids with pure integer
    div/mod arithmetic (no shift operators), so the SAME formula text
    evaluates identically in Spark (`div`) and DuckDB (`//`) —
    truncating division agrees on non-negative inputs."""
    terms = []
    for k in range(_ZO_BITS):
        terms.append(f"(({x} {div} {1 << k}) % 2) * {1 << (2 * k + 1)}")
        terms.append(f"(({y} {div} {1 << k}) % 2) * {1 << (2 * k)}")
    return " + ".join(terms)


def _zo_audit_sql(layout: str, fid: str) -> str:
    return f"""
      SELECT '{layout}' AS layout,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(CASE WHEN mn_x > {_ZO_Q - 1} OR mn_y > {_ZO_Q - 1}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_skip,
             CAST(sum(CASE WHEN mx_x <= {_ZO_Q - 1} AND mx_y <= {_ZO_Q - 1}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
             CAST(sum(cnt) AS BIGINT) AS rows_total,
             CAST(sum(CASE WHEN mn_x > {_ZO_Q - 1} OR mn_y > {_ZO_Q - 1}
                           THEN 0 ELSE cnt END) AS BIGINT) AS rows_scanned,
             CAST(sum(hits) AS BIGINT) AS rows_matched,
             CAST(sum(CASE WHEN mn_x > {_ZO_Q - 1} OR mn_y > {_ZO_Q - 1}
                           THEN 1 ELSE 0 END) * 1000000 // count(*)
                  AS BIGINT) AS skip_ppm
      FROM (
        SELECT {fid} AS fid, min(x) AS mn_x, max(x) AS mx_x,
               min(y) AS mn_y, max(y) AS mx_y, count(*) AS cnt,
               sum(CASE WHEN x < {_ZO_Q} AND y < {_ZO_Q} THEN 1 ELSE 0 END)
                 AS hits
        FROM b GROUP BY 1)
    """


@_register(
    "b165_zorder_clustering_audit",
    f"""
    WITH mx AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs
                FROM lineitem),
    b AS (
      -- greatest(.., 0): keys at/below the 1-based floor (the
      -- fixture contains a few 0 keys) clamp into bucket 0, keeping
      -- x/y in [0, {_ZO_B}) so the Morton div/mod bit math is defined
      SELECT least(greatest(l_partkey - 1, 0) * {_ZO_B} // maxp,
                   {_ZO_B - 1}) AS x,
             least(greatest(l_suppkey - 1, 0) * {_ZO_B} // maxs,
                   {_ZO_B - 1}) AS y
      FROM lineitem, mx
    ), z AS (SELECT x, y, {_morton('x', 'y', '//')} AS z FROM b)
    SELECT * FROM ({_zo_audit_sql('linear', f'x // {_ZO_LIN_DIV}')})
    UNION ALL
    SELECT * FROM (
      {_zo_audit_sql('zorder', f'z // {_ZO_FILE_DIV}')
       .replace('FROM b GROUP BY 1', 'FROM z GROUP BY 1')})
    ORDER BY layout
    """,
    "Z-ORDER CLUSTERING audit — the multi-dimensional layout decision "
    "behind Delta OPTIMIZE ZORDER / Iceberg sort orders, made value-"
    f"checkable: both join keys bucket into {_ZO_B} max-scaled "
    "cells, files are equi-width ranges of either the Morton-"
    "interleaved code (zorder) or the first dimension alone (linear), "
    "and per-file (min,max) zone maps classify a 2-D quarter-box "
    "predicate as skip / scan.  The audit reports both layouts side "
    "by side: linear can only prune on its sort column, so the "
    "y-constraint scans everything in-range; the Morton layout prunes "
    "on BOTH (the predicate box touches a contiguous z prefix), which "
    "is the whole point of interleaved clustering.  rows_matched is "
    "identical across layouts by construction — a zone-map classifier "
    "that skips a matching file breaks the hash.  Scale shape: one "
    "narrow aggregate builds each layout's zone-map manifest; "
    "classification and the audit run on |files| rows (~800k for "
    "128 MB files at 100 TB), never the data.  The actual table "
    "rewrite this audit justifies is ONE range-repartition by z "
    "(sample boundaries like b164, then a 1-pass shuffle write); the "
    "audit is how you decide it's worth 100 TB of IO before paying "
    "it.  Morton code is pure div/mod integer arithmetic, identical "
    "text in both engines.",
)
def b165_zorder_clustering_audit(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mx = li.agg(F.max("l_partkey").alias("maxp"),
                F.max("l_suppkey").alias("maxs"))
    b = (li.crossJoin(F.broadcast(mx))
         .select(F.expr(f"least(greatest(l_partkey - 1, 0) * {_ZO_B} "
                        f"div maxp, {_ZO_B - 1})").alias("x"),
                 F.expr(f"least(greatest(l_suppkey - 1, 0) * {_ZO_B} "
                        f"div maxs, {_ZO_B - 1})").alias("y")))
    z = b.withColumn("z", F.expr(_morton("x", "y", "div")))

    def audit(rows: DataFrame, layout: str, fid_expr: str) -> DataFrame:
        zm = (rows.groupBy(F.expr(fid_expr).alias("fid"))
              .agg(F.min("x").alias("mn_x"), F.max("x").alias("mx_x"),
                   F.min("y").alias("mn_y"), F.max("y").alias("mx_y"),
                   F.count("*").alias("cnt"),
                   F.sum(F.when((F.col("x") < _ZO_Q)
                                & (F.col("y") < _ZO_Q), 1)
                         .otherwise(0)).alias("hits")))
        skip = (F.col("mn_x") > _ZO_Q - 1) | (F.col("mn_y") > _ZO_Q - 1)
        full = (F.col("mx_x") <= _ZO_Q - 1) & (F.col("mx_y") <= _ZO_Q - 1)
        return (zm.agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(F.when(skip, 1).otherwise(0)).cast("long")
            .alias("n_skip"),
            F.sum(F.when(full, 1).otherwise(0)).cast("long")
            .alias("n_full"),
            F.sum("cnt").cast("long").alias("rows_total"),
            F.sum(F.when(skip, 0).otherwise(F.col("cnt"))).cast("long")
            .alias("rows_scanned"),
            F.sum("hits").cast("long").alias("rows_matched"),
            F.expr(f"sum(CASE WHEN mn_x > {_ZO_Q - 1} OR mn_y > "
                   f"{_ZO_Q - 1} THEN 1 ELSE 0 END) * 1000000 "
                   "div count(*)").cast("long").alias("skip_ppm"))
            .select(F.lit(layout).alias("layout"), "*"))

    return (audit(b, "linear", f"x div {_ZO_LIN_DIV}")
            .unionByName(audit(z, "zorder", f"z div {_ZO_FILE_DIV}"))
            .orderBy("layout"))


# ---------------------------------------------------------------------
# b166: small-file compaction planner (ordered cumulative-size bin
#       packing of the file manifest into target rewrite groups)
# ---------------------------------------------------------------------

_CP_FILE_DIV = 64          # l_orderkey div 64 -> many small "files"
_CP_TARGET = 100_000       # target bytes per compacted output file


@_register(
    "b166_compaction_bin_packing",
    f"""
    WITH manifest AS (
      SELECT l_orderkey // {_CP_FILE_DIV} AS file_id,
             count(*) * 100 + CAST(sum(l_linenumber) AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1
    ), planned AS (
      SELECT file_id, bytes,
             coalesce(sum(bytes) OVER (ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_CP_TARGET} AS bin_id
      FROM manifest
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(min(file_id) AS BIGINT) AS first_file,
           CAST(max(file_id) AS BIGINT) AS last_file,
           CAST(sum(bytes) * 1000000 // {_CP_TARGET} AS BIGINT)
             AS fill_ppm
    FROM planned GROUP BY bin_id ORDER BY bin_id
    """,
    "SMALL-FILE COMPACTION planner — the bin-packing loop inside "
    "Delta OPTIMIZE / Iceberg rewrite_data_files: files in manifest "
    "order (≈ ingestion time, preserving temporal clustering) are "
    "assigned to rewrite groups by cumulative-size bucketing "
    f"(running bytes BEFORE each file // {_CP_TARGET}-byte target — "
    "ordered first-fit), and the plan is audited per bin: file count, "
    "realized bytes, fill ratio, and the contiguous [first,last] "
    "file range each rewrite task reads.  Deterministic synthetic "
    "sizes (rows*100 + linenumber sum) stand in for parquet file "
    "bytes.  Scale shape: the manifest aggregate collapses the fact "
    "to |files| rows up front; the running sum is a window over the "
    "MANIFEST (~800k rows at 100 TB for 128 MB files — driver-"
    "planner scale, the same relation every table format's optimizer "
    "walks), and each bin becomes one independent rewrite task "
    "reading a contiguous file range.  The single-partition window "
    "sits strictly above that bounding aggregate (the plan-gate "
    "Aggregate lenience, justified here by |files| << |rows|).",
)
def b166_compaction_bin_packing(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    manifest = (li.groupBy(F.expr(f"l_orderkey div {_CP_FILE_DIV}")
                           .alias("file_id"))
                .agg((F.count("*") * 100
                      + F.sum("l_linenumber").cast("long"))
                     .alias("bytes")))
    w = (W.orderBy("file_id")
         .rowsBetween(W.unboundedPreceding, -1))
    planned = (manifest
               .withColumn("cum_before",
                           F.coalesce(F.sum("bytes").over(w), F.lit(0)))
               .select("file_id", "bytes",
                       F.expr(f"cum_before div {_CP_TARGET}")
                       .alias("bin_id")))
    return (planned.groupBy("bin_id")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("total_bytes"),
                 F.min("file_id").cast("long").alias("first_file"),
                 F.max("file_id").cast("long").alias("last_file"),
                 F.expr(f"sum(bytes) * 1000000 div {_CP_TARGET}")
                 .cast("long").alias("fill_ppm"))
            .withColumn("bin_id", F.col("bin_id").cast("long"))
            .orderBy("bin_id"))


# ---------------------------------------------------------------------
# b167: merge-on-read delete-vector maintenance audit
# ---------------------------------------------------------------------

_DV_FILE_DIV = 256         # l_orderkey div 256 -> base data files
_DV_REWRITE_PPM = 190_000  # rewrite a file once >=19% of it is deleted


@_register(
    "b167_delete_vector_audit",
    f"""
    WITH f AS (
      SELECT l_orderkey // {_DV_FILE_DIV} AS file_id,
             count(*) AS n_rows,
             sum(CASE WHEN l_returnflag = 'R' AND l_discount >= 0.05
                      THEN 1 ELSE 0 END) AS n_deleted
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(file_id AS BIGINT) AS file_id,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_deleted AS BIGINT) AS n_deleted,
           CAST(n_rows - n_deleted AS BIGINT) AS live_rows,
           CAST(n_deleted * 1000000 // n_rows AS BIGINT) AS del_ppm,
           CASE WHEN n_deleted = 0 THEN 'none'
                WHEN n_deleted * 1000000 // n_rows >= {_DV_REWRITE_PPM}
                THEN 'rewrite' ELSE 'dv' END AS action
    FROM f ORDER BY file_id
    """,
    "MERGE-ON-READ DELETE-VECTOR maintenance audit — Iceberg v2 "
    "positional deletes / Delta deletion vectors: a retention delete "
    "(returned lines with >=5% discount) lands as per-file delete "
    "vectors instead of eager rewrites, and the maintenance planner "
    "must decide per base file whether the deleted fraction justifies "
    f"compacting it away (>= {_DV_REWRITE_PPM} ppm -> rewrite) or the "
    "DV stays (read-time anti-join cost on a small fraction).  "
    "Output is the per-file decision manifest: rows, deleted, live, "
    "deleted ppm, action.  Scale shape: ONE narrow aggregate "
    "(predicate + count) collapses the fact to |files| rows — the "
    "planner never rereads data, exactly how table-format maintenance "
    "jobs consume file-level delete statistics; each 'rewrite' row "
    "then becomes one independent anti-join-and-rewrite task.",
)
def b167_delete_vector_audit(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_discount")
    f = (li.groupBy(F.expr(f"l_orderkey div {_DV_FILE_DIV}")
                    .alias("file_id"))
         .agg(F.count("*").alias("n_rows"),
              F.sum(F.when((F.col("l_returnflag") == "R")
                           & (F.col("l_discount") >= 0.05), 1)
                    .otherwise(0)).alias("n_deleted")))
    return (f.select(
        F.col("file_id").cast("long"),
        F.col("n_rows").cast("long"),
        F.col("n_deleted").cast("long"),
        (F.col("n_rows") - F.col("n_deleted")).cast("long")
        .alias("live_rows"),
        F.expr("n_deleted * 1000000 div n_rows").cast("long")
        .alias("del_ppm"),
        F.when(F.col("n_deleted") == 0, "none")
        .when(F.expr("n_deleted * 1000000 div n_rows")
              >= _DV_REWRITE_PPM, "rewrite")
        .otherwise("dv").alias("action"))
        .orderBy("file_id"))


# ---------------------------------------------------------------------
# c136: cross-document suffix-LCP (ExactSubstr-style adjacency)
# ---------------------------------------------------------------------

_XL_W = 8                  # suffixes truncated to 8 tokens (caps LCP)
_XL_THR = 4                # cross-doc repeated span = LCP >= 4 tokens


@_register(
    "c136_crossdoc_suffix_lcp",
    f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk
      FROM documents
    ), suf AS (
      SELECT doc_id, source, p,
             tk[p:least(p + {_XL_W} - 1, len(tk))] AS s
      FROM (SELECT doc_id, source, tk,
                   generate_subscripts(tk, 1) AS p FROM toks)
    ), adj AS (
      SELECT source, doc_id, s,
             lag(s) OVER w AS prev,
             lag(doc_id) OVER w AS prev_doc
      FROM suf
      WINDOW w AS (PARTITION BY s[1]
                   ORDER BY array_to_string(s, ' '), doc_id, p)
    ), lcp AS (
      SELECT source,
             {" + ".join(
                 f"CASE WHEN len(s) >= {k} AND len(prev) >= {k} "
                 f"AND s[1:{k}] = prev[1:{k}] THEN 1 ELSE 0 END"
                 for k in range(1, _XL_W + 1))} AS l
      FROM adj WHERE prev IS NOT NULL AND prev_doc <> doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_cross_pairs,
           CAST(max(l) AS BIGINT) AS max_lcp,
           CAST(sum(CASE WHEN l >= {_XL_THR} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rep{_XL_THR},
           CAST(sum(CASE WHEN l >= {_XL_THR} THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS rep_ppm
    FROM lcp GROUP BY source ORDER BY source
    """,
    "CROSS-DOCUMENT suffix-LCP — c135 lifted from within-source "
    "repeated spans to ACROSS-document duplication, the adjacency "
    "pass of suffix-array exact-substring dedup (Lee et al. ACL'22, "
    "ExactSubstr): sort every token suffix in one corpus-wide order "
    "and measure the token-LCP of lexicographically adjacent pairs "
    "drawn from DIFFERENT documents — the density of >= "
    f"{_XL_THR}-token cross-doc spans (per source of the right "
    "suffix) is the signal that drives span-level dedup.  The "
    "corpus-wide suffix sort is PARTITIONED BY FIRST TOKEN in both "
    "engines — lossless for this statistic, because adjacent "
    "suffixes that disagree on token 1 have LCP 0 and can never "
    "reach the threshold, so the partition boundary drops only "
    "zero-LCP pairs; that is exactly the distributed suffix-array "
    "sharding story (vocabulary-keyed ranges, no global sort), and "
    "it keeps every partition bounded by the hottest first-token "
    "group rather than the corpus.  Suffix rows stay narrow "
    f"(<= {_XL_W}-token slices); LCP is a sum of monotone prefix-"
    "equality indicators on list slices — exact integers in both "
    "engines.",
)
def c136_crossdoc_suffix_lcp(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    toks = (_t(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.split("text", " ").alias("tk")))
    suf = (toks
           .select("doc_id", "source", "tk",
                   F.posexplode("tk").alias("p0", "_tok"))
           .select("doc_id", "source",
                   (F.col("p0") + 1).alias("p"),
                   F.slice("tk", F.col("p0") + 1, _XL_W).alias("s")))
    w = (W.partitionBy(F.element_at("s", 1))
         .orderBy(F.concat_ws(" ", "s"), "doc_id", "p"))
    adj = (suf
           .withColumn("prev", F.lag("s").over(w))
           .withColumn("prev_doc", F.lag("doc_id").over(w))
           .filter(F.col("prev").isNotNull()
                   & (F.col("prev_doc") != F.col("doc_id"))))
    eq_k = [F.when((F.size("s") >= k) & (F.size("prev") >= k)
                   & (F.slice("s", 1, k) == F.slice("prev", 1, k)), 1)
            .otherwise(0) for k in range(1, _XL_W + 1)]
    lcp = adj.select("source", sum(eq_k[1:], eq_k[0]).alias("l"))
    thr = _XL_THR
    return (lcp.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_cross_pairs"),
                 F.max("l").cast("long").alias("max_lcp"),
                 F.sum(F.when(F.col("l") >= thr, 1).otherwise(0))
                 .cast("long").alias(f"n_rep{thr}"),
                 F.expr(f"sum(CASE WHEN l >= {thr} THEN 1 ELSE 0 END)"
                        " * 1000000 div count(*)").cast("long")
                 .alias("rep_ppm"))
            .orderBy("source"))


# ---------------------------------------------------------------------
# c137: synchronous label-propagation communities (fixed rounds,
#       deterministic min-label tiebreak)
# ---------------------------------------------------------------------

_LPA_ROUNDS = 4


def _lpa_round_sql(prev: str, cur: str) -> str:
    # the vote includes the node's own current label (see
    # operators.components.label_propagation: neighbors-only sync
    # voting makes isolated pairs swap labels forever)
    return f"""
    {cur} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, lbl) AS rn
        FROM (SELECT node, lbl, count(*) AS cnt FROM (
                SELECT s.a AS node, l.lbl
                FROM sym s JOIN {prev} l ON l.node = s.b
                UNION ALL SELECT node, lbl FROM {prev})
              GROUP BY node, lbl))
      WHERE rn = 1)"""


@_register(
    "c137_label_propagation_communities",
    # _EDGES_SQL (shared with c19/c119) derives the exact c08
    # Jaccard>=0.5 pair graph; the recursive `reach` CTE it carries is
    # unused here and never evaluated.
    None,  # oracle text is attached below (needs the graph module)
    "COMMUNITY DETECTION by synchronous label propagation over the "
    "near-dup pair graph (c08 Jaccard>=0.5 edges, shared with "
    "c19/c119): every node starts as its own label, and each of "
    f"{_LPA_ROUNDS} FIXED rounds reassigns every node the most "
    "frequent label among itself and its neighbors (self-inclusive: "
    "a neighbors-only sync vote makes isolated PAIRS — the dominant "
    "dup shape — swap labels forever; caught by the property suite), "
    "ties broken by MINIMUM "
    "label — exact integer counts + deterministic tiebreak make the "
    "result a pure function of the edge multiset, so DuckDB unrolls "
    "the same rounds and matches bit-for-bit (the c104 pagerank_int "
    "discipline; fixed rounds also sidestep sync-LPA's oscillation "
    "non-termination).  Scale shape mirrors connected_components: "
    "each round is ONE edges-x-labels equi-join plus one "
    "(node,label) count and one max_by per node — two shuffles per "
    "round, no driver-side graph; lineage is cut by a LAZY "
    "checkpoint EVERY round (the self-inclusive vote references "
    "labels twice, so the uncut plan doubles per round — 62 vs 5 "
    "exchanges measured at 4 rounds; pointer-doubling-class cadence, "
    "BASELINE.md r08).  Against c19 "
    "components this answers a different question: components give "
    "reachability (everything transitively linked), LPA gives "
    "density (a chain of borderline matches splits into its dense "
    "cores) — the pair is how curation distinguishes true dup "
    "clusters from topical chains.",
)
def c137_label_propagation_communities(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    from tp_airflow_gtfs_snowflake_spark.operators.components import (
        label_propagation)
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_graph import (
        _edges)

    lp = label_propagation(_edges(spark, sf_dir), src="d1", dst="d2",
                           n_iter=_LPA_ROUNDS)
    return (lp.select(F.col("node").cast("long").alias("doc_id"),
                      F.col("label").cast("long").alias("community"))
            .orderBy("doc_id"))


def _attach_lpa_oracle() -> None:
    """The LPA oracle reuses the shared edge-derivation CTE from the
    graph module (import deferred to avoid a cycle at module load)."""
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
        REGISTRY, QuerySpec)
    from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_graph import (
        _EDGES_SQL)

    rounds = "".join(
        "," + _lpa_round_sql(f"l{i}", f"l{i + 1}")
        for i in range(_LPA_ROUNDS))
    sql = f"""
    WITH RECURSIVE {_EDGES_SQL},
    l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM sym)
    {rounds}
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(lbl AS BIGINT) AS community
    FROM l{_LPA_ROUNDS} ORDER BY doc_id
    """
    spec = REGISTRY["c137_label_propagation_communities"]
    REGISTRY["c137_label_propagation_communities"] = QuerySpec(
        fn=spec.fn, oracle=sql, note=spec.note)


_attach_lpa_oracle()
