"""Similarity search over embedding columns (charter C2): brute-force
cosine top-k as the correctness baseline, IVF cell assignment as the
scale path, and cell-blocked near-duplicate pairing.

Scale design (100 TB of vectors):
- the query vector / centroid set is always broadcast — scoring is a
  narrow per-row map, no shuffle;
- brute-force top-k ends in TakeOrderedAndProject (per-partition heap
  + driver merge), never a global sort;
- IVF: vectors are assigned once to their nearest centroid (narrow
  map over a broadcast centroid table) and only the probed cells are
  scanned at query time — cells shard across executors, and the
  near-dup cross product stays per-cell-local (O(sum cell^2), not
  O(n^2));
- all similarity math is `functions.vectors` (JVM higher-order
  expressions, doubles); similarities are rounded to 6dp BEFORE any
  argmax/threshold so float ulp noise cannot flip assignments between
  runs or engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.functions.vectors import cosine


def brute_force_topk(vectors: DataFrame, query: DataFrame, *,
                     vec_col: str = "embedding", k: int = 20,
                     payload: list[str] | None = None) -> DataFrame:
    """Exact cosine top-k of `vectors` against a 1-row `query` frame
    (column `qemb`).  Baseline and recall oracle for the IVF path."""
    payload = payload if payload is not None else [
        c for c in vectors.columns if c != vec_col]
    return (vectors.crossJoin(F.broadcast(query))
            .select(*payload,
                    F.round(cosine(F.col(vec_col), F.col("qemb")), 6)
                    .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), *payload[:1])
            .limit(k))


def kmeans_centroids(emb: DataFrame, *, vec_col: str = "embedding",
                     k: int = 8, seed: int = 42,
                     max_iter: int = 5) -> list[tuple[int, list[float]]]:
    """Train k-means (pyspark.ml, fixed seed) on the embedding column
    and return [(cent_id, center)] — the trained alternative to the
    first-n stand-in centroids.  Centers are tiny (k x dim floats), so
    they ride to ivf_assign/ivf_topk as driver-side literals exactly
    like the stand-ins."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    return [(i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]


def ivf_assign(emb: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding", n_cents: int = 8,
               centroids: list[tuple[int, list[float]]] | None = None
               ) -> DataFrame:
    """Assign every vector to its nearest centroid: input columns +
    `cent_id`.  Centroids are the first n_cents vectors by id (cheap
    stand-in) unless an explicit [(cent_id, center)] list — e.g. from
    kmeans_centroids — is passed.  Ties break to the lowest cent_id.

    Centroid assignment is a pure per-row function, so the <=n_cents
    centroids are collected once (tiny: a pushed-down `id < n` scan)
    and inlined as an array-of-structs literal; the argmax is a single
    narrow projection over that literal -- ZERO exchanges, regardless
    of |emb|.  The previous form (crossJoin(broadcast(cents)) then
    row_number over a window partitioned by vec_id) exploded every row
    x n_cents and shuffled the whole blow-up just to keep rank 1; at
    100 TB of vectors that shuffle IS the job.  Pinned by
    tests/test_plan_quality.py::test_ivf_assign_has_no_exchange.
    """
    if centroids is None:
        centroids = [(int(r["cent_id"]), list(r["cemb"])) for r in
                     emb.filter(F.col(id_col) < n_cents)
                     .select(F.col(id_col).cast("long").alias("cent_id"),
                             F.col(vec_col).cast("array<double>")
                             .alias("cemb"))
                     .collect()]
    cent_rows = sorted(centroids, key=lambda c: c[0])
    cent_arr = F.array(*[
        F.struct(
            F.lit(int(cid)).cast("long").alias("cent_id"),
            F.array(*[F.lit(float(x)) for x in vec])
             .cast("array<double>").alias("cemb"))
        for cid, vec in cent_rows])
    # score each centroid (same 6dp rounding as before, so assignments
    # are bit-identical to the old plan), then fold to the argmax; the
    # tie-break mirrors ORDER BY sim DESC, cent_id ASC.
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.round(cosine(F.col(vec_col), c["cemb"]), 6).alias("sim"),
            c["cent_id"].alias("cent_id")))
    best = F.aggregate(
        scored,
        F.struct(F.lit(float("-inf")).alias("sim"),
                 F.lit(-1).cast("long").alias("cent_id")),
        lambda acc, x: F.when(
            (x["sim"] > acc["sim"])
            | ((x["sim"] == acc["sim"]) & (x["cent_id"] < acc["cent_id"])),
            x).otherwise(acc))
    return emb.withColumn("cent_id", best["cent_id"])


def ivf_topk(emb: DataFrame, query: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", n_cents: int = 8,
             n_probe: int = 2, k: int = 20,
             payload: list[str] | None = None,
             centroids: list[tuple[int, list[float]]] | None = None
             ) -> DataFrame:
    """Approximate top-k: score only vectors whose cell is among the
    n_probe cells nearest the query.  Stand-in (first-n) or trained
    (kmeans_centroids) centroid sets both work."""
    if centroids is None:
        cents = emb.filter(F.col(id_col) < n_cents).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cemb"))
    else:
        cents = emb.sparkSession.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
            "cent_id long, cemb array<double>")
    probe = (cents.crossJoin(F.broadcast(query))
             .withColumn("sim", F.round(cosine(F.col("cemb"),
                                               F.col("qemb")), 6))
             .orderBy(F.desc("sim"), "cent_id")
             .limit(n_probe).select("cent_id"))
    asg = ivf_assign(emb, id_col=id_col, vec_col=vec_col, n_cents=n_cents,
                     centroids=centroids)
    candidates = asg.join(F.broadcast(probe), "cent_id")
    return brute_force_topk(candidates.drop("cent_id"), query,
                            vec_col=vec_col, k=k, payload=payload)


def cell_blocked_neardup(emb: DataFrame, *, id_col: str = "vec_id",
                         vec_col: str = "embedding", n_cents: int = 8,
                         threshold: float = 0.35) -> DataFrame:
    """(d1, d2, cos_sim) pairs with cosine >= threshold, compared only
    within each vector's assigned IVF cell."""
    asg = ivf_assign(emb, id_col=id_col, vec_col=vec_col, n_cents=n_cents)
    a = asg.select("cent_id", F.col(id_col).alias("d1"),
                   F.col(vec_col).alias("e1"))
    b = asg.select("cent_id", F.col(id_col).alias("d2"),
                   F.col(vec_col).alias("e2"))
    return (a.join(b, "cent_id")
            .filter(F.col("d1") < F.col("d2"))
            .withColumn("cos_sim",
                        F.round(cosine(F.col("e1"), F.col("e2")), 6))
            .filter(F.col("cos_sim") >= threshold)
            .select("d1", "d2", "cos_sim"))
