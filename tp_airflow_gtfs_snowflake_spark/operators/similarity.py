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

from pyspark.sql import Column, DataFrame
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
        # collect the stand-ins ONCE here (a pushed-down id<n scan) and
        # hand the literal list to ivf_assign, instead of letting both
        # this probe and the assignment scan the corpus for them.
        centroids = [(int(r["cent_id"]), list(r["cemb"])) for r in
                     emb.filter(F.col(id_col) < n_cents)
                     .select(F.col(id_col).cast("long").alias("cent_id"),
                             F.col(vec_col).cast("array<double>")
                             .alias("cemb"))
                     .collect()]
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


def pq_codebooks(emb: DataFrame, *, id_col: str = "vec_id",
                 vec_col: str = "embedding", m: int = 4,
                 k: int = 16) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: the vector space is split into
    `m` contiguous subspaces and each gets `k` codewords.  Stand-in
    codewords are the sub-chunks of the first k vectors by id (the
    same cheap deterministic choice as ivf_assign's stand-in
    centroids); swap in per-subspace k-means for trained quality —
    the encode/score plumbing is identical.

    Codebooks are tiny (m*k*(dim/m) doubles) and ride to executors as
    literals, exactly like IVF centroids."""
    rows = (emb.filter(F.col(id_col) < k)
            .select(F.col(id_col).cast("long").alias("i"),
                    F.col(vec_col).cast("array<double>").alias("v"))
            .collect())
    rows = sorted(rows, key=lambda r: r["i"])
    dim = len(rows[0]["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [[(int(r["i"]), list(r["v"][j * d:(j + 1) * d])) for r in rows]
            for j in range(m)]


def _sq_l2(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(emb: DataFrame,
              codebooks: list[list[tuple[int, list[float]]]], *,
              vec_col: str = "embedding") -> DataFrame:
    """Add `codes` (array<long>, one code per subspace): each subvector
    is replaced by its nearest codeword's id — 8x-32x compression of
    the corpus for ANN scans.  A pure per-row fold over literal
    codebooks: ZERO exchanges at any corpus size (the point of PQ —
    the compressed codes fit in memory where raw vectors do not).
    Squared-L2 is rounded to 6dp before the argmin so assignments are
    reproducible; ties break to the lowest code id."""
    m = len(codebooks)
    d = len(codebooks[0][0][1])
    v = F.col(vec_col).cast("array<double>")
    per_sub = []
    for j, book in enumerate(codebooks):
        sub = F.slice(v, j * d + 1, d)
        scored = F.array(*[
            F.struct(
                F.round(_sq_l2(sub, F.array(*[F.lit(float(x)) for x in cw])
                               .cast("array<double>")), 6).alias("dist"),
                F.lit(int(code)).cast("long").alias("code"))
            for code, cw in book])
        best = F.aggregate(
            scored,
            F.struct(F.lit(float("inf")).alias("dist"),
                     F.lit(-1).cast("long").alias("code")),
            lambda acc, x: F.when(
                (x["dist"] < acc["dist"])
                | ((x["dist"] == acc["dist"]) & (x["code"] < acc["code"])),
                x).otherwise(acc))
        per_sub.append(best["code"])
    return emb.withColumn("codes", F.array(*per_sub))


def pq_topk(emb: DataFrame, query: DataFrame, *, id_col: str = "vec_id",
            vec_col: str = "embedding", m: int = 4, n_words: int = 16,
            k: int = 20, refine: int = 100,
            payload: list[str] | None = None,
            codebooks: list[list[tuple[int, list[float]]]] | None = None
            ) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: the query's distance to
    every codeword is a tiny m x n_words lookup table computed once on
    the driver and shipped as a literal; each row's approximate
    distance is m table lookups over its `codes` — no vector math per
    row at scan time.  The approx top-`refine` candidates are then
    re-ranked by exact cosine and the exact top-k returned.

    refine >= |corpus| degenerates to exact brute force (the recall
    invariant tests pin this); at 100 TB the scan touches only the
    m-byte codes column — the raw embedding column is read for the
    `refine` survivors alone (parquet column pruning does the rest)."""
    if codebooks is None:
        codebooks = pq_codebooks(emb, id_col=id_col, vec_col=vec_col,
                                 m=m, k=n_words)
    payload = payload if payload is not None else [
        c for c in emb.columns if c != vec_col]
    q = query.select(F.col("qemb").cast("array<double>")).first()[0]
    d = len(codebooks[0][0][1])
    # driver-side LUT: lut[j][code] = ||q_sub_j - codeword||^2, 6dp
    lut = [[round(sum((float(q[j * d + i]) - cw[i]) ** 2
                      for i in range(d)), 6)
            for _, cw in book] for j, book in enumerate(codebooks)]
    lut_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in row]).cast("array<double>")
        for row in lut])
    coded = pq_encode(emb, codebooks, vec_col=vec_col)
    approx = F.aggregate(
        F.zip_with(lut_lit, F.col("codes"),
                   lambda row, c: F.element_at(row, c.cast("int") + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    cand = (coded.withColumn("approx_dist", F.round(approx, 6))
            .orderBy("approx_dist", id_col).limit(refine))
    return brute_force_topk(cand.drop("codes", "approx_dist"), query,
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
