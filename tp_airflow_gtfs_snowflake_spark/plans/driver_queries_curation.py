"""Second training-data-curation batch + interval-overlap join.

- c23: Gopher-style document quality rules (Rae et al. 2021, table A1
  — public paper) re-expressed as engine-exact integer arithmetic.
- c24: repetition metrics (dup-word / top-bigram fractions) — the
  "repetitious document" filter every pretraining pipeline runs.
- b36: interval x interval OVERLAP join via grid bucketing (b15 covers
  point-in-broadcast-range; this is the general two-sided case where
  NEITHER side fits in a broadcast and a nested-loop join would be
  O(n*m)).
- c25: signed-random-projection (SRP/hyperplane) LSH for cosine
  near-dup — the embedding-space sibling of MinHash (Charikar STOC'02);
  complements c10's IVF-cell blocking with a probe-free banded join.

Engine-parity conventions follow driver_queries: BIGINT casts on int
outputs, ppm integer ratios instead of float division, 6dp rounding
before any float comparison, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.functions.vectors import cosine, dot
from tp_airflow_gtfs_snowflake_spark.operators import similarity as SIM
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _register, _t
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries_ext import (
    _duck_toks, _spread)

_STOPS = ("the", "a", "of", "and", "in")
_STOPS_SQL = ", ".join(f"'{w}'" for w in _STOPS)


@_register(
    "c23_gopher_quality",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    m AS (SELECT doc_id, len(toks) AS n_words,
                 list_sum(list_transform(toks, w -> length(w))) AS sum_wlen,
                 len(list_filter(toks,
                     w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
                 len(list_filter(toks, w -> w IN ({_STOPS_SQL}))) AS n_stop
          FROM t WHERE len(toks) > 0)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(sum_wlen * 1000000 // n_words AS BIGINT) AS mean_wlen_ppm,
           CAST(n_alpha * 1000000 // n_words AS BIGINT) AS alpha_ppm,
           CAST(n_stop AS BIGINT) AS n_stop,
           (n_words BETWEEN 50 AND 100000
            AND sum_wlen * 1000000 // n_words BETWEEN 3000000 AND 10000000
            AND n_alpha * 1000000 // n_words >= 800000
            AND n_stop >= 2) AS keep
    FROM m
    """,
    "LLM-curation: Gopher quality rules (word-count bounds, mean word "
    "length 3-10, >=80% alphabetic words, >=2 stopwords) as integer-"
    "ppm arithmetic — a pure narrow map, no shuffle, trivially "
    "100 TB-parallel; the keep flag is the pretraining drop decision",
)
def c23_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    m = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.aggregate(F.transform(toks, lambda w: F.length(w)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_wlen"),
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).alias("n_alpha"),
        F.size(F.filter(toks, lambda w: w.isin(*_STOPS))).alias("n_stop"),
    ).filter(F.col("n_words") > 0)
    mean_ppm = F.expr("sum_wlen * 1000000 div n_words")
    alpha_ppm = F.expr("n_alpha * 1000000 div n_words")
    return m.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        mean_ppm.cast("long").alias("mean_wlen_ppm"),
        alpha_ppm.cast("long").alias("alpha_ppm"),
        F.col("n_stop").cast("long").alias("n_stop"),
        (F.col("n_words").between(50, 100000)
         & mean_ppm.between(3000000, 10000000)
         & (alpha_ppm >= 800000)
         & (F.col("n_stop") >= 2)).alias("keep"),
    )


@_register(
    "c24_repetition_metrics",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    b AS (SELECT doc_id, toks,
                 list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i + 1]) AS bgs
          FROM t WHERE len(toks) >= 2)
    SELECT doc_id,
           CAST((len(toks) - len(list_distinct(toks))) * 1000000
                // len(toks) AS BIGINT) AS dup_word_ppm,
           CAST(list_max(list_transform(bgs,
                  b1 -> len(list_filter(bgs, b2 -> b2 = b1)))) * 1000000
                // len(bgs) AS BIGINT) AS top_bigram_ppm
    FROM b
    """,
    "LLM-curation: repetition filter — duplicate-word fraction and "
    "most-frequent-bigram fraction (ppm).  Spark computes the top "
    "bigram as a max-run fold over the SORTED per-row bigram array: "
    "zero shuffle, no per-doc groupBy — the whole metric is a narrow "
    "map (the oracle uses the O(b^2) spec form; the fold is the "
    "scale form).  At 100 TB this filter costs one pass over text",
)
def c24_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    b = docs.select(
        "doc_id", toks.alias("toks"),
        F.array_sort(F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y))).alias("bgs"),
    ).filter(F.size("toks") >= 2)
    # Max run length in the sorted bigram list == count of the most
    # frequent bigram; one fold, no explode/groupBy.
    top = F.aggregate(
        F.col("bgs"),
        F.struct(F.lit("").alias("prev"),
                 F.lit(0).cast("long").alias("run"),
                 F.lit(0).cast("long").alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
             .otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1)
                 .otherwise(F.lit(1).cast("long"))).alias("best")),
        lambda acc: acc["best"])
    return b.select(
        "doc_id",
        F.expr("(size(toks) - size(array_distinct(toks))) * 1000000"
               " div size(toks)").cast("long").alias("dup_word_ppm"),
        (top * 1000000).cast("long")
        .__div__(F.size("bgs")).cast("long").alias("top_bigram_ppm"),
    )


@_register(
    "b36_interval_overlap_join",
    """
    WITH ship AS (
      SELECT l_orderkey, l_linenumber, l_shipdate,
             CAST(l_shipdate + (CAST(l_quantity AS INTEGER) % 14 + 1)
                  * INTERVAL 1 DAY AS DATE) AS l_receiptdate
      FROM lineitem WHERE l_quantity = 50),
    promo AS (
      SELECT o_orderkey, o_orderdate AS p_start,
             o_orderdate + INTERVAL 6 DAY AS p_end
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND year(o_orderdate) = 1995)
    SELECT o_orderkey,
           CAST(count(*) AS BIGINT) AS n_shipments,
           CAST(min(date_diff('day', DATE '1970-01-01', l_shipdate))
                AS BIGINT) AS first_ship_day,
           CAST(max(date_diff('day', DATE '1970-01-01', l_receiptdate))
                AS BIGINT) AS last_receipt_day
    FROM promo JOIN ship
      ON l_shipdate <= p_end AND p_start <= l_receiptdate
    GROUP BY o_orderkey
    """,
    "interval x interval OVERLAP join via 7-day grid bucketing: both "
    "sides explode into the week-cells their interval covers, the join "
    "is a plain equi-join on cell, and the count-once predicate (cell "
    "= the LATER interval's first cell) makes each overlapping pair "
    "appear exactly once — no distinct, no nested-loop.  The oracle "
    "runs the naive theta-join spec; at 100 TB the grid join shuffles "
    "O(rows x cells/interval) keyed rows while the naive form is "
    "O(n*m) — this is the standard distributed interval-join shape",
)
def b36_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    epoch = F.lit("1970-01-01")

    def cell(c):
        return F.floor(F.datediff(c, epoch) / 7)

    # the test lineitem carries no receipt date; derive a deterministic
    # one (shipdate + 1..14 days keyed on quantity) identically in both
    # engines so the interval has real width
    ship = (li.filter(F.col("l_quantity") == 50)
            .select("l_orderkey", "l_linenumber", "l_shipdate",
                    F.date_add("l_shipdate",
                               F.col("l_quantity").cast("int") % 14 + 1)
                    .alias("l_receiptdate"),
                    cell(F.col("l_shipdate")).alias("s_c0"))
            .withColumn("cell", F.explode(F.sequence(
                F.col("s_c0"), cell(F.col("l_receiptdate"))))))
    promo = (orders.filter((F.col("o_orderpriority") == "1-URGENT")
                           & (F.year("o_orderdate") == 1995))
             .select("o_orderkey",
                     F.col("o_orderdate").alias("p_start"),
                     F.date_add("o_orderdate", 6).alias("p_end"),
                     cell(F.col("o_orderdate")).alias("p_c0"))
             .withColumn("cell", F.explode(F.sequence(
                 F.col("p_c0"), cell(F.col("p_end"))))))
    pairs = promo.join(ship, "cell").filter(
        (F.col("l_shipdate") <= F.col("p_end"))
        & (F.col("p_start") <= F.col("l_receiptdate"))
        # count each overlapping pair in exactly one cell: the first
        # cell both intervals share = the later interval's start cell
        & (F.col("cell") == F.greatest("s_c0", "p_c0")))
    return (pairs.groupBy("o_orderkey")
            .agg(F.count("*").cast("long").alias("n_shipments"),
                 F.min(F.datediff("l_shipdate", epoch)).cast("long")
                 .alias("first_ship_day"),
                 F.max(F.datediff("l_receiptdate", epoch)).cast("long")
                 .alias("last_receipt_day")))


@_register(
    "c25_srp_lsh_neardup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    p AS (SELECT vec_id AS plane_id, emb AS pemb FROM e
          WHERE vec_id < 8),
    bits AS (
      SELECT e.vec_id, e.emb,
             CAST(sum(CASE WHEN round(list_inner_product(e.emb, p.pemb), 6)
                                >= 0
                           THEN 1 << plane_id ELSE 0 END) AS BIGINT) AS sig
      FROM e CROSS JOIN p GROUP BY e.vec_id, e.emb),
    bands AS (
      SELECT vec_id, emb, band, CASE WHEN band = 0 THEN sig % 16
                                     ELSE sig // 16 END AS bval
      FROM bits CROSS JOIN (SELECT unnest([0, 1]) AS band)),
    cand AS (
      SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2,
             a.emb AS e1, b.emb AS e2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id)
    SELECT d1, d2, round(list_cosine_similarity(e1, e2), 6) AS cos_sim
    FROM cand
    WHERE round(list_cosine_similarity(e1, e2), 6) >= 0.35
    """,
    "C2 signed-random-projection LSH (Charikar hyperplane hashing): "
    "8 sign-bits against data-derived planes -> 2 banded tables -> "
    "candidate equi-join -> exact cosine verify.  Like MinHash-LSH "
    "but for embeddings: candidates come from a bucketed equi-join "
    "(shuffle on 4-bit band values), never an all-pairs product; the "
    "sign bits are a narrow map over a broadcast plane set.  "
    "Complements c10 (IVF-cell blocking) with the probe-free variant",
)
def c25_srp_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    planes = [(int(r["vec_id"]), [float(x) for x in r["emb"]]) for r in
              emb.filter(F.col("vec_id") < 8)
              .select("vec_id",
                      F.col("embedding").cast("array<double>").alias("emb"))
              .collect()]
    # broadcast-as-literal plane set (same pattern as ivf_assign):
    # the signature is a pure per-row fold, zero exchanges.
    sig = F.aggregate(
        F.array(*[
            F.when(F.round(dot(F.col("embedding"),
                               F.array(*[F.lit(x) for x in vec])
                               .cast("array<double>")), 6) >= 0,
                   F.lit(1 << pid).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for pid, vec in sorted(planes)]),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    bits = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"),
        sig.alias("sig"))
    bands = bits.select(
        "vec_id", "emb",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     (F.col("sig") % 16).alias("bval")),
            F.struct(F.lit(1).alias("band"),
                     (F.col("sig") / F.lit(16)).cast("long")
                     .alias("bval")))).alias("bb")
    ).select("vec_id", "emb", F.col("bb.band").alias("band"),
             F.col("bb.bval").alias("bval"))
    a = bands.select("band", "bval", F.col("vec_id").alias("d1"),
                     F.col("emb").alias("e1"))
    b = bands.select("band", "bval", F.col("vec_id").alias("d2"),
                     F.col("emb").alias("e2"))
    cand = (a.join(b, ["band", "bval"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2", "e1", "e2").distinct())
    return (cand
            .withColumn("cos_sim",
                        F.round(cosine(F.col("e1"), F.col("e2")), 6))
            .filter(F.col("cos_sim") >= 0.35)
            .select("d1", "d2", "cos_sim"))


@_register(
    "c26_pq_ann", None,
    "C2 product-quantization ANN (Jegou et al. TPAMI'11): vectors "
    "compressed to m=4 codes against 16-word codebooks; the query's "
    "asymmetric-distance lookup table (m x 16 doubles) ships as a "
    "literal, so the corpus scan reads ONLY the codes column and does "
    "m array lookups per row — at 100 TB the raw embedding column is "
    "touched for the `refine` survivors alone.  Exact cosine re-rank "
    "of the top-100 approx candidates.  rows-only check (codebook "
    "training isn't SQL-expressible); recall invariants pinned by "
    "tests/test_operators_extra.py::test_pq_full_refine_equals_brute_"
    "force and ::test_pq_refine_recall",
)
def c26_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qemb"))
    return SIM.pq_topk(emb, qv, m=4, n_words=16, k=20, refine=100,
                       payload=["vec_id", "label"])


@_register(
    "c26c_pq_adc_int",
    """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * 1000) AS BIGINT)) AS q
      FROM embeddings
    ), cbl AS (
      SELECT list(q ORDER BY vec_id) AS books
      FROM e WHERE vec_id < 16
    ), qv AS (
      SELECT q AS qq FROM e WHERE vec_id = 0
    ), sub AS (
      SELECT e.vec_id, j.j,
             list_transform(range(0, 16), c ->
               list_sum(list_transform(range(1, 17), i ->
                 (e.q[j.j * 16 + i] - cbl.books[c + 1][j.j * 16 + i])
                 * (e.q[j.j * 16 + i]
                    - cbl.books[c + 1][j.j * 16 + i])))) AS dl,
             list_transform(range(0, 16), c ->
               list_sum(list_transform(range(1, 17), i ->
                 (qv.qq[j.j * 16 + i] - cbl.books[c + 1][j.j * 16 + i])
                 * (qv.qq[j.j * 16 + i]
                    - cbl.books[c + 1][j.j * 16 + i])))) AS lut
      FROM e, cbl, qv, range(0, 4) j(j)
    ), scored AS (
      SELECT vec_id,
             sum(lut[list_position(dl, list_min(dl))]) AS adc_dist
      FROM sub GROUP BY vec_id
    )
    SELECT vec_id, CAST(adc_dist AS BIGINT) AS adc_dist
    FROM scored
    ORDER BY adc_dist, vec_id
    LIMIT 20
    """,
    "VALUE-HASH-oracled PQ/ADC (the c26/c26b family's missing hard "
    "check): embeddings quantize to an integer grid (round(x*1000)), "
    "codebooks are the 16 lowest-id vectors' subvectors (m=4 "
    "subspaces x 16 codewords, the ivf_assign stand-in discipline), "
    "encode = integer squared-L2 argmin per subspace (ties to the "
    "lowest code via first-position), ADC = 4 lookups in the query's "
    "m x 16 integer LUT shipped as a literal.  All-integer "
    "arithmetic end to end, so DuckDB reproduces every distance "
    "bit-for-bit — proving the ADC scan logic the rows-only trained "
    "variants share.  Scan shape is identical to c26: narrow per-row "
    "map over codes + TakeOrdered top-k, zero exchanges before the "
    "final k rows",
)
def c26c_pq_adc_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    m, k_words, d = 4, 16, 16
    emb = _t(spark, sf_dir, "embeddings")
    qi = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.round(x * 1000).cast("long"))
    # bounded driver pulls: 16 codebook vectors + the query vector
    books = {int(r["vec_id"]): list(r["q"]) for r in
             emb.select("vec_id", qi.alias("q"))
             .filter(F.col("vec_id") < k_words).collect()}
    qvec = next(v for i, v in books.items() if i == 0)
    sub = lambda vec, j: vec[j * d:(j + 1) * d]
    luts = [[sum((a - b) * (a - b)
                 for a, b in zip(sub(qvec, j), sub(books[c], j)))
             for c in range(k_words)] for j in range(m)]

    # Arrow/numpy scoring: the m*k distance argmin is Catalyst's
    # worst shape (the 64-way literal fold drops to interpreted eval
    # — measured ~2.8 s vs ~0.4 s at sf0.1), and numpy's is one
    # (batch, k, d) broadcasted subtract per subspace.  All-int64
    # arithmetic, HALF-AWAY-FROM-ZERO quantization matching Spark's
    # F.round / DuckDB round exactly; argmin first-hit ties to the
    # lowest code like list_position.  Narrow map, zero exchanges
    # before the final TakeOrdered.
    import numpy as np
    import pandas as pd

    bk = np.array([[sub(books[c], j) for c in range(k_words)]
                   for j in range(m)], dtype=np.int64)      # (m, k, d)
    lut_np = np.array(luts, dtype=np.int64)                 # (m, k)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "adc_dist": pd.Series([], dtype="int64")})
                continue
            v = np.array([np.asarray(x, dtype=np.float64)
                          for x in pdf["embedding"]])
            scaled = v * 1000.0
            q = (np.sign(scaled)
                 * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
            total = np.zeros(len(pdf), dtype=np.int64)
            for j in range(m):
                sb = q[:, j * d:(j + 1) * d]
                diff = sb[:, None, :] - bk[j][None, :, :]
                dist = (diff * diff).sum(axis=2)
                total += lut_np[j][dist.argmin(axis=1)]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "adc_dist": total})

    out = (emb.select("vec_id", "embedding")
           .mapInPandas(score, "vec_id long, adc_dist long"))
    return out.orderBy("adc_dist", "vec_id").limit(20)


@_register(
    "b37_constraint_audit",
    """
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'orders_null_custkey',
           CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'orders_duplicate_orderkey',
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST((SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    """,
    "data-quality expectation suite (the dbt-test / constraint-audit "
    "pattern): referential integrity via LEFT ANTI join, null-rate, "
    "key-uniqueness, and value-domain checks, one row per check.  "
    "Each check is a single aggregating pass; the orphan check is the "
    "only shuffle (semi-join on the key) and rides broadcast when the "
    "parent side is small — audits run as cheap post-load gates at "
    "any scale",
)
def b37_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    n_li = li.count()
    n_ord = orders.count()

    def row(name, viol_df):
        return viol_df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("long").alias("n_violations"))

    orphan = row("lineitem_orphan_orderkey",
                 li.join(orders.select(F.col("o_orderkey")),
                         li["l_orderkey"] == F.col("o_orderkey"),
                         "left_anti")).withColumn(
        "n_checked", F.lit(n_li).cast("long"))
    nullck = row("orders_null_custkey",
                 orders.filter(F.col("o_custkey").isNull())).withColumn(
        "n_checked", F.lit(n_ord).cast("long"))
    dupck = (orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long")
        .alias("n_violations"))
        .select(F.lit("orders_duplicate_orderkey").alias("check_name"),
                "n_violations",
                F.lit(n_ord).cast("long").alias("n_checked")))
    domck = row("lineitem_nonpositive_price",
                li.filter(F.col("l_extendedprice") <= 0)).withColumn(
        "n_checked", F.lit(n_li).cast("long"))
    return orphan.unionByName(nullck).unionByName(dupck).unionByName(domck)


@_register(
    "b38_scd2_intervals",
    """
    WITH ch AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    starts AS (
      SELECT user_id, event_type, ts
      FROM ch WHERE prev_type IS NULL OR event_type <> prev_type)
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts)) AS valid_to_us,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
             AS is_current
    FROM starts
    """,
    "SCD2 (slowly-changing-dimension type 2) interval construction "
    "from an event change log: collapse consecutive same-value runs "
    "(lag), then close each version with the next version's start "
    "(lead) — the standard warehouse dimension-history builder.  Both "
    "windows share ONE per-user shuffle partitioning; at 100 TB the "
    "user key shards evenly and no global sort exists",
)
def b38_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id", "event_type", "ts",
        F.lag("event_type").over(w).alias("prev_type"))
    starts = ch.filter(F.col("prev_type").isNull()
                       | (F.col("event_type") != F.col("prev_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w2)
    return starts.select(
        "user_id", "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"))


@_register(
    "b39_linear_interpolation",
    """
    WITH d AS (
      SELECT o_orderpriority AS pri,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT)
               AS day_no,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
      GROUP BY 1, 2),
    bounds AS (SELECT min(day_no) AS lo, max(day_no) AS hi FROM d),
    spine AS (
      SELECT pri, gs.day_no
      FROM (SELECT DISTINCT pri FROM d),
           (SELECT unnest(generate_series(lo, hi)) AS day_no
            FROM bounds) gs),
    joined AS (
      SELECT s.pri, s.day_no, d.n_orders
      FROM spine s LEFT JOIN d ON s.pri = d.pri AND s.day_no = d.day_no),
    ctx AS (
      SELECT pri, day_no, n_orders,
             last_value(n_orders IGNORE NULLS) OVER (
               PARTITION BY pri ORDER BY day_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(day_if_obs IGNORE NULLS) OVER (
               PARTITION BY pri ORDER BY day_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(n_orders IGNORE NULLS) OVER (
               PARTITION BY pri ORDER BY day_no
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(day_if_obs IGNORE NULLS) OVER (
               PARTITION BY pri ORDER BY day_no
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM (SELECT pri, day_no, n_orders,
                   CASE WHEN n_orders IS NOT NULL
                        THEN day_no END AS day_if_obs
            FROM joined) j)
    SELECT pri, day_no, n_orders IS NULL AS was_gap,
           round(CASE
             WHEN n_orders IS NOT NULL THEN n_orders
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (day_no - pd) * 1.0 / (nd - pd)
           END, 6) AS n_orders_interp
    FROM ctx
    """,
    "time-series LINEAR interpolation over the dense calendar spine: "
    "previous/next observation via last_value/first_value IGNORE "
    "NULLS over mirrored frames, then the two-point line formula; "
    "edges clamp to the nearest observation.  Same single (pri) "
    "shuffle serves the join and all four windows — the resample "
    "primitive for sensor/metric regularization before model windows",
)
def b39_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1996-03-01")))
    d = (o.groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1970-01-01")).cast("long").alias("day_no"))
         .agg(F.count("*").cast("long").alias("n_orders")))
    lo, hi = d.agg(F.min("day_no"), F.max("day_no")).first()
    spine = (d.select("pri").distinct()
             .crossJoin(F.broadcast(
                 _spread(spark, d.sparkSession.range(lo, hi + 1)
                         .select(F.col("id").alias("day_no"))))))
    joined = spine.join(d, ["pri", "day_no"], "left")
    back = (Window.partitionBy("pri").orderBy("day_no")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = (Window.partitionBy("pri").orderBy("day_no")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_day = F.when(F.col("n_orders").isNotNull(), F.col("day_no"))
    ctx = joined.select(
        "pri", "day_no", "n_orders",
        F.last("n_orders", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("n_orders", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"))
    interp = (F.when(F.col("n_orders").isNotNull(),
                     F.col("n_orders").cast("double"))
              .when(F.col("pv").isNull(), F.col("nv").cast("double"))
              .when(F.col("nv").isNull(), F.col("pv").cast("double"))
              .otherwise(
                  F.col("pv") + (F.col("nv") - F.col("pv"))
                  * (F.col("day_no") - F.col("pd"))
                  / (F.col("nd") - F.col("pd"))))
    return ctx.select("pri", "day_no",
                      F.col("n_orders").isNull().alias("was_gap"),
                      F.round(interp, 6).alias("n_orders_interp"))


@_register(
    "b40_profile_table",
    """
    SELECT 'o_orderkey' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           round(min(o_orderkey), 6) AS min_val,
           round(max(o_orderkey), 6) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(min(o_custkey), 6), round(max(o_custkey), 6)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 6), round(max(o_totalprice), 6)
    FROM orders
    """,
    "column-profiling pass (the ANALYZE/data-catalog primitive): "
    "count / null-count / exact distinct / min / max per column.  "
    "Spark computes ALL columns in ONE scan with per-column distinct "
    "aggregates (Expand under the hood) then unpivots to the "
    "one-row-per-column shape; the oracle re-scans per column.  For "
    "interactive 100 TB profiling swap exact distinct for "
    "approx_count_distinct (b23) — same plan, sketch memory",
)
def b40_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    agg = o.agg(
        F.count("*").alias("_n"),
        *[a for c in cols for a in (
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__mn"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__mx"))])
    per_col = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col("_n").cast("long").alias("n_rows"),
                 F.col(f"{c}__nn").cast("long").alias("n_nonnull"),
                 F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                 F.col(f"{c}__mn").alias("min_val"),
                 F.col(f"{c}__mx").alias("max_val"))
        for c in cols])
    return (agg.select(F.explode(per_col).alias("p"))
            .select("p.col_name", "p.n_rows", "p.n_nonnull",
                    "p.n_distinct", "p.min_val", "p.max_val"))


@_register(
    "c26b_pq_kmeans_ann", None,
    "C2 product quantization with TRAINED per-subspace codebooks: "
    "pyspark.ml k-means (fixed seed) learns 16 codewords per "
    "subspace on the sliced subvectors, then the same Arrow encode / "
    "ADC lookup-table scan / exact re-rank as c26.  rows-only check "
    "(k-means isn't SQL-expressible); the refine>=corpus == "
    "brute-force invariant is codebook-independent and pinned by "
    "tests/test_operators_extra.py",
)
def c26b_pq_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    books = SIM.pq_codebooks_kmeans(emb, m=4, k=16, seed=42)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qemb"))
    return SIM.pq_topk(emb, qv, m=4, n_words=16, k=20, refine=100,
                       payload=["vec_id", "label"], codebooks=books)
