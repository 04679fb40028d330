"""TPC-H round-3 batch: the join/subquery shapes that complete the
TPC-H family on the driver's star schema.

Q7/Q8/Q15/Q21 are expressible directly on the available columns
(adapted where the driver schema lacks TPC-H columns — noted per
query).  Q2/Q9/Q11/Q16/Q20 need PARTSUPP, which the driver schema
does not ship; each derives an equivalent supply relation from
lineitem (DISTINCT (l_partkey, l_suppkey) plus exact aggregates) in
BOTH engines, so the subquery/join shape under test is identical to
the real query while the inputs stay engine-agreed.

Engine-parity rules (same as driver_queries):
- money sums go through DECIMAL(18,2) so the sum is exact and
  order-independent in both Spark and DuckDB;
- quantity sums cast to BIGINT (exact at any order);
- unit costs are per-row IEEE double ops (division/multiplication are
  deterministic per row; only SUMS of doubles are order-sensitive,
  and those are never compared raw);
- every aggregate/computed column is aliased identically on both
  sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _register, _t

_DEC = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(_DEC)


def _money_sum(col):
    """Exact decimal sum surfaced as DOUBLE (both engines bit-agree)."""
    return F.sum(col).cast("decimal(38,4)").cast("double")


def _views(spark: SparkSession, sf_dir: str, prefix: str, *tables: str):
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}_{t}")


# =====================================================================
# Q7 — volume shipping between two nations (nation pair disjunction)
# =====================================================================

@_register(
    "q07_volume_shipping",
    """
    WITH v AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
              AND n2.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8'))
          OR (n1.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8')
              AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
           CAST(CAST(CAST(sum(volume) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM v GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 volume shipping: two-fact join with a nation-PAIR "
    "disjunction.  The pair predicate sits above two broadcast nation "
    "joins, so it filters after cheap hash probes — only the "
    "lineitem<->orders shuffle is big.  At 100 TB both nation joins "
    "stay broadcast and the disjunction never forces a cartesian",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1998-01-01")))
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    n1 = na.select(F.col("n_nationkey").alias("n1_key"),
                   F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("n2_key"),
                   F.col("n_name").alias("cust_nation"))
    grp_a = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    grp_b = ["NATION_5", "NATION_6", "NATION_7", "NATION_8"]
    pair = ((F.col("supp_nation").isin(grp_a)
             & F.col("cust_nation").isin(grp_b))
            | (F.col("supp_nation").isin(grp_b)
               & F.col("cust_nation").isin(grp_a)))
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
            .join(F.broadcast(n1), su.s_nationkey == F.col("n1_key"))
            .join(F.broadcast(n2), cu.c_nationkey == F.col("n2_key"))
            .filter(pair)
            .withColumn("l_year", F.year("l_shipdate").cast("long"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(_money_sum(volume).alias("revenue"),
                 F.count("*").cast("long").alias("n_items")))


# =====================================================================
# Q8 — national market share within a region
# =====================================================================

@_register(
    "q08_market_share",
    """
    WITH an AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(CAST(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume END)
                AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS nation_volume,
           CAST(CAST(CAST(sum(volume) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
             AS total_volume,
           CAST(count(*) AS BIGINT) AS n_items
    FROM an GROUP BY o_year
    """,
    "TPC-H Q8 market share: 8-table star join, conditional aggregate "
    "(one nation's volume vs all) per order-year.  Numerator and "
    "denominator are surfaced separately as exact decimal sums — the "
    "consumer divides; comparing a ratio of order-sensitive double "
    "sums cross-engine would be flaky.  All dims broadcast; facts "
    "shuffle once on orderkey",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1998-01-01")))
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re_ = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = na.select(F.col("n_nationkey").alias("n1_key"),
                   F.col("n_regionkey").alias("n1_rkey"))
    n2 = na.select(F.col("n_nationkey").alias("n2_key"),
                   F.col("n_name").alias("nation"))
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
            .join(F.broadcast(n1), cu.c_nationkey == F.col("n1_key"))
            .join(F.broadcast(re_), F.col("n1_rkey") == re_.r_regionkey)
            .join(F.broadcast(n2), su.s_nationkey == F.col("n2_key"))
            .withColumn("o_year", F.year("o_orderdate").cast("long"))
            .groupBy("o_year")
            .agg(_money_sum(F.when(F.col("nation") == "NATION_5", volume))
                 .alias("nation_volume"),
                 _money_sum(volume).alias("total_volume"),
                 F.count("*").cast("long").alias("n_items")))


# =====================================================================
# Q15 — top supplier (aggregate CTE + uncorrelated scalar max)
# =====================================================================

@_register(
    "q15_top_supplier",
    """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))))
                  AS DECIMAL(38,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    "TPC-H Q15 top supplier: quarterly revenue view reused twice — "
    "once joined to supplier, once reduced to its scalar max.  The "
    "max-equality predicate is exact because revenue is an exact "
    "decimal sum in both engines.  Spark computes the view once, "
    "derives the 1-row max, and broadcast-joins it back (no window, "
    "no second scan of lineitem)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01")))
    su = _t(spark, sf_dir, "supplier")
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(volume).cast("decimal(38,4)").alias("total_revenue")))
    top = rev.agg(F.max("total_revenue").alias("_max_rev"))
    return (rev.join(F.broadcast(top),
                     rev.total_revenue == F.col("_max_rev"))
            .join(F.broadcast(su), F.col("supplier_no") == su.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("double")
                    .alias("total_revenue")))


# =====================================================================
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS pair)
# =====================================================================

@_register(
    "q21_waiting_supplier",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
      JOIN orders   ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
    "TPC-H Q21 shape: the sole-late-supplier query — correlated "
    "EXISTS (another supplier touched the order) AND correlated NOT "
    "EXISTS (no OTHER supplier was late on it), both referencing the "
    "outer row.  Catalyst plans them as one left-semi and one "
    "left-anti join on l_orderkey.  Adapted: the driver schema has no "
    "l_commitdate/l_receiptdate, so 'late' is l_shipdate more than 60 "
    "days after o_orderdate (reference semantics: receipt after "
    "commit).  The anti join's extra l_shipdate predicate correlates "
    "through o_orderdate exactly like the reference's does",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "q21", "lineitem", "orders", "supplier", "nation")
    return spark.sql("""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM q21_lineitem l1
          JOIN q21_orders   ON o_orderkey = l1.l_orderkey
          JOIN q21_supplier ON s_suppkey = l1.l_suppkey
          JOIN q21_nation   ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          AND n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
          AND EXISTS (SELECT 1 FROM q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate
                                                + INTERVAL 60 DAYS)
        GROUP BY s_name
    """)


# =====================================================================
# Derived PARTSUPP: the driver schema ships no partsupp table, so the
# Q2/Q9/Q11/Q16/Q20 family derives one from lineitem identically in
# both engines.  ps_availqty = total shipped quantity (exact BIGINT),
# ps_mincost = cheapest observed extended price (exact DECIMAL),
# ps_unitcost = min per-row price/qty (IEEE double, order-independent
# because MIN is).
# =====================================================================

_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS ps_availqty,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_mincost,
             min(l_extendedprice / l_quantity) AS ps_unitcost
      FROM lineitem GROUP BY 1, 2
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                       F.col("l_suppkey").alias("ps_suppkey"))
            .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
                 .alias("ps_availqty"),
                 F.min(_dec("l_extendedprice")).alias("ps_mincost"),
                 F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("ps_unitcost")))


@_register(
    "q02_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_SQL})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           ps_unitcost AS supplycost
    FROM part
      JOIN ps       ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size <= 10 AND p_type = 'SMALL' AND r_name = 'EUROPE'
      AND ps_unitcost = (
        SELECT min(ps2.ps_unitcost)
        FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "TPC-H Q2 minimum-cost supplier: correlated scalar MIN subquery "
    "that itself contains a 3-way join, correlated on the outer "
    "p_partkey.  Catalyst decorrelates it into one per-part aggregate "
    "over the joined supply relation, joined back on partkey+cost — "
    "never a per-row probe.  ps_unitcost is a per-row IEEE division "
    "min-reduced, so the equality is exact cross-engine.  partsupp is "
    "derived from lineitem (schema ships none); the subquery shape is "
    "the reference one",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "q02", "part", "supplier", "nation", "region")
    _ps(spark, sf_dir).createOrReplaceTempView("q02_ps")
    return spark.sql("""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
               ps_unitcost AS supplycost
        FROM q02_part
          JOIN q02_ps       ON p_partkey = ps_partkey
          JOIN q02_supplier ON s_suppkey = ps_suppkey
          JOIN q02_nation   ON s_nationkey = n_nationkey
          JOIN q02_region   ON n_regionkey = r_regionkey
        WHERE p_size <= 10 AND p_type = 'SMALL' AND r_name = 'EUROPE'
          AND ps_unitcost = (
            SELECT min(ps2.ps_unitcost)
            FROM q02_ps ps2
              JOIN q02_supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
              JOIN q02_nation n2   ON s2.s_nationkey = n2.n_nationkey
              JOIN q02_region r2   ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """)


@_register(
    "q09_product_profit",
    f"""
    WITH ps AS ({_PS_SQL})
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(CAST(CAST(sum(amount) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS profit,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - ps_mincost * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        JOIN ps       ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    "TPC-H Q9 product-type profit: profit expression spanning fact "
    "and supply-relation columns, grouped by supplier nation x order "
    "year.  The ps join is two-key (partkey, suppkey) — it co-shuffles "
    "with the fact on the same composite key; orders is the second "
    "shuffle; part/supplier/nation broadcast.  Cost term uses the "
    "exact-decimal ps_mincost so the whole amount stays decimal "
    "(adapted: no ps_supplycost in the schema)",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    su = _t(spark, sf_dir, "supplier")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    na = _t(spark, sf_dir, "nation")
    ps = _ps(spark, sf_dir)
    amount = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
              - F.col("ps_mincost") * _dec("l_quantity"))
    return (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .join(ps, (li.l_partkey == ps.ps_partkey)
                  & (li.l_suppkey == ps.ps_suppkey))
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").cast("long").alias("o_year"),
                    amount.alias("amount"))
            .groupBy("nation", "o_year")
            .agg(_money_sum(F.col("amount")).alias("profit"),
                 F.count("*").cast("long").alias("n_items")))


@_register(
    "q11_important_stock",
    f"""
    WITH ps AS ({_PS_SQL}),
    g AS (
      SELECT ps_partkey,
             sum(ps_mincost * ps_availqty) AS val
      FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY ps_partkey
    )
    SELECT ps_partkey,
           CAST(CAST(CAST(val AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS part_value
    FROM g
    WHERE CAST(val AS DOUBLE) > (
      SELECT CAST(CAST(CAST(sum(ps_mincost * ps_availqty) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) * 0.005
      FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
    """,
    "TPC-H Q11 important stock: per-part inventory value filtered "
    "against a FRACTION of the global total — an uncorrelated scalar "
    "subquery over the same aggregate, evaluated once and broadcast "
    "as a literal into the HAVING.  Both value and threshold are "
    "exact decimal sums surfaced as DOUBLE, multiplied by the same "
    "double constant, so the comparison is bit-identical cross-engine",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier")
    na = (_t(spark, sf_dir, "nation")
          .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")))
    ps = _ps(spark, sf_dir)
    joined = (ps.join(F.broadcast(su), ps.ps_suppkey == su.s_suppkey)
              .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
              .withColumn("item_val",
                          F.col("ps_mincost") * F.col("ps_availqty")))
    g = (joined.groupBy("ps_partkey")
         .agg(F.sum("item_val").alias("val")))
    total = (joined.agg((F.sum("item_val").cast("decimal(38,2)")
                         .cast("double") * F.lit(0.005))
                        .alias("_threshold")))
    return (g.join(F.broadcast(total),
                   g.val.cast("double") > F.col("_threshold"))
            .select("ps_partkey",
                    F.col("val").cast("decimal(38,2)").cast("double")
                    .alias("part_value")))


@_register(
    "q16_supplier_cnt",
    f"""
    WITH ps AS ({_PS_SQL})
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
    "TPC-H Q16 supplier count: negated predicates + NOT IN "
    "(null-aware anti join against the excluded-supplier set) + "
    "count(DISTINCT) per part attribute triple.  s_suppkey is "
    "non-null so the NOT IN degrades to a plain anti join; the "
    "distinct count is a two-phase partial/final aggregate",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = (_t(spark, sf_dir, "part")
          .filter((F.col("p_brand") != "Brand#1")
                  & (F.col("p_type") != "MEDIUM")
                  & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)))
    bad = (_t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    ps = _ps(spark, sf_dir)
    return (ps.join(bad, ps.ps_suppkey == bad.s_suppkey, "left_anti")
            .join(F.broadcast(pa), ps.ps_partkey == pa.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("ps_suppkey").cast("long")
                 .alias("supplier_cnt")))


@_register(
    "q20_excess_inventory",
    f"""
    WITH ps AS ({_PS_SQL})
    SELECT s_name, CAST(s_suppkey AS BIGINT) AS s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_0', 'NATION_2', 'NATION_4', 'NATION_6',
                     'NATION_8', 'NATION_10', 'NATION_12')
      AND s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > (
            SELECT 0.3 * sum(CAST(l_quantity AS BIGINT))
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
    """,
    "TPC-H Q20 excess inventory: nested IN subqueries three deep — "
    "supplier IN (supply rows whose part IN (name-matched parts) AND "
    "whose availqty exceeds a CORRELATED 30%-of-year-shipments "
    "scalar).  Catalyst turns the INs into semi joins and "
    "decorrelates the scalar into a per-(part,supp) aggregate joined "
    "back — three shuffles total, no per-row probes.  Quantities are "
    "exact BIGINT sums; the 0.3x threshold is one double multiply on "
    "both sides",
)
def q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "q20", "supplier", "nation", "part", "lineitem")
    _ps(spark, sf_dir).createOrReplaceTempView("q20_ps")
    return spark.sql("""
        SELECT s_name, CAST(s_suppkey AS BIGINT) AS s_suppkey
        FROM q20_supplier JOIN q20_nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_0', 'NATION_2', 'NATION_4', 'NATION_6',
                         'NATION_8', 'NATION_10', 'NATION_12')
          AND s_suppkey IN (
            SELECT ps_suppkey FROM q20_ps
            WHERE ps_partkey IN
                  (SELECT p_partkey FROM q20_part
                   WHERE p_name LIKE 'small%')
              AND ps_availqty > (
                SELECT 0.3 * sum(CAST(l_quantity AS BIGINT))
                FROM q20_lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
    """)
