"""Driver-table query registry: one entry per implemented operator from
SURVEY.md section 2, each with a DuckDB oracle SQL equivalent.

Every query maps a reference-repo semantic (cited per entry) onto the
driver's TPC-H-ish testdata per FIXTURES.md section 2 role table
(lineitem = stop_times-like big fact, orders = trip header, events =
RT feed with event time, customer/nation/region = dimensions,
documents/embeddings = charter-extension corpora).

Engine-parity conventions (so the driver's order-insensitive value
hash matches between Spark and DuckDB):
- every integer output is cast to BIGINT on both sides (DuckDB widens
  integer sums to HUGEINT, Spark keeps LongType);
- money aggregates are computed in DECIMAL from the source column so
  the arithmetic is exact and order-independent, final cast
  DECIMAL(38,2)/(38,4) on both sides;
- AVG is only used over integer-valued or 0/1 data (exact in double
  for < 2^53), rounded to 6 dp on both sides;
- timestamps are emitted as epoch microseconds (unix_micros /
  epoch_us) or formatted strings, never raw timestamp objects;
- all orderings that feed a LIMIT are made deterministic with a key
  tiebreaker.

Scale notes are inline: each query is written the way it should run on
a 1000-executor / 100 TB cluster (broadcast the dims, pre-aggregate
before join where legal, let AQE coalesce), not just the way that
passes at sf0.01.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.functions.gtfs_time import gtfs_time_to_seconds
from tp_airflow_gtfs_snowflake_spark.functions.vectors import cosine


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Hour/day bucketing and timestamp formatting must agree with the
    # UTC-naive DuckDB oracle regardless of the caller's session TZ.
    try:
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    if name == "events":
        # Historically events.parquet carried TIMESTAMP(NANOS), which
        # Spark's parquet reader rejects; current driver testdata uses
        # TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads
        # as TIMESTAMP_NTZ.  Normalize BOTH to session-UTC TIMESTAMP so
        # downstream unix_micros/window logic sees one type; in a UTC
        # session the NTZ->LTZ cast is wall-clock-identical to DuckDB's
        # naive TIMESTAMP semantics.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # nanos-as-long: truncate ns->us with integer division
            # (double arithmetic would lose precision at epoch-nanos
            # magnitudes); DuckDB truncates ns->us on read identically.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver records weaker rows-only check
    note: str


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, note: str):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, note=note)
        return fn
    return deco


# =====================================================================
# Flagship (SURVEY §7 M1): scan + join + window-span + agg + top-k in
# one plan — the Spark analogue of "scheduled trip duration per route,
# top-k" (stop_times ⋈ trips ⋈ routes; B3+B10+B7).
# =====================================================================

@_register(
    "flagship_span_topk",
    """
    WITH k AS (
      SELECT l_orderkey, l_shipdate,
             CAST(l_linenumber AS BIGINT) * 10000000000 +
             CAST(epoch(l_shipdate) AS BIGINT) AS seq_key
      FROM lineitem
    ), spans AS (
      SELECT l_orderkey,
             date_diff('day', arg_min(l_shipdate, seq_key),
                              arg_max(l_shipdate, seq_key)) AS span_days,
             count(*) AS n_lines
      FROM k GROUP BY l_orderkey
    )
    SELECT o_orderpriority,
           round(avg(span_days), 6) AS avg_span_days,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM spans JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY avg_span_days DESC, o_orderpriority
    LIMIT 5
    """,
    "B3+B10+B7: per-trip span (first/last over sequence) joined to header, top-k",
)
def flagship_span_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # Per-order span = ship(last line) - ship(first line) in the
    # (l_linenumber, l_shipdate) sequence (reference semantics:
    # time(last stop) - time(first stop) per trip, gtfs KPI
    # README.md:126).  min_by/max_by over a composite sequence key is
    # ONE partially-aggregatable hash agg — map-side combine, no
    # per-key sort, no window exchange.  (The window formulation costs
    # an extra Sort inside the shuffle and ran ~2x slower; the window
    # family itself is covered by b10_span_per_group.)
    seq = (F.col("l_linenumber").cast("long") * F.lit(10_000_000_000)
           + F.unix_timestamp("l_shipdate"))
    spans = li.groupBy("l_orderkey").agg(
        F.datediff(F.max_by("l_shipdate", seq),
                   F.min_by("l_shipdate", seq)).cast("long").alias("span_days"),
        F.count("*").cast("long").alias("n_lines"),
    )
    return (
        spans.join(o, spans.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("span_days"), 6).alias("avg_span_days"),
            F.count("*").cast("long").alias("n_orders"),
        )
        .orderBy(F.desc("avg_span_days"), "o_orderpriority")
        .limit(5)
    )


# =====================================================================
# Tier A — literal reference operators (SURVEY §2.1-2.2)
# =====================================================================

@_register(
    "a13_explode_array",
    """
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           unnest(embedding)::DOUBLE AS val
    FROM embeddings WHERE vec_id < 50
    """,
    "A13 explode repeated field (gtfs_rt_minutely.py:103-109) via posexplode",
)
def a13_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("long").alias("pos"),
                F.col("val").cast("double").alias("val"))
    )


@_register(
    "a15_dedup_first_wins",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
    "A15 deterministic first-wins dedup (gtfs_rt_minutely.py:98-100 seen_trips)",
)
def a15_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # dropDuplicates is nondeterministic across partitions (SURVEY §7
    # hard parts) -> impose explicit ordering with row_number.
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id",
                F.unix_micros("ts").alias("ts_us"), "event_type")
    )


@_register(
    "a16_lenient_cast",
    """
    WITH s AS (
      SELECT CASE WHEN l_linenumber > 3
                  THEN CAST(l_orderkey AS VARCHAR) || 'x'
                  ELSE CAST(l_orderkey AS VARCHAR) END AS raw
      FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(TRY_CAST(raw AS BIGINT)) AS BIGINT) AS n_parsed,
           CAST(sum(TRY_CAST(raw AS BIGINT)) AS BIGINT) AS sum_parsed
    FROM s
    """,
    "A16 lenient numeric cast, null on garbage (gtfs_rt_minutely.py:120-123)",
)
def a16_lenient_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    raw = F.when(F.col("l_linenumber") > 3,
                 F.concat(F.col("l_orderkey").cast("string"), F.lit("x"))
                 ).otherwise(F.col("l_orderkey").cast("string"))
    return (
        li.select(raw.alias("raw"))
        .select(F.expr("try_cast(raw AS BIGINT)").alias("v"))
        .agg(F.count("*").cast("long").alias("n_rows"),
             F.count("v").cast("long").alias("n_parsed"),
             F.sum("v").cast("long").alias("sum_parsed"))
    )


@_register(
    "a17_round_cast",
    """
    SELECT CAST(round(value) AS BIGINT) AS v_rounded,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY v_rounded
    """,
    "A17 round-then-cast (gtfs_rt_minutely.py:172 bearing)",
)
def a17_round_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.round("value", 0).cast("long").alias("v_rounded"))
        .groupBy("v_rounded")
        .agg(F.count("*").cast("long").alias("n"))
    )


@_register(
    "a18_projection_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 45
    """,
    "A18 projection + pushed-down filter (gtfs_silver.py:125-213 silver selects)",
)
def a18_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Both the filter and the 3-column ReadSchema push to the parquet
    # scan — verified via explain("formatted") (PushedFilters).
    return (li.filter(F.col("l_quantity") >= 45)
              .select("l_orderkey", "l_linenumber", "l_quantity"))


@_register(
    "a19_coalesce",
    """
    SELECT coalesce(nullif(l_returnflag, 'N'), 'ls:' || l_linestatus) AS flag,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY flag
    """,
    "A19 COALESCE intermediate_stop (gtfs_silver.py:173,195)",
)
def a19_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    flag = F.coalesce(F.nullif("l_returnflag", F.lit("N")),
                      F.concat(F.lit("ls:"), F.col("l_linestatus")))
    return (li.select(flag.alias("flag"))
              .groupBy("flag").agg(F.count("*").cast("long").alias("n")))


@_register(
    "a20_case_null_label",
    """
    SELECT CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL
                THEN 'in experimentation' ELSE o_orderpriority END AS prio_label,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY prio_label
    """,
    "A20 CASE WHEN NULL -> 'in experimentation' + to-string (gtfs_silver.py:184)",
)
def a20_case_null_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = F.nullif("o_orderpriority", F.lit("1-URGENT"))
    label = F.when(c.isNull(), F.lit("in experimentation")).otherwise(
        F.col("o_orderpriority").cast("string"))
    return (o.select(label.alias("prio_label"))
             .groupBy("prio_label").agg(F.count("*").cast("long").alias("n")))


@_register(
    "a21_scalar_max_watermark",
    """
    SELECT CAST(count(*) AS BIGINT) AS n,
           epoch_us(min(ts)) AS first_us,
           epoch_us(max(ts)) AS watermark_us
    FROM events
    """,
    "A21 scalar MAX(insert_date) watermark (gtfs_silver.py:133)",
)
def a21_scalar_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").cast("long").alias("n"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("watermark_us"),
    )


@_register(
    "a22_incremental_filter",
    """
    SELECT event_id FROM events
    WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    """,
    "A22 high-watermark incremental predicate (gtfs_silver.py:125-213)",
)
def a22_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("a22_events")
    # Scalar subquery, as in the reference's
    # WHERE insert_date > (SELECT MAX(insert_date) FROM dst).
    return spark.sql(
        "SELECT event_id FROM a22_events "
        "WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM a22_events)")


@_register(
    "a23_timezone_convert",
    """
    SELECT event_id,
           strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Paris',
                    '%Y-%m-%d %H:%M:%S') AS paris_ts
    FROM events WHERE event_id < 2000
    """,
    "A23 CONVERT_TIMEZONE Europe/Paris (gtfs_static_daily.py:58, gtfs_silver.py:15)",
)
def a23_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.date_format(
                F.from_utc_timestamp(F.col("ts").cast("timestamp"), "Europe/Paris"),
                "yyyy-MM-dd HH:mm:ss").alias("paris_ts"),
        )
    )


# =====================================================================
# Tier B — KPI-layer analytic operators (SURVEY §2.3)
# =====================================================================

@_register(
    "b01_gtfs_time_parse",
    """
    WITH t AS (
      SELECT l_returnflag,
             CAST(20 + l_linenumber AS VARCHAR) || ':' ||
             lpad(CAST(l_partkey % 60 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST(l_suppkey % 60 AS VARCHAR), 2, '0') AS gtfs_time
      FROM lineitem
    ), p AS (
      SELECT l_returnflag,
             CAST(string_split(gtfs_time, ':')[1] AS BIGINT) * 3600 +
             CAST(string_split(gtfs_time, ':')[2] AS BIGINT) * 60 +
             CAST(string_split(gtfs_time, ':')[3] AS BIGINT) AS secs
      FROM t
    )
    SELECT l_returnflag,
           CAST(sum(secs) AS BIGINT) AS sum_secs,
           CAST(max(secs) AS BIGINT) AS max_secs,
           CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY l_returnflag
    """,
    "B1 GTFS 'HH:MM:SS' parse incl. >24:00:00 (stop_times, gtfs_static_daily.py:94-95)",
)
def b01_gtfs_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Synthesize service times; 20+linenumber in 21..27 exercises the
    # GTFS >24h trap that breaks naive to_timestamp.
    gtfs_time = F.concat(
        (F.lit(20) + F.col("l_linenumber")).cast("string"), F.lit(":"),
        F.lpad((F.col("l_partkey") % 60).cast("string"), 2, "0"), F.lit(":"),
        F.lpad((F.col("l_suppkey") % 60).cast("string"), 2, "0"),
    )
    secs = gtfs_time_to_seconds(gtfs_time)
    return (
        li.select("l_returnflag", secs.alias("secs"))
        .groupBy("l_returnflag")
        .agg(F.sum("secs").cast("long").alias("sum_secs"),
             F.max("secs").cast("long").alias("max_secs"),
             F.count("*").cast("long").alias("n"))
    )


@_register(
    "b02_epoch_local_buckets",
    """
    SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events GROUP BY hour_of_day
    """,
    "B2 event-time hour bucketing (timestamp_epoch, gtfs_rt_minutely.py:215)",
)
def b02_epoch_local_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(F.count("*").cast("long").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)"))
              .cast("double").alias("sum_value"))
    )


@_register(
    "b03_delay_join",
    """
    SELECT o_orderpriority,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 6) AS avg_delay_days,
           CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_delay,
           CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_delay,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    "B3 observed-vs-scheduled delay equi-join (trip_stop_times ⋈ stop_times_static)",
)
def b03_delay_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # Shuffle equi-join on the fact key; at 100 TB both sides are big so
    # this stays a sort-merge join (AQE handles skew).
    d = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", d.alias("delay"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.avg("delay"), 6).alias("avg_delay_days"),
             F.min("delay").cast("long").alias("min_delay"),
             F.max("delay").cast("long").alias("max_delay"),
             F.count("*").cast("long").alias("n"))
    )


@_register(
    "b04_broadcast_dim_join",
    """
    SELECT r_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,2))) AS VARCHAR)
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    "B4 star-schema dimension joins w/ broadcast (routes/stops dims, README KPIs)",
)
def b04_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    # nation/region are tiny at any SF -> broadcast (no shuffle);
    # customer scales with SF -> leave to AQE (shuffle join at 100 TB).
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count("*").cast("long").alias("n_lines"))
    )


@_register(
    "b05_time_bucket_agg",
    """
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_epoch,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY bucket_epoch
    """,
    "B5 time-bucketed aggregation, 5-minute buckets (README.md:120 avg delay over time)",
)
def b05_time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 300) * 300)
    return (
        ev.groupBy(bucket.cast("long").alias("bucket_epoch"))
        .agg(F.count("*").cast("long").alias("n"),
             F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@_register(
    "b06_conditional_rate",
    """
    SELECT o_orderpriority,
           round(avg(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
                          THEN 1 ELSE 0 END), 6) AS punctuality_rate,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    "B6 punctuality rate = share with delay <= threshold (README.md:121)",
)
def b06_conditional_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    on_time = F.when(F.datediff("l_shipdate", "o_orderdate") <= 60, 1).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", on_time.alias("on_time"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.avg("on_time"), 6).alias("punctuality_rate"),
             F.count("*").cast("long").alias("n"))
    )


@_register(
    "b07_topk_by_aggregate",
    """
    SELECT c_custkey, c_name,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    "B7 top-k by aggregate (most-delayed lines / top stops, README.md:122-123)",
)
def b07_topk_by_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # groupBy before orderBy+limit -> Spark plans TakeOrderedAndProject
    # (no full sort at scale).
    return (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").alias("revenue"),
             F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@_register(
    "b08_heatmap_dow_hour",
    """
    SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
           CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events GROUP BY iso_dow, hour_of_day
    """,
    "B8 hour x day heatmap aggregation (README.md:124)",
)
def b08_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # F.weekday: Monday=0 -> +1 matches DuckDB isodow (Monday=1).
    return (
        ev.groupBy((F.weekday("ts") + 1).cast("long").alias("iso_dow"),
                   F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(F.count("*").cast("long").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)"))
              .cast("double").alias("sum_value"))
    )


@_register(
    "b09_histogram",
    """
    SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 7.0) AS BIGINT)
             AS delay_week_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY delay_week_bucket
    """,
    "B9 delay distribution histogram (README.md:125)",
)
def b09_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.datediff("l_shipdate", "o_orderdate") / F.lit(7.0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(bucket.cast("long").alias("delay_week_bucket"))
        .groupBy("delay_week_bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


@_register(
    "b10_span_per_group",
    """
    WITH k AS (
      SELECT l_orderkey, l_shipdate,
             CAST(l_linenumber AS BIGINT) * 10000000000 +
             CAST(epoch(l_shipdate) AS BIGINT) AS seq_key
      FROM lineitem
    )
    SELECT l_orderkey,
           CAST(date_diff('day', arg_min(l_shipdate, seq_key),
                                 arg_max(l_shipdate, seq_key)) AS BIGINT) AS span_days,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM k GROUP BY l_orderkey
    """,
    "B10 per-group first/last over sequence (actual vs scheduled travel time, README.md:126)",
)
def b10_span_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = (W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_shipdate")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (
        li.select(
            "l_orderkey",
            F.datediff(F.last("l_shipdate").over(w),
                       F.first("l_shipdate").over(w)).cast("long").alias("span_days"),
            F.count("*").over(w).cast("long").alias("n_lines"),
        )
        .distinct()
    )


@_register(
    "b11_latest_per_key",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    "B11 latest-row-per-key / live bus map (README.md:127; vehicle_positions)",
)
def b11_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"),
                "event_type", "value")
    )


@_register(
    "b12_left_anti_coverage",
    """
    SELECT c_custkey,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CASE WHEN n_orders IS NULL THEN 'no-service' ELSE 'active' END AS service_state
    FROM customer
    LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) oc
      ON c_custkey = o_custkey
    """,
    "B12 left join coverage state / anti set (stop map with service state, README.md:128)",
)
def b12_left_anti_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # Pre-aggregate the fact side before the join (shrinks the shuffle
    # from |orders| to |customers| — the only sane shape at 100 TB).
    oc = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        cust.join(oc, cust.c_custkey == oc.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.when(F.col("n_orders").isNull(), F.lit("no-service"))
             .otherwise(F.lit("active")).alias("service_state"),
        )
    )


@_register(
    "b13_recency_filter",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS sum_value
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 3 DAY FROM events)
    GROUP BY event_type
    """,
    "B13 mandatory recency window filter (README.md:139 -> partition pruning at scale)",
)
def b13_recency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("b13_events")
    return spark.sql("""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM b13_events
        WHERE ts >= (SELECT max(ts) - INTERVAL 3 DAY FROM b13_events)
        GROUP BY event_type
    """)


# =====================================================================
# Tier C — charter extensions (SURVEY §2.5): LLM-data-pipeline ops
# =====================================================================

@_register(
    "c01_exact_dedup",
    """
    SELECT md5(text) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text
    """,
    "C1 exact dedup: hash-groupBy on content, deterministic keeper",
)
def c01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # groupBy(text) shuffles full text at 100 TB -> in operators/dedup.py
    # the scale path groups by md5 prefix; here we keep exact semantics.
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").cast("long").alias("keep_doc_id"),
             F.count("*").cast("long").alias("n_copies"))
        .select(F.md5("text").alias("fingerprint"), "keep_doc_id", "n_copies")
    )


@_register(
    "c01b_normalized_neardup",
    """
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT md5(norm) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM n GROUP BY norm
    """,
    "C1 near-dup via text normalization fingerprint",
)
def c01b_normalized_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition: the test corpus is one parquet file (one input
    # task); the double regex pass is the cost here, spread it.
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "))
    return (
        docs.select("doc_id", norm.alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").cast("long").alias("keep_doc_id"),
             F.count("*").cast("long").alias("n_copies"))
        .select(F.md5("norm").alias("fingerprint"), "keep_doc_id", "n_copies")
    )


@_register(
    "c02_cosine_topk",
    """
    SELECT vec_id, label,
           round(list_cosine_similarity(
                   embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                 6) AS cos_sim
    FROM embeddings
    ORDER BY cos_sim DESC, vec_id
    LIMIT 20
    """,
    "C2 brute-force cosine top-k ANN baseline (native zip_with/aggregate, no UDF)",
)
def c02_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # Broadcast the single query vector; scoring is a narrow map ->
    # TakeOrderedAndProject gives top-k without a global sort.
    return (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", "label",
                F.round(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(20)
    )


@_register(
    "c03_text_stats",
    """
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), ' +') AS toks,
             length(regexp_replace(trim(lower(text)), ' +', '', 'g')) AS n_alpha
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'in')))
                AS BIGINT) AS n_stopwords,
           round(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'in')))
                 * 1.0 / len(toks), 6) AS stopword_ratio,
           round(n_alpha * 1.0 / len(toks), 6) AS avg_token_len
    FROM t
    """,
    "C3 text quality scoring: token counts, stopword ratio, avg token length",
)
def c03_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    clean = F.trim(F.lower("text"))
    toks = F.split(clean, " +")
    stop = F.array([F.lit(x) for x in ("the", "a", "of", "and", "in")])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_alpha = F.length(F.regexp_replace(clean, " +", ""))
    return docs.select(
        "doc_id", "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(n_stop * F.lit(1.0) / F.size(toks), 6).alias("stopword_ratio"),
        F.round(n_alpha * F.lit(1.0) / F.size(toks), 6).alias("avg_token_len"),
    )


@_register(
    "c03b_fingerprint",
    """
    WITH t AS (
      SELECT source,
             md5(array_to_string(
                   list_sort(list_distinct(
                     string_split_regex(trim(lower(text)), ' +'))), ' ')) AS fp
      FROM documents
    )
    SELECT source,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM t GROUP BY source
    """,
    "C3 document fingerprinting: bag-of-tokens content hash per source",
)
def c03b_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), " +")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(F.countDistinct("fp").cast("long").alias("n_distinct_fp"),
             F.count("*").cast("long").alias("n_docs"))
    )


@_register(
    "c04_json_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    "C4 JSON event analytics: get_json_object over events.props",
)
def c04_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("k").cast("long").alias("sum_k"),
             F.max("k").cast("long").alias("max_k"))
    )


@_register(
    "c05_multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
    "C5 multimodal plumbing: opaque binary column + typed metadata (decode stubbed)",
)
def c05_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # text -> binary stands in for an image/audio payload column; the
    # real decode path lives in operators/multimodal.py (stubbed UDF).
    bin_col = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(bin_col).cast("long").alias("n_bytes"),
        F.sha2(bin_col, 256).alias("content_sha"),
    )


# Extension batch (as-of/range joins, grouping sets, set ops, dedup
# suite, IVF ANN, text analysis, multimodal) registers itself into
# REGISTRY on import; import at the bottom so _register/_t exist.
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_ext  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_tpch2  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_graph  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_curation  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_linkage  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round3  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round4  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round5  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round6  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round7  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round8  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round9  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round10  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round11  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round12  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round13  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round14  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round15  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round16  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round17  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round18  # noqa: E402,F401
from tp_airflow_gtfs_snowflake_spark.plans import driver_queries_round19  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
