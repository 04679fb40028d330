"""API-surface coverage: cogrouped applyInPandas and polymorphic
UDTFs (analyze-time schema) — the remaining pandas/UDTF entry points
not exercised by the query registry (c31 covers fixed-schema UDTF,
c38/b102 cover mapInPandas)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _t
from tests.conftest import SF_SMALL


def test_cogroup_applyinpandas_matches_join(spark):
    """cogroup: both sides of a key arrive aligned in one pandas
    callback — the escape hatch when per-key logic needs BOTH
    relations at once (here it must reproduce what a full-outer
    join + two aggs computes)."""
    ev = (_t(spark, SF_SMALL, "events")
          .select(F.col("user_id").alias("k"), "value"))
    orders = (_t(spark, SF_SMALL, "orders")
              .select(F.col("o_custkey").alias("k"), "o_totalprice"))

    def stats(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        k = (left["k"].iloc[0] if len(left) else right["k"].iloc[0])
        return pd.DataFrame([{"k": int(k), "n_events": len(left),
                              "n_orders": len(right)}])

    got = (ev.groupBy("k").cogroup(orders.groupBy("k"))
           .applyInPandas(stats, "k long, n_events long, n_orders long"))

    e_agg = ev.groupBy("k").agg(F.count("*").alias("n_events"))
    o_agg = orders.groupBy("k").agg(F.count("*").alias("n_orders"))
    want = (e_agg.join(o_agg, "k", "full_outer")
            .select("k", F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_polymorphic_udtf_schema_from_analyze(spark):
    """Polymorphic UDTF: the output schema is computed at ANALYSIS
    time from a constant argument (pyspark.sql.udtf.AnalyzeResult) —
    one UDTF serves any width without N registered variants."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument,
                    n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(StructType(
                [StructField(f"c{i}", StringType())
                 for i in range(n.value)]))

        def eval(self, text, n):
            parts = (text or "").split(" ")
            yield tuple(parts[i] if i < len(parts) else None
                        for i in range(n))

    spark.udtf.register("split_fixed", udtf(SplitFixed))
    two = spark.sql(
        "SELECT s.* FROM VALUES ('a b c') t(x), "
        "LATERAL split_fixed(x, 2) s").collect()
    assert [tuple(r) for r in two] == [("a", "b")]
    four = spark.sql(
        "SELECT s.* FROM VALUES ('a b c') t(x), "
        "LATERAL split_fixed(x, 4) s")
    assert four.columns == ["c0", "c1", "c2", "c3"]
    assert [tuple(r) for r in four.collect()] == [("a", "b", "c", None)]


def test_arrow_native_udf_matches_native_expression(spark):
    """Spark 4.1 Arrow-native UDFs (arrow_udf): batch-level pyarrow
    compute without the pandas conversion tax — must agree exactly
    with the JVM zip_with/aggregate dot product on quantized ints
    (the functions/vectors.py hot path stays native; this pins the
    escape hatch for kernels pyspark.sql.functions cannot express)."""
    from pyspark.sql.functions import arrow_udf
    from pyspark.sql.types import LongType

    @arrow_udf(LongType())
    def dot_q(a: pa.Array, b: pa.Array) -> pa.Array:
        out = []
        for x, y in zip(a.to_pylist(), b.to_pylist()):
            out.append(sum(int(u * 1000) * int(v * 1000)
                           for u, v in zip(x, y)))
        return pa.array(out, pa.int64())

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(50)
           .select("vec_id", F.col("embedding").alias("a"),
                   F.reverse("embedding").alias("b")))
    native = F.aggregate(
        F.zip_with("a", "b", lambda x, y:
                   (x.cast("double") * 1000).cast("long")
                   * (y.cast("double") * 1000).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    got = emb.select("vec_id", dot_q("a", "b").alias("u"),
                     native.alias("n")).collect()
    assert len(got) == 50
    assert all(r["u"] == r["n"] for r in got)
