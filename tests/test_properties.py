"""Property-based tests (SURVEY §5.2): random inputs against
independent reference implementations — the GTFS >24h time parser vs
integer arithmetic, the as-of join vs pandas merge_asof, salted
count-distinct vs the exact aggregate, and text-quality score bounds.

Each example builds ONE DataFrame for a whole batch of generated rows
(a Spark job per generated row would be minutes per test); examples
are capped low because the per-example cost is a Spark job, not a
function call.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.functions import text as T
from tp_airflow_gtfs_snowflake_spark.functions.gtfs_time import (
    gtfs_time_to_seconds)
from tp_airflow_gtfs_snowflake_spark.operators.asof import asof_join
from tp_airflow_gtfs_snowflake_spark.operators.skew import (
    salted_count_distinct)

SETTINGS = dict(max_examples=5, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 47), st.integers(0, 59),
                          st.integers(0, 59)),
                min_size=1, max_size=50))
def test_gtfs_time_parse_matches_arithmetic(spark, hms):
    rows = [(f"{h:02d}:{m:02d}:{s:02d}", h * 3600 + m * 60 + s)
            for h, m, s in hms]
    df = spark.createDataFrame(rows, "t string, expect long")
    out = df.select((gtfs_time_to_seconds(F.col("t"))
                     == F.col("expect")).alias("ok")).collect()
    assert all(r["ok"] for r in out)


@settings(**SETTINGS)
@given(st.data())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    base = dt.datetime(2026, 1, 1)
    ts = st.integers(0, 10_000)
    keys = st.integers(0, 3)
    left_rows = data.draw(st.lists(st.tuples(keys, ts),
                                   min_size=1, max_size=30))
    right_rows = data.draw(st.lists(st.tuples(keys, ts),
                                    min_size=1, max_size=30))
    # unique (key, ts) on the right: with duplicates both
    # implementations tie-break arbitrarily (documented), so the
    # property quantifies over the unambiguous domain.
    right_rows = list({(k, t): (k, t) for k, t in right_rows}.values())

    left = [(i, k, base + dt.timedelta(seconds=t))
            for i, (k, t) in enumerate(left_rows)]
    right = [(k, base + dt.timedelta(seconds=t), f"p{k}_{t}")
             for k, t in right_rows]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "k long, ts timestamp, payload string")

    got = {r["lid"]: r["payload"]
           for r in asof_join(ldf, rdf, on=["k"], left_ts="ts",
                              right_ts="ts").collect()}

    lpd = pd.DataFrame(left, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right, columns=["k", "ts", "payload"]).sort_values("ts")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    want = {int(r.lid): (None if pd.isna(r.payload) else r.payload)
            for r in merged.itertuples()}
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "hot"]),
                          st.integers(0, 30)),
                min_size=1, max_size=200))
def test_salted_count_distinct_matches_exact(spark, rows):
    df = spark.createDataFrame(rows, "g string, u long")
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()}
    salted = {r["g"]: r["n_distinct"] for r in salted_count_distinct(
        df, group_cols=["g"], distinct_col="u", salt_buckets=4).collect()}
    assert salted == exact


@settings(**SETTINGS)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=80), min_size=1, max_size=30))
def test_quality_score_bounded_or_null(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    scores = [r[0] for r in
              df.select(T.quality_score(F.col("text"))).collect()]
    for s in scores:
        assert s is None or (0.0 <= s <= 1.000001)
