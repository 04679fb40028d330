"""Local mirror of the driver's Spark-vs-DuckDB comparison: sorts
columns by name, sorts rows, compares values exactly (strict by
default — floats must match after the query's own rounding)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

from tp_airflow_gtfs_snowflake_spark.schemas import DRIVER_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, Decimal), na_action="ignore").any():
            df[c] = df[c].map(lambda v: str(v) if v is not None else None,
                              na_action="ignore")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame, name: str = "query") -> None:
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_df)
    assert list(s.columns) == list(d.columns), (
        f"{name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}")
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}: col {c} row {i}: {a!r} != {b!r}"
            else:
                if pd.isna(a) and pd.isna(b):
                    continue
                assert a == b, f"{name}: col {c} row {i}: {a!r} != {b!r}"
