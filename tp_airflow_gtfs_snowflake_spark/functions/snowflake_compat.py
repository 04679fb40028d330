"""Snowflake-dialect compatibility for the reference's SQL surface.

The reference emits Snowflake SQL strings from its Airflow DAGs
(dags/gtfs_silver.py:125-213, dags/gtfs_static_daily.py:44-106).  The
function surface those statements actually use is small, and most of
it is ALREADY native in Spark 4 with identical semantics:

| Snowflake                       | Spark 4                           |
|---------------------------------|-----------------------------------|
| COALESCE(a, b)                  | native, identical                 |
| CAST(x AS t)                    | native, identical                 |
| MAX(x)                          | native, identical                 |
| CURRENT_TIMESTAMP()             | native, identical                 |
| CONVERT_TIMEZONE(tz, ts) 2-arg  | native: session tz -> tz, same    |
| TO_VARCHAR(x, fmt) 2-arg        | native alias of to_char           |
| NVL / NVL2 / SPLIT_PART         | native, identical                 |
| ZEROIFNULL / NULLIFZERO         | native, identical                 |

ONE rewrite is unavoidable: Snowflake's 1-arg TO_VARCHAR(x) (plain
cast-to-string).  Spark's builtin to_varchar demands a format and a
builtin name cannot be shadowed by a SQL UDF
(CANNOT_REPLACE_NON_SQL_UDF_WITH_SQL_UDF), so 1-arg call sites —
the reference has exactly one, gtfs_silver.py:184 — become
CAST(x AS STRING).

What Spark lacks outright, :func:`register_snowflake_compat` adds as SQL
scalar functions (CREATE TEMPORARY FUNCTION ... RETURN expr — pure
Catalyst expressions, zero Python-worker cost, fully codegen'd), so a
reference user can paste their DAG SQL into spark.sql with at most a
table-name change.  SQL UDFs are statically typed; the signatures
cover the types the reference's statements use.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SHIMS = [
    # Snowflake IFF(cond, a, b) — the reference's CASE WHEN shorthand
    "CREATE OR REPLACE TEMPORARY FUNCTION IFF(c BOOLEAN, a STRING, "
    "b STRING) RETURNS STRING RETURN CASE WHEN c THEN a ELSE b END",
    "CREATE OR REPLACE TEMPORARY FUNCTION IFF_NUM(c BOOLEAN, a DOUBLE, "
    "b DOUBLE) RETURNS DOUBLE RETURN CASE WHEN c THEN a ELSE b END",
    # Snowflake TO_TIMESTAMP_NTZ(varchar) — Spark's to_timestamp_ntz
    # exists but Snowflake also accepts epoch seconds as a number
    "CREATE OR REPLACE TEMPORARY FUNCTION TO_TIMESTAMP_NTZ_EPOCH("
    "s BIGINT) RETURNS TIMESTAMP_NTZ "
    "RETURN to_timestamp_ntz(timestamp_seconds(s))",
]


def register_snowflake_compat(spark: SparkSession) -> None:
    """Register the non-native Snowflake functions as session-scoped
    SQL UDFs.  Idempotent (CREATE OR REPLACE)."""
    for stmt in _SHIMS:
        spark.sql(stmt)
