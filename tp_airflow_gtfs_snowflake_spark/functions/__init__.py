"""Reusable native-expression helpers (no row-at-a-time Python UDFs).

Everything here returns pyspark Column expressions built from
pyspark.sql.functions so the work stays inside whole-stage codegen.
"""
