"""Every registry query with an oracle must hash-match DuckDB at
sf0.001 — the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare, duck_connection

WITH_ORACLE = [n for n, s in REGISTRY.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMALL)
    ddf = duck.sql(spec.oracle).df()
    compare(sdf, ddf, name)


def test_all_queries_return_rows(spark):
    for name, spec in REGISTRY.items():
        assert spec.fn(spark, SF_SMALL).count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
