from __future__ import annotations

import gc

import pytest

from tp_airflow_gtfs_snowflake_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # 48g heap: the suite has grown to ~640 tests / ~13k Spark stages
    # in ONE long-lived local-mode JVM; at the 24g default the driver
    # eventually died mid-suite (py4j ConnectionRefused cascade) from
    # accumulated codegen/listener/checkpoint state.  The box has
    # 125 GiB; the env var still overrides.
    s = get_spark("tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "48g",
    })
    yield s


@pytest.fixture(scope="module", autouse=True)
def _module_gc():
    """Collect Python per module so py4j references drop and the
    async ContextCleaner can free localCheckpoint blocks.  NO
    System.gc() here: a stop-the-world full collection of a large
    heap is exactly the long driver stall that trips local mode's
    unrecoverable heartbeat death spiral (see session.py)."""
    yield
    gc.collect()
