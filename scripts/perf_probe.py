"""Per-query performance probe: wall time, Spark job count, and
`.explain("formatted")` capture for a set of registry queries.

Usage:
    python scripts/perf_probe.py out_dir [name ...]

With no names, probes every HEADLINE query in bench.py.  For each
query it runs the plan once untimed (JIT warm-up), then once timed
with a dedicated job group so the job count is exact, and writes
<out_dir>/<name>.txt containing the formatted plan; a final JSON line
carries {name: {"sec": wall, "jobs": n}} for all probed queries.

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) like bench.py.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, ".")

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY
from tp_airflow_gtfs_snowflake_spark.session import get_spark


def main() -> None:
    out_dir = pathlib.Path(sys.argv[1])
    out_dir.mkdir(parents=True, exist_ok=True)
    names = sys.argv[2:]
    if not names:
        import bench
        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("perf_probe")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    results: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        try:
            fn(spark, sf_dir).count()          # warm-up (JIT, broadcasts)
            df = fn(spark, sf_dir)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}.txt").write_text(buf.getvalue())
            sc.setJobGroup(f"probe_{name}", name)
            sc._jvm.System.gc()                # noqa: SLF001
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            sec = time.perf_counter() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(
                f"probe_{name}"))
            sc.setJobGroup("idle", "idle")
            results[name] = {"sec": round(sec, 3), "jobs": jobs}
            print(f"{name}: {sec:.3f}s  {jobs} jobs", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"{name}: ERROR {exc}", flush=True)
    (out_dir / "probe.json").write_text(json.dumps(results, indent=1))
    print(json.dumps({"probed": len(results)}))


if __name__ == "__main__":
    main()
