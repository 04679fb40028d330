"""Run EVERY registry query against its DuckDB oracle at a given SF
with a vanilla SparkSession (mirrors the driver's CORRECTNESS gate).

Usage:  python scripts/validate_registry.py [sf_dir] [name_prefix...]

Prints one line per query (OK / ROWS-ONLY / FAIL) and a final tally;
exit code 1 if any FAIL.  Unlike tests/test_driver_queries.py (which
runs at sf0.001 inside pytest fixtures), this uses the driver's exact
recipe: plain builder session, sf0.01 default, order-insensitive
value compare via tests.oracle_harness.compare.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

import __spark_entry__ as entry
from tests.oracle_harness import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, oracles = entry.queries(), entry.oracle_sql()
    if prefixes:
        qs = {k: v for k, v in qs.items()
              if any(k.startswith(p) for p in prefixes)}
    n_ok = n_rows_only = 0
    failures: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                compare(df, con.sql(oracles[name]).df(), name)
                n_ok += 1
                status = "OK"
            else:
                n = df.count()
                assert n >= 0
                n_rows_only += 1
                status = f"ROWS-ONLY ({n} rows)"
        except Exception:
            failures.append(name)
            status = "FAIL\n" + traceback.format_exc(limit=3)
        print(f"{name:40s} {time.time() - t0:6.2f}s  {status}", flush=True)
    print(f"\n{n_ok} value-checked OK, {n_rows_only} rows-only, "
          f"{len(failures)} FAIL: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
