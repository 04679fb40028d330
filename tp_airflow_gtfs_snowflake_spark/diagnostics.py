"""Debug/observability surface (A5, A10, A11) — the reference's
operational odds and ends, Spark-shaped.

reference:
- A5 debug text sink: dags/gtfs_rt_minutely.py:34-68 — one
  `str(entity.trip_update)` / `str(entity.vehicle)` block per record
  appended to exports/*.txt.
- A10 connection probe: dags/gtfs_static_daily.py:166-171,
  dags/gtfs_rt_minutely.py:303-308 — `SELECT 1` health check.
- A11 stage listing: dags/gtfs_rt_minutely.py:335-340 — `LIST @stage`
  shows staged files before COPY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_debug_text(feed: DataFrame, out_dir: str, *,
                     kind: str = "trip_update",
                     mode: str = "overwrite") -> None:
    """A5: dump one human-readable record per feed entity to text
    files.  The reference renders the proto block with str(); the
    engine renders the entity struct as a JSON line (to_json) and
    writes with the distributed text sink — same observability, no
    driver-side loop."""
    ent = feed.select(F.explode("feed.entity").alias("e"))
    (ent.filter(F.col(f"e.{kind}").isNotNull())
        .select(F.to_json(F.col(f"e.{kind}")).alias("value"))
        .write.mode(mode).text(out_dir))


def connection_probe(spark: SparkSession) -> bool:
    """A10: `SELECT 1` — verifies the session executes SQL end-to-end."""
    return spark.sql("SELECT 1 AS probe").collect()[0]["probe"] == 1


def list_stage(spark: SparkSession, stage_dir: str, *,
               pattern: str | None = None) -> DataFrame:
    """A11: `LIST @stage` — (path, size, modification_time) of staged
    files, optionally filtered by a glob (the COPY PATTERN analogue).
    binaryFile + column pruning: file CONTENT is never read."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    return (reader.load(stage_dir)
            .select("path", F.col("length").alias("size"),
                    F.col("modificationTime").alias("modification_time")))
