"""Multi-format table I/O beyond parquet: ORC, JSON-lines, CSV.

The engine's canonical storage is parquet (columnar, stats, pruning),
but a 100 TB estate always has edges in other formats — upstream
drops JSONL, partners want CSV, legacy Hive tables are ORC.  These
helpers make the non-parquet edges safe:

- ALWAYS an explicit schema on read (`inferSchema` re-scans the data
  and guesses drifting types — banned repo-wide);
- ORC keeps columnar pruning + predicate pushdown (same contract as
  parquet; the plan gate asserts it);
- JSONL/CSV are row formats: fine as ingest/egress edges, wrong as
  an analytical store — land them into parquet/ORC first (the
  round-trip test is exactly that path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str, *,
                partition_cols: list[str] | None = None,
                mode: str = "overwrite", **options) -> None:
    """Format-dispatched sink.  CSV gets a header by default (the
    reference's COPY exports were headered CSV)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    getattr(writer, fmt)(path)


def read_table(spark: SparkSession, path: str, fmt: str,
               schema: T.StructType | str | None = None,
               **options) -> DataFrame:
    """Format-dispatched source.  Row formats (json/csv) REQUIRE a
    schema — schema inference is a full extra pass over 100 TB and a
    type-drift hazard."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use {FORMATS}")
    if fmt in ("json", "csv") and schema is None:
        raise ValueError(f"{fmt} reads need an explicit schema "
                         "(inferSchema is banned at scale)")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(path)
