"""CSV scan with the reference's COPY INTO file-format semantics (A3).

reference: dags/gtfs_static_daily.py:117-142 —
  FILE_FORMAT = (TYPE=CSV FIELD_DELIMITER=',' SKIP_HEADER=1
                 FIELD_OPTIONALLY_ENCLOSED_BY='"'
                 NULL_IF=('','NULL','null'))
  ON_ERROR = 'CONTINUE'
with an explicit positional column list (no inference).

Spark mapping: explicit schema + header/quote options; ON_ERROR
CONTINUE -> DROPMALFORMED (or PERMISSIVE + corrupt-record column for
auditability).  Multiple NULL_IF tokens need a post-read normalization
because Spark's csv reader takes a single nullValue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_TOKENS = ("", "NULL", "null")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    on_error_continue: bool = True,
    null_tokens: tuple[str, ...] = NULL_TOKENS,
    path_glob: str | None = None,
) -> DataFrame:
    """Typed CSV scan mirroring COPY INTO options.

    To apply NULL_IF over *typed* columns faithfully, non-string
    columns are read as string, null-normalized, then cast (lenient:
    bad numerics -> NULL, matching ON_ERROR='CONTINUE' row tolerance
    at column granularity).
    """
    raw_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields])
    reader = (
        spark.read.schema(raw_schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("mode", "DROPMALFORMED" if on_error_continue else "FAILFAST")
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    df = reader.csv(path)

    non_empty_tokens = [t for t in null_tokens if t != ""]
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        # '' arrives as null already (Spark csv default nullValue '');
        # normalize the remaining NULL_IF tokens.
        if non_empty_tokens:
            c = F.when(c.isin(*non_empty_tokens), F.lit(None)).otherwise(c)
        if not isinstance(f.dataType, T.StringType):
            c = c.cast(f.dataType)  # lenient: garbage -> NULL (A16)
        cols.append(c.alias(f.name))
    return df.select(*cols)
