"""Compression-ratio quality scoring for text curation.

The Gopher / MassiveText-family pipelines use compressibility as a
cheap quality proxy: text that barely compresses is usually encoded
noise, minified markup, or random identifiers; text that compresses
extremely well is boilerplate or pathological repetition.  Both tails
get filtered before LLM training.

DEFLATE via the stdlib ``zlib`` at a pinned level is fully
deterministic (same bytes in -> same bytes out, platform-independent
for a given zlib source), so the ratio is a stable, testable feature
— unlike wall-clock-dependent or model-based quality scores.

Spark shape: Arrow-batched ``mapInPandas`` (the per-row cost is the
DEFLATE itself, so vectorization gains nothing — but Arrow transfer
and batch amortization still beat a row-at-a-time Python UDF), text
never collected to the driver, O(batch) memory.  Output adds two
columns: ``comp_bytes`` (compressed size) and ``ratio_ppm``
(compressed/original in parts-per-million, integer — empty text maps
to ratio 1_000_000 i.e. "incompressible" so downstream band filters
never divide by zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ZLIB_LEVEL = 6  # pinned: determinism contract of the feature


def with_compression_ratio(df: DataFrame, *, text_col: str = "text",
                           level: int = ZLIB_LEVEL) -> DataFrame:
    """Append comp_bytes + ratio_ppm computed from zlib DEFLATE."""

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            nb = raw.str.len().astype("int64")
            cb = raw.map(lambda b: len(zlib.compress(b, level))) \
                    .astype("int64")
            ratio = (cb * 1_000_000).where(nb > 0, 1_000_000)
            ratio = (ratio // nb.where(nb > 0, 1)).where(nb > 0,
                                                         1_000_000)
            yield pdf.assign(comp_bytes=cb, ratio_ppm=ratio)

    schema = T.StructType(
        df.schema.fields
        + [T.StructField("comp_bytes", T.LongType()),
           T.StructField("ratio_ppm", T.LongType())])
    return df.mapInPandas(score, schema)
