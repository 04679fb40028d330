"""Multimodal column plumbing (charter): image/audio/video payloads as
opaque `binary` columns with typed metadata, processed via Arrow-batched
mapInPandas.

The container has no image/audio codecs, so the actual decode is
STUBBED: `decode_image`/`decode_audio` raise NotImplementedError unless
a caller passes `fake=True`, which substitutes a deterministic fake
decoder (byte-statistics standing in for pixels/samples).  Everything
Spark-side — schema contract, Arrow batch shape, partition sizing,
UDF signatures — is real and tested.

Scale design:
- payloads stay in executors end-to-end (never .collect()ed);
- mapInPandas streams Arrow record batches, so peak executor memory is
  O(batch) not O(partition) — set spark.sql.execution.arrow
  .maxRecordsPerBatch down when payloads are MBs;
- decode is a narrow map: no shuffle, embarrassingly parallel, scales
  linearly with executors;
- downstream similarity/dedup on the extracted features reuses the
  vector/dedup operators (operators/dedup.py, functions/vectors.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    # 8-bin byte histogram as exact parts-per-million (floor), so an
    # external SQL oracle reproduces them with integer arithmetic
    # (float rounding rules differ between engines).
    StructField("features", ArrayType(LongType())),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_bytes", BinaryType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Deterministic stand-in for an image decode: dimensions derived
    from a content digest, features = 8-bin byte histogram in exact
    parts-per-million.  Replace with PIL/torchvision in a real
    deployment."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    total = max(len(payload), 1)
    return width, height, channels, [h * 1_000_000 // total for h in hist]


def decode_image_features(df: DataFrame, *, id_col: str, payload_col: str,
                          media_type: str = "image",
                          fake: bool = False) -> DataFrame:
    """binary payload -> (dims, channels, feature vector) via
    Arrow-batched mapInPandas.  `fake=False` raises at task time until a
    real codec is wired in (keeps the contract honest in CI)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no image codec in this environment; pass fake=True "
                    "or plug a real decoder into _fake_decode's slot")
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                w, h, c, feats = _fake_decode(payload)
                rows.append((int(doc_id), media_type, len(payload),
                             w, h, c, feats))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


def sample_frames(df: DataFrame, *, id_col: str, payload_col: str,
                  every_n_bytes: int = 1024, max_frames: int = 8,
                  fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits up to
    `max_frames` byte-slices per payload (one output row per frame) —
    the explode-shaped mapInPandas contract a real ffmpeg-based
    sampler would fill in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no video codec in this environment; pass fake=True")
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames,
                                   max(1, len(payload) // every_n_bytes))):
                    sl = payload[i * every_n_bytes:(i + 1) * every_n_bytes]
                    out.append((int(doc_id), i, sl))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             FRAME_SAMPLE_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(run, FRAME_SAMPLE_SCHEMA))
