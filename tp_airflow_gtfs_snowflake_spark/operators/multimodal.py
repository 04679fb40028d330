"""Multimodal column plumbing (charter): image/audio/video payloads as
opaque `binary` columns with typed metadata, processed via Arrow-batched
mapInPandas.

Decode paths:
- `fake=True`: deterministic fake decoder (byte statistics standing in
  for pixels) — used by the oracle-checked registry queries, since the
  driver's synthetic payloads are not real images.
- `fake=False`: a REAL decoder.  The container has no codec libraries,
  so the built-in real paths are pure-Python: uncompressed-BMP and
  PNG decoders for images (BMP: public BITMAPINFOHEADER layout,
  bottom-up / top-down row order, 8/24/32 bpp, row padding; PNG:
  chunk walk + stdlib-zlib inflate + all five spec filters) and a PCM
  WAV decoder for audio (RIFF chunk walk, 8/16-bit, multi-channel,
  integer-exact amplitude stats); video frame sampling demuxes
  uncompressed AVI containers (RIFF 'movi' walk — a container needs
  no codec when frames are DIBs).  Codec-compressed formats raise
  NotImplementedError at task time until PIL/ffmpeg is plugged in.
Everything Spark-side — schema contract, Arrow batch shape, partition
sizing, UDF signatures — is identical between the two paths.

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

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("peak", LongType()),
    # floor(sqrt(mean(sample^2))) — integer arithmetic end to end so
    # the value is engine- and platform-exact
    StructField("rms", LongType()),
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


def _hist_ppm(data: bytes | bytearray) -> list[int]:
    """8-bin histogram as exact parts-per-million (floor) — integer
    arithmetic so any SQL oracle can reproduce it."""
    hist = [0] * 8
    for b in data:
        hist[b >> 5] += 1
    total = max(len(data), 1)
    return [h * 1_000_000 // total for h in hist]


def _bmp_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Uncompressed BMP (BITMAPINFOHEADER et seq.) -> (width, height,
    channels, 8-bin pixel-value histogram in ppm).  Handles 8/24/32 bpp,
    bottom-up and top-down (negative height) row order, and 4-byte row
    padding; palette/compressed variants raise."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (8, 24, 32) or width <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, "
                         f"compression={compression})")
    top_down = height < 0
    h = abs(height)
    channels = bpp // 8
    row_stride = (width * channels + 3) // 4 * 4
    pixels = bytearray()
    for r in range(h):
        src = r if top_down else h - 1 - r
        start = data_off + src * row_stride
        row = payload[start:start + width * channels]
        if len(row) != width * channels:
            raise ValueError("truncated BMP pixel data")
        pixels += row
    return width, h, channels, _hist_ppm(pixels)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, channels: int,
                  height: int) -> bytearray:
    """Reverse the per-row PNG filters (spec section 9: None/Sub/Up/
    Average/Paeth).  `raw` is the inflated IDAT stream: height rows of
    (1 filter byte + width*channels sample bytes)."""
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(height * stride)
    prev_start = -1
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)])
        cur = r * stride
        for i in range(stride):
            a = out[cur + i - channels] if i >= channels else 0
            b = out[prev_start + i] if prev_start >= 0 else 0
            c = (out[prev_start + i - channels]
                 if prev_start >= 0 and i >= channels else 0)
            x = row[i]
            if ftype == 0:
                v = x
            elif ftype == 1:      # Sub
                v = (x + a) & 0xFF
            elif ftype == 2:      # Up
                v = (x + b) & 0xFF
            elif ftype == 3:      # Average
                v = (x + (a + b) // 2) & 0xFF
            elif ftype == 4:      # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                v = (x + pred) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter type {ftype}")
            out[cur + i] = v
        prev_start = cur
    return out


def _png_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Pure-Python PNG decode (public spec: chunk walk, zlib inflate,
    per-row unfilter) -> (width, height, channels, 8-bin pixel
    histogram in ppm).  Supports bit depth 8, color types
    gray/RGB/gray+alpha/RGBA, no interlace; palette (3) and Adam7
    raise.  zlib is stdlib, so unlike JPEG this needs no external
    codec."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    width = height = channels = None
    idat = bytearray()
    while i + 8 <= len(payload):
        ln = int.from_bytes(payload[i:i + 4], "big")
        cid = payload[i + 4:i + 8]
        body = payload[i + 8:i + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        if cid == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type, _comp, _filt, interlace = body[8:13]
            if bit_depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth}, "
                    f"color_type={color_type})")
            if interlace != 0:
                raise ValueError("Adam7 interlace unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        i += 12 + ln  # length + id + body + CRC
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    pixels = _png_unfilter(zlib.decompress(bytes(idat)), width, channels,
                           height)
    return width, height, channels, _hist_ppm(pixels)


def _netpbm_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Binary netpbm (P5 gray / P6 RGB, public netpbm spec): ASCII
    header `P5|P6 <width> <height> <maxval>` with #-comments, single
    whitespace after maxval, then raw big-endian samples.  maxval<=255
    only (1 byte/sample)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    channels = 1 if payload[:2] == b"P5" else 3
    # header tokenizer: whitespace-separated ints, # starts a comment
    vals: list[int] = []
    i = 2
    while len(vals) < 3 and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j:j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError("malformed netpbm header")
    if len(vals) < 3:
        raise ValueError("truncated netpbm header")
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("netpbm maxval > 255 unsupported")
    i += 1  # exactly one whitespace byte after maxval
    data = payload[i:i + width * height * channels]
    if len(data) != width * height * channels:
        raise ValueError("truncated netpbm pixel data")
    return width, height, channels, _hist_ppm(data)


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-variant LZW (public spec, GIF89a appendix F): variable
    code width LSB-first, CLEAR resets the dictionary, and the
    just-emitted+first-symbol rule covers the KwKwK case."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0
    pos = 0

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev: bytes | None = None
    while True:
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _gif_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """GIF87a/89a first frame: header + global color table walk,
    extensions skipped, LZW-decoded palette indices mapped through
    the color table.  Interlace and local color tables raise (rare,
    and honesty beats silent wrong pixels)."""
    import struct

    if payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    w, h, packed = struct.unpack_from("<HHB", payload, 6)
    i = 13
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = payload[i:i + n]
        i += n
    while i < len(payload):
        b0 = payload[i]
        if b0 == 0x21:  # extension: label + sub-blocks
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b0 == 0x2C:  # image descriptor
            _, _, iw, ih, ipacked = struct.unpack_from("<HHHHB",
                                                       payload, i + 1)
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if ipacked & 0x80:
                raise NotImplementedError("local color table unsupported")
            i += 10
            min_code = payload[i]
            i += 1
            lzw = bytearray()
            while payload[i] != 0:
                ln = payload[i]
                lzw += payload[i + 1:i + 1 + ln]
                i += 1 + ln
            idx = _gif_lzw_decode(bytes(lzw), min_code)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF frame")
            px = bytearray()
            for p in idx[:iw * ih]:
                px += gct[3 * p:3 * p + 3]
            return iw, ih, 3, _hist_ppm(px)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image frame")


def _real_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Dispatch on magic bytes.  BMP, PNG, binary netpbm and GIF
    decode natively (PNG via stdlib zlib, GIF via the pure-Python
    LZW above); other formats need a codec library this container
    doesn't ship."""
    if payload[:2] == b"BM":
        return _bmp_decode(payload)
    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _netpbm_decode(payload)
    if payload[:4] == b"GIF8":
        return _gif_decode(payload)
    raise NotImplementedError(
        "built-in real decodes: uncompressed BMP, PNG (8-bit, "
        "non-interlaced), binary netpbm (P5/P6) and GIF "
        "(non-interlaced, global palette).  Plug PIL/torchvision "
        "in _real_decode for JPEG/WebP")


def _wav_decode(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """Uncompressed RIFF/WAVE PCM -> (sample_rate, n_channels,
    bit_depth, n_samples, peak, rms).  Public WAV chunk layout: RIFF
    header, then 'fmt ' (PCM format 1: channels, rate, bits) and
    'data' chunks; unknown chunks skipped.  8-bit PCM is unsigned
    (centered at 128), 16-bit is signed little-endian."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        ln = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate = struct.unpack("<HHI", fmt[:8])
    bit_depth = struct.unpack("<H", fmt[14:16])[0]
    if audio_format != 1 or bit_depth not in (8, 16):
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, "
            f"bits={bit_depth})")
    if bit_depth == 16:
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[:n * 2])
    else:
        samples = [b - 128 for b in data]
        n = len(samples)
    n_samples = n // max(n_channels, 1)
    peak = max((abs(s) for s in samples), default=0)
    sumsq = sum(s * s for s in samples)
    rms = _isqrt(sumsq // n) if n else 0
    return sample_rate, n_channels, bit_depth, n_samples, peak, rms


def _isqrt(x: int) -> int:
    import math
    return math.isqrt(x)


def _real_audio_decode(payload: bytes
                       ) -> tuple[int, int, int, int, int, int]:
    if payload[:4] == b"RIFF":
        return _wav_decode(payload)
    raise NotImplementedError(
        "only uncompressed PCM WAV decode is built in (no codec "
        "libraries in this container); plug soundfile/ffmpeg in "
        "_real_audio_decode for MP3/FLAC/OGG")


def _fake_audio_decode(payload: bytes
                       ) -> tuple[int, int, int, int, int, int]:
    """Deterministic stand-in mirroring _fake_decode: header fields
    from a digest, stats from byte arithmetic."""
    digest = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
    channels = 1 + digest[1] % 2
    n = len(payload)
    peak = max(payload, default=0)
    rms = _isqrt(sum(b * b for b in payload) // n) if n else 0
    return rate, channels, 16, n // max(channels, 1), peak, rms


def decode_audio_features(df: DataFrame, *, id_col: str, payload_col: str,
                          media_type: str = "audio",
                          fake: bool = False) -> DataFrame:
    """binary payload -> typed audio metadata + amplitude stats via
    Arrow-batched mapInPandas.  fake=False really decodes PCM WAV;
    other formats raise at task time until a codec library is plugged
    in.  Same scale contract as decode_image_features: narrow map,
    payloads never leave executors."""
    decode = _fake_audio_decode if fake else _real_audio_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                rate, ch, bits, n, peak, rms = decode(payload)
                rows.append((int(doc_id), media_type, len(payload),
                             rate, ch, bits, n, peak, rms))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURES_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(run, AUDIO_FEATURES_SCHEMA))


def decode_image_features(df: DataFrame, *, id_col: str, payload_col: str,
                          media_type: str = "image",
                          fake: bool = False) -> DataFrame:
    """binary payload -> (dims, channels, feature vector) via
    Arrow-batched mapInPandas.  `fake=False` really decodes (BMP
    natively; other formats raise at task time until a codec library
    is plugged in)."""
    decode = _fake_decode if fake else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                w, h, c, feats = decode(payload)
                rows.append((int(doc_id), media_type, len(payload),
                             w, h, c, feats))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


def _avi_frames(payload: bytes) -> list[bytes]:
    """Frame payloads of an uncompressed AVI (public RIFF layout):
    walk the chunk tree, collect '..db'/'..dw' entries under the
    'movi' LIST.  Pure Python — a video CONTAINER needs no codec
    when the frames are device-independent bitmaps."""
    import struct

    if len(payload) < 12 or payload[0:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "real video path supports uncompressed AVI only "
            "(RIFF/'AVI '); pass fake=True for other payloads")
    frames: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        while off + 8 <= end:
            fourcc = buf[off:off + 4]
            (size,) = struct.unpack_from("<I", buf, off + 4)
            body = off + 8
            if fourcc in (b"RIFF", b"LIST"):
                walk(buf, body + 4, min(end, body + size))
            elif fourcc[2:4] in (b"db", b"dw"):
                frames.append(buf[body:body + size])
            off = body + size + (size & 1)  # chunks pad to even

    walk(payload, 12, len(payload))
    return frames


def sample_frames(df: DataFrame, *, id_col: str, payload_col: str,
                  every_n_bytes: int = 1024, max_frames: int = 8,
                  fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: up to `max_frames` frames
    per payload, one output row each.  fake=False REALLY demuxes
    uncompressed AVI containers (RIFF 'movi' walk, every-k-th frame
    up to the cap); fake=True emits deterministic byte-slices (the
    stand-in for codec-compressed formats in this codec-less
    container).  Same explode-shaped mapInPandas contract either
    way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                out = []
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                    fr = _avi_frames(bytes(payload or b""))
                    step = max(1, len(fr) // max_frames)
                    for i, j in enumerate(range(0, len(fr), step)):
                        if i >= max_frames:
                            break
                        out.append((int(doc_id), i, fr[j]))
                yield pd.DataFrame(
                    out, columns=[f.name for f in
                                  FRAME_SAMPLE_SCHEMA.fields])
                continue
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
