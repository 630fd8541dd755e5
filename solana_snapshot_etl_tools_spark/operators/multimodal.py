"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json: first-class training-pipeline capability).

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` decode, explode-style frame sampling, fixed-dim
feature extraction. The actual codec step is pluggable, three tiers:

- the deterministic FAKE codec (``FIMG``/``FAUD``/``FVID`` headers,
  fixtures.py) exercises the full path with value-level oracles;
- the STD codec (``codec="std"``) REALLY decodes the formats that
  need no external library: RIFF/WAVE PCM audio, uncompressed BMP,
  and (since round 4) 8-bit truecolor PNG — the inflate step is
  stdlib zlib — parsed from the published byte layouts (falls back to
  the fake containers so mixed corpora decode in one pass);
- remaining compressed formats (JPEG/MP3/MP4, exotic PNG shapes) are
  gated behind import — PIL / soundfile / av are not in this
  container, so ``codec="real"`` raises NotImplementedError naming
  the dependency, per the build contract.

Scale notes: blobs never shuffle — every operator is a narrow map
producing small typed rows; partition by (kind, bucket(media_id)) for
balanced batches; Arrow batch size bounds executor memory, set
``spark.sql.execution.arrow.maxRecordsPerBatch`` for 100 MB+ blobs.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("blob", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType()),
    ]
)

FEATURE_DIM = 8
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def parse_fake_media(blob: bytes):
    """Parse the deterministic fake container formats:
      FIMG | w u16 | h u16 | channels u8 | payload (w*h*c bytes)
      FAUD | sample_rate u32 | n_samples u32 | payload (2*n bytes)
      FVID | w u16 | h u16 | n_frames u16 | frames (w*h bytes each)
    Returns a dict of metadata or None for anything malformed."""
    try:
        if blob is None or len(blob) < 4:
            return None
        magic = bytes(blob[:4])
        if magic == b"FIMG":
            w, h = struct.unpack_from("<HH", blob, 4)
            c = blob[8]
            payload = bytes(blob[9:])
            if len(payload) != w * h * c:
                return None
            return dict(format="fimg", width=w, height=h, channels=c,
                        payload=payload)
        if magic == b"FAUD":
            sr, n = struct.unpack_from("<II", blob, 4)
            payload = bytes(blob[12:])
            if len(payload) != 2 * n:
                return None
            return dict(format="faud", sample_rate=sr, n_samples=n,
                        payload=payload)
        if magic == b"FVID":
            w, h, nf = struct.unpack_from("<HHH", blob, 4)
            payload = bytes(blob[10:])
            if len(payload) != w * h * nf:
                return None
            return dict(format="fvid", width=w, height=h, n_frames=nf,
                        payload=payload)
        return None
    except (struct.error, IndexError):
        return None


def parse_std_media(blob: bytes):
    """REAL decode of the library-free formats (WAV, BMP, PNG), from
    their public byte layouts. Returns the same dict shape as
    parse_fake_media, or None for anything else/malformed
    (skip-not-fail).

    RIFF/WAVE (PCM): 'RIFF' | riff_size u32 | 'WAVE' | chunks, where a
    chunk is id(4) | size u32 | data (word-aligned). The 'fmt ' chunk
    carries audio_format u16 (1 = PCM), channels u16, sample_rate u32,
    byte_rate u32, block_align u16, bits_per_sample u16; 'data' is the
    sample payload; n_samples = len(data) / block_align.

    BMP (BITMAPINFOHEADER, uncompressed 24/32-bit): 'BM' | file_size
    u32 | reserved u32 | pixel_offset u32 | header_size u32 | width
    i32 | height i32 (negative = top-down) | planes u16 | bpp u16 |
    compression u32 (0 = BI_RGB); rows are 4-byte aligned.

    PNG (8-bit truecolor RGB/RGBA, non-interlaced) — see
    :func:`_parse_png`; the inflate step is stdlib zlib, so this is the
    one COMPRESSED format decodable with no external library."""
    try:
        if blob is None or len(blob) < 12:
            return None
        if bytes(blob[:4]) == b"RIFF" and bytes(blob[8:12]) == b"WAVE":
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(blob):
                cid = bytes(blob[pos : pos + 4])
                (csize,) = struct.unpack_from("<I", blob, pos + 4)
                body = bytes(blob[pos + 8 : pos + 8 + csize])
                if len(body) != csize:
                    return None  # truncated chunk
                if cid == b"fmt " and csize >= 16:
                    fmt = struct.unpack_from("<HHIIHH", body, 0)
                elif cid == b"data":
                    data = body
                pos += 8 + csize + (csize & 1)  # chunks are word-aligned
            if fmt is None or data is None:
                return None
            audio_format, channels, sample_rate, _rate, block_align, bits = fmt
            if audio_format != 1 or block_align == 0 or bits not in (8, 16, 24, 32):
                return None
            return dict(
                format="wav",
                channels=channels,
                sample_rate=sample_rate,
                n_samples=len(data) // block_align,
                payload=data,
            )
        if bytes(blob[:8]) == b"\x89PNG\r\n\x1a\n":
            return _parse_png(bytes(blob))
        if bytes(blob[:2]) == b"BM" and len(blob) >= 54:
            (pixel_offset,) = struct.unpack_from("<I", blob, 10)
            header_size, width, height, _planes, bpp = struct.unpack_from(
                "<IiiHH", blob, 14
            )
            (compression,) = struct.unpack_from("<I", blob, 30)
            if header_size < 40 or compression != 0 or bpp not in (24, 32):
                return None
            h = abs(height)
            row_bytes = ((width * bpp // 8) + 3) // 4 * 4
            payload = bytes(blob[pixel_offset : pixel_offset + row_bytes * h])
            if width <= 0 or h == 0 or len(payload) != row_bytes * h:
                return None
            return dict(
                format="bmp",
                width=width,
                height=h,
                channels=bpp // 8,
                payload=payload,
                # negative height = top-down row order (no flip needed);
                # consumers that reconstruct pixels (media_dedup's
                # raster) must respect this or they mirror the image
                top_down=height < 0,
            )
        return None
    except (struct.error, IndexError):
        return None


def _parse_png(blob: bytes):
    """REAL PNG decode with nothing but the stdlib (zlib is the PNG
    compression): signature | chunks (len u32 BE, type, data, crc) —
    IHDR gives width/height/bit-depth/color-type; the concatenated
    IDAT stream inflates to filter-prefixed scanlines which are
    de-filtered per the spec (None/Sub/Up/Average/Paeth). Supports the
    overwhelmingly-common shape: 8-bit, truecolor RGB/RGBA,
    non-interlaced. Anything else → None (skip-not-fail), same
    contract as the other std formats. Returns the raw de-filtered
    pixel payload."""
    import zlib

    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(blob):
        (clen,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            return None
        if ctype == b"IHDR":
            ihdr = struct.unpack_from(">IIBBBBB", data, 0)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if ihdr is None or not idat:
        return None
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp or filt or interlace:
        return None
    channels = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) != (stride + 1) * height or not width or not height:
        return None
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for x in range(channels, stride):
                row[x] = (row[x] + row[x - channels]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif f != 0:
            return None
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return dict(
        format="png",
        width=width,
        height=height,
        channels=channels,
        payload=bytes(out),
    )


def _parse_with(codec: str, blob: bytes):
    if codec == "std":
        return parse_std_media(blob) or parse_fake_media(blob)
    return parse_fake_media(blob)


def _require_real_codec(kind: str):
    deps = {"image": "Pillow (PIL)", "audio": "soundfile/librosa", "video": "av"}
    need = deps.get(kind) or " / ".join(deps.values())
    raise NotImplementedError(
        f"real {kind} decoding requires {need} — not bundled in this "
        "container; use codec='fake' (the deterministic test container) "
        "or install the dependency."
    )


def decode_media_meta(media: DataFrame, codec: str = "fake") -> DataFrame:
    """(media_id, kind, blob) → typed metadata row per blob; malformed
    blobs yield a row with null metadata (skip-not-fail, L1)."""
    if codec not in ("fake", "std"):
        _require_real_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, blob in pdf[["media_id", "kind", "blob"]].itertuples(
                index=False
            ):
                m = _parse_with(codec, blob)
                if m is None:
                    rows.append((mid, kind, None, None, None, None, None,
                                 None, None, None, None))
                else:
                    p = m["payload"]
                    rows.append(
                        (mid, kind, m["format"], m.get("width"), m.get("height"),
                         m.get("channels"), m.get("sample_rate"),
                         m.get("n_samples"), m.get("n_frames"), len(p),
                         hashlib.md5(p).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return media.mapInPandas(run, META_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2, codec: str = "fake") -> DataFrame:
    """Video frame sampling: every k-th frame → (media_id, frame_idx,
    frame_md5). Explode happens inside the batch iterator, so one
    input row → n output rows without materializing frames in a
    column."""
    if codec != "fake":
        _require_real_codec("video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, blob in pdf[["media_id", "kind", "blob"]].itertuples(
                index=False
            ):
                if kind != "video":
                    continue
                m = parse_fake_media(blob)
                if m is None or m["format"] != "fvid":
                    continue
                fsize = m["width"] * m["height"]
                for idx in range(0, m["n_frames"], every_k):
                    frame = m["payload"][idx * fsize : (idx + 1) * fsize]
                    rows.append((mid, idx, hashlib.md5(frame).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(run, FRAME_SCHEMA)


def extract_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Fixed-dim feature proxy: mean byte value of FEATURE_DIM equal
    payload chunks (pure-Python arithmetic → engine-independent
    doubles). Stands in for an embedding model; the plumbing (blob →
    array<double> column) is what a real model would use."""
    if codec not in ("fake", "std"):
        _require_real_codec("image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in pdf[["media_id", "blob"]].itertuples(index=False):
                m = _parse_with(codec, blob)
                if m is None:
                    rows.append((mid, None))
                    continue
                rows.append((mid, payload_features(m["payload"])))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def payload_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    n = max(len(payload) // dim, 1)
    out = []
    for i in range(dim):
        chunk = payload[i * n : (i + 1) * n]
        out.append(sum(chunk) / len(chunk) if chunk else 0.0)
    return out


# ship by value for worker-side decode (see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
