"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json: first-class training-pipeline capability).

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` decode, explode-style frame sampling, fixed-dim
feature extraction. The actual codec step is pluggable:

- the deterministic FAKE codec (``FIMG``/``FAUD``/``FVID`` headers,
  fixtures.py) exercises the full path with value-level oracles;
- real decoders (PIL / soundfile / av) are gated behind import — the
  libraries are not in this container, so ``decode_media_meta(...,
  codec="real")`` raises NotImplementedError with the dependency
  named, per the build contract.

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
    if codec != "fake":
        _require_real_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, blob in pdf[["media_id", "kind", "blob"]].itertuples(
                index=False
            ):
                m = parse_fake_media(blob)
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
    if codec != "fake":
        _require_real_codec("image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in pdf[["media_id", "blob"]].itertuples(index=False):
                m = parse_fake_media(blob)
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
