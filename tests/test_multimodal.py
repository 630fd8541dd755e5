"""Multimodal plumbing tests beyond the differential gate."""

from __future__ import annotations

import pytest

from solana_snapshot_etl_tools_spark.fixtures import build_fixture, media_df
from solana_snapshot_etl_tools_spark.operators import multimodal as MM


def _wav_bytes(sample_rate=16000, channels=1, bits=16, n_samples=100):
    """Hand-built RIFF/WAVE PCM file from the published layout."""
    import struct

    block_align = channels * bits // 8
    data = bytes((i * 7) % 256 for i in range(n_samples * block_align))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks, data


def _bmp_bytes(width=5, height=3, bpp=24):
    """Hand-built uncompressed BMP (BITMAPINFOHEADER)."""
    import struct

    row = ((width * bpp // 8) + 3) // 4 * 4
    pixels = bytes((i * 11) % 256 for i in range(row * height))
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0,
                          len(pixels), 2835, 2835, 0, 0)
    return header + pixels, pixels


def test_std_codec_decodes_real_wav_and_bmp(spark):
    """codec='std' must REALLY decode library-free formats: PCM WAV and
    uncompressed BMP, with exact metadata and payload hash — and fall
    back to the fake containers so mixed corpora decode in one pass."""
    import hashlib

    wav, wav_data = _wav_bytes(sample_rate=8000, channels=2, bits=16, n_samples=50)
    bmp, bmp_pixels = _bmp_bytes(width=5, height=3)
    fimg = build_fixture()["media"][0][2]  # a fake-container blob
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "image", bytearray(bmp)),
         (3, "image", bytearray(fimg)), (4, "audio", bytearray(b"RIFFxxxx"))],
        MM.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in MM.decode_media_meta(df, codec="std").collect()}
    w = out[1]
    assert (w.format, w.sample_rate, w.n_samples, w.channels) == ("wav", 8000, 50, 2)
    assert w.payload_md5 == hashlib.md5(wav_data).hexdigest()
    b = out[2]
    assert (b.format, b.width, b.height, b.channels) == ("bmp", 5, 3, 3)
    assert b.payload_md5 == hashlib.md5(bmp_pixels).hexdigest()
    assert out[3].format == "fimg"  # fake container still decodes
    assert out[4].format is None  # truncated RIFF skips, not fails
    # features flow from the real payloads too
    feats = {r.media_id: r.feature for r in MM.extract_features(df, codec="std").collect()}
    assert feats[1] is not None and len(feats[1]) == MM.FEATURE_DIM
    assert feats[1] == MM.payload_features(wav_data)
    assert feats[2] == MM.payload_features(bmp_pixels)


def test_std_codec_rejects_malformed_variants():
    import struct

    wav, _ = _wav_bytes()
    assert MM.parse_std_media(wav[: len(wav) - 3]) is None  # truncated data
    bad_fmt = wav.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    assert MM.parse_std_media(bad_fmt) is None  # non-PCM format code
    bmp, _ = _bmp_bytes()
    rle = bytearray(bmp)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 compression
    assert MM.parse_std_media(bytes(rle)) is None
    assert MM.parse_std_media(bmp[:-1]) is None  # short pixel array


def test_real_codec_is_gated(spark):
    with pytest.raises(NotImplementedError, match="PIL|Pillow"):
        MM.decode_media_meta(media_df(spark), codec="real")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media_df(spark), codec="real")


def test_corrupt_blobs_skip_not_fail(spark):
    meta = MM.decode_media_meta(media_df(spark))
    bad = meta.filter(meta.format.isNull())
    assert bad.count() == 3  # the three planted corrupt blobs
    # and every input row produced exactly one output row
    assert meta.count() == len(build_fixture()["media"])


def test_frame_sampling_counts(spark):
    frames = MM.sample_frames(media_df(spark), every_k=2)
    exp = build_fixture()["expected"]["frame_sample"][2]
    assert frames.count() == len(exp)
    got = {(r.media_id, r.frame_idx, r.frame_md5) for r in frames.collect()}
    assert got == set(exp)
