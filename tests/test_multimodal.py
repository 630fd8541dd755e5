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


def _encode_png(pixels: bytes, width: int, height: int, channels: int,
                filters=None) -> bytes:
    """Minimal in-test PNG writer: applies the given per-row filter
    types (cycling) before deflate, so the decoder's de-filter paths
    (None/Sub/Up/Average/Paeth) are all exercised against ground
    truth."""
    import struct as _s
    import zlib as _z

    filters = filters or [0]
    stride = width * channels
    color_type = 2 if channels == 3 else 6

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row = bytearray(pixels[y * stride:(y + 1) * stride])
        f = filters[y % len(filters)]
        enc = bytearray(row)
        if f == 1:
            for x in range(stride - 1, channels - 1, -1):
                enc[x] = (row[x] - row[x - channels]) & 0xFF
        elif f == 2:
            for x in range(stride):
                enc[x] = (row[x] - prev[x]) & 0xFF
        elif f == 3:
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (row[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = row
    ihdr = _s.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_std_codec_decodes_real_png():
    """8-bit RGB and RGBA PNGs round-trip through every filter type;
    unsupported shapes and corrupt streams skip (None), never raise."""
    w, h = 7, 9
    rgb = bytes((x * 37 + i * 11) % 256 for x in range(w * h) for i in range(3))
    for channels in (3, 4):
        px = rgb if channels == 3 else bytes(
            b for x in range(w * h) for b in (rgb[x * 3], rgb[x * 3 + 1],
                                              rgb[x * 3 + 2], (x * 7) % 256)
        )
        blob = _encode_png(px, w, h, channels, filters=[0, 1, 2, 3, 4])
        m = MM.parse_std_media(blob)
        assert m is not None and m["format"] == "png"
        assert (m["width"], m["height"], m["channels"]) == (w, h, channels)
        assert m["payload"] == px
    # 16-bit depth → unsupported shape, skipped
    deep = bytearray(_encode_png(rgb, w, h, 3))
    deep[24] = 16  # IHDR bit-depth byte
    assert MM.parse_std_media(bytes(deep)) is None
    # corrupt deflate stream → skipped
    blob = bytearray(_encode_png(rgb, w, h, 3))
    blob[50] ^= 0xFF
    assert MM.parse_std_media(bytes(blob)) is None
    # truncated mid-chunk (IDAT length points past the end) → skipped
    truncated = _encode_png(rgb, w, h, 3)
    cut = truncated[: len(truncated) - 30]
    assert MM.parse_std_media(cut) is None
