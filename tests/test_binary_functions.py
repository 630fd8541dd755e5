"""Unit tests: binary layout readers + base58 (SURVEY.md §5 item 1)."""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.functions import b58decode, b58encode
from solana_snapshot_etl_tools_spark.functions.binary import (
    le_u16,
    le_u32,
    le_u64,
    u8_at,
)


def test_le_u64_roundtrip_includes_wraparound(spark):
    rng = random.Random(7)
    vals = [0, 1, 2**32 - 1, 2**32, 2**63 - 1, 2**63, 2**64 - 1] + [
        rng.randrange(2**64) for _ in range(200)
    ]
    rows = [(struct.pack("<Q", v),) for v in vals]
    df = spark.createDataFrame(rows, "b binary")
    got = [r[0] for r in df.select(le_u64(F.col("b"), 0).alias("v")).collect()]
    want = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    assert got == want


def test_le_small_ints(spark):
    b = struct.pack("<BHI", 0xAB, 0xBEEF, 0xDEADBEEF)
    df = spark.createDataFrame([(b,)], "b binary")
    r = df.select(
        u8_at(F.col("b"), 0).alias("a"),
        le_u16(F.col("b"), 1).alias("c"),
        le_u32(F.col("b"), 3).alias("d"),
    ).collect()[0]
    assert (r.a, r.c, r.d) == (0xAB, 0xBEEF, 0xDEADBEEF)


def test_base58_known_vectors():
    # system program is all zeros → all '1's
    assert b58encode(b"\x00" * 32) == "1" * 32
    assert b58decode("11111111111111111111111111111111") == b"\x00" * 32
    rng = random.Random(3)
    for _ in range(100):
        raw = rng.randbytes(32)
        assert b58decode(b58encode(raw)) == raw
    # well-known program id round-trips through our decoder
    tok = "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"
    assert b58encode(b58decode(tok)) == tok
