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


# --- hypothesis property sweeps (round 14): arbitrary lengths incl.
# --- leading zeros, empty input, and an INDEPENDENT reference
try:
    from hypothesis import given, settings, strategies as st

    def _ref_b58(raw: bytes) -> str:
        """Independent reference: positional div-mod on a digit list
        (different machinery from the int.from_bytes implementation)."""
        alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
        digits = [0]
        for byte in raw:
            carry = byte
            for i in range(len(digits)):
                carry += digits[i] << 8
                digits[i] = carry % 58
                carry //= 58
            while carry:
                digits.append(carry % 58)
                carry //= 58
        zeros = len(raw) - len(raw.lstrip(b"\x00"))
        return "1" * zeros + "".join(
            alpha[d] for d in reversed(digits)
        ).lstrip("1") if raw else ""

    @settings(max_examples=400, deadline=None)
    @given(st.binary(max_size=80))
    def test_base58_roundtrip_and_reference_agreement(raw):
        enc = b58encode(raw)
        assert b58decode(enc) == raw
        assert enc == _ref_b58(raw)

except ImportError:  # pragma: no cover
    pass


def test_le_readers_agree_with_struct(spark):
    """Same property the round-14 hypothesis sweep pinned (readers at
    every pad 0..8 agree with struct.unpack_from over the uint64
    domain incl. sign/width boundaries), but evaluated as ONE batched
    collect: the per-example spelling paid a full Spark action per
    hypothesis draw — 200 actions, ~2 min of the suite for a pure
    expression identity (r17 test-budget fix; same case count kept)."""
    rng = random.Random(14)
    edges = [0, 1, 0x7F, 0x80, 0xFF, 0x100, 0x7FFF, 0x8000, 0xFFFF,
             0x10000, 2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**63 - 1,
             2**63, 2**64 - 1]
    cases = [(v, p) for v in edges for p in (0, 1, 8)] + [
        (rng.randrange(2**64), rng.randrange(9)) for _ in range(149)
    ]
    rows = [
        (i, b"\x5a" * pad + struct.pack("<Q", v))
        for i, (v, pad) in enumerate(cases)
    ]
    # the readers take a LITERAL offset, so emit one column per pad and
    # pick the row's own pad at assert time — still one Spark action
    dfs = spark.createDataFrame(
        [(pad, i, b) for (i, b), (_, pad) in zip(rows, cases)],
        "pad int, i int, b binary",
    )
    collected = dfs.select(
        "pad",
        "i",
        *[
            F.when(F.col("pad") == p, le_u64(F.col("b"), p)).alias(f"q{p}")
            for p in range(9)
        ],
        *[
            F.when(F.col("pad") == p, le_u32(F.col("b"), p)).alias(f"u{p}")
            for p in range(9)
        ],
        *[
            F.when(F.col("pad") == p, le_u16(F.col("b"), p)).alias(f"h{p}")
            for p in range(9)
        ],
        *[
            F.when(F.col("pad") == p, u8_at(F.col("b"), p)).alias(f"c{p}")
            for p in range(9)
        ],
    ).collect()
    assert len(collected) == len(cases)
    for r in collected:
        v, pad = cases[r.i]
        b = rows[r.i][1]
        assert r[f"q{pad}"] == struct.unpack_from("<q", b, pad)[0]  # signed view
        assert r[f"u{pad}"] == struct.unpack_from("<I", b, pad)[0]
        assert r[f"h{pad}"] == struct.unpack_from("<H", b, pad)[0]
        assert r[f"c{pad}"] == b[pad]
