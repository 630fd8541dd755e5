"""Property-based fuzz over the binary parsers (hypothesis).

The L1 contract is skip-not-fail: arbitrary or corrupted bytes must
either parse, stop cleanly, or raise ValueError — never any other
exception, never a hang, never a record that lies about its bounds.
These parsers run executor-side over untrusted snapshot bytes at
100 TB, so "crashes only on ValueError" is a real operational
property, not test decoration.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from solana_snapshot_etl_tools_spark.sources import appendvec as AV  # noqa: E402
from solana_snapshot_etl_tools_spark.sources import bank as B  # noqa: E402
from solana_snapshot_etl_tools_spark.sources import snapshot as SNAP  # noqa: E402
from solana_snapshot_etl_tools_spark.operators import decoders as D  # noqa: E402
from solana_snapshot_etl_tools_spark.streaming import fbs  # noqa: E402


def _valid_append_vec() -> bytes:
    rows = [
        dict(
            pubkey=bytes([i] * 32),
            write_version=i,
            owner=bytes([i + 1] * 32),
            lamports=1000 + i,
            executable=bool(i % 2),
            rent_epoch=i,
            hash=bytes([i + 2] * 32),
            data=bytes(range(i * 3 % 250)),
        )
        for i in range(5)
    ]
    return AV.write_append_vec(rows)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_append_vec_walk_never_crashes_on_garbage(blob):
    for rec in AV.iter_append_vec(blob):
        # any yielded record must honor its own bounds
        assert len(rec["data"]) == rec["data_len"] <= len(blob)
        assert len(rec["pubkey"]) == 32 and len(rec["owner"]) == 32


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=800),
    st.binary(min_size=1, max_size=16),
)
def test_append_vec_walk_survives_point_corruption(pos, junk):
    base = bytearray(_valid_append_vec())
    pos = pos % len(base)
    base[pos : pos + len(junk)] = junk
    seen = 0
    for rec in AV.iter_append_vec(bytes(base)):
        assert len(rec["data"]) == rec["data_len"]
        seen += 1
        assert seen <= 64  # corrupted lengths must not loop unboundedly


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_bank_skip_walk_garbage_is_valueerror_only(blob):
    try:
        off = B.skip_versioned_bank(blob)
        assert 0 <= off <= len(blob)
    except ValueError:
        pass  # the ONLY permitted failure mode


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 255))
def test_bank_skip_walk_survives_point_corruption(pos, byte):
    base = bytearray(B.write_versioned_bank())
    base[pos % len(base)] = byte
    try:
        off = B.skip_versioned_bank(bytes(base))
        assert 0 <= off <= len(base)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_manifest_parse_garbage_is_valueerror_only(blob):
    try:
        SNAP.parse_manifest(blob)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_metadata_udf_parser_never_crashes(blob):
    out = D._parse_metadata(blob)
    assert out is None or len(out) == 10


def _account_fixture():
    return {
        "key": bytes(range(32)),
        "lamports": 5,
        "owner": bytes(range(32, 64)),
        "executable": False,
        "rent_epoch": 0,
        "data": b"\x01\x02",
        "write_version": 1,
        "slot": 2,
        "is_startup": False,
    }


import struct as _struct


@settings(max_examples=200, deadline=500)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 255))
def test_fbs_reader_survives_point_corruption(pos, byte):
    """Corrupted FlatBuffers must fail with a bounded, typed error (a
    consumer drops the message) — no hangs (hypothesis deadline), no
    giant allocations (vector lengths are sanity-bounded against the
    buffer size), no exception types a dispatcher wouldn't catch."""
    buf = bytearray(fbs.serialize_account(_account_fixture()))
    buf[pos % len(buf)] = byte
    try:
        out = fbs.deserialize_account(bytes(buf))
        assert isinstance(out, dict)
    except (ValueError, IndexError, UnicodeDecodeError, _struct.error):
        pass
