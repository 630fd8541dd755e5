"""Binary fixed-layout readers as pure column expressions.

The reference unpacks SPL-token layouts with trusted Rust decoders
(reference sqlite.rs:237-251); here each field read compiles to
Catalyst expressions (substring / hex / conv / decimal arithmetic) so
the decode stays inside whole-stage codegen — no Python in the hot
path (SURVEY.md §2.4 T1-T3, §7 "hard parts").

u64 policy (SURVEY.md §4 item 5): columns are LongType with u64→i64
wraparound, matching the reference's ``as i64`` casts
(reference sqlite.rs:227-231) — u64::MAX rent_epoch reads as -1.
ANSI mode is on in Spark 4, so the wraparound is done exactly in
DecimalType(38,0) then cast (never relies on silent overflow).

Offsets are 1-based (Spark substring convention); helpers take the
0-based layout offset and convert.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TWO63 = "9223372036854775808"
_TWO64 = "18446744073709551616"


def _rev_hex(data: Column, off0: int, nbytes: int) -> Column:
    """Hex of the byte-reversed slice. NB: ``F.reverse`` is NOT usable
    here — on BinaryType it casts to string and reverses *code points*,
    so bytes that happen to form valid multi-byte UTF-8 stay grouped
    (silent corruption). Per-byte substring+concat is byte-exact and
    still folds into whole-stage codegen."""
    return F.hex(
        F.concat(*[F.substring(data, off0 + i, 1) for i in range(nbytes, 0, -1)])
    )


def _le_uint(data: Column, off0: int, nbytes: int) -> Column:
    """Little-endian unsigned int of `nbytes` (<= 7) as LongType."""
    assert nbytes <= 7, "use le_u64 for 8-byte fields (wraparound policy)"
    return F.conv(_rev_hex(data, off0, nbytes), 16, 10).cast("long")


def u8_at(data: Column, off0: int) -> Column:
    return _le_uint(data, off0, 1)


def le_u16(data: Column, off0: int) -> Column:
    return _le_uint(data, off0, 2)


def le_u32(data: Column, off0: int) -> Column:
    return _le_uint(data, off0, 4)


def le_u64(data: Column, off0: int) -> Column:
    """LE u64 → LongType with two's-complement wraparound (ANSI-safe).

    Split into two u32 halves (each fits a long exactly), combine in
    DecimalType(38,0), subtract 2^64 when the value exceeds i64 range,
    then cast — exact for the full u64 domain.
    """
    lo = F.conv(_rev_hex(data, off0, 4), 16, 10).cast("decimal(20,0)")
    hi = F.conv(_rev_hex(data, off0 + 4, 4), 16, 10).cast("decimal(20,0)")
    v = (hi * F.lit(4294967296).cast("decimal(20,0)") + lo).cast("decimal(38,0)")
    signed = F.when(
        v >= F.lit(_TWO63).cast("decimal(38,0)"),
        v - F.lit(_TWO64).cast("decimal(38,0)"),
    ).otherwise(v)
    return signed.cast("long")


def le_u64_decimal(data: Column, off0: int) -> Column:
    """LE u64 as DecimalType(20,0) — the exactness-preserving opt-in
    view (SURVEY.md §4 item 5) for consumers that must see the full
    unsigned domain (e.g. rent_epoch's u64::MAX sentinel as
    18446744073709551615 rather than the LongType wraparound -1)."""
    lo = F.conv(_rev_hex(data, off0, 4), 16, 10).cast("decimal(20,0)")
    hi = F.conv(_rev_hex(data, off0 + 4, 4), 16, 10).cast("decimal(20,0)")
    return (hi * F.lit(4294967296).cast("decimal(20,0)") + lo).cast("decimal(20,0)")


def unsigned_view(col: Column) -> Column:
    """Reinterpret a wraparound LongType column as its unsigned u64
    value in DecimalType(20,0): negative ⇒ +2^64."""
    d = col.cast("decimal(20,0)")
    return F.when(col < 0, d + F.lit(_TWO64).cast("decimal(20,0)")).otherwise(d)


def pubkey_at(data: Column, off0: int) -> Column:
    """32-byte pubkey slice (BinaryType)."""
    return F.substring(data, off0 + 1, 32)


def coption_pubkey(data: Column, off0: int) -> Column:
    """COption<Pubkey>: 4-byte LE tag (0|1) then 32-byte value
    (reference sqlite.rs:277-281). Null when tag == 0."""
    return F.when(le_u32(data, off0) == 1, pubkey_at(data, off0 + 4))


def coption_u64(data: Column, off0: int) -> Column:
    """COption<u64>: 4-byte LE tag then u64 value."""
    return F.when(le_u32(data, off0) == 1, le_u64(data, off0 + 4))


def bool_at(data: Column, off0: int) -> Column:
    return u8_at(data, off0) != 0


# --- dynamic-offset variants ------------------------------------------------
# For layouts whose field positions depend on earlier variable-length
# fields (Borsh strings/vecs): the offset is a Column computed from the
# data itself. Still pure Catalyst — ``Column.substr`` accepts Column
# positions — so variable-length decodes stay in whole-stage codegen.


_INT_MAX = 2147483647


def _as_int(v: Column) -> Column:
    """Clamp a long offset/length into int range for ``substr`` (whose
    ANSI long→int cast would otherwise overflow on corrupted u32
    lengths). Beyond-buffer values slice to empty/rest either way, so
    clamping preserves semantics; NULL propagates."""
    return F.when(v > _INT_MAX, F.lit(_INT_MAX)).otherwise(v).cast("int")


def substr_dyn(data: Column, pos0: Column, n: Column) -> Column:
    """`n`-byte slice at 0-based Column offset `pos0`."""
    return data.substr(_as_int(pos0 + F.lit(1)), _as_int(n))


def _rev_hex_dyn(data: Column, pos0: Column, nbytes: int) -> Column:
    return F.hex(
        F.concat(
            *[
                data.substr(_as_int(pos0 + F.lit(i + 1)), F.lit(1))
                for i in range(nbytes - 1, -1, -1)
            ]
        )
    )


def _le_uint_dyn(data: Column, pos0: Column, nbytes: int) -> Column:
    """LE unsigned int at a dynamic offset. A slice running off the
    buffer yields the LE value of the available bytes (and NULL when
    no bytes remain) — callers bound-check, mirroring Python's
    truncating ``int.from_bytes(b[o:o+n], 'little')``."""
    assert nbytes <= 7
    return F.conv(_rev_hex_dyn(data, pos0, nbytes), 16, 10).cast("long")


def u8_at_dyn(data: Column, pos0: Column) -> Column:
    return _le_uint_dyn(data, pos0, 1)


def le_u16_dyn(data: Column, pos0: Column) -> Column:
    return _le_uint_dyn(data, pos0, 2)


def le_u32_dyn(data: Column, pos0: Column) -> Column:
    return _le_uint_dyn(data, pos0, 4)


# ship this module's functions by value inside serialized UDF tasks
# (workers do not share the driver's sys.path — see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
