"""AppendVec record codec (S5) — the snapshot's on-disk account log.

Byte layout mirrors the reference's mmap'd structs
(solana-snapshot-etl/src/append_vec.rs:54-107, record walk
lib.rs:59-75): per record

    StoredMeta   { write_version u64, data_len u64, pubkey [32] }   48 B
    AccountMeta  { lamports u64, rent_epoch u64, owner [32],
                   executable u8, pad [7] }                         56 B
    hash [32]                                                       32 B
    data [data_len]
    → 8-byte alignment (append_vec.rs:39-44 u64_align!)

Pure-Python struct walk — this is the ONE place byte-level imperative
decode is required (SURVEY.md §1.2); it runs inside mapInPandas on
executors, never on the driver.
"""

from __future__ import annotations

import struct

# plain format strings (struct.Struct objects are unpicklable and this
# module ships by value into UDF tasks)
HDR_FMT = "<QQ32s"  # StoredMeta
ACC_FMT = "<QQ32sB7x"  # AccountMeta + padding
HDR_SIZE = struct.calcsize(HDR_FMT)
ACC_SIZE = struct.calcsize(ACC_FMT)
HASH_LEN = 32
MAX_APPEND_VEC_FILE_SIZE = 16 * 1024 * 1024 * 1024  # append_vec.rs:46


def _align8(n: int) -> int:
    return (n + 7) & ~7


def pack_account(
    pubkey: bytes,
    write_version: int,
    owner: bytes,
    lamports: int,
    executable: bool,
    rent_epoch: int,
    hash32: bytes,
    data: bytes,
) -> bytes:
    rec = (
        struct.pack(HDR_FMT, write_version, len(data), pubkey)
        + struct.pack(ACC_FMT, lamports & (2**64 - 1), rent_epoch & (2**64 - 1),
                      owner, 1 if executable else 0)
        + hash32
        + data
    )
    return rec + b"\x00" * (_align8(len(rec)) - len(rec))


def write_append_vec(accounts: list[dict]) -> bytes:
    """Serialize account dicts (RAW_ACCOUNTS_SCHEMA field names) into
    one AppendVec blob."""
    out = bytearray()
    for a in accounts:
        out += pack_account(
            a["pubkey"], a["write_version"], a["owner"], a["lamports"],
            a["executable"], a["rent_epoch"], a["hash"], a["data"],
        )
    return bytes(out)


def iter_append_vec(buf: bytes, current_len: int | None = None):
    """Walk records by offset; stop at the first record that does not
    fit (reference semantics: stop at first None, lib.rs:59-75).
    ``current_len`` bounds the readable region (manifest
    accounts_current_len, F14)."""
    end = len(buf) if current_len is None else min(len(buf), current_len)
    off = 0
    while off + HDR_SIZE + ACC_SIZE + HASH_LEN <= end:
        write_version, data_len, pubkey = struct.unpack_from(HDR_FMT, buf, off)
        a_off = off + HDR_SIZE
        lamports, rent_epoch, owner, executable = struct.unpack_from(
            ACC_FMT, buf, a_off
        )
        h_off = a_off + ACC_SIZE
        d_off = h_off + HASH_LEN
        if data_len > MAX_APPEND_VEC_FILE_SIZE or d_off + data_len > end:
            return
        yield dict(
            pubkey=pubkey,
            write_version=write_version,
            owner=owner,
            lamports=_i64(lamports),
            executable=executable != 0,
            rent_epoch=_i64(rent_epoch),
            hash=buf[h_off:d_off],
            data=bytes(buf[d_off : d_off + data_len]),
            data_len=data_len,
        )
        off = _align8(d_off + data_len)


def _i64(v: int) -> int:
    """u64 → i64 wraparound (engine LongType policy, sqlite.rs:227-231)."""
    return v - (1 << 64) if v >= (1 << 63) else v


# ship by value for worker-side decode (see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
