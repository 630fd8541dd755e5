"""FlatBuffers wire format for Geyser messages (T9 default parity).

The reference's *default* serialization for every Kafka topic is
FlatBuffers (serializer/src/flatbuffer/mod.rs:32-567; IDL in
serializer/src/flatbuffer/*.fbs). This module implements the
FlatBuffers binary wire format from the public spec — a minimal
builder and reader written from scratch (the ``flatbuffers`` runtime
is not in the container) — plus the five message serializers the
reference dispatches:

==================  =====================  ==========================
message             root type              reference
==================  =====================  ==========================
account update      AccountInfo            mod.rs:32-71, account_info.fbs
block metadata      Metadata               mod.rs:73-91, metadata.fbs
transaction         TransactionInfo        mod.rs:94-537, transaction_info.fbs
nft off-chain data  MetadataOffChain       mod.rs:540-557, metadata_off_chain.fbs
finalized slot      scalar u64 root        mod.rs:560-566
==================  =====================  ==========================

Wire-compatibility notes:

- vtable slots follow .fbs declaration order; the union field in
  ``SanitizedTransaction`` occupies two slots (type tag, then value),
  exactly as flatc-generated code assigns them, so a consumer built
  from the reference IDL can read these buffers.
- like the reference's default ``FlatBufferBuilder``, fields equal to
  their schema default (0 / false) are omitted from the vtable.
- u64 schema fields carry this repo's i64 column values re-encoded
  two's-complement (the documented u64→i64 wraparound policy).

Only the features these five schemas need are implemented: tables,
(nested) vectors, strings, scalars, one union. No structs-in-tables,
no shared-vtable dedup (readers don't care), no key sorting.
"""

from __future__ import annotations

import struct
from typing import Any, Sequence

__all__ = [
    "Builder",
    "serialize_account",
    "serialize_metadata",
    "serialize_metadata_off_chain",
    "serialize_finalized_slot",
    "serialize_transaction",
    "deserialize_account",
    "deserialize_metadata",
    "deserialize_metadata_off_chain",
    "deserialize_finalized_slot",
    "deserialize_transaction",
]

_MASK64 = (1 << 64) - 1


def _i(v) -> int:
    """Coerce a pandas/Arrow cell to int: None/NaN → 0, numpy ints ok."""
    if v is None or (isinstance(v, float) and v != v):
        return 0
    return int(v)


def _lst(v) -> list:
    """Coerce a pandas/Arrow list cell (None, list, numpy array) to a
    list — plain ``or []`` is ambiguous on numpy arrays."""
    if v is None or (isinstance(v, float) and v != v):
        return []
    return list(v)


# --- builder ---------------------------------------------------------------


class Builder:
    """Minimal FlatBuffers builder (back-to-front buffer, per spec)."""

    def __init__(self, initial: int = 1024) -> None:
        self.buf = bytearray(initial)
        self.head = initial
        self.minalign = 1
        self._vtable: list[int] | None = None
        self._obj_end = 0

    # offsets are measured from the END of the buffer (grows downward)
    def offset(self) -> int:
        return len(self.buf) - self.head

    def _grow(self, needed: int) -> None:
        while self.head < needed:
            old = len(self.buf)
            # prepend zeros; existing data stays at the tail
            self.buf = bytearray(old) + self.buf
            self.head += old

    def _prep(self, size: int, additional: int = 0) -> None:
        """Pad so that after writing `additional` bytes, the next
        `size`-byte write is size-aligned (from the buffer end)."""
        if size > self.minalign:
            self.minalign = size
        align = (~(self.offset() + additional) + 1) & (size - 1)
        self._grow(align + size + additional)
        self.head -= align  # bytes below head are always zero

    def _place(self, fmt: str, size: int, value) -> None:
        self.head -= size
        # A negative head would wrap pack_into to the buffer TAIL
        # (Python negative indexing) and silently corrupt already-written
        # data — every write must be preceded by a _prep/_grow reservation.
        assert self.head >= 0, "Builder underflow: write without reservation"
        struct.pack_into(fmt, self.buf, self.head, value)

    def push_scalar(self, fmt: str, size: int, value) -> int:
        self._prep(size)
        self._place(fmt, size, value)
        return self.offset()

    def _place_uoffset(self, target: int) -> None:
        # stored value = distance from this field forward to target
        self._place("<I", 4, self.offset() + 4 - target)

    def push_uoffset(self, target: int) -> int:
        self._prep(4)
        self._place_uoffset(target)
        return self.offset()

    def bytes_vector(self, data: bytes | bytearray | Sequence[int]) -> int:
        data = bytes(bytearray(data))
        self._prep(4, len(data))
        self.head -= len(data)
        self.buf[self.head : self.head + len(data)] = data
        self._place("<I", 4, len(data))
        return self.offset()

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        self._prep(4, len(data) + 1)  # +1: NUL terminator (already 0)
        self.head -= len(data) + 1
        self.buf[self.head : self.head + len(data)] = data
        self._place("<I", 4, len(data))
        return self.offset()

    def scalar_vector(self, fmt: str, size: int, values: Sequence) -> int:
        self._prep(4, size * len(values))
        self._prep(size, size * len(values))
        for v in reversed(values):
            self._place(fmt, size, v)
        self._place("<I", 4, len(values))
        return self.offset()

    def offset_vector(self, offsets: Sequence[int]) -> int:
        self._prep(4, 4 * len(offsets))
        for off in reversed(offsets):
            self._place_uoffset(off)
        self._place("<I", 4, len(offsets))
        return self.offset()

    # tables
    def start_table(self, nslots: int) -> None:
        self._vtable = [0] * nslots
        self._obj_end = self.offset()

    def slot_scalar(self, slot: int, fmt: str, size: int, value, default=0) -> None:
        if value == default:
            return  # default values are omitted (reader falls back)
        self._prep(size)
        self._place(fmt, size, value)
        self._vtable[slot] = self.offset()

    def slot_u64(self, slot: int, value) -> None:
        self.slot_scalar(slot, "<Q", 8, _i(value) & _MASK64)

    def slot_i64(self, slot: int, value) -> None:
        self.slot_scalar(slot, "<q", 8, _i(value))

    def slot_u8(self, slot: int, value) -> None:
        self.slot_scalar(slot, "<B", 1, _i(value) & 0xFF)

    def slot_bool(self, slot: int, value) -> None:
        v = 0 if value is None or (isinstance(value, float) and value != value) else int(bool(value))
        self.slot_scalar(slot, "<B", 1, v)

    def slot_f64(self, slot: int, value) -> None:
        v = 0.0 if value is None or (isinstance(value, float) and value != value) else float(value)
        self.slot_scalar(slot, "<d", 8, v, 0.0)

    def slot_offset(self, slot: int, target: int | None) -> None:
        if not target:
            return
        self.push_uoffset(target)
        self._vtable[slot] = self.offset()

    def end_table(self) -> int:
        assert self._vtable is not None
        vt = self._vtable
        while vt and vt[-1] == 0:
            vt.pop()
        self._prep(4)
        self.head -= 4  # soffset placeholder (patched below)
        table = self.offset()
        # reserve the vtable bytes BEFORE placing them: _place does not
        # grow, and an unreserved write underflows head near a buffer
        # doubling boundary
        self._grow(2 * (len(vt) + 2))
        for foff in reversed(vt):
            self._place("<H", 2, (table - foff) if foff else 0)
        self._place("<H", 2, table - self._obj_end)  # table byte size
        self._place("<H", 2, (len(vt) + 2) * 2)  # vtable byte size
        vtable = self.offset()
        struct.pack_into("<i", self.buf, len(self.buf) - table, vtable - table)
        self._vtable = None
        return table

    def finish(self, root: int) -> bytes:
        self._prep(self.minalign, 4)
        self.push_uoffset(root)
        return bytes(self.buf[self.head :])


# --- reader ----------------------------------------------------------------


def _u16(b: bytes, p: int) -> int:
    return struct.unpack_from("<H", b, p)[0]


def _i32(b: bytes, p: int) -> int:
    return struct.unpack_from("<i", b, p)[0]


def _u32(b: bytes, p: int) -> int:
    return struct.unpack_from("<I", b, p)[0]


def root_pos(buf: bytes) -> int:
    return _u32(buf, 0)


def _field(buf: bytes, tpos: int, slot: int) -> int | None:
    vt = tpos - _i32(buf, tpos)
    rel = 4 + slot * 2
    if rel >= _u16(buf, vt):
        return None
    off = _u16(buf, vt + rel)
    return tpos + off if off else None


def fscalar(buf, tpos, slot, fmt, default=0):
    p = _field(buf, tpos, slot)
    return default if p is None else struct.unpack_from(fmt, buf, p)[0]


def fi64_from_u64(buf, tpos, slot) -> int:
    """Read a schema-u64 back into this repo's i64 wraparound view."""
    v = fscalar(buf, tpos, slot, "<Q")
    return v - (1 << 64) if v >= (1 << 63) else v


def fbool(buf, tpos, slot) -> bool:
    return bool(fscalar(buf, tpos, slot, "<B"))


def ftable(buf, tpos, slot) -> int | None:
    p = _field(buf, tpos, slot)
    return None if p is None else p + _u32(buf, p)


def _fvec(buf, tpos, slot):
    p = _field(buf, tpos, slot)
    if p is None:
        return None, 0
    v = p + _u32(buf, p)
    n = _u32(buf, v)
    # sanity bound before any caller builds an n-sized structure: a
    # vector element is ≥ 1 byte, so a corrupted length larger than
    # the buffer can never be legitimate (prevents multi-GB list
    # allocations on malformed input)
    if n > len(buf):
        raise ValueError(f"implausible vector length {n} at {v}")
    return v + 4, n


def fbytes(buf, tpos, slot) -> bytes | None:
    start, n = _fvec(buf, tpos, slot)
    return None if start is None else bytes(buf[start : start + n])


def fstring(buf, tpos, slot) -> str | None:
    raw = fbytes(buf, tpos, slot)
    return None if raw is None else raw.decode("utf-8")


def fvec_scalar(buf, tpos, slot, fmt, size) -> list | None:
    start, n = _fvec(buf, tpos, slot)
    if start is None:
        return None
    return [struct.unpack_from(fmt, buf, start + i * size)[0] for i in range(n)]


def fvec_tables(buf, tpos, slot) -> list[int] | None:
    start, n = _fvec(buf, tpos, slot)
    if start is None:
        return None
    return [start + 4 * i + _u32(buf, start + 4 * i) for i in range(n)]


def fvec_strings(buf, tpos, slot) -> list[str] | None:
    ps = fvec_tables(buf, tpos, slot)  # same indirection shape
    if ps is None:
        return None
    out = []
    for p in ps:
        n = _u32(buf, p)
        out.append(bytes(buf[p + 4 : p + 4 + n]).decode("utf-8"))
    return out


# --- message serializers ---------------------------------------------------
# Helper tables shared by several messages.


def _pubkey(b: Builder, key: bytes) -> int:
    vec = b.bytes_vector(key)
    b.start_table(1)
    b.slot_offset(0, vec)
    return b.end_table()


def _read_pubkey(buf: bytes, tpos: int) -> bytes:
    return fbytes(buf, tpos, 0) or b""


def serialize_account(row: dict[str, Any]) -> bytes:
    """AccountInfo (mod.rs:32-71). Row keys = ACCOUNT_UPDATES_SCHEMA."""
    b = Builder(256)
    pk = _pubkey(b, row["key"])
    owner = _pubkey(b, row["owner"])
    data = b.bytes_vector(row.get("data") or b"")
    b.start_table(9)
    b.slot_offset(0, pk)
    b.slot_u64(1, row["lamports"])
    b.slot_offset(2, owner)
    b.slot_bool(3, row["executable"])
    b.slot_u64(4, row["rent_epoch"])
    b.slot_offset(5, data)
    b.slot_u64(6, row["write_version"])
    b.slot_u64(7, row["slot"])
    b.slot_bool(8, bool(row.get("is_startup")))
    return b.finish(b.end_table())


def deserialize_account(buf: bytes) -> dict[str, Any]:
    t = root_pos(buf)
    pk = ftable(buf, t, 0)
    owner = ftable(buf, t, 2)
    return {
        "key": _read_pubkey(buf, pk) if pk is not None else b"",
        "lamports": fi64_from_u64(buf, t, 1),
        "owner": _read_pubkey(buf, owner) if owner is not None else b"",
        "executable": fbool(buf, t, 3),
        "rent_epoch": fi64_from_u64(buf, t, 4),
        "data": fbytes(buf, t, 5),
        "write_version": fi64_from_u64(buf, t, 6),
        "slot": fi64_from_u64(buf, t, 7),
        "is_startup": fbool(buf, t, 8),
    }


def serialize_metadata(row: dict[str, Any]) -> bytes:
    """Metadata / block metadata (mod.rs:73-91). T10 null-defaulting
    happens upstream; None here still encodes as absent/default."""
    b = Builder(256)
    blockhash = b.string(row.get("blockhash") or "")
    rewards = b.string(row.get("rewards") or "")
    b.start_table(5)
    b.slot_u64(0, row["slot"])
    b.slot_offset(1, blockhash)
    b.slot_offset(2, rewards)
    b.slot_i64(3, row.get("block_time") or 0)
    b.slot_u64(4, row.get("block_height") or 0)
    return b.finish(b.end_table())


def deserialize_metadata(buf: bytes) -> dict[str, Any]:
    t = root_pos(buf)
    return {
        "slot": fi64_from_u64(buf, t, 0),
        "blockhash": fstring(buf, t, 1),
        "rewards": fstring(buf, t, 2),
        "block_time": fscalar(buf, t, 3, "<q"),
        "block_height": fi64_from_u64(buf, t, 4),
    }


def serialize_metadata_off_chain(row: dict[str, Any]) -> bytes:
    """MetadataOffChain (mod.rs:540-557): pubkey/uri ride as strings
    (the reference sends base58 text)."""
    b = Builder(256)
    pubkey = b.string(row["pubkey"])
    uri = b.string(row["uri"])
    b.start_table(4)
    b.slot_offset(0, pubkey)
    b.slot_offset(1, uri)
    b.slot_u64(2, row["slot"])
    b.slot_bool(3, bool(row.get("is_startup")))
    return b.finish(b.end_table())


def deserialize_metadata_off_chain(buf: bytes) -> dict[str, Any]:
    t = root_pos(buf)
    return {
        "pubkey": fstring(buf, t, 0),
        "uri": fstring(buf, t, 1),
        "slot": fi64_from_u64(buf, t, 2),
        "is_startup": fbool(buf, t, 3),
    }


def serialize_finalized_slot(slot: int) -> bytes:
    """Scalar u64 root (mod.rs:560-566): builder.push(slot); finish."""
    b = Builder(32)
    off = b.push_scalar("<Q", 8, int(slot) & _MASK64)
    return b.finish(off)


def deserialize_finalized_slot(buf: bytes) -> int:
    v = struct.unpack_from("<Q", buf, root_pos(buf))[0]
    return v - (1 << 64) if v >= (1 << 63) else v


# transaction -----------------------------------------------------------

_REWARD_TYPES = ["None", "Fee", "Rent", "Staking", "Voting"]


def _compiled_instruction(b: Builder, ins: dict[str, Any]) -> int:
    accounts = b.bytes_vector(bytes(_i(a) & 0xFF for a in _lst(ins.get("accounts"))))
    data = b.bytes_vector(ins.get("data") or b"")
    b.start_table(3)
    b.slot_u8(0, ins.get("program_id_index") or 0)
    b.slot_offset(1, accounts)
    b.slot_offset(2, data)
    return b.end_table()


def _read_compiled_instruction(buf: bytes, t: int) -> dict[str, Any]:
    return {
        "program_id_index": fscalar(buf, t, 0, "<B"),
        "accounts": list(fbytes(buf, t, 1) or b""),
        "data": fbytes(buf, t, 2),
    }


def _message_header(b: Builder, hdr: dict[str, Any] | None) -> int | None:
    if hdr is None:
        return None
    b.start_table(3)
    b.slot_u8(0, hdr.get("num_required_signatures") or 0)
    b.slot_u8(1, hdr.get("num_readonly_signed_accounts") or 0)
    b.slot_u8(2, hdr.get("num_readonly_unsigned_accounts") or 0)
    return b.end_table()


def _token_balance(b: Builder, tb: dict[str, Any]) -> int:
    uta = tb.get("ui_token_amount") or {}
    amount = b.string(uta.get("amount") or "")
    ui_amount_string = b.string(uta.get("ui_amount_string") or "")
    b.start_table(4)
    # UiTokenAmount: ui_amount f64, decimals u8, amount, ui_amount_string
    b.slot_f64(0, uta.get("ui_amount") or 0.0)
    b.slot_u8(1, uta.get("decimals") or 0)
    b.slot_offset(2, amount)
    b.slot_offset(3, ui_amount_string)
    uta_off = b.end_table()
    mint = b.string(tb.get("mint") or "")
    owner = b.string(tb.get("owner") or "")
    program_id = b.string(tb.get("program_id") or "")
    b.start_table(5)
    b.slot_u8(0, tb.get("account_index") or 0)
    b.slot_offset(1, mint)
    b.slot_offset(2, uta_off)
    b.slot_offset(3, owner)
    b.slot_offset(4, program_id)
    return b.end_table()


def _read_token_balance(buf: bytes, t: int) -> dict[str, Any]:
    uta = ftable(buf, t, 2)
    return {
        "account_index": fscalar(buf, t, 0, "<B"),
        "mint": fstring(buf, t, 1),
        "ui_token_amount": None
        if uta is None
        else {
            "ui_amount": fscalar(buf, uta, 0, "<d", 0.0),
            "decimals": fscalar(buf, uta, 1, "<B"),
            "amount": fstring(buf, uta, 2),
            "ui_amount_string": fstring(buf, uta, 3),
        },
        "owner": fstring(buf, t, 3),
        "program_id": fstring(buf, t, 4),
    }


def serialize_transaction(row: dict[str, Any]) -> bytes:
    """TransactionInfo (mod.rs:94-537). Row keys = TRANSACTIONS_SCHEMA
    (the repo's flattened tx shape: message fields at top level plus
    loaded_writable/loaded_readonly and message_version selecting the
    SanitizedMessage union arm)."""
    b = Builder(2048)

    instructions = b.offset_vector(
        [_compiled_instruction(b, i) for i in _lst(row.get("instructions"))]
    )
    header = _message_header(b, row.get("header"))
    account_keys = b.offset_vector(
        [_pubkey(b, k) for k in _lst(row.get("account_keys"))]
    )
    recent_blockhash = b.bytes_vector(row.get("recent_blockhash") or b"")

    is_v0 = (row.get("message_version") or "legacy") == "v0"
    if not is_v0:
        # LegacyMessage: header, account_keys, recent_blockhash, instructions
        b.start_table(4)
        b.slot_offset(0, header)
        b.slot_offset(1, account_keys)
        b.slot_offset(2, recent_blockhash)
        b.slot_offset(3, instructions)
        message = b.end_table()
        message_type = 1  # SanitizedMessage::Legacy
    else:
        lookups = []
        for lk in _lst(row.get("address_table_lookups")):
            wi = b.bytes_vector(
                bytes(_i(i) & 0xFF for i in _lst(lk.get("writable_indexes")))
            )
            ri = b.bytes_vector(
                bytes(_i(i) & 0xFF for i in _lst(lk.get("readonly_indexes")))
            )
            ak = _pubkey(b, lk.get("account_key") or b"")
            b.start_table(3)
            b.slot_offset(0, ak)
            b.slot_offset(1, wi)
            b.slot_offset(2, ri)
            lookups.append(b.end_table())
        lookups_vec = b.offset_vector(lookups)
        # MessageV0: header, account_keys, recent_blockhash, instructions,
        # address_table_lookups
        b.start_table(5)
        b.slot_offset(0, header)
        b.slot_offset(1, account_keys)
        b.slot_offset(2, recent_blockhash)
        b.slot_offset(3, instructions)
        b.slot_offset(4, lookups_vec)
        msg_v0 = b.end_table()
        writable = b.offset_vector(
            [_pubkey(b, k) for k in _lst(row.get("loaded_writable"))]
        )
        readonly = b.offset_vector(
            [_pubkey(b, k) for k in _lst(row.get("loaded_readonly"))]
        )
        b.start_table(2)  # LoadedAddresses
        b.slot_offset(0, writable)
        b.slot_offset(1, readonly)
        loaded = b.end_table()
        b.start_table(2)  # LoadedMessageV0
        b.slot_offset(0, msg_v0)
        b.slot_offset(1, loaded)
        message = b.end_table()
        message_type = 2  # SanitizedMessage::V0

    message_hash = b.bytes_vector(row.get("message_hash") or b"")
    signatures = b.offset_vector(
        [_pubkey(b, s) for s in _lst(row.get("signatures"))]
    )  # Signature table has the same single [uint8] field as Pubkey
    # SanitizedTransaction: message union (2 slots), message_hash,
    # is_simple_vote_tx, signatures
    b.start_table(5)
    b.slot_u8(0, message_type)
    b.slot_offset(1, message)
    b.slot_offset(2, message_hash)
    b.slot_bool(3, bool(row.get("is_vote")))
    b.slot_offset(4, signatures)
    sanitized = b.end_table()

    inner = []
    for ii in _lst(row.get("inner_instructions")):
        ins_vec = b.offset_vector(
            [_compiled_instruction(b, i) for i in _lst(ii.get("instructions"))]
        )
        b.start_table(2)
        b.slot_u8(0, ii.get("index") or 0)
        b.slot_offset(1, ins_vec)
        inner.append(b.end_table())
    inner_vec = b.offset_vector(inner) if inner else None
    logs = (
        b.offset_vector([b.string(s) for s in row["log_messages"]])
        if not isinstance(row.get("log_messages"), (float, type(None)))
        else None
    )
    pre_tb = b.offset_vector(
        [_token_balance(b, tb) for tb in _lst(row.get("pre_token_balances"))]
    )
    post_tb = b.offset_vector(
        [_token_balance(b, tb) for tb in _lst(row.get("post_token_balances"))]
    )
    rewards = []
    for rw in _lst(row.get("rewards")):
        pubkey = b.string(rw.get("pubkey") or "")
        b.start_table(5)
        b.slot_offset(0, pubkey)
        b.slot_i64(1, rw.get("lamports") or 0)
        b.slot_u64(2, rw.get("post_balance") or 0)
        rt = rw.get("reward_type")
        b.slot_u8(3, _REWARD_TYPES.index(rt) if rt in _REWARD_TYPES else 0)
        b.slot_u8(4, rw.get("commission") or 0)
        rewards.append(b.end_table())
    rewards_vec = b.offset_vector(rewards) if rewards else None
    pre_bal = b.scalar_vector(
        "<Q", 8, [_i(v) & _MASK64 for v in _lst(row.get("pre_balances"))]
    )
    post_bal = b.scalar_vector(
        "<Q", 8, [_i(v) & _MASK64 for v in _lst(row.get("post_balances"))]
    )
    # TransactionStatusMeta: status, fee, pre/post_balances,
    # inner_instructions, log_messages, pre/post_token_balances, rewards
    b.start_table(9)
    b.slot_bool(0, bool(row.get("status_ok")))
    b.slot_u64(1, row.get("fee") or 0)
    b.slot_offset(2, pre_bal)
    b.slot_offset(3, post_bal)
    b.slot_offset(4, inner_vec)
    b.slot_offset(5, logs)
    b.slot_offset(6, pre_tb)
    b.slot_offset(7, post_tb)
    b.slot_offset(8, rewards_vec)
    meta = b.end_table()

    signature = _pubkey(b, row["signature"])
    # TransactionInfo: signature, is_vote, slot, transaction, meta
    b.start_table(5)
    b.slot_offset(0, signature)
    b.slot_bool(1, bool(row.get("is_vote")))
    b.slot_u64(2, row["slot"])
    b.slot_offset(3, sanitized)
    b.slot_offset(4, meta)
    return b.finish(b.end_table())


def deserialize_transaction(buf: bytes) -> dict[str, Any]:
    t = root_pos(buf)
    out: dict[str, Any] = {
        "signature": _read_pubkey(buf, ftable(buf, t, 0)),
        "is_vote": fbool(buf, t, 1),
        "slot": fi64_from_u64(buf, t, 2),
    }
    st = ftable(buf, t, 3)  # SanitizedTransaction
    mtype = fscalar(buf, st, 0, "<B")
    msg = ftable(buf, st, 1)
    out["message_hash"] = fbytes(buf, st, 2)
    out["signatures"] = [
        _read_pubkey(buf, p) for p in fvec_tables(buf, st, 4) or []
    ]
    if mtype == 2:  # V0: LoadedMessageV0 { message, loaded_addresses }
        out["message_version"] = "v0"
        inner_msg = ftable(buf, msg, 0)
        loaded = ftable(buf, msg, 1)
        out["loaded_writable"] = [
            _read_pubkey(buf, p) for p in fvec_tables(buf, loaded, 0) or []
        ]
        out["loaded_readonly"] = [
            _read_pubkey(buf, p) for p in fvec_tables(buf, loaded, 1) or []
        ]
        out["address_table_lookups"] = [
            {
                "account_key": _read_pubkey(buf, ftable(buf, p, 0)),
                "writable_indexes": list(fbytes(buf, p, 1) or b""),
                "readonly_indexes": list(fbytes(buf, p, 2) or b""),
            }
            for p in fvec_tables(buf, inner_msg, 4) or []
        ]
        msg = inner_msg
    else:
        out["message_version"] = "legacy"
        out["address_table_lookups"] = []
        out["loaded_writable"] = []
        out["loaded_readonly"] = []
    hdr = ftable(buf, msg, 0)
    out["header"] = None if hdr is None else {
        "num_required_signatures": fscalar(buf, hdr, 0, "<B"),
        "num_readonly_signed_accounts": fscalar(buf, hdr, 1, "<B"),
        "num_readonly_unsigned_accounts": fscalar(buf, hdr, 2, "<B"),
    }
    out["account_keys"] = [
        _read_pubkey(buf, p) for p in fvec_tables(buf, msg, 1) or []
    ]
    out["recent_blockhash"] = fbytes(buf, msg, 2)
    out["instructions"] = [
        _read_compiled_instruction(buf, p) for p in fvec_tables(buf, msg, 3) or []
    ]
    meta = ftable(buf, t, 4)
    out["status_ok"] = fbool(buf, meta, 0)
    out["fee"] = fi64_from_u64(buf, meta, 1)
    for name, slot in (("pre_balances", 2), ("post_balances", 3)):
        vals = fvec_scalar(buf, meta, slot, "<Q", 8)
        out[name] = None if vals is None else [
            v - (1 << 64) if v >= (1 << 63) else v for v in vals
        ]
    out["inner_instructions"] = [
        {
            "index": fscalar(buf, p, 0, "<B"),
            "instructions": [
                _read_compiled_instruction(buf, q)
                for q in fvec_tables(buf, p, 1) or []
            ],
        }
        for p in fvec_tables(buf, meta, 4) or []
    ]
    out["log_messages"] = fvec_strings(buf, meta, 5)
    out["pre_token_balances"] = [
        _read_token_balance(buf, p) for p in fvec_tables(buf, meta, 6) or []
    ]
    out["post_token_balances"] = [
        _read_token_balance(buf, p) for p in fvec_tables(buf, meta, 7) or []
    ]
    out["rewards"] = [
        {
            "pubkey": fstring(buf, p, 0),
            "lamports": fscalar(buf, p, 1, "<q"),
            "post_balance": fi64_from_u64(buf, p, 2),
            "reward_type": _REWARD_TYPES[fscalar(buf, p, 3, "<B")],
            "commission": fscalar(buf, p, 4, "<B"),
        }
        for p in fvec_tables(buf, meta, 8) or []
    ]
    return out


SERIALIZERS = {
    "account": serialize_account,
    "block": serialize_metadata,
    "offchain": serialize_metadata_off_chain,
    "transaction": serialize_transaction,
}


def serialize_transaction_json(json_str: str) -> bytes:
    """Build a TransactionInfo buffer from the ``to_json`` envelope of
    the typed transaction row (binary fields ride base64 — Spark's
    to_json encoding). Used by the flatbuffer wire path: the nested
    transaction schema cannot cross the Arrow boundary on this Spark
    build (JVM segfault in the Arrow collect path for this type
    shape), so rows reach Python as one JSON string column instead."""
    import base64
    import json

    def b64(v):
        return None if v is None else base64.b64decode(v)

    d = json.loads(json_str)
    d["signature"] = b64(d.get("signature"))
    d["account_keys"] = [b64(k) for k in d.get("account_keys") or []]
    d["recent_blockhash"] = b64(d.get("recent_blockhash"))
    d["message_hash"] = b64(d.get("message_hash"))
    d["signatures"] = [b64(s) for s in d.get("signatures") or []]
    for ins in d.get("instructions") or []:
        ins["data"] = b64(ins.get("data"))
    for lk in d.get("address_table_lookups") or []:
        lk["account_key"] = b64(lk.get("account_key"))
    d["loaded_writable"] = [b64(k) for k in d.get("loaded_writable") or []]
    d["loaded_readonly"] = [b64(k) for k in d.get("loaded_readonly") or []]
    for ii in d.get("inner_instructions") or []:
        for ins in ii.get("instructions") or []:
            ins["data"] = b64(ins.get("data"))
    return serialize_transaction(d)


# ship by value inside serialized UDF tasks (workers don't share the
# driver's sys.path — see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
