"""Golden-bytes wire validation for the FlatBuffers envelope (T9).

The ``flatbuffers`` pip runtime is not in this container, so wire
compatibility with the reference's flatc-generated consumers
(serializer/src/flatbuffer/*_generated.rs, dispatch mod.rs:32-567)
is pinned two ways, both independent of the repo's own reader
(streaming/fbs.py):

1. **Byte-exact goldens** — each message type's serialized bytes are
   frozen here as literals. Any builder change that shifts the wire
   layout fails loudly and must re-justify the goldens.
2. **Independent walker** — the goldens are decoded below with a
   from-scratch vtable walker written directly from the published
   FlatBuffers internals spec (the exact access algorithm flatc
   generates: root uoffset → table soffset → vtable, field at
   ``vtable[4 + 2*slot]``, zero entry / short vtable = schema
   default). Slot numbers come from the reference .fbs declaration
   order, so these asserts check what a flatc-generated reader would
   see, not what our reader agrees with.

Union slot convention checked explicitly: ``message: SanitizedMessage``
occupies TWO slots — slot 0 carries the uint8 type tag (1 = Legacy,
2 = V0, per union declaration order), slot 1 the table offset — which
is how flatc numbers union fields.
"""

from __future__ import annotations

import struct

from solana_snapshot_etl_tools_spark.streaming import fbs

# --- independent walker (FlatBuffers spec access algorithm) -----------------


def _root(buf: bytes) -> int:
    return struct.unpack_from("<I", buf, 0)[0]


def _fpos(buf: bytes, tpos: int, slot: int) -> int | None:
    """Absolute position of a field, or None if defaulted/absent —
    the algorithm every flatc-generated accessor inlines."""
    vtable = tpos - struct.unpack_from("<i", buf, tpos)[0]
    vt_size = struct.unpack_from("<H", buf, vtable)[0]
    entry = 4 + 2 * slot
    if entry >= vt_size:
        return None  # trailing-default trimmed from the vtable
    rel = struct.unpack_from("<H", buf, vtable + entry)[0]
    return tpos + rel if rel else None


def _scalar(buf, tpos, slot, fmt, default=0):
    p = _fpos(buf, tpos, slot)
    return default if p is None else struct.unpack_from(fmt, buf, p)[0]


def _indirect(buf: bytes, pos: int) -> int:
    return pos + struct.unpack_from("<I", buf, pos)[0]


def _table(buf, tpos, slot) -> int | None:
    p = _fpos(buf, tpos, slot)
    return None if p is None else _indirect(buf, p)


def _vec(buf, tpos, slot):
    """(first-element position, length) of a vector field."""
    p = _fpos(buf, tpos, slot)
    if p is None:
        return None, 0
    v = _indirect(buf, p)
    return v + 4, struct.unpack_from("<I", buf, v)[0]


def _vec_u8(buf, tpos, slot) -> bytes | None:
    start, n = _vec(buf, tpos, slot)
    return None if start is None else bytes(buf[start : start + n])


def _string(buf, tpos, slot) -> str | None:
    raw = _vec_u8(buf, tpos, slot)
    return None if raw is None else raw.decode("utf-8")


def _vec_tables(buf, tpos, slot) -> list[int]:
    start, n = _vec(buf, tpos, slot)
    if start is None:
        return []
    return [_indirect(buf, start + 4 * i) for i in range(n)]


def _pubkey(buf, tpos: int | None) -> bytes:
    """Pubkey/Signature table: single [uint8] field at slot 0."""
    assert tpos is not None
    return _vec_u8(buf, tpos, 0) or b""


def _check_alignment(buf: bytes):
    """Every scalar read in these tests must come from a naturally
    aligned position — flatc readers on strict-alignment targets
    require it."""
    assert _root(buf) % 4 == 0


# --- fixtures (shared with the generator that froze the goldens) ------------

ACCOUNT = {
    "key": bytes(range(32)),
    "lamports": 987654321,
    "owner": bytes(range(32, 64)),
    "executable": True,
    "rent_epoch": -1,  # repo-wide u64→i64 wraparound policy
    "data": b"\x01\x02\x03\x04\x05",
    "write_version": 7,
    "slot": 1234,
    "is_startup": False,
}
META = {
    "slot": 42,
    "blockhash": "hash11",
    "rewards": "[]",
    "block_time": -5,
    "block_height": 99,
}
OFFCHAIN = {"pubkey": "pk58", "uri": "https://x/y.json", "slot": 7, "is_startup": True}


def _tx(version: str) -> dict:
    ins = [{"program_id_index": 2, "accounts": [0, 1], "data": b"\x09"}]
    t = {
        "signature": bytes(range(64)),
        "is_vote": True,
        "slot": 777,
        "status_ok": True,
        "message_version": version,
        "header": {
            "num_required_signatures": 1,
            "num_readonly_signed_accounts": 0,
            "num_readonly_unsigned_accounts": 1,
        },
        "account_keys": [bytes([9] * 32), bytes([8] * 32)],
        "recent_blockhash": bytes([7] * 32),
        "instructions": ins,
        "address_table_lookups": [],
        "loaded_writable": [],
        "loaded_readonly": [],
        "message_hash": bytes([6] * 32),
        "signatures": [bytes([5] * 64)],
        "fee": 5000,
        "pre_balances": [10, 20],
        "post_balances": [9, 21],
        "inner_instructions": [{"index": 0, "instructions": ins}],
        "log_messages": ["ok"],
        "pre_token_balances": [
            {
                "account_index": 1,
                "mint": "M1",
                "ui_token_amount": {
                    "ui_amount": 1.5,
                    "decimals": 9,
                    "amount": "15",
                    "ui_amount_string": "1.5",
                },
                "owner": "O1",
                "program_id": "P1",
            }
        ],
        "post_token_balances": [],
        "rewards": [
            {
                "pubkey": "V1",
                "lamports": -42,
                "post_balance": 12345,
                "reward_type": "Staking",
                "commission": 5,
            }
        ],
    }
    if version == "v0":
        t["address_table_lookups"] = [
            {
                "account_key": bytes([4] * 32),
                "writable_indexes": [0, 2],
                "readonly_indexes": [1],
            }
        ]
        t["loaded_writable"] = [bytes([3] * 32)]
        t["loaded_readonly"] = [bytes([2] * 32)]
    return t


# --- goldens ----------------------------------------------------------------

GOLDEN_ACCOUNT = bytes.fromhex(
    "1c0000000000000014003c0038002c00280027001c0018000c00040014000000"
    "d20400000000000007000000000000000000000024000000ffffffffffffffff"
    "0000000124000000b168de3a0000000000000000480000000500000001020304"
    "0500060008000400060000000400000020000000202122232425262728292a2b"
    "2c2d2e2f303132333435363738393a3b3c3d3e3f000006000800040006000000"
    "0400000020000000000102030405060708090a0b0c0d0e0f1011121314151617"
    "18191a1b1c1d1e1f"
)
GOLDEN_METADATA = bytes.fromhex(
    "1400000000000e0028001c00180014000c0004000e0000006300000000000000"
    "fbffffffffffffff14000000180000002a000000000000000000000002000000"
    "5b5d0000060000006861736831310000"
)
GOLDEN_OFFCHAIN = bytes.fromhex(
    "100000000c001c0018001400080007000c000000000000010700000000000000"
    "00000000080000001c0000001000000068747470733a2f2f782f792e6a736f6e"
    "0000000004000000706b353800000000"
)
GOLDEN_SLOT = bytes.fromhex("080000000000000002200f0000000000")
GOLDEN_TX_LEGACY = bytes.fromhex(
    "1400000000000e0022001c001b000c00080004000e0000008800000004020000"
    "090300000000000000000000000000010c000000000006000800040006000000"
    "0400000040000000000102030405060708090a0b0c0d0e0f1011121314151617"
    "18191a1b1c1d1e1f202122232425262728292a2b2c2d2e2f3031323334353637"
    "38393a3b3c3d3e3f000016002c002b0020001c001800140010000c0008000400"
    "1600000054000000900000009000000008010000140100001400000028000000"
    "8813000000000000000000010200000009000000000000001500000000000000"
    "00000000020000000a0000000000000014000000000000000100000014000000"
    "00000e0020001c0010000800070006000e000000000005033930000000000000"
    "d6ffffffffffffff000000000400000002000000563100000000000001000000"
    "1400000000000e001800170010000c00080004000e0000001400000018000000"
    "3000000018000000000000010200000050310000020000004f31000002000000"
    "4d3100000c00180010000f00080004000c000000140000001800000000000009"
    "000000000000f83f03000000312e350002000000313500000100000004000000"
    "020000006f6b0000010000000c00000008000800000004000800000004000000"
    "010000001000000000000a0010000f00080004000a0000000c00000010000000"
    "0000000201000000090000000200000000010e001800170010000c000b000400"
    "0e0000001400000000000001680000009400000000000001010000000c000000"
    "0000060008000400060000000400000040000000050505050505050505050505"
    "0505050505050505050505050505050505050505050505050505050505050505"
    "0505050505050505050505050505050505050505200000000606060606060606"
    "0606060606060606060606060606060606060606060606060c00140010000c00"
    "080004000c000000bc0000000c0000002c000000a80000002000000007070707"
    "0707070707070707070707070707070707070707070707070707070702000000"
    "440000000c000000000006000800040006000000040000002000000008080808"
    "0808080808080808080808080808080808080808080808080808080800000600"
    "0800040006000000040000002000000009090909090909090909090909090909"
    "0909090909090909090909090909090900000a0008000700000006000a000000"
    "00000101010000001000000000000a0010000f00080004000a0000000c000000"
    "100000000000000201000000090000000200000000010000"
)
GOLDEN_TX_V0 = bytes.fromhex(
    "1400000000000e0022001c001b000c00080004000e0000008800000004020000"
    "090300000000000000000000000000010c000000000006000800040006000000"
    "0400000040000000000102030405060708090a0b0c0d0e0f1011121314151617"
    "18191a1b1c1d1e1f202122232425262728292a2b2c2d2e2f3031323334353637"
    "38393a3b3c3d3e3f000016002c002b0020001c001800140010000c0008000400"
    "1600000054000000900000009000000008010000140100001400000028000000"
    "8813000000000000000000010200000009000000000000001500000000000000"
    "00000000020000000a0000000000000014000000000000000100000014000000"
    "00000e0020001c0010000800070006000e000000000005033930000000000000"
    "d6ffffffffffffff000000000400000002000000563100000000000001000000"
    "1400000000000e001800170010000c00080004000e0000001400000018000000"
    "3000000018000000000000010200000050310000020000004f31000002000000"
    "4d3100000c00180010000f00080004000c000000140000001800000000000009"
    "000000000000f83f03000000312e350002000000313500000100000004000000"
    "020000006f6b0000010000000c00000008000800000004000800000004000000"
    "010000001000000000000a0010000f00080004000a0000000c00000010000000"
    "0000000201000000090000000200000000010e001800170010000c000b000400"
    "0e0000001400000000000001680000009000000000000002010000000c000000"
    "0000060008000400060000000400000040000000050505050505050505050505"
    "0505050505050505050505050505050505050505050505050505050505050505"
    "0505050505050505050505050505050505050505200000000606060606060606"
    "06060606060606060606060606060606060606060606060608000c0008000400"
    "0800000010000000a000000008000c0008000400080000000800000040000000"
    "010000000c000000000006000800040006000000040000002000000002020202"
    "0202020202020202020202020202020202020202020202020202020201000000"
    "0c00000000000600080004000600000004000000200000000303030303030303"
    "03030303030303030303030303030303030303030303030300000e0018001400"
    "10000c00080004000e0000001400000024010000740000009400000010010000"
    "010000001000000000000a0012000c00080004000a0000004000000044000000"
    "0c00000000000600080004000600000004000000200000000404040404040404"
    "0404040404040404040404040404040404040404040404040100000001000000"
    "0200000000020000200000000707070707070707070707070707070707070707"
    "07070707070707070707070702000000440000000c0000000000060008000400"
    "0600000004000000200000000808080808080808080808080808080808080808"
    "0808080808080808080808080000060008000400060000000400000020000000"
    "0909090909090909090909090909090909090909090909090909090909090909"
    "00000a0008000700000006000a00000000000101010000001000000000000a00"
    "10000f00080004000a0000000c00000010000000000000020100000009000000"
    "0200000000010000"
)


# --- byte-exact pins --------------------------------------------------------


def test_goldens_pinned():
    assert fbs.serialize_account(ACCOUNT) == GOLDEN_ACCOUNT
    assert fbs.serialize_metadata(META) == GOLDEN_METADATA
    assert fbs.serialize_metadata_off_chain(OFFCHAIN) == GOLDEN_OFFCHAIN
    assert fbs.serialize_finalized_slot(991234) == GOLDEN_SLOT
    assert fbs.serialize_transaction(_tx("legacy")) == GOLDEN_TX_LEGACY
    assert fbs.serialize_transaction(_tx("v0")) == GOLDEN_TX_V0


# --- independent decodes (slot numbers from the .fbs declarations) ----------


def test_golden_account_flatc_view():
    buf = GOLDEN_ACCOUNT
    _check_alignment(buf)
    t = _root(buf)
    # account_info.fbs: pubkey0 lamports1 owner2 executable3 rent_epoch4
    # data5 write_version6 slot7 is_startup8
    assert _pubkey(buf, _table(buf, t, 0)) == ACCOUNT["key"]
    assert _scalar(buf, t, 1, "<Q") == 987654321
    assert _pubkey(buf, _table(buf, t, 2)) == ACCOUNT["owner"]
    assert _scalar(buf, t, 3, "<B") == 1
    assert _scalar(buf, t, 4, "<Q") == (1 << 64) - 1
    assert _vec_u8(buf, t, 5) == b"\x01\x02\x03\x04\x05"
    assert _scalar(buf, t, 6, "<Q") == 7
    assert _scalar(buf, t, 7, "<Q") == 1234
    # is_startup=False must be DEFAULTED (flatc builders trim trailing
    # default slots from the vtable; a written 0 would also be legal but
    # our builder omits, matching the reference's FlatBufferBuilder)
    assert _fpos(buf, t, 8) is None
    # u64 scalars must be 8-aligned for strict readers
    for slot in (1, 4, 6, 7):
        assert _fpos(buf, t, slot) % 8 == 0


def test_golden_metadata_flatc_view():
    buf = GOLDEN_METADATA
    t = _root(buf)
    # metadata.fbs: slot0 blockhash1 rewards2 block_time3 block_height4
    assert _scalar(buf, t, 0, "<Q") == 42
    assert _string(buf, t, 1) == "hash11"
    assert _string(buf, t, 2) == "[]"
    assert _scalar(buf, t, 3, "<q") == -5
    assert _scalar(buf, t, 4, "<Q") == 99


def test_golden_offchain_flatc_view():
    buf = GOLDEN_OFFCHAIN
    t = _root(buf)
    # metadata_off_chain.fbs: pubkey0 uri1 slot2 is_startup3
    assert _string(buf, t, 0) == "pk58"
    assert _string(buf, t, 1) == "https://x/y.json"
    assert _scalar(buf, t, 2, "<Q") == 7
    assert _scalar(buf, t, 3, "<B") == 1


def test_golden_slot_scalar_root():
    # mod.rs:560-566 pushes a bare u64 and finishes: root uoffset points
    # straight at an 8-aligned u64
    pos = _root(GOLDEN_SLOT)
    assert pos % 8 == 0
    assert struct.unpack_from("<Q", GOLDEN_SLOT, pos)[0] == 991234


def _assert_message_common(buf, msg, *, has_lookups: bool):
    """LegacyMessage / MessageV0 share slots 0-3 (header, account_keys,
    recent_blockhash, instructions); MessageV0 adds lookups at slot 4."""
    hdr = _table(buf, msg, 0)
    assert _scalar(buf, hdr, 0, "<B") == 1
    assert _scalar(buf, hdr, 1, "<B") == 0
    assert _scalar(buf, hdr, 2, "<B") == 1
    keys = [_pubkey(buf, p) for p in _vec_tables(buf, msg, 1)]
    assert keys == [bytes([9] * 32), bytes([8] * 32)]
    assert _vec_u8(buf, msg, 2) == bytes([7] * 32)
    (ins,) = _vec_tables(buf, msg, 3)
    # CompiledInstruction: program_id_index0 accounts1 data2
    assert _scalar(buf, ins, 0, "<B") == 2
    assert _vec_u8(buf, ins, 1) == b"\x00\x01"
    assert _vec_u8(buf, ins, 2) == b"\x09"
    if has_lookups:
        (lk,) = _vec_tables(buf, msg, 4)
        # MessageAddressTableLookup: account_key0 writable1 readonly2
        assert _pubkey(buf, _table(buf, lk, 0)) == bytes([4] * 32)
        assert _vec_u8(buf, lk, 1) == b"\x00\x02"
        assert _vec_u8(buf, lk, 2) == b"\x01"


def _assert_meta(buf, meta):
    # TransactionStatusMeta: status0 fee1 pre_balances2 post_balances3
    # inner_instructions4 log_messages5 pre_tb6 post_tb7 rewards8
    assert _scalar(buf, meta, 0, "<B") == 1
    assert _scalar(buf, meta, 1, "<Q") == 5000
    start, n = _vec(buf, meta, 2)
    assert [struct.unpack_from("<Q", buf, start + 8 * i)[0] for i in range(n)] == [10, 20]
    start, n = _vec(buf, meta, 3)
    assert [struct.unpack_from("<Q", buf, start + 8 * i)[0] for i in range(n)] == [9, 21]
    (ii,) = _vec_tables(buf, meta, 4)
    assert _scalar(buf, ii, 0, "<B") == 0
    (iins,) = _vec_tables(buf, ii, 1)
    assert _vec_u8(buf, iins, 2) == b"\x09"
    logs = _vec_tables(buf, meta, 5)  # [string] shares vector-of-offset shape
    assert [
        bytes(
            buf[p + 4 : p + 4 + struct.unpack_from("<I", buf, p)[0]]
        ).decode()
        for p in logs
    ] == ["ok"]
    (tb,) = _vec_tables(buf, meta, 6)
    # TransactionTokenBalance: account_index0 mint1 ui_token_amount2
    # owner3 program_id4
    assert _scalar(buf, tb, 0, "<B") == 1
    assert _string(buf, tb, 1) == "M1"
    uta = _table(buf, tb, 2)
    # UiTokenAmount: ui_amount0 decimals1 amount2 ui_amount_string3
    assert _scalar(buf, uta, 0, "<d", 0.0) == 1.5
    assert _scalar(buf, uta, 1, "<B") == 9
    assert _string(buf, uta, 2) == "15"
    assert _string(buf, uta, 3) == "1.5"
    assert _string(buf, tb, 3) == "O1"
    assert _string(buf, tb, 4) == "P1"
    assert _vec_tables(buf, meta, 7) == []  # post_token_balances absent/empty
    (rw,) = _vec_tables(buf, meta, 8)
    # Reward: pubkey0 lamports1 post_balance2 reward_type3 commission4
    assert _string(buf, rw, 0) == "V1"
    assert _scalar(buf, rw, 1, "<q") == -42
    assert _scalar(buf, rw, 2, "<Q") == 12345
    assert _scalar(buf, rw, 3, "<B") == 3  # RewardType.Staking
    assert _scalar(buf, rw, 4, "<B") == 5


def test_golden_transaction_legacy_flatc_view():
    buf = GOLDEN_TX_LEGACY
    t = _root(buf)
    # TransactionInfo: signature0 is_vote1 slot2 transaction3 meta4
    assert _pubkey(buf, _table(buf, t, 0)) == bytes(range(64))
    assert _scalar(buf, t, 1, "<B") == 1
    assert _scalar(buf, t, 2, "<Q") == 777
    st = _table(buf, t, 3)
    # SanitizedTransaction: message union = TWO slots (type tag 0,
    # value 1), then message_hash2, is_simple_vote_tx3, signatures4
    assert _scalar(buf, st, 0, "<B") == 1  # SanitizedMessage.Legacy
    msg = _table(buf, st, 1)
    _assert_message_common(buf, msg, has_lookups=False)
    assert _vec_u8(buf, st, 2) == bytes([6] * 32)
    assert _scalar(buf, st, 3, "<B") == 1
    sigs = [_pubkey(buf, p) for p in _vec_tables(buf, st, 4)]
    assert sigs == [bytes([5] * 64)]
    _assert_meta(buf, _table(buf, t, 4))


def test_golden_transaction_v0_flatc_view():
    buf = GOLDEN_TX_V0
    t = _root(buf)
    st = _table(buf, t, 3)
    assert _scalar(buf, st, 0, "<B") == 2  # SanitizedMessage.V0
    loaded_v0 = _table(buf, st, 1)
    # LoadedMessageV0: message0 loaded_addresses1
    msg = _table(buf, loaded_v0, 0)
    _assert_message_common(buf, msg, has_lookups=True)
    la = _table(buf, loaded_v0, 1)
    # LoadedAddresses: writable0 readonly1
    assert [_pubkey(buf, p) for p in _vec_tables(buf, la, 0)] == [bytes([3] * 32)]
    assert [_pubkey(buf, p) for p in _vec_tables(buf, la, 1)] == [bytes([2] * 32)]
    _assert_meta(buf, _table(buf, t, 4))
