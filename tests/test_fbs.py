"""FlatBuffers wire format roundtrips (T9 default parity).

Each of the five reference message types (serializer/src/flatbuffer/
mod.rs:32-567) is built with our pure-Python builder and read back with
the independent reader, including default-omission, u64 wraparound, and
both SanitizedMessage union arms. Structural invariants (root uoffset,
vtable layout by .fbs slot order) are checked by hand on a small buffer
so the builder can't drift from the spec while roundtrips stay green.
"""

from __future__ import annotations

import struct

from solana_snapshot_etl_tools_spark.streaming import fbs

U64_MAX_AS_I64 = -1  # repo-wide u64→i64 wraparound policy


ACCOUNT = {
    "key": bytes(range(32)),
    "lamports": 987654321,
    "owner": bytes(range(32, 64)),
    "executable": True,
    "rent_epoch": U64_MAX_AS_I64,
    "data": b"\x01\x02\x03\x04\x05",
    "write_version": 7,
    "slot": 1234,
    "is_startup": False,
}


def test_account_roundtrip():
    buf = fbs.serialize_account(ACCOUNT)
    assert fbs.deserialize_account(buf) == ACCOUNT


def test_account_defaults_omitted():
    row = dict(ACCOUNT, lamports=0, executable=False, rent_epoch=0)
    buf = fbs.serialize_account(row)
    out = fbs.deserialize_account(buf)
    assert out == row
    # a zero scalar must not occupy a vtable slot: the vtable entry is 0
    t = fbs.root_pos(buf)
    vt = t - struct.unpack_from("<i", buf, t)[0]
    vsize = struct.unpack_from("<H", buf, vt)[0]
    lamports_slot_off = 4 + 1 * 2
    assert (
        lamports_slot_off >= vsize
        or struct.unpack_from("<H", buf, vt + lamports_slot_off)[0] == 0
    )


def test_account_empty_data():
    row = dict(ACCOUNT, data=b"")
    assert fbs.deserialize_account(fbs.serialize_account(row))["data"] == b""


def test_metadata_roundtrip():
    row = {
        "slot": 42,
        "blockhash": "9xQeWvG816bUx9EPjHmaT23yvVM2ZWbrrpZb9PusVFin",
        "rewards": '[{"pubkey":"x","lamports":5}]',
        "block_time": -1234567890,
        "block_height": 41,
    }
    assert fbs.deserialize_metadata(fbs.serialize_metadata(row)) == row


def test_metadata_nulls_default():
    row = {
        "slot": 1,
        "blockhash": None,
        "rewards": None,
        "block_time": None,
        "block_height": None,
    }
    out = fbs.deserialize_metadata(fbs.serialize_metadata(row))
    assert out == {
        "slot": 1,
        "blockhash": "",
        "rewards": "",
        "block_time": 0,
        "block_height": 0,
    }


def test_offchain_roundtrip():
    row = {
        "pubkey": "Ej5xP5uU9q8kB6qhQZ6pQ7G3y1vZC6rDdzKXC7mWvLWu",
        "uri": "https://arweave.net/abc123",
        "slot": 99,
        "is_startup": True,
    }
    buf = fbs.serialize_metadata_off_chain(row)
    assert fbs.deserialize_metadata_off_chain(buf) == row


def test_finalized_slot_scalar_root():
    for slot in (0, 1, 255, 2**40, U64_MAX_AS_I64):
        buf = fbs.serialize_finalized_slot(slot)
        assert fbs.deserialize_finalized_slot(buf) == slot
    # scalar root: root uoffset points straight at the u64
    buf = fbs.serialize_finalized_slot(77)
    pos = struct.unpack_from("<I", buf, 0)[0]
    assert struct.unpack_from("<Q", buf, pos)[0] == 77
    # u64 payload must be 8-byte aligned in the buffer
    assert pos % 8 == 0


def _tx(version: str) -> dict:
    ins = [
        {"program_id_index": 3, "accounts": [0, 1, 2], "data": b"\x09\x01"},
        {"program_id_index": 4, "accounts": [], "data": b""},
    ]
    tx = {
        "signature": bytes(range(64)),
        "is_vote": False,
        "slot": 5555,
        "status_ok": True,
        "message_version": version,
        "header": {
            "num_required_signatures": 1,
            "num_readonly_signed_accounts": 0,
            "num_readonly_unsigned_accounts": 2,
        },
        "account_keys": [bytes([i] * 32) for i in range(4)],
        "recent_blockhash": bytes(range(32)),
        "instructions": ins,
        "address_table_lookups": [],
        "loaded_writable": [],
        "loaded_readonly": [],
        "message_hash": bytes(range(32, 64)),
        "signatures": [bytes([7] * 64)],
        "fee": 5000,
        "pre_balances": [10, 20, U64_MAX_AS_I64],
        "post_balances": [9, 21, 0],
        "inner_instructions": [{"index": 0, "instructions": ins}],
        "log_messages": ["Program log: ok", ""],
        "pre_token_balances": [
            {
                "account_index": 1,
                "mint": "So11111111111111111111111111111111111111112",
                "ui_token_amount": {
                    "ui_amount": 1.5,
                    "decimals": 9,
                    "amount": "1500000000",
                    "ui_amount_string": "1.5",
                },
                "owner": "ownerpubkey",
                "program_id": "tokenprogram",
            }
        ],
        "post_token_balances": [],
        "rewards": [
            {
                "pubkey": "validator1",
                "lamports": -42,
                "post_balance": 123456,
                "reward_type": "Staking",
                "commission": 5,
            }
        ],
    }
    if version == "v0":
        tx["address_table_lookups"] = [
            {
                "account_key": bytes([9] * 32),
                "writable_indexes": [0, 2],
                "readonly_indexes": [1],
            }
        ]
        tx["loaded_writable"] = [bytes([5] * 32)]
        tx["loaded_readonly"] = [bytes([6] * 32), bytes([7] * 32)]
    return tx


def test_transaction_legacy_roundtrip():
    tx = _tx("legacy")
    assert fbs.deserialize_transaction(fbs.serialize_transaction(tx)) == tx


def test_transaction_v0_roundtrip():
    tx = _tx("v0")
    assert fbs.deserialize_transaction(fbs.serialize_transaction(tx)) == tx


def test_transaction_absent_meta_options():
    """Reference encodes Option::None meta vectors as absent fields;
    the reader must fall back cleanly."""
    tx = _tx("legacy")
    tx["inner_instructions"] = []
    tx["rewards"] = []
    tx["log_messages"] = None
    out = fbs.deserialize_transaction(fbs.serialize_transaction(tx))
    assert out["inner_instructions"] == []
    assert out["rewards"] == []
    assert out["log_messages"] is None


def test_builder_size_boundary_sweep():
    """Regression for the round-2 end_table underflow: vtable bytes were
    written without a _grow reservation, so messages landing just under
    a buffer-doubling boundary wrapped pack_into to the buffer tail and
    corrupted the already-written vectors (a ~48-byte window per
    power-of-two boundary). Sweep every payload size 0-600 for each
    message type so any future window corrupts loudly, not silently."""
    for n in range(601):
        row = dict(ACCOUNT, data=bytes(i & 0xFF for i in range(n)))
        out = fbs.deserialize_account(fbs.serialize_account(row))
        assert out == row, f"account payload size {n} corrupted"

    for n in range(601):
        row = {
            "slot": 42,
            "blockhash": "B" * (n % 97),
            "rewards": "r" * n,
            "block_time": 1700000000,
            "block_height": 99,
        }
        assert fbs.deserialize_metadata(fbs.serialize_metadata(row)) == row

    for n in range(601):
        row = {
            "pubkey": "p" * (1 + n % 89),
            "uri": "u" * n,
            "slot": 7,
            "is_startup": bool(n % 2),
        }
        out = fbs.deserialize_metadata_off_chain(
            fbs.serialize_metadata_off_chain(row)
        )
        assert out == row, f"offchain payload size {n} corrupted"

    # transactions cross boundaries with ~20-slot vtables; sweep the log
    # vector length so the total buffer size walks through 2^k edges
    for n in range(0, 601, 7):
        tx = _tx("v0")
        tx["log_messages"] = ["x" * (n % 31)] * (n % 17) or None
        tx["instructions"] = [
            {"program_id_index": 1, "accounts": list(range(n % 25)),
             "data": bytes(n % 256 for _ in range(n % 50))}
        ]
        out = fbs.deserialize_transaction(fbs.serialize_transaction(tx))
        assert out == tx, f"transaction sweep step {n} corrupted"


def test_vtable_slot_layout_matches_fbs_order():
    """AccountInfo field slots must follow account_info.fbs declaration
    order — that's what makes the buffer readable by flatc-generated
    consumers. Verify lamports (slot 1) and slot (slot 7) land where a
    generated reader would look."""
    buf = fbs.serialize_account(ACCOUNT)
    t = fbs.root_pos(buf)
    vt = t - struct.unpack_from("<i", buf, t)[0]
    lam_off = struct.unpack_from("<H", buf, vt + 4 + 1 * 2)[0]
    slot_off = struct.unpack_from("<H", buf, vt + 4 + 7 * 2)[0]
    assert struct.unpack_from("<Q", buf, t + lam_off)[0] == 987654321
    assert struct.unpack_from("<Q", buf, t + slot_off)[0] == 1234
    # scalars must be naturally aligned in the final buffer
    assert (t + lam_off) % 8 == 0
    assert (t + slot_off) % 8 == 0


def test_string_nul_terminated():
    b = fbs.Builder(64)
    off = b.string("abc")
    b.start_table(1)
    b.slot_offset(0, off)
    buf = b.finish(b.end_table())
    t = fbs.root_pos(buf)
    assert fbs.fstring(buf, t, 0) == "abc"
    # string layout = [len u32][bytes][NUL terminator]
    p = fbs.ftable(buf, t, 0)  # resolves the field's uoffset indirection
    assert struct.unpack_from("<I", buf, p)[0] == 3
    assert buf[p + 4 : p + 4 + 3] == b"abc" and buf[p + 7] == 0


def test_routed_messages_flatbuffer_wire(spark):
    """End-to-end: routed_messages(wire='flatbuffer') over the geyser
    fixture — every value must parse with the fbs reader and match the
    typed input row it came from."""
    from solana_snapshot_etl_tools_spark.fixtures import (
        account_updates_df,
        block_metadata_df,
        build_fixture,
        slot_status_df,
        transactions_df,
    )
    from solana_snapshot_etl_tools_spark.streaming import geyser as G

    fx = build_fixture()
    routed = G.routed_messages(
        account_updates_df(spark),
        slot_status_df(spark),
        block_metadata_df(spark),
        transactions_df(spark),
        owners=fx["selector_owners"],
        tx_programs=fx["tx_program_set"],
        wire="flatbuffer",
    )
    rows = routed.collect()
    by_topic: dict[str, list] = {}
    for r in rows:
        by_topic.setdefault(r.topic, []).append(r)
    assert set(by_topic) == set(G.TOPICS.values())

    # account: decode and re-find the source row by (key, slot, wv)
    src = {
        (r["key"], r["slot"], r["write_version"]): r.asDict()
        for r in G.account_update_stream(
            account_updates_df(spark), fx["selector_owners"]
        ).collect()
    }
    n_checked = 0
    for r in by_topic[G.TOPICS["account"]]:
        dec = fbs.deserialize_account(bytes(r.value))
        want = src[(dec["key"], dec["slot"], dec["write_version"])]
        assert dec["lamports"] == want["lamports"]
        assert dec["owner"] == bytes(want["owner"])
        assert dec["data"] == (bytes(want["data"]) if want["data"] is not None else b"")
        assert dec["executable"] == want["executable"]
        n_checked += 1
    assert n_checked > 0

    # slot: scalar u64 roots, all rooted slots present
    got_slots = {
        fbs.deserialize_finalized_slot(bytes(r.value))
        for r in by_topic[G.TOPICS["slot"]]
    }
    exp_slots = {
        r.slot for r in G.rooted_slot_stream(slot_status_df(spark)).collect()
    }
    assert got_slots == exp_slots

    # block: metadata roundtrip against the null-defaulted stream
    blk_src = {
        r["slot"]: r.asDict()
        for r in G.block_metadata_stream(block_metadata_df(spark)).collect()
    }
    for r in by_topic[G.TOPICS["block"]]:
        dec = fbs.deserialize_metadata(bytes(r.value))
        want = blk_src[dec["slot"]]
        assert dec["blockhash"] == (want["blockhash"] or "")
        assert dec["block_time"] == want["block_time"]
        assert dec["block_height"] == want["block_height"]

    # offchain: valid pubkey/uri envelope
    for r in by_topic[G.TOPICS["offchain"]]:
        dec = fbs.deserialize_metadata_off_chain(bytes(r.value))
        assert dec["uri"].startswith(("http", "ar://", "ipfs://")) or dec["uri"]
        assert len(dec["pubkey"]) > 0

    # transaction: full nested roundtrip vs the typed stream
    tx_src = {
        bytes(r["signature"]): r
        for r in G.transaction_stream(
            transactions_df(spark), fx["tx_program_set"]
        ).collect()
    }
    n_tx = 0
    for r in by_topic[G.TOPICS["transaction"]]:
        dec = fbs.deserialize_transaction(bytes(r.value))
        want = tx_src[dec["signature"]]
        assert dec["slot"] == want["slot"]
        assert dec["status_ok"] == want["status_ok"]
        assert dec["account_keys"] == [bytes(k) for k in want["account_keys"]]
        assert len(dec["instructions"]) == len(want["instructions"])
        for di, wi in zip(dec["instructions"], want["instructions"]):
            assert di["program_id_index"] == wi["program_id_index"]
            assert di["accounts"] == list(wi["accounts"])
        assert dec["message_version"] == (want["message_version"] or "legacy")
        n_tx += 1
    assert n_tx > 0
