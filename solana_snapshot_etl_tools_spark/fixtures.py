"""Deterministic Solana fixtures + ground-truth oracles.

The reference repo ships no tests (SURVEY.md §5); our correctness
strategy packs known field values into the reference's binary layouts
(FIXTURES.md §1) and checks that the engine's decoders recover them.
Because field values are drawn BEFORE packing, every decode query gets
a real value-level oracle: the expected output is rendered as a DuckDB
``VALUES`` literal (see :func:`values_sql`), so the driver's
hash-compare validates actual decoded values, not just row counts.

Layout citations (into /root/reference):
- SPL token account 165 B / mint 82 B / multisig 355 B:
  solana-snapshot-etl/src/bin/solana-snapshot-etl/sqlite.rs:236-259
- Metaplex Borsh metadata: .../mpl_metadata.rs:6-85
- UpgradeableLoaderState ProgramData (ELF at byte 45): .../programs.rs:40-47
- Off-chain URI region (offset 119, 200 B): geyser/src/plugin.rs:190-195
"""

from __future__ import annotations

import hashlib
import random
import struct
from functools import lru_cache

from solana_snapshot_etl_tools_spark import schemas as S
from solana_snapshot_etl_tools_spark.functions.base58 import b58encode

SEED = 42

# --- packing helpers (little-endian, COption = u32 tag + value) ------------


def _u32(v: int) -> bytes:
    return struct.pack("<I", v)


def _u64(v: int) -> bytes:
    return struct.pack("<Q", v)


def _copt_pubkey(pk: bytes | None) -> bytes:
    return _u32(1) + pk if pk is not None else _u32(0) + b"\x00" * 32


def _copt_u64(v: int | None) -> bytes:
    return _u32(1) + _u64(v) if v is not None else _u32(0) + _u64(0)


def _i64(v: int) -> int:
    """u64 → i64 wraparound (the engine's LongType policy)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _borsh_str(s: bytes, capacity: int) -> bytes:
    """Borsh string NUL-padded to fixed capacity (on-chain convention)."""
    padded = s.ljust(capacity, b"\x00")[:capacity]
    return _u32(capacity) + padded


def pack_token_account(f: dict) -> bytes:
    out = (
        f["mint"]
        + f["owner"]
        + _u64(f["amount"])
        + _copt_pubkey(f["delegate"])
        + bytes([f["state"]])
        + _copt_u64(f["is_native"])
        + _u64(f["delegated_amount"])
        + _copt_pubkey(f["close_authority"])
    )
    assert len(out) == S.SPL_ACCOUNT_LEN
    return out


def pack_mint(f: dict) -> bytes:
    out = (
        _copt_pubkey(f["mint_authority"])
        + _u64(f["supply"])
        + bytes([f["decimals"], 1 if f["is_initialized"] else 0])
        + _copt_pubkey(f["freeze_authority"])
    )
    assert len(out) == S.SPL_MINT_LEN
    return out


def pack_multisig(f: dict) -> bytes:
    signers = b"".join(f["signers"]) + b"\x00" * 32 * (
        S.MAX_MULTISIG_SIGNERS - len(f["signers"])
    )
    out = bytes([f["m"], f["n"], 1]) + signers
    assert len(out) == S.SPL_MULTISIG_LEN
    return out


def pack_metadata(f: dict) -> bytes:
    """MetadataV1 body, optionally + edition_nonce ext + v1.2 ext."""
    creators = f.get("creators")
    if creators is None:
        cre = b"\x00"
    else:
        cre = b"\x01" + _u32(len(creators)) + b"".join(
            pk + bytes([1 if ver else 0, share]) for pk, ver, share in creators
        )
    out = (
        bytes([S.METADATA_V1_KEY])
        + f["update_authority"]
        + f["mint"]
        + _borsh_str(f["name"].encode() if isinstance(f["name"], str) else f["name"], 32)
        + _borsh_str(f["symbol"].encode(), 10)
        + _borsh_str(f["uri"] if isinstance(f["uri"], bytes) else f["uri"].encode(), 200)
        + struct.pack("<H", f["seller_fee_basis_points"])
        + cre
        + bytes([1 if f["primary_sale_happened"] else 0, 1 if f["is_mutable"] else 0])
    )
    if f.get("edition_nonce", "absent") != "absent":
        en = f["edition_nonce"]
        out += b"\x01" + bytes([en]) if en is not None else b"\x00"
        if f.get("v12"):
            ts = f.get("token_standard")
            out += b"\x01" + bytes([ts]) if ts is not None else b"\x00"
            col = f.get("collection")
            if col is not None:
                out += b"\x01" + bytes([1 if col[0] else 0]) + col[1]
            else:
                out += b"\x00"
            uses = f.get("uses")
            if uses is not None:
                out += b"\x01" + bytes([uses[0]]) + _u64(uses[1]) + _u64(uses[2])
            else:
                out += b"\x00"
    return out


def pack_programdata(elf: bytes, authority: bytes | None, slot: int) -> bytes:
    head = _u32(S.PROGRAMDATA_TAG) + _u64(slot)
    head += (b"\x01" + authority) if authority is not None else (b"\x00" + b"\x00" * 32)
    assert len(head) == S.PROGRAMDATA_ELF_OFFSET
    return head + elf


# --- minimal eBPF ELF builder (for opcode stats, reference main.rs:85-107) -

# subset of the reference's mnemonic table (main.rs:159-268)
EBPF_MNEMONICS = {
    0x07: "add64_imm",
    0x0F: "add64_reg",
    0x18: "lddw",
    0x1F: "sub64_reg",
    0x25: "jgt_imm",
    0x61: "ldxw",
    0x62: "stw",
    0x71: "ldxb",
    0x85: "call",
    0x95: "exit",
    0xB7: "mov64_imm",
    0xBF: "mov64_reg",
}


def build_elf(opcodes: list[int]) -> bytes:
    """Minimal ELF64 with one .text section holding the given eBPF
    opcodes (8 B/insn; lddw 0x18 takes 16 B, matching main.rs:97-101)."""
    text = b""
    for op in opcodes:
        text += bytes([op]) + b"\x00" * 7
        if op == 0x18:
            text += b"\x00" * 8
    shstrtab = b"\x00.text\x00.shstrtab\x00"
    ehsize, shentsize = 64, 64
    text_off = ehsize
    shstr_off = text_off + len(text)
    shoff = shstr_off + len(shstrtab)
    eh = struct.pack(
        "<4sBBBBB7xHHIQQQIHHHHHH",
        b"\x7fELF", 2, 1, 1, 0, 0,  # magic, 64-bit, LE, v1
        0xF7, 0x3E, 1,  # ET_NONE-ish, EM_BPF, version
        0, 0, shoff,  # entry, phoff, shoff
        0, ehsize, 0, 0,  # flags, ehsize, phentsize, phnum
        shentsize, 3, 2,  # shentsize, shnum, shstrndx
    )
    def sh(name_off, typ, off, size):
        return struct.pack("<IIQQQQIIQQ", name_off, typ, 6, 0, off, size, 0, 0, 8, 0)
    sections = sh(0, 0, 0, 0) + sh(1, 1, text_off, len(text)) + sh(7, 3, shstr_off, len(shstrtab))
    return eh + text + shstrtab + sections


# --- the fixture itself -----------------------------------------------------


def _pk(rng: random.Random) -> bytes:
    return rng.randbytes(32)


@lru_cache(maxsize=1)
def build_fixture() -> dict:
    """Deterministic raw_accounts rows + per-table expected outputs.

    Returns dict with:
      raw_accounts  : list of tuples (RAW_ACCOUNTS_SCHEMA order)
      expected      : dict table -> (colnames, duck_types, rows)
      account_updates / slot_status / block_metadata / transactions /
      program_elfs  : auxiliary fixtures (FIXTURES.md §3-6)
    """
    rng = random.Random(SEED)
    extra_programs = [_pk(rng) for _ in range(3)]
    raw: list[dict] = []  # each: field dict + kind + decoded ground truth

    def add(kind, owner, data, truth=None, *, executable=False, lamports=None,
            rent_epoch=None, pubkey=None):
        raw.append(
            dict(
                kind=kind,
                pubkey=pubkey or _pk(rng),
                owner=owner,
                data=data,
                truth=truth,
                executable=executable,
                lamports=rng.randrange(10**9) if lamports is None else lamports,
                rent_epoch=rent_epoch if rent_epoch is not None else rng.randrange(400),
                slot=rng.randrange(1000, 2000),
                write_version=rng.randrange(10**6),
            )
        )
        return raw[-1]

    # token accounts (incl. u64 wraparound amount + all COption branches)
    for i in range(40):
        f = dict(
            mint=_pk(rng),
            owner=_pk(rng),
            amount=(1 << 63) + rng.randrange(1 << 32) if i == 0 else rng.randrange(1 << 53),
            delegate=_pk(rng) if i % 3 == 0 else None,
            state=rng.choice([0, 1, 2]),
            is_native=rng.randrange(1 << 40) if i % 5 == 0 else None,
            delegated_amount=rng.randrange(1 << 40),
            close_authority=_pk(rng) if i % 4 == 0 else None,
        )
        add("token_account", S.TOKEN_PROGRAM_ID, pack_token_account(f), f)

    # mints
    for i in range(15):
        f = dict(
            mint_authority=_pk(rng) if i % 2 == 0 else None,
            supply=(1 << 64) - 1 if i == 0 else rng.randrange(1 << 50),
            decimals=rng.randrange(0, 12),
            is_initialized=i % 7 != 0,
            freeze_authority=_pk(rng) if i % 3 == 0 else None,
        )
        add("token_mint", S.TOKEN_PROGRAM_ID, pack_mint(f), f)

    # multisigs
    for i in range(8):
        n = rng.randrange(2, S.MAX_MULTISIG_SIGNERS + 1)
        f = dict(m=rng.randrange(1, n + 1), n=n, signers=[_pk(rng) for _ in range(n)])
        add("token_multisig", S.TOKEN_PROGRAM_ID, pack_multisig(f), f)

    # wrong-size token payloads → must be skipped (L1, sqlite.rs:252-258)
    for sz in (100, 164, 83, 356, 1):
        add("token_bad", S.TOKEN_PROGRAM_ID, bytes(rng.randbytes(sz)))

    # unpack-invalid token payloads → must be skipped (spl_token unpack
    # Err, silently dropped by the reference's `if let Ok(..)`):
    # invalid AccountState byte, malformed COption tag, mint
    # is_initialized byte > 1, uninitialized multisig
    f_inv = dict(
        mint=_pk(rng), owner=_pk(rng), amount=7, delegate=None, state=1,
        is_native=None, delegated_amount=0, close_authority=None,
    )
    b_state = bytearray(pack_token_account(f_inv)); b_state[108] = 3
    add("token_bad", S.TOKEN_PROGRAM_ID, bytes(b_state))
    b_tag = bytearray(pack_token_account(f_inv)); b_tag[72] = 2
    add("token_bad", S.TOKEN_PROGRAM_ID, bytes(b_tag))
    b_tag2 = bytearray(pack_token_account(f_inv)); b_tag2[129:133] = b"\x01\x01\x00\x00"
    add("token_bad", S.TOKEN_PROGRAM_ID, bytes(b_tag2))
    f_minv = dict(mint_authority=None, supply=5, decimals=2,
                  is_initialized=True, freeze_authority=None)
    b_mint = bytearray(pack_mint(f_minv)); b_mint[45] = 2
    add("token_bad", S.TOKEN_PROGRAM_ID, bytes(b_mint))
    f_msinv = dict(m=1, n=2, signers=[_pk(rng), _pk(rng)])
    b_ms = bytearray(pack_multisig(f_msinv)); b_ms[2] = 0
    add("token_bad", S.TOKEN_PROGRAM_ID, bytes(b_ms))

    # metaplex metadata: three truncation levels + edge cases
    for i in range(25):
        level = i % 3  # 0: v1-only, 1: +edition_nonce, 2: +v1.2
        f = dict(
            update_authority=_pk(rng),
            mint=_pk(rng),
            name=f"NFT #{i}",
            symbol=f"S{i}",
            uri=f"https://arweave.net/{i:08d}",
            seller_fee_basis_points=rng.randrange(10000),
            creators=[(_pk(rng), bool(rng.randrange(2)), rng.randrange(100))]
            if i % 2 == 0
            else None,
            primary_sale_happened=bool(rng.randrange(2)),
            is_mutable=bool(rng.randrange(2)),
        )
        if level >= 1:
            f["edition_nonce"] = rng.randrange(256) if i % 4 else None
        else:
            f["edition_nonce"] = "absent"
        if level == 2:
            f["v12"] = True
            f["token_standard"] = rng.randrange(5) if i % 5 else None
            f["collection"] = (bool(rng.randrange(2)), _pk(rng)) if i % 3 else None
            f["uses"] = (rng.randrange(3), rng.randrange(100), 100) if i % 7 == 0 else None
        add("token_metadata", S.MPL_METADATA_PROGRAM_ID, pack_metadata(f), f)

    # metadata edge: non-UTF-8 uri (T6 null; decoder lenient-skips)
    f_bad = dict(
        update_authority=_pk(rng), mint=_pk(rng), name="BAD", symbol="B",
        uri=b"\xff\xfe" + b"x" * 20, seller_fee_basis_points=1, creators=None,
        primary_sale_happened=False, is_mutable=True, edition_nonce="absent",
    )
    add("metadata_bad_utf8", S.MPL_METADATA_PROGRAM_ID, pack_metadata(f_bad), f_bad)
    # metadata edge: empty data + truncated body + wrong discriminator
    add("metadata_empty", S.MPL_METADATA_PROGRAM_ID, b"")
    add("metadata_trunc", S.MPL_METADATA_PROGRAM_ID, pack_metadata(f_bad)[:80])
    add("metadata_wrong_key", S.MPL_METADATA_PROGRAM_ID, b"\x07" + bytes(rng.randbytes(140)))

    # programs: legacy loaders (executable) + upgradeable ProgramData
    elf_specs = []
    for i in range(6):
        ops = [rng.choice(list(EBPF_MNEMONICS)) for _ in range(rng.randrange(5, 40))] + [0x95]
        elf_specs.append(ops)
        owner = S.BPF_LOADER_ID if i % 2 else S.BPF_LOADER_DEPRECATED_ID
        add("program_legacy", owner, build_elf(ops), dict(ops=ops), executable=True)
    for i in range(4):
        ops = [rng.choice(list(EBPF_MNEMONICS)) for _ in range(rng.randrange(5, 30))] + [0x95]
        elf_specs.append(ops)
        elf = build_elf(ops)
        add(
            "program_upgradeable",
            S.BPF_LOADER_UPGRADEABLE_ID,
            pack_programdata(elf, _pk(rng) if i % 2 else None, 1500 + i),
            dict(ops=ops, elf=elf),
        )
    # upgradeable-owned but NOT ProgramData (Program stub, tag=2) → skipped
    add("program_stub", S.BPF_LOADER_UPGRADEABLE_ID, _u32(2) + _pk(rng), executable=True)

    # system-owned + random-program accounts (base table breadth)
    for i in range(40):
        owner = rng.choice([S.SYSTEM_PROGRAM_ID] + extra_programs)
        add("plain", owner, bytes(rng.randbytes(rng.randrange(0, 64))))
    # deletion rows (F6): lamports=0, empty data, system owner
    for _ in range(5):
        add("deleted", S.SYSTEM_PROGRAM_ID, b"", lamports=0)
    # rent-exempt sentinel rows: rent_epoch = u64::MAX stored as -1
    add("plain", S.SYSTEM_PROGRAM_ID, b"xyz", rent_epoch=_i64((1 << 64) - 1))

    # duplicates: re-emit 30 existing pubkeys at later slots with new
    # lamports (and payload for token accounts) → exercises X3 dedup
    dup_pool = [r for r in raw if r["kind"] in ("token_account", "plain")][:30]
    for r in dup_pool:
        if r["kind"] == "token_account":
            f2 = dict(r["truth"])
            f2["amount"] = rng.randrange(1 << 50)
            add("token_account", r["owner"], pack_token_account(f2), f2,
                pubkey=r["pubkey"])
            raw[-1]["slot"] = r["slot"] + rng.randrange(1, 500)
        else:
            add("plain", r["owner"], r["data"], pubkey=r["pubkey"])
            raw[-1]["slot"] = r["slot"] + rng.randrange(1, 500)

    # ---- materialize raw rows (RAW_ACCOUNTS_SCHEMA order) ----
    raw_rows = [
        (
            r["pubkey"], r["write_version"], r["slot"],
            rng.randrange(10),  # append_vec_id
            r["owner"], r["lamports"], r["executable"], r["rent_epoch"],
            hashlib.sha256(r["pubkey"] + r["data"]).digest()[:32],
            r["data"], len(r["data"]),
        )
        for r in raw
    ]

    # ---- expected: last-write-wins winner per pubkey (X3) ----
    winners: dict[bytes, dict] = {}
    for r in raw:
        cur = winners.get(r["pubkey"])
        if cur is None or (r["slot"], r["write_version"]) > (cur["slot"], cur["write_version"]):
            winners[r["pubkey"]] = r
    win = list(winners.values())

    def hx(b: bytes | None) -> str | None:
        return b.hex().upper() if b is not None else None

    expected: dict[str, tuple] = {}
    expected["account"] = (
        ["pubkey", "data_len", "owner", "lamports", "executable", "rent_epoch"],
        ["VARCHAR", "BIGINT", "VARCHAR", "BIGINT", "BOOLEAN", "BIGINT"],
        [
            (hx(r["pubkey"]), len(r["data"]), hx(r["owner"]), r["lamports"],
             r["executable"], r["rent_epoch"])
            for r in win
        ],
    )
    expected["token_account"] = (
        ["pubkey", "mint", "owner", "amount", "delegate", "state",
         "is_native", "delegated_amount", "close_authority"],
        ["VARCHAR", "VARCHAR", "VARCHAR", "BIGINT", "VARCHAR", "INTEGER",
         "BIGINT", "BIGINT", "VARCHAR"],
        [
            (hx(r["pubkey"]), hx(t["mint"]), hx(t["owner"]), _i64(t["amount"]),
             hx(t["delegate"]), t["state"], t["is_native"],
             t["delegated_amount"], hx(t["close_authority"]))
            for r in win if r["kind"] == "token_account"
            for t in [r["truth"]]
            if t["state"] != 0  # Uninitialized fails unpack → skipped
        ],
    )
    expected["token_mint"] = (
        ["pubkey", "mint_authority", "supply", "decimals", "is_initialized",
         "freeze_authority"],
        ["VARCHAR", "VARCHAR", "BIGINT", "INTEGER", "BOOLEAN", "VARCHAR"],
        [
            (hx(r["pubkey"]), hx(t["mint_authority"]), _i64(t["supply"]),
             t["decimals"], t["is_initialized"], hx(t["freeze_authority"]))
            for r in win if r["kind"] == "token_mint"
            for t in [r["truth"]]
            if t["is_initialized"]  # uninitialized fails unpack → skipped
        ],
    )
    expected["token_multisig"] = (
        ["pubkey", "signer", "m", "n"],
        ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER"],
        [
            (hx(r["pubkey"]), hx(sg), t["m"], t["n"])
            for r in win if r["kind"] == "token_multisig"
            for t in [r["truth"]]
            for sg in t["signers"]
        ],
    )

    def _meta_row(r):
        t = r["truth"]
        en = t.get("edition_nonce")
        col = t.get("collection") if t.get("v12") else None
        return (
            hx(r["pubkey"]), hx(t["mint"]), t["name"], t["symbol"], t["uri"],
            t["seller_fee_basis_points"], t["primary_sale_happened"],
            t["is_mutable"], en if en != "absent" else None,
            col[0] if col else None, hx(col[1]) if col else None,
        )

    expected["token_metadata"] = (
        ["pubkey", "mint", "name", "symbol", "uri", "seller_fee_basis_points",
         "primary_sale_happened", "is_mutable", "edition_nonce",
         "collection_verified", "collection_key"],
        ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "INTEGER",
         "BOOLEAN", "BOOLEAN", "INTEGER", "BOOLEAN", "VARCHAR"],
        [_meta_row(r) for r in win if r["kind"] == "token_metadata"],
    )
    expected["offchain_uri"] = (
        ["pubkey", "uri"],
        ["VARCHAR", "VARCHAR"],
        [
            (hx(r["pubkey"]), r["truth"]["uri"])
            for r in win if r["kind"] == "token_metadata"
        ],
    )
    expected["program_elfs"] = (
        ["pubkey", "elf_len", "elf_md5"],
        ["VARCHAR", "BIGINT", "VARCHAR"],
        [
            (hx(r["pubkey"]), len(e), hashlib.md5(e).hexdigest())
            for r in win
            if r["kind"] in ("program_legacy", "program_upgradeable")
            for e in [r["data"] if r["kind"] == "program_legacy" else r["truth"]["elf"]]
        ],
    )
    expected["csv_projection"] = (
        ["pubkey", "owner", "data_len", "lamports"],
        ["VARCHAR", "VARCHAR", "BIGINT", "BIGINT"],
        [
            (b58encode(r["pubkey"]), b58encode(r["owner"]), len(r["data"]), r["lamports"])
            for r in win
        ],
    )
    # deletion-event rows (F6) out of the full raw set
    expected["deletion_events"] = (
        ["pubkey", "slot"],
        ["VARCHAR", "BIGINT"],
        [(hx(r["pubkey"]), r["slot"]) for r in raw if r["kind"] == "deleted"],
    )

    # ---- opcode stats expected (A1/A2/O1 over ALL fixture programs) ----
    op_insns: dict[int, int] = {}
    op_progs: dict[int, int] = {}
    for ops in elf_specs:
        for op in ops:
            op_insns[op] = op_insns.get(op, 0) + 1
        for op in set(ops):
            op_progs[op] = op_progs.get(op, 0) + 1
    expected["opcode_stats"] = (
        ["opcode", "mnemonic", "num_programs", "num_insns"],
        ["VARCHAR", "VARCHAR", "BIGINT", "BIGINT"],
        [
            (f"0x{op:02x}", EBPF_MNEMONICS.get(op, "unknown"), op_progs[op], op_insns[op])
            for op in sorted(op_insns)
        ],
    )

    # ---- streaming fixtures (FIXTURES.md §3-5) ----
    # account_updates: selector-set membership × startup × deletion mix
    selector_owners = [S.TOKEN_PROGRAM_ID, S.MPL_METADATA_PROGRAM_ID]
    upd = []
    for i in range(60):
        owner = rng.choice(
            selector_owners + [S.SYSTEM_PROGRAM_ID] + extra_programs
        )
        is_del = i % 10 == 9
        if is_del:
            owner, lamports, data = S.SYSTEM_PROGRAM_ID, 0, b""
        else:
            lamports = rng.randrange(1, 10**9)
            if owner == S.MPL_METADATA_PROGRAM_ID and i % 2 == 0:
                f = dict(
                    update_authority=_pk(rng), mint=_pk(rng), name=f"U{i}",
                    symbol="UU", uri=f"https://meta.example/{i}",
                    seller_fee_basis_points=10, creators=None,
                    primary_sale_happened=False, is_mutable=True,
                    edition_nonce="absent",
                )
                data = pack_metadata(f)
            else:
                data = bytes(rng.randbytes(rng.randrange(8, 64)))
        upd.append(
            dict(
                key=_pk(rng), lamports=lamports, owner=owner,
                executable=False, rent_epoch=rng.randrange(400), data=data,
                write_version=rng.randrange(10**6),
                slot=rng.randrange(2000, 3000), is_startup=i % 3 == 0,
            )
        )
    account_updates = [
        (u["key"], u["lamports"], u["owner"], u["executable"], u["rent_epoch"],
         u["data"], u["write_version"], u["slot"], u["is_startup"])
        for u in upd
    ]

    def _sel_v1(u, owners, deletion=True, startup=None):
        """Reference selector semantics (geyser/src/selectors.rs:42-59):
        the deletion-event early return fires BEFORE the startup check,
        so a deletion is selected regardless of is_startup; otherwise
        tri-state startup filter AND owner-set membership (empty set =
        pass all)."""
        if deletion and u["lamports"] == 0 and len(u["data"]) == 0 and u["owner"] == S.SYSTEM_PROGRAM_ID:
            return True
        if startup is not None and u["is_startup"] != startup:
            return False
        return not owners or u["owner"] in owners

    expected["stream_selected_accounts"] = (
        ["key", "slot", "write_version", "lamports"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT"],
        [
            (hx(u["key"]), u["slot"], u["write_version"], u["lamports"])
            for u in upd
            if _sel_v1(u, selector_owners, deletion=True, startup=False)
        ],
    )
    expected["stream_offchain_fanout"] = (
        ["key", "uri"],
        ["VARCHAR", "VARCHAR"],
        [
            (hx(u["key"]), f"https://meta.example/{i}")
            for i, u in enumerate(upd)
            if u["owner"] == S.MPL_METADATA_PROGRAM_ID
            and len(u["data"]) > 0 and u["data"][0] == S.METADATA_V1_KEY
            and len(u["data"]) >= 319
        ],
    )

    # slot_status: only rooted slots pass (ST3, plugin.rs:296-318)
    slot_status = []
    for i in range(30):
        st = rng.choice(["processed", "confirmed", "rooted"])
        slot_status.append((3000 + i, 2999 + i if i else None, st))
    expected["stream_rooted_slots"] = (
        ["slot"],
        ["BIGINT"],
        [(s,) for s, _p, st in slot_status if st == "rooted"],
    )

    # block_metadata with nullable fields → T10 defaults
    block_metadata = []
    bm_expected = []
    for i in range(20):
        bt = rng.randrange(1_600_000_000, 1_700_000_000) if i % 4 else None
        bh = rng.randrange(10**6) if i % 5 else None
        rewards = '[{"pubkey":"x","lamports":%d}]' % rng.randrange(100)
        block_metadata.append((4000 + i, f"hash{i}", rewards, bt, bh))
        bm_expected.append((4000 + i, f"hash{i}", rewards, bt or 0, bh or 0))
    expected["stream_block_metadata"] = (
        ["slot", "blockhash", "rewards", "block_time", "block_height"],
        ["BIGINT", "VARCHAR", "VARCHAR", "BIGINT", "BIGINT"],
        bm_expected,
    )

    # transactions (FIXTURES.md §4, subset of nested cols populated)
    program_set = [S.TOKEN_PROGRAM_ID, extra_programs[0]]
    txs = []
    tx_expected = []
    for i in range(40):
        sig = rng.randbytes(64)
        ok = i % 5 != 4  # F8: failed dropped
        n_keys = rng.randrange(2, 6)
        keys = [_pk(rng) for _ in range(n_keys)]
        if i % 3 == 0:  # plant selector-set membership (F9)
            keys[rng.randrange(n_keys)] = rng.choice(program_set)
        is_vote = i % 7 == 0
        fee = rng.randrange(5000, 10**6)
        pre = [rng.randrange(10**9) for _ in range(n_keys)]
        post = [v - fee if j == 0 else v for j, v in enumerate(pre)]
        instrs = [
            (rng.randrange(n_keys), [rng.randrange(n_keys) for _ in range(2)],
             bytes(rng.randbytes(8)))
            for _ in range(rng.randrange(1, 4))
        ]
        logs = [f"Program log: {i}/{j}" for j in range(rng.randrange(0, 3))] or None
        ver = "legacy" if i % 2 else "v0"
        if ver == "v0":  # FIXTURES.md §4: v0-only nullable fields populated
            lookups = [(_pk(rng), [0, 1], [2])]
            loaded_w, loaded_r = [_pk(rng)], [_pk(rng)]
        else:
            lookups = loaded_w = loaded_r = None
        inner = (
            [(0, [(rng.randrange(n_keys), [0], bytes(rng.randbytes(4)))])]
            if i % 4 == 0
            else None
        )
        tok_bal = (
            [(0, hx(_pk(rng)), (1.5, 6, "1500000", "1.5"), hx(_pk(rng)), hx(S.TOKEN_PROGRAM_ID))]
            if i % 6 == 0
            else None
        )
        rewards = (
            [(hx(_pk(rng)), rng.randrange(1000), rng.randrange(10**9), "Fee", 0)]
            if i % 5 == 0
            else None
        )
        txs.append(
            (sig, is_vote, 5000 + i, ok, ver, (1, 0, 1), keys, rng.randbytes(32),
             instrs, lookups, loaded_w, loaded_r, rng.randbytes(32), [sig], fee,
             pre, post, inner, logs, tok_bal, tok_bal, rewards)
        )
        if ok and any(k in program_set for k in keys):
            tx_expected.append((hx(sig), 5000 + i, fee, len(keys)))
    expected["stream_tx_filtered"] = (
        ["signature", "slot", "fee", "n_keys"],
        ["VARCHAR", "BIGINT", "BIGINT", "INTEGER"],
        tx_expected,
    )
    expected["stream_tx_nested"] = (
        ["signature", "message_version", "n_instrs", "n_lookups",
         "n_inner", "first_log", "total_reward"],
        ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER", "INTEGER", "VARCHAR",
         "BIGINT"],
        [
            (
                hx(t[0]), t[4], len(t[8]),
                len(t[9]) if t[9] is not None else -1,
                sum(len(g[1]) for g in t[17]) if t[17] is not None else 0,
                t[18][0] if t[18] else None,
                sum(r[1] for r in t[21]) if t[21] is not None else 0,
            )
            for t in txs
            if t[3] and any(k in program_set for k in t[6])
        ],
    )

    # ---- multimodal fixture (fake containers, operators/multimodal.py) ----
    import struct as _st

    media = []  # (media_id, kind, blob)
    media_meta_exp = []
    frame_exp = []
    feat_exp = []

    def _feat(payload):
        from solana_snapshot_etl_tools_spark.operators.multimodal import (
            payload_features,
        )

        return payload_features(payload)

    mid = 0
    for _ in range(10):  # images
        w, h, c = rng.randrange(4, 32), rng.randrange(4, 32), rng.choice([1, 3])
        payload = bytes(rng.randbytes(w * h * c))
        media.append((mid, "image", b"FIMG" + _st.pack("<HH", w, h) + bytes([c]) + payload))
        media_meta_exp.append((mid, "image", "fimg", w, h, c, None, None, None,
                               len(payload), hashlib.md5(payload).hexdigest()))
        feat_exp.append((mid, *_feat(payload)))
        mid += 1
    for _ in range(6):  # audio
        sr = rng.choice([8000, 16000, 44100])
        n = rng.randrange(16, 256)
        payload = bytes(rng.randbytes(2 * n))
        media.append((mid, "audio", b"FAUD" + _st.pack("<II", sr, n) + payload))
        media_meta_exp.append((mid, "audio", "faud", None, None, None, sr, n,
                               None, len(payload), hashlib.md5(payload).hexdigest()))
        feat_exp.append((mid, *_feat(payload)))
        mid += 1
    for _ in range(5):  # video
        w, h, nf = rng.randrange(4, 16), rng.randrange(4, 16), rng.randrange(2, 9)
        payload = bytes(rng.randbytes(w * h * nf))
        media.append((mid, "video", b"FVID" + _st.pack("<HHH", w, h, nf) + payload))
        media_meta_exp.append((mid, "video", "fvid", w, h, None, None, None, nf,
                               len(payload), hashlib.md5(payload).hexdigest()))
        feat_exp.append((mid, *_feat(payload)))
        for idx in range(0, nf, 2):
            frame = payload[idx * w * h : (idx + 1) * w * h]
            frame_exp.append((mid, idx, hashlib.md5(frame).hexdigest()))
        mid += 1
    for blob in (b"", b"JUNKDATA", b"FIMG" + _st.pack("<HH", 9, 9) + b"\x03" + b"short"):
        media.append((mid, "image", blob))  # corrupt → null metadata
        media_meta_exp.append((mid, "image", None, None, None, None, None,
                               None, None, None, None))
        feat_exp.append((mid, *([None] * 8)))
        mid += 1

    expected["media_meta"] = (
        ["media_id", "kind", "format", "width", "height", "channels",
         "sample_rate", "n_samples", "n_frames", "payload_len", "payload_md5"],
        ["BIGINT", "VARCHAR", "VARCHAR", "INTEGER", "INTEGER", "INTEGER",
         "INTEGER", "INTEGER", "INTEGER", "BIGINT", "VARCHAR"],
        media_meta_exp,
    )
    expected["frame_sample"] = (
        ["media_id", "frame_idx", "frame_md5"],
        ["BIGINT", "INTEGER", "VARCHAR"],
        frame_exp,
    )
    expected["media_features"] = (
        ["media_id"] + [f"f{i}" for i in range(8)],
        ["BIGINT"] + ["DOUBLE"] * 8,
        feat_exp,
    )

    return dict(
        raw_rows=raw_rows,
        raw=raw,
        media=media,
        expected=expected,
        account_updates=account_updates,
        selector_owners=selector_owners,
        slot_status=slot_status,
        block_metadata=block_metadata,
        transactions=txs,
        tx_program_set=program_set,
    )


def values_sql(table: str) -> str:
    """DuckDB oracle: expected rows as a typed VALUES literal."""
    cols, types, rows = build_fixture()["expected"][table]
    if not rows:
        sel = ", ".join(f"CAST(NULL AS {t}) AS {c}" for c, t in zip(cols, types))
        return f"SELECT {sel} WHERE FALSE"

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, float):
            # bare float literals in VALUES are inferred as DECIMAL and
            # quantized; a string→DOUBLE cast parses to the exact bits
            return f"CAST('{v!r}' AS DOUBLE)"
        return str(v)

    body = ",\n".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    cast = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    return f"SELECT {cast} FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"


# Fixture DataFrames are materialized to parquet once per fixture
# content-hash (not per query): repeated `createDataFrame` over the
# binary fixture costs ~2 s of driver-side pandas/py4j conversion per
# call, which dominated the etl_* bench entries and measured harness,
# not engine. The cache is content-addressed so a fixture change
# invalidates it instead of serving stale bytes, and promotion is an
# atomic rename so concurrent sessions never read a half-written dir.


@lru_cache(maxsize=1)
def _fixture_tag() -> str:
    fx = build_fixture()
    h = hashlib.md5()
    for k in (
        "raw_rows",
        "account_updates",
        "slot_status",
        "block_metadata",
        "transactions",
        "media",
    ):
        h.update(repr(fx[k]).encode())
    return h.hexdigest()[:10]


def _materialized_df(spark, key: str, rows, schema):
    import os
    import shutil
    import tempfile
    import uuid

    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_fixture_pq_{_fixture_tag()}"
    )
    path = os.path.join(base, key)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(base, exist_ok=True)
        tmp = f"{path}._tmp.{uuid.uuid4().hex[:8]}"
        spark.createDataFrame(rows, schema).repartition(8).write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:  # concurrent writer promoted first
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.schema(schema).parquet(path)


def raw_accounts_df(spark):
    from solana_snapshot_etl_tools_spark.schemas import RAW_ACCOUNTS_SCHEMA

    return _materialized_df(
        spark, "raw_accounts", build_fixture()["raw_rows"], RAW_ACCOUNTS_SCHEMA
    )


def account_updates_df(spark):
    from solana_snapshot_etl_tools_spark.schemas import ACCOUNT_UPDATES_SCHEMA

    return _materialized_df(
        spark,
        "account_updates",
        build_fixture()["account_updates"],
        ACCOUNT_UPDATES_SCHEMA,
    )


def slot_status_df(spark):
    from solana_snapshot_etl_tools_spark.schemas import SLOT_STATUS_SCHEMA

    return _materialized_df(
        spark, "slot_status", build_fixture()["slot_status"], SLOT_STATUS_SCHEMA
    )


def block_metadata_df(spark):
    from solana_snapshot_etl_tools_spark.schemas import BLOCK_METADATA_SCHEMA

    return _materialized_df(
        spark,
        "block_metadata",
        build_fixture()["block_metadata"],
        BLOCK_METADATA_SCHEMA,
    )


def transactions_df(spark):
    from solana_snapshot_etl_tools_spark.schemas import TRANSACTIONS_SCHEMA

    return _materialized_df(
        spark, "transactions", build_fixture()["transactions"], TRANSACTIONS_SCHEMA
    )


def media_df(spark):
    from solana_snapshot_etl_tools_spark.operators.multimodal import MEDIA_SCHEMA

    return _materialized_df(spark, "media", build_fixture()["media"], MEDIA_SCHEMA)
