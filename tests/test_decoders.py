"""Golden decode tests: engine output vs pre-pack ground truth
(FIXTURES.md §1-2; the fixture packs known values into the reference's
binary layouts, so these check actual decoded values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.fixtures import build_fixture
from solana_snapshot_etl_tools_spark.operators import decoders as D


def hx(c):
    return F.hex(F.col(c)).alias(c)


def _check(name, df, fx):
    cols, _types, rows = fx["expected"][name]
    assert df.columns == cols, f"{df.columns} != {cols}"
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(rows), f"{name}: value mismatch"


def test_account_table(raw_accounts):
    fx = build_fixture()
    df = D.account_table(raw_accounts).select(
        hx("pubkey"), "data_len", hx("owner"), "lamports", "executable", "rent_epoch"
    )
    _check("account", df, fx)


def test_token_account(raw_accounts):
    fx = build_fixture()
    df = D.token_account_table(raw_accounts).select(
        hx("pubkey"), hx("mint"), hx("owner"), "amount", hx("delegate"),
        "state", "is_native", "delegated_amount", hx("close_authority"),
    )
    _check("token_account", df, fx)


def test_token_mint(raw_accounts):
    fx = build_fixture()
    df = D.token_mint_table(raw_accounts).select(
        hx("pubkey"), hx("mint_authority"), "supply", "decimals",
        "is_initialized", hx("freeze_authority"),
    )
    _check("token_mint", df, fx)


def test_token_multisig_explode(raw_accounts):
    fx = build_fixture()
    df = D.token_multisig_table(raw_accounts).select(
        hx("pubkey"), hx("signer"), "m", "n"
    )
    _check("token_multisig", df, fx)


def test_token_metadata_borsh(raw_accounts):
    fx = build_fixture()
    df = D.token_metadata_table(raw_accounts).select(
        hx("pubkey"), hx("mint"), "name", "symbol", "uri",
        "seller_fee_basis_points", "primary_sale_happened", "is_mutable",
        "edition_nonce", "collection_verified", hx("collection_key"),
    )
    _check("token_metadata", df, fx)


def test_offchain_uri(raw_accounts):
    fx = build_fixture()
    df = D.offchain_uri_table(raw_accounts).select(hx("pubkey"), "uri")
    _check("offchain_uri", df, fx)


def test_program_elfs(raw_accounts):
    fx = build_fixture()
    df = D.program_elfs_table(raw_accounts).select(
        hx("pubkey"),
        F.octet_length("elf").cast("long").alias("elf_len"),
        F.md5("elf").alias("elf_md5"),
    )
    _check("program_elfs", df, fx)


def test_csv_projection_base58(raw_accounts):
    fx = build_fixture()
    _check("csv_projection", D.csv_projection(raw_accounts), fx)


def test_deletion_events(raw_accounts):
    fx = build_fixture()
    df = D.deletion_events(raw_accounts).select(hx("pubkey"), "slot")
    _check("deletion_events", df, fx)


def test_dedup_keeps_max_slot_writeversion(raw_accounts):
    win = D.dedup_last_write_wins(raw_accounts)
    assert win.count() == win.select("pubkey").distinct().count()
    # total raw rows > winners (fixture emits 30 duplicates)
    assert raw_accounts.count() > win.count()
