"""Solana ETL query corpus — the reference's derived tables as
(spark, sf_dir) callables with value-level DuckDB oracles.

Each query decodes the deterministic binary fixture (fixtures.py) with
the engine's operators; the oracle is the pre-pack ground truth as a
``VALUES`` literal, so the driver's hash-compare checks decoded VALUES,
not just row counts. Binary keys are hex-encoded at the output edge
(the driver compares strings; BinaryType stays canonical internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from solana_snapshot_etl_tools_spark.fixtures import raw_accounts_df, values_sql
from solana_snapshot_etl_tools_spark.operators import decoders as D


def _hx(c):
    return F.hex(F.col(c)).alias(c)


def q_account(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.account_table(raw_accounts_df(spark)).select(
        _hx("pubkey"), "data_len", _hx("owner"), "lamports", "executable",
        "rent_epoch",
    )


def q_token_account(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.token_account_table(raw_accounts_df(spark)).select(
        _hx("pubkey"), _hx("mint"), _hx("owner"), "amount", _hx("delegate"),
        "state", "is_native", "delegated_amount", _hx("close_authority"),
    )


def q_token_mint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.token_mint_table(raw_accounts_df(spark)).select(
        _hx("pubkey"), _hx("mint_authority"), "supply", "decimals",
        "is_initialized", _hx("freeze_authority"),
    )


def q_token_multisig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.token_multisig_table(raw_accounts_df(spark)).select(
        _hx("pubkey"), _hx("signer"), "m", "n"
    )


def q_token_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.token_metadata_table(raw_accounts_df(spark)).select(
        _hx("pubkey"), _hx("mint"), "name", "symbol", "uri",
        "seller_fee_basis_points", "primary_sale_happened", "is_mutable",
        "edition_nonce", "collection_verified", _hx("collection_key"),
    )


def q_offchain_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.offchain_uri_table(raw_accounts_df(spark)).select(
        _hx("pubkey"), "uri"
    )


def q_program_elfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.program_elfs_table(raw_accounts_df(spark)).select(
        _hx("pubkey"),
        F.octet_length("elf").cast("long").alias("elf_len"),
        F.md5("elf").alias("elf_md5"),
    )


def q_csv_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.csv_projection(raw_accounts_df(spark))


def q_deletion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.deletion_events(raw_accounts_df(spark)).select(_hx("pubkey"), "slot")


def q_opcode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6→T7→A1-A3→O1 over the extracted program ELFs, plus planted
    broken ELFs that the lenient parser must skip."""
    from solana_snapshot_etl_tools_spark.operators.opcode import opcode_stats

    elfs = D.program_elfs_table(raw_accounts_df(spark)).select(
        F.col("pubkey").alias("program_id"), "elf"
    )
    broken = spark.createDataFrame(
        [
            (b"\x00" * 32, b"not an elf at all"),
            (b"\x01" * 32, b"\x7fELF" + b"\x02\x01" + b"\x00" * 10),  # truncated
            (b"\x02" * 32, None),
        ],
        "program_id binary, elf binary",
    )
    return opcode_stats(elfs.unionByName(broken))


def q_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S5 + F13 + F14 end-to-end: materialize the fixture as REAL
    AppendVec files + bincode manifest (once, under /tmp), run the
    distributed scan, build the deduped account table — checked
    against the same pre-pack ground truth as etl_account."""
    import os
    import tempfile

    from solana_snapshot_etl_tools_spark.fixtures import build_fixture
    from solana_snapshot_etl_tools_spark.sources import appendvec as AV
    from solana_snapshot_etl_tools_spark.sources import snapshot as SNAP

    import hashlib

    from solana_snapshot_etl_tools_spark.fixtures import build_fixture as _bf

    # content-addressed cache dir: a fixture change invalidates the
    # materialized snapshot instead of silently serving stale bytes
    tag = hashlib.md5(
        repr(sorted(_bf()["expected"]["account"][2])).encode()
    ).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_snapshot_fixture_{tag}"
    )
    accounts_dir = os.path.join(base, "accounts")
    done = os.path.join(base, "_DONE")
    if not os.path.exists(done):
        os.makedirs(accounts_dir, exist_ok=True)
        fx = build_fixture()
        cols = [f.name for f in __import__(
            "solana_snapshot_etl_tools_spark.schemas", fromlist=["RAW_ACCOUNTS_SCHEMA"]
        ).RAW_ACCOUNTS_SCHEMA.fields]
        by_vec: dict[tuple[int, int], list[dict]] = {}
        for row in fx["raw_rows"]:
            d = dict(zip(cols, row))
            by_vec.setdefault((d["slot"], d["append_vec_id"]), []).append(d)
        manifest: dict[tuple[int, int], int] = {}
        for (slot, vid), accounts in by_vec.items():
            blob = AV.write_append_vec(accounts)
            with open(os.path.join(accounts_dir, f"{slot}.{vid}"), "wb") as f:
                f.write(blob)
            manifest[(slot, vid)] = len(blob)
        with open(os.path.join(base, "manifest.bin"), "wb") as f:
            f.write(SNAP.write_accounts_db_fields(manifest))
        with open(done, "w") as f:
            f.write("ok")
    manifest = SNAP.parse_accounts_db_fields(
        open(os.path.join(base, "manifest.bin"), "rb").read()
    )
    raw = SNAP.scan_unpacked(spark, accounts_dir, manifest)
    return D.account_table(raw).select(
        _hx("pubkey"), "data_len", _hx("owner"), "lamports", "executable",
        "rent_epoch",
    )


def q_stream_tx_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-structure access over the full transaction shape
    (FIXTURES.md §4): lookup tables, inner instructions, logs,
    rewards — flattened with array/struct expressions."""
    from solana_snapshot_etl_tools_spark.fixtures import (
        build_fixture,
        transactions_df,
    )
    from solana_snapshot_etl_tools_spark.streaming.geyser import transaction_stream

    progs = build_fixture()["tx_program_set"]
    t = transaction_stream(transactions_df(spark), progs)
    return t.select(
        _hx("signature"),
        "message_version",
        F.size("instructions").alias("n_instrs"),
        F.coalesce(F.size("address_table_lookups"), F.lit(-1)).alias("n_lookups"),
        F.coalesce(
            F.aggregate(
                "inner_instructions",
                F.lit(0),
                lambda acc, g: acc + F.size(g["instructions"]),
            ),
            F.lit(0),
        ).alias("n_inner"),
        F.col("log_messages")[0].alias("first_log"),
        F.coalesce(
            F.aggregate("rewards", F.lit(0).cast("long"), lambda acc, r: acc + r["lamports"]),
            F.lit(0).cast("long"),
        ).alias("total_reward"),
    )


# --- multimodal corpus (operators/multimodal.py over the fake-codec fixture)


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import media_df
    from solana_snapshot_etl_tools_spark.operators.multimodal import (
        decode_media_meta,
    )

    return decode_media_meta(media_df(spark))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import media_df
    from solana_snapshot_etl_tools_spark.operators.multimodal import sample_frames

    return sample_frames(media_df(spark), every_k=2)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import media_df
    from solana_snapshot_etl_tools_spark.operators.multimodal import (
        extract_features,
    )

    feats = extract_features(media_df(spark))
    return feats.select(
        "media_id",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(8)],
    )


# --- streaming corpus (batch replay of the ST1-ST5 pipelines; the same
# functions run under readStream — parity proven in tests/test_streaming.py)


def q_stream_selected_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import (
        account_updates_df,
        build_fixture,
    )
    from solana_snapshot_etl_tools_spark.streaming.geyser import (
        account_update_stream,
    )

    owners = build_fixture()["selector_owners"]
    return account_update_stream(
        account_updates_df(spark), owners, select_deletions=True, startup=False
    ).select(_hx("key"), "slot", "write_version", "lamports")


def q_stream_offchain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import account_updates_df
    from solana_snapshot_etl_tools_spark.streaming.geyser import (
        offchain_fanout_stream,
    )

    return offchain_fanout_stream(account_updates_df(spark)).select(
        _hx("key"), "uri"
    )


def q_stream_rooted_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import slot_status_df
    from solana_snapshot_etl_tools_spark.streaming.geyser import rooted_slot_stream

    return rooted_slot_stream(slot_status_df(spark))


def q_stream_block_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import block_metadata_df
    from solana_snapshot_etl_tools_spark.streaming.geyser import (
        block_metadata_stream,
    )

    return block_metadata_stream(block_metadata_df(spark))


def q_stream_tx_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solana_snapshot_etl_tools_spark.fixtures import (
        build_fixture,
        transactions_df,
    )
    from solana_snapshot_etl_tools_spark.streaming.geyser import transaction_stream

    progs = build_fixture()["tx_program_set"]
    return transaction_stream(transactions_df(spark), progs).select(
        _hx("signature"),
        "slot",
        "fee",
        F.size("account_keys").alias("n_keys"),
    )


QUERIES = {
    "etl_account": q_account,
    "etl_token_account": q_token_account,
    "etl_token_mint": q_token_mint,
    "etl_token_multisig": q_token_multisig,
    "etl_token_metadata": q_token_metadata,
    "etl_offchain_uri": q_offchain_uri,
    "etl_program_elfs": q_program_elfs,
    "etl_csv_projection": q_csv_projection,
    "etl_deletion_events": q_deletion_events,
    "etl_opcode_stats": q_opcode_stats,
    "etl_snapshot_scan": q_snapshot_scan,
    "media_meta": q_media_meta,
    "media_frame_sample": q_frame_sample,
    "media_features": q_media_features,
    "stream_selected_accounts": q_stream_selected_accounts,
    "stream_offchain_fanout": q_stream_offchain,
    "stream_rooted_slots": q_stream_rooted_slots,
    "stream_block_metadata": q_stream_block_metadata,
    "stream_tx_filtered": q_stream_tx_filtered,
    "stream_tx_nested": q_stream_tx_nested,
}

_ORACLE_TABLE = {
    "etl_account": "account",
    "etl_token_account": "token_account",
    "etl_token_mint": "token_mint",
    "etl_token_multisig": "token_multisig",
    "etl_token_metadata": "token_metadata",
    "etl_offchain_uri": "offchain_uri",
    "etl_program_elfs": "program_elfs",
    "etl_csv_projection": "csv_projection",
    "etl_deletion_events": "deletion_events",
    "etl_opcode_stats": "opcode_stats",
    "etl_snapshot_scan": "account",
    "media_meta": "media_meta",
    "media_frame_sample": "frame_sample",
    "media_features": "media_features",
    "stream_selected_accounts": "stream_selected_accounts",
    "stream_offchain_fanout": "stream_offchain_fanout",
    "stream_rooted_slots": "stream_rooted_slots",
    "stream_block_metadata": "stream_block_metadata",
    "stream_tx_filtered": "stream_tx_filtered",
    "stream_tx_nested": "stream_tx_nested",
}


def oracles() -> dict[str, str]:
    return {k: values_sql(t) for k, t in _ORACLE_TABLE.items()}
