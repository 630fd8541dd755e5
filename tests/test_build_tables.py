"""Batch build plan tests: atomic writes, observed counters, registry,
plus the stateful streaming tracker."""

from __future__ import annotations

import os

from solana_snapshot_etl_tools_spark.fixtures import build_fixture
from solana_snapshot_etl_tools_spark.plans import build_tables as BT


def test_build_all_tables_atomic(spark, raw_accounts, tmp_path):
    out = str(tmp_path / "tables")
    counts = BT.build_all_tables(raw_accounts, out)
    fx = build_fixture()
    assert counts["account"] == len(fx["expected"]["account"][2])
    assert counts["token_account"] == len(fx["expected"]["token_account"][2])
    assert counts["token_multisig"] == len(fx["expected"]["token_multisig"][2])
    for t in BT.TABLES:
        path = os.path.join(out, t)
        assert os.path.isdir(path)
        assert spark.read.parquet(path).count() == counts[t]
        # no leftover temp dirs (atomic promotion)
    assert not [d for d in os.listdir(out) if "._tmp." in d]


def test_build_overwrite_is_atomic(spark, raw_accounts, tmp_path):
    out = str(tmp_path / "tables")
    BT.build_all_tables(raw_accounts, out)
    first = spark.read.parquet(os.path.join(out, "account")).count()
    BT.build_all_tables(raw_accounts, out)  # idempotent overwrite
    assert spark.read.parquet(os.path.join(out, "account")).count() == first


def test_decoder_registry_extension(spark, raw_accounts):
    from pyspark.sql import functions as F

    BT.register_decoder(
        "nonempty", lambda raw: raw.filter(F.col("data_len") > 0)
    )
    assert BT.decode(raw_accounts, "nonempty").count() > 0
    # 15 mint fixtures minus the 3 uninitialized ones (i % 7 == 0),
    # which spl_token unpack rejects
    assert BT.decode(raw_accounts, "token_mint").count() == 12


def test_stateful_tracker_stream_vs_batch(spark, tmp_path):
    from solana_snapshot_etl_tools_spark import schemas as S
    from solana_snapshot_etl_tools_spark.fixtures import account_updates_df
    from solana_snapshot_etl_tools_spark.streaming.sinks import run_available_now
    from solana_snapshot_etl_tools_spark.streaming.stateful import (
        account_version_tracker,
    )

    d = str(tmp_path / "upd")
    account_updates_df(spark).write.parquet(d)
    streamed = run_available_now(
        spark, d, S.ACCOUNT_UPDATES_SCHEMA, account_version_tracker,
        output_mode="update",
    )
    batch = account_version_tracker(account_updates_df(spark))
    key = lambda df: sorted(
        (r.key_hex, r.n_updates, r.max_slot, r.max_write_version)
        for r in df.collect()
    )
    assert key(streamed) == key(batch)
    assert streamed.count() > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming X3: duplicated deliveries collapse to one row per
    (key, slot, write_version) under a real streaming query."""
    from solana_snapshot_etl_tools_spark import schemas as S
    from solana_snapshot_etl_tools_spark.fixtures import account_updates_df
    from solana_snapshot_etl_tools_spark.streaming.sinks import run_available_now
    from solana_snapshot_etl_tools_spark.streaming.stateful import (
        dedup_updates_stream,
    )

    d = str(tmp_path / "upd_dup")
    upd = account_updates_df(spark)
    upd.union(upd).write.parquet(d)  # every row delivered twice
    streamed = run_available_now(
        spark, d, S.ACCOUNT_UPDATES_SCHEMA, dedup_updates_stream
    )
    assert streamed.count() == upd.count()
    batch = dedup_updates_stream(upd.union(upd))
    assert batch.count() == upd.count()
