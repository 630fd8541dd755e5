"""Coverage for the remaining SURVEY §2 items: CSV sink (K1),
programs tar sink/scan (K3/S6), plugin-push analog (K4), source
dispatch incl. HTTP (S3), and the JSON round-trip (T9/T11)."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.fixtures import (
    account_updates_df,
    build_fixture,
)
from solana_snapshot_etl_tools_spark.operators import decoders as D
from solana_snapshot_etl_tools_spark.operators import sinks as K


def test_csv_sink_roundtrip(spark, raw_accounts, tmp_path):
    out = str(tmp_path / "csv")
    K.write_csv(raw_accounts, out)
    back = spark.read.option("header", True).csv(out)
    exp = build_fixture()["expected"]["csv_projection"][2]
    got = sorted(
        (r.pubkey, r.owner, int(r.data_len), int(r.lamports)) for r in back.collect()
    )
    assert got == sorted(exp)


def test_training_shards_sink(spark, tmp_path):
    """Shards are bounded at records_per_shard, cover every row exactly
    once, and the range layout keeps each shard contiguous in the
    order column."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.sha1(F.col("id").cast("string")).alias("text")
    )
    out = str(tmp_path / "shards")
    manifest = K.write_training_shards(df, out, records_per_shard=1024, order_col="doc_id")
    rows = manifest.collect()
    assert sum(r.rows for r in rows) == 10_000
    assert all(r.rows <= 1024 for r in rows)
    assert len(rows) >= 10  # ceil(10000/1024)
    # contiguity: per-file [min,max] doc_id ranges must not overlap
    back = spark.read.parquet(out).select(
        F.input_file_name().alias("f"), "doc_id"
    )
    spans = sorted(
        (r.lo, r.hi)
        for r in back.groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
        assert lo > hi_prev, "shard ranges overlap"
    # full row coverage, no dup/loss
    assert back.select("doc_id").distinct().count() == 10_000


def test_programs_tar_roundtrip(spark, raw_accounts, tmp_path):
    tar_path = str(tmp_path / "programs.tar")
    elfs = D.program_elfs_table(raw_accounts)
    n = K.write_programs_tar(elfs, tar_path)
    assert n == elfs.count() == 10
    back = K.read_programs_tar(spark, tar_path)
    orig = {(bytes(r.pubkey), bytes(r.elf)) for r in elfs.collect()}
    got = {(bytes(r.program_id), bytes(r.elf)) for r in back.collect()}
    assert got == orig
    # S6→T7 over the tar: same opcode histogram as the fixture truth
    from solana_snapshot_etl_tools_spark.operators.opcode import opcode_stats

    stats = sorted(tuple(r) for r in opcode_stats(back).collect())
    assert stats == sorted(build_fixture()["expected"]["opcode_stats"][2])


def test_program_files_sink(spark, raw_accounts, tmp_path):
    out = str(tmp_path / "programs")
    elfs = D.program_elfs_table(raw_accounts)
    K.write_program_files(elfs, out)
    assert len([f for f in os.listdir(out) if f.endswith(".so")]) == 10


def test_foreach_batch_push_executor_side(spark, tmp_path):
    """K4 default mode: consumer runs executor-side per partition over
    a multi-partition batch — no whole-batch driver materialization.
    Delivery is proven through an external side effect (files), the
    only channel an executor-side consumer legitimately has."""
    import glob
    import json as _json
    import uuid as _uuid

    from solana_snapshot_etl_tools_spark import schemas as S
    from solana_snapshot_etl_tools_spark.streaming.sinks import foreach_batch_push

    d = str(tmp_path / "upd")
    account_updates_df(spark).repartition(4).write.parquet(d)
    sink_dir = str(tmp_path / "sink")
    os.makedirs(sink_dir)

    def consumer(rows, epoch_id):
        p = os.path.join(sink_dir, f"{epoch_id}-{_uuid.uuid4().hex}.json")
        with open(p, "w") as f:
            _json.dump([r["key"].hex() for r in rows], f)

    stream = spark.readStream.schema(S.ACCOUNT_UPDATES_SCHEMA).parquet(d)
    q = foreach_batch_push(stream, consumer)
    q.awaitTermination(120)
    files = glob.glob(os.path.join(sink_dir, "*.json"))
    assert len(files) > 1  # one call per non-empty partition
    got = sorted(k for f in files for k in _json.load(open(f)))
    want = sorted(
        r["key"].hex() for r in account_updates_df(spark).collect()
    )
    assert got == want


def test_foreach_batch_push_collect_and_iterate(spark, tmp_path):
    from solana_snapshot_etl_tools_spark import schemas as S
    from solana_snapshot_etl_tools_spark.streaming.sinks import foreach_batch_push

    d = str(tmp_path / "upd2")
    account_updates_df(spark).write.parquet(d)
    n_expected = account_updates_df(spark).count()
    for mode in ("collect", "iterate"):
        received: list = []
        lock = threading.Lock()

        def consumer(rows, epoch_id):
            with lock:
                received.extend(rows)

        stream = spark.readStream.schema(S.ACCOUNT_UPDATES_SCHEMA).parquet(d)
        q = foreach_batch_push(stream, consumer, mode=mode)
        q.awaitTermination(120)
        assert len(received) == n_expected, mode


def test_json_roundtrip_t9_t11(spark):
    """account update → routed JSON envelope → parsed back == input."""
    from solana_snapshot_etl_tools_spark.streaming.geyser import (
        account_update_stream,
        parse_account_update_json,
    )

    upd = account_update_stream(account_updates_df(spark), owners=None)
    envelope = upd.select(
        F.to_json(F.struct(*[F.col(c) for c in upd.columns])).alias("value")
    )
    back = parse_account_update_json(envelope)
    key = lambda df: sorted(tuple(map(repr, r)) for r in df.collect())
    assert key(back.select(*upd.columns)) == key(upd)


def test_load_snapshot_dispatch_http(spark, tmp_path, raw_accounts):
    """S3: serve the fixture snapshot tar over a local HTTP server and
    scan it through the URL dispatch path."""
    import functools
    import http.server
    import socketserver
    import tarfile

    from solana_snapshot_etl_tools_spark.sources import snapshot as SNAP
    from solana_snapshot_etl_tools_spark.sources.loader import load_snapshot
    from tests.test_snapshot_source import _write_snapshot_dir

    accounts_dir, manifest = _write_snapshot_dir(str(tmp_path))
    slot = max(s for s, _ in manifest)
    tar_path = str(tmp_path / "snap.tar")
    with tarfile.open(tar_path, "w") as tf:
        mpath = str(tmp_path / "manifest.bin")
        with open(mpath, "wb") as f:
            f.write(SNAP.write_accounts_db_fields(manifest))
        tf.add(mpath, arcname=f"snapshots/{slot}/{slot}")
        for name in sorted(os.listdir(accounts_dir)):
            tf.add(os.path.join(accounts_dir, name), arcname=f"accounts/{name}")

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    with socketserver.TCPServer(("127.0.0.1", 0), handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            df = load_snapshot(
                spark,
                f"http://127.0.0.1:{port}/snap.tar",
                str(tmp_path / "work"),
            )
            assert sorted(map(tuple, df.collect())) == sorted(
                map(tuple, raw_accounts.collect())
            )
        finally:
            srv.shutdown()


class TestSizedParquet:
    def test_row_bytes_estimate_is_sane(self, spark):
        from solana_snapshot_etl_tools_spark.operators.sinks import (
            estimate_parquet_row_bytes,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        est = estimate_parquet_row_bytes(docs)
        # the synthetic docs average hundreds of chars; zstd-encoded
        # parquet bytes/row must land in a plausible band, not a
        # schema-width guess (which would be ~16) nor raw chars (~1k+)
        assert 20 < est < 5000

        import pytest

        with pytest.raises(ValueError, match="empty"):
            estimate_parquet_row_bytes(docs.limit(0))

    def test_target_size_controls_file_count(self, spark, tmp_path):
        import glob

        from solana_snapshot_etl_tools_spark.operators.sinks import (
            estimate_parquet_row_bytes,
            write_sized_parquet,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        bpr = estimate_parquet_row_bytes(docs)
        n = docs.count()
        # pick a target that should yield ~4 files for this corpus
        target_mb = max(1, int(n * bpr / 4 / (1 << 20)))
        # sub-MB corpus: drive the math in bytes via a tiny target
        out = str(tmp_path / "sized")
        files = write_sized_parquet(docs, out, target_mb=target_mb)
        written = [
            f for f in glob.glob(f"{out}/*.parquet")
            if not f.rsplit("/", 1)[-1].startswith("_")
        ]
        assert len(written) == files >= 1
        got = spark.read.parquet(out)
        assert got.count() == n
        assert sorted(got.columns) == sorted(docs.columns)

    def test_huge_target_gives_one_file(self, spark, tmp_path):
        import glob

        from solana_snapshot_etl_tools_spark.operators.sinks import (
            write_sized_parquet,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path / "one")
        assert write_sized_parquet(docs, out, target_mb=10_000) == 1
        files = [
            f for f in glob.glob(f"{out}/*.parquet")
            if not f.rsplit("/", 1)[-1].startswith("_")
        ]
        assert len(files) == 1

    def test_order_col_makes_ranges_contiguous(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from solana_snapshot_etl_tools_spark.operators.sinks import (
            write_sized_parquet,
        )

        df = spark.range(100_000).withColumn("pad", F.lpad("id", 64, "x"))
        out = str(tmp_path / "ranged")
        files = write_sized_parquet(df, out, target_mb=1, order_col="id")
        if files > 1:
            spans = (
                spark.read.parquet(out)
                .groupBy(F.input_file_name().alias("f"))
                .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
                .orderBy("lo")
                .collect()
            )
            # non-overlapping [lo, hi] ranges per file
            for a, b in zip(spans, spans[1:]):
                assert a.hi < b.lo

    def test_cli_shard_target_mb(self, spark, tmp_path_factory, capsys):
        import json

        from solana_snapshot_etl_tools_spark import corpus_cli

        out = str(tmp_path_factory.mktemp("corpus_sized"))
        assert corpus_cli.main([
            "/root/testdata/sf0.001/documents.parquet", out,
            "--no-pii", "--shard-target-mb", "1",
        ]) == 0
        rep = json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )
        assert rep["records_per_shard"] >= 1
        # the derived cap actually reached the writer: no split dir
        # holds a file with more rows than the derived cap
        from pyspark.sql import functions as F

        for name, meta in rep["splits"].items():
            if meta["rows"]:
                per_file = (
                    spark.read.parquet(f"{out}/{name}")
                    .groupBy(F.input_file_name())
                    .count()
                    .agg(F.max("count"))
                    .collect()[0][0]
                )
                assert per_file <= rep["records_per_shard"]

    def test_cli_shard_target_mb_measures_packed_frame(
        self, spark, tmp_path_factory, capsys
    ):
        # review finding: the byte target must be derived from the
        # frame actually written (packed int sequences under
        # --tokenize), not the pre-tokenize text frame
        import json

        from pyspark.sql import functions as F

        from solana_snapshot_etl_tools_spark import corpus_cli

        out = str(tmp_path_factory.mktemp("corpus_sized_packed"))
        assert corpus_cli.main([
            "/root/testdata/sf0.001/documents.parquet", out,
            "--no-pii", "--tokenize", "300", "--pack", "64",
            "--shard-target-mb", "1",
        ]) == 0
        rep = json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )
        assert rep["records_per_shard"] >= 1
        packed = spark.read.parquet(f"{out}/train")
        assert "input_ids" in packed.columns
        per_file = (
            packed.groupBy(F.input_file_name()).count()
            .agg(F.max("count")).collect()[0][0]
        )
        assert per_file <= rep["records_per_shard"]
