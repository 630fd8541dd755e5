"""Right-to-be-forgotten purge (operators/purge.py + CLI --purge-ids)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark import corpus_cli

SRC = "/root/testdata/sf0.001/documents.parquet"


def _run(capsys, *argv):
    assert corpus_cli.main(list(argv)) == 0
    return json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )


@pytest.fixture()
def stream_state(spark, tmp_path_factory, capsys):
    """A real two-batch ingest-stream state (corpus + profile + index
    + sigs + bloom) to purge against."""
    base = tmp_path_factory.mktemp("purge_state")
    docs = (
        spark.read.parquet(SRC).select("doc_id", "text")
        .orderBy("doc_id").limit(80)
    )
    src = str(base / "arrivals")
    os.makedirs(src)
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out, idx = str(base / "out"), str(base / "idx")
    rep = _run(capsys, src, out, "--ingest-stream", "--index-out", idx,
               "--no-pii", "--quality", "0", "--lang", "", "--profile")
    assert rep["n_corpus"] == 80
    return base, out, idx, docs


def test_purge_removes_from_every_store(spark, stream_state, capsys):
    base, out, idx, docs = stream_state
    victims = [r.doc_id for r in docs.limit(5).collect()]
    flist = str(base / "purge.txt")
    with open(flist, "w") as fh:
        fh.write("\n".join(str(v) for v in victims) + "\n")
    n_idx_before = spark.read.parquet(f"{idx}/index").count()
    rep = _run(capsys, out, str(base / "audit"), "--purge-ids", flist,
               "--index-out", idx)
    a = rep["purge"]
    assert a["n_ids_requested"] == 5
    assert a["n_corpus_rows_removed"] == 5
    assert a["n_signature_rows_removed"] == 5
    assert a["n_index_rows_removed"] > 0
    assert a["bloom_rebuilt"] is True
    # the stores really no longer contain the victims
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == 75
    assert corpus.filter(F.col("doc_id").isin(victims)).count() == 0
    assert spark.read.parquet(f"{idx}/sigs").filter(
        F.col("doc").isin(victims)
    ).count() == 0
    assert spark.read.parquet(f"{idx}/index").count() == n_idx_before - a[
        "n_index_rows_removed"
    ]
    # profile partials recomputed: merged doc count reflects the purge
    from solana_snapshot_etl_tools_spark.operators.profile import (
        merge_profiles,
        profile_estimates,
    )

    est = profile_estimates(
        merge_profiles(spark.read.parquet(f"{out}/profile"))
    ).collect()[0]
    assert est.n_docs == 75
    # a RE-INGEST of a purged doc is accepted again (the index no
    # longer blocks it) — the semantic test that the purge is real
    src = str(base / "arrivals")
    time.sleep(1.1)
    docs.filter(F.col("doc_id") == victims[0]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    rep2 = _run(capsys, src, out, "--ingest-stream", "--index-out", idx,
                "--no-pii", "--quality", "0", "--lang", "")
    assert rep2["n_corpus"] == 76
    # the tombstone log records exactly the purged ids
    log = spark.read.parquet(f"{out}/purge_log")
    assert sorted(r.doc_id for r in log.collect()) == sorted(victims)
    assert all(r.purged_at is not None for r in log.collect())


def test_purge_emptied_batch_partition_is_removed(spark, stream_state, capsys):
    base, out, idx, docs = stream_state
    # victims = the ENTIRE first batch (even doc_ids)
    victims = [r.doc_id for r in docs.filter(F.col("doc_id") % 2 == 0).collect()]
    flist = str(base / "purge_all_b0.txt")
    with open(flist, "w") as fh:
        fh.write("\n".join(str(v) for v in victims) + "\n")
    rep = _run(capsys, out, str(base / "audit2"), "--purge-ids", flist,
               "--index-out", idx)
    a = rep["purge"]
    assert a["n_corpus_rows_removed"] == len(victims)
    assert a["corpus_batches_emptied"] == [0]
    assert not os.path.isdir(f"{out}/corpus/batch=0")
    assert not os.path.isdir(f"{out}/profile/batch=0")
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == 80 - len(victims)
    assert corpus.select("batch").distinct().collect()[0].batch == 1


def test_purge_guards(spark, tmp_path, capsys):
    empty = str(tmp_path / "empty.txt")
    open(empty, "w").close()
    with pytest.raises(SystemExit, match="empty"):
        corpus_cli.main([str(tmp_path), str(tmp_path / "o"),
                         "--purge-ids", empty])
    # rejected as a stage inside the ingest run
    lst = str(tmp_path / "one.txt")
    with open(lst, "w") as fh:
        fh.write("1\n")
    with pytest.raises(SystemExit):
        corpus_cli.main([str(tmp_path), str(tmp_path / "o"),
                         "--ingest-stream", "--index-out", str(tmp_path / "i"),
                         "--purge-ids", lst])
    assert "--purge-ids" in capsys.readouterr().err


def test_purge_index_only_state(spark, tmp_path, capsys):
    """A state with an index but no corpus store (e.g. built by batch
    --index-out runs) purges cleanly: corpus count 0, index rewritten."""
    from solana_snapshot_etl_tools_spark.operators.incremental import (
        build_index,
        signature_table,
    )
    from solana_snapshot_etl_tools_spark.operators.purge import purge_ids

    docs = (
        spark.read.parquet(SRC).select("doc_id", "text")
        .orderBy("doc_id").limit(40)
    )
    idx = str(tmp_path / "idx")
    build_index(docs).write.parquet(f"{idx}/index")
    signature_table(docs).write.parquet(f"{idx}/sigs")
    victims = spark.createDataFrame(
        [(r.doc_id,) for r in docs.limit(3).collect()], "doc_id long"
    )
    audit = purge_ids(spark, str(tmp_path / "state"), victims, index_dir=idx)
    assert audit["n_corpus_rows_removed"] == 0
    assert audit["n_index_rows_removed"] > 0
    assert audit["n_signature_rows_removed"] == 3
    got = {r.doc for r in spark.read.parquet(f"{idx}/index").select("doc").distinct().collect()}
    assert got.isdisjoint({r.doc_id for r in victims.collect()})


@pytest.mark.slow
def test_governance_capstone_monitor_then_takedown(
    spark, tmp_path_factory, capsys
):
    """The round-15 governance loop end-to-end on one state:
    (1) a batch run records the drift reference artifact;
    (2) the ingest stream runs WITH the per-arrival drift monitor;
    (3) a takedown purges ids from every store (tombstoned);
    (4) a rerun of the stream with no new arrivals is a no-op on the
        purged corpus (the checkpoint does not resurrect the victims)
        and the drift log survives untouched."""
    import time as _t

    base = tmp_path_factory.mktemp("governance")
    src0 = "/root/testdata/sf0.001/documents.parquet"

    # (1) reference histogram from a batch run
    ref_out = str(base / "ref")
    _run(capsys, src0, ref_out, "--no-pii", "--drift-save")

    # (2) stream ingest with the drift monitor
    docs = (
        spark.read.parquet(src0).select("doc_id", "text")
        .orderBy("doc_id").limit(60)
    )
    src = str(base / "arrivals")
    os.makedirs(src)
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _t.sleep(1.1)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out, idx = str(base / "out"), str(base / "idx")
    rep = _run(capsys, src, out, "--ingest-stream", "--index-out", idx,
               "--no-pii", "--quality", "0", "--lang", "",
               "--drift-reference", f"{ref_out}/drift_hist")
    assert rep["n_corpus"] == 60
    assert set(rep["drift_log"]) == {"0", "1"}

    # (3) takedown
    victims = [r.doc_id for r in docs.limit(4).collect()]
    flist = str(base / "takedown.txt")
    with open(flist, "w") as fh:
        fh.write("\n".join(str(v) for v in victims) + "\n")
    prep = _run(capsys, out, str(base / "audit"), "--purge-ids", flist,
                "--index-out", idx)
    assert prep["purge"]["n_corpus_rows_removed"] == 4
    log = spark.read.parquet(f"{out}/purge_log")
    assert log.count() == 4

    # (4) replay: no new arrivals — victims stay gone, drift log intact
    drift_rows = spark.read.parquet(f"{out}/drift_log").count()
    rep2 = _run(capsys, src, out, "--ingest-stream", "--index-out", idx,
                "--no-pii", "--quality", "0", "--lang", "",
                "--drift-reference", f"{ref_out}/drift_hist")
    assert rep2["n_corpus"] == 56
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.filter(F.col("doc_id").isin(victims)).count() == 0
    assert spark.read.parquet(f"{out}/drift_log").count() == drift_rows
