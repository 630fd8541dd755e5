"""Corpus integrity manifest (operators/manifest.py)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import manifest as M

SRC = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def corpus(spark, tmp_path):
    out = str(tmp_path / "corpus")
    spark.read.parquet(SRC).repartition(4).write.parquet(out)
    return out


def test_record_then_verify_identical(spark, corpus, tmp_path):
    mf = str(tmp_path / "manifest.json")
    man = M.write_manifest(spark, corpus, mf)
    assert man["n_files"] == 4 and man["n_rows"] > 0
    rep = M.verify_corpus(spark, corpus, mf)
    assert rep["status"] == "identical"
    assert rep["n_missing"] == rep["n_extra"] == rep["n_changed"] == 0


def test_copied_corpus_verifies_green(spark, corpus, tmp_path):
    """The manifest must survive a byte-copy to a different parent
    directory — file identities are relative to the corpus root."""
    mf = str(tmp_path / "manifest.json")
    M.write_manifest(spark, corpus, mf)
    moved = str(tmp_path / "elsewhere" / "renamed_corpus")
    shutil.copytree(corpus, moved)
    rep = M.verify_corpus(spark, moved, mf)
    assert rep["status"] == "identical"


def test_recompaction_is_distinguished_from_change(spark, corpus, tmp_path):
    """Re-sharding the same rows fails per-file but passes the
    corpus-level sums — its own status, not a false alarm."""
    mf = str(tmp_path / "manifest.json")
    M.write_manifest(spark, corpus, mf)
    compacted = str(tmp_path / "compacted")
    spark.read.parquet(corpus).coalesce(1).write.parquet(compacted)
    rep = M.verify_corpus(spark, compacted, mf)
    assert rep["status"] == "relaid_out_content_identical"
    assert rep["content_sum_match"] is True
    assert rep["rows_found"] == rep["rows_expected"]


def test_tampered_row_is_content_changed(spark, corpus, tmp_path):
    mf = str(tmp_path / "manifest.json")
    M.write_manifest(spark, corpus, mf)
    tampered = str(tmp_path / "tampered")
    df = spark.read.parquet(corpus)
    df.withColumn(
        "text",
        F.when(F.col("doc_id") == df.select(F.min("doc_id")).first()[0],
               F.lit("TAMPERED")).otherwise(F.col("text")),
    ).coalesce(1).write.parquet(tampered)
    rep = M.verify_corpus(spark, tampered, mf)
    assert rep["status"] == "content_changed"


def test_dropped_rows_are_content_changed(spark, corpus, tmp_path):
    mf = str(tmp_path / "manifest.json")
    M.write_manifest(spark, corpus, mf)
    pruned = str(tmp_path / "pruned")
    df = spark.read.parquet(corpus)
    df.filter(F.col("doc_id") % 7 != 0).coalesce(1).write.parquet(pruned)
    rep = M.verify_corpus(spark, pruned, mf)
    assert rep["status"] == "content_changed"
    assert rep["rows_found"] < rep["rows_expected"]


def test_column_subset_identity(spark, corpus, tmp_path):
    """cols picks what DEFINES identity: a text edit passes a manifest
    keyed on doc_id only, and fails one keyed on (doc_id, text)."""
    mf_id = str(tmp_path / "m_id.json")
    M.write_manifest(spark, corpus, mf_id, cols=["doc_id"])
    edited = str(tmp_path / "edited")
    spark.read.parquet(corpus).withColumn(
        "text", F.upper(F.col("text"))
    ).coalesce(1).write.parquet(edited)
    rep = M.verify_corpus(spark, edited, mf_id)
    assert rep["status"] == "relaid_out_content_identical"
    mf_full = str(tmp_path / "m_full.json")
    M.write_manifest(spark, corpus, mf_full, cols=["doc_id", "text"])
    assert M.verify_corpus(spark, edited, mf_full)["status"] == (
        "content_changed"
    )


def test_cli_manifest_out(spark, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("corpus_manifest"))
    assert corpus_cli.main([SRC, out, "--no-pii", "--manifest-out"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rep = json.loads(lines[-1])
    assert set(rep["manifests"]) == {"train", "val", "test"}
    # the written manifest verifies the written split
    rep2 = M.verify_corpus(
        spark, f"{out}/train", f"{out}/manifest_train.json"
    )
    assert rep2["status"] == "identical"
    assert rep2["rows_found"] == rep["manifests"]["train"]["n_rows"]


def test_cli_verify_manifests_mode(spark, tmp_path_factory, capsys):
    """--verify-manifests: green on an untouched run, exit 3 after a
    split's content changes."""
    import json

    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("corpus_vm"))
    scratch = str(tmp_path_factory.mktemp("corpus_vm_rep"))
    assert corpus_cli.main([SRC, out, "--no-pii", "--manifest-out"]) == 0
    capsys.readouterr()
    assert corpus_cli.main([out, scratch, "--verify-manifests"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rep = json.loads(lines[-1])
    v = rep["manifest_verification"]
    assert set(v) == {"train", "val", "test"}
    assert all(r["status"] == "identical" for r in v.values())
    # tamper the train split -> the gate trips with exit code 3
    # (localCheckpoint materializes BEFORE the overwrite of the very
    # path the plan reads from)
    train = spark.read.parquet(f"{out}/train").localCheckpoint()
    train.withColumn("text", F.concat(F.col("text"), F.lit("!"))) \
        .coalesce(1).write.mode("overwrite").parquet(f"{out}/train")
    assert corpus_cli.main([out, scratch, "--verify-manifests"]) == 3
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rep2 = json.loads(lines[-1])
    assert rep2["manifest_verification"]["train"]["status"] == (
        "content_changed"
    )
    # no manifests -> loud
    import pytest
    empty = str(tmp_path_factory.mktemp("corpus_vm_empty"))
    with pytest.raises(SystemExit, match="no manifest"):
        corpus_cli.main([empty, scratch, "--verify-manifests"])


def test_unknown_columns_and_version_are_loud(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="not in corpus"):
        M.file_manifest(spark, corpus, cols=["nope"])
    mf = str(tmp_path / "m.json")
    man = M.write_manifest(spark, corpus, mf)
    man["version"] = 99
    import json
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="version"):
        M.read_manifest(bad)


def test_trailing_slash_root_keys_match_canonical(spark, corpus, tmp_path):
    """A trailing-slash root must yield the SAME per-file keys as the
    canonical form: the length-based strip chopped the first character
    of every key (and could collide distinct files) before the
    _norm_path rstrip fix."""
    canon = M.file_manifest(spark, corpus).collect()
    slashed = M.file_manifest(spark, corpus + "/").collect()
    assert {r.file for r in canon} == {r.file for r in slashed}
    assert all(r.file.startswith("part-") for r in canon)


def test_record_with_slash_verify_without(spark, corpus, tmp_path):
    """Mixed-form record/verify must still report 'identical', not a
    spurious 'relaid_out_content_identical'."""
    mf = str(tmp_path / "manifest.json")
    M.write_manifest(spark, corpus + "/", mf)
    rep = M.verify_corpus(spark, corpus, mf)
    assert rep["status"] == "identical"
    rep2 = M.verify_corpus(spark, corpus + "//", mf)
    assert rep2["status"] == "identical"


def test_uri_encoded_corpus_dir(spark, tmp_path):
    """input_file_name() URI-encodes (space → %20, '+' stays '+');
    a corpus dir containing both must still produce clean relative
    keys and verify across a copy to another encoded dir."""
    src = str(tmp_path / "with space+plus" / "corpus")
    spark.read.parquet(SRC).repartition(2).write.parquet(src)
    rows = M.file_manifest(spark, src).collect()
    assert all(r.file.startswith("part-") for r in rows)
    assert all("%" not in r.file and "/" not in r.file for r in rows)
    mf = str(tmp_path / "manifest.json")
    M.write_manifest(spark, src, mf)
    moved = str(tmp_path / "other area+2" / "corpus")
    shutil.copytree(src, moved)
    rep = M.verify_corpus(spark, moved, mf)
    assert rep["status"] == "identical"


def test_norm_path_forms():
    assert M._norm_path("/a/b/") == "/a/b"
    assert M._norm_path("file:///a/b") == "/a/b"
    assert M._norm_path("file:/a/b///") == "/a/b"
    assert M._norm_path("/") == "/"
