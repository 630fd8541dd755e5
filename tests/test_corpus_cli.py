"""corpus_cli end-to-end on the real sf0.001 corpus: report contract,
stage monotonicity, split disjointness, and the tokenize+pack path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark import corpus_cli

SRC = "/root/testdata/sf0.001/documents.parquet"


def _run(capsys, *argv):
    assert corpus_cli.main(list(argv)) == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    return json.loads(out[-1])


def test_document_pipeline_end_to_end(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("corpus_docs"))
    rep = _run(capsys, SRC, out, "--near-dedup", "--records-per-shard", "100")
    assert rep["n_input"] >= rep["n_after_dedup"] >= rep["n_after_filters"] > 0
    sizes = {k: v["rows"] for k, v in rep["splits"].items()}
    assert sum(sizes.values()) == rep["n_after_filters"]
    assert sizes["train"] > sizes["val"] >= 0
    # written shards are a disjoint id partition with the clean schema
    frames = {k: spark.read.parquet(f"{out}/{k}") for k in sizes if sizes[k]}
    ids = [r.doc_id for df in frames.values() for r in df.select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == rep["n_after_filters"]
    for df in frames.values():
        assert df.columns == ["doc_id", "text", "n_tokens"]
        assert df.filter(F.col("text").isNull()).count() == 0


def test_gopher_flag_tightens_the_filter(spark, tmp_path_factory, capsys):
    out1 = str(tmp_path_factory.mktemp("corpus_base"))
    out2 = str(tmp_path_factory.mktemp("corpus_gopher"))
    out3 = str(tmp_path_factory.mktemp("corpus_gopher_relaxed"))
    base = _run(capsys, SRC, out1, "--no-pii")
    # the faithful A1.1 stop-word list rejects the synthetic word-salad
    # corpus outright (by design); the pipeline must survive that
    strict = _run(capsys, SRC, out2, "--no-pii", "--gopher")
    assert strict["n_after_filters"] == 0
    # a per-corpus stop list keeps the flag usable on this corpus
    relaxed = _run(
        capsys, SRC, out3, "--no-pii", "--gopher",
        "--gopher-stopwords", "the,scan,join,sort,window",
    )
    assert 0 < relaxed["n_after_filters"] <= base["n_after_filters"]


def test_cluster_balance_stage(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("corpus_balanced"))
    rep = _run(
        capsys,
        SRC,
        out,
        "--no-pii",
        "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
        "--cluster-balance", "3",
        "--records-per-shard", "100",
    )
    assert len(rep["cluster_sizes"]) == 3
    assert 0 < rep["n_after_balance"] <= rep["n_after_filters"]
    sizes = {k: v["rows"] for k, v in rep["splits"].items()}
    assert sum(sizes.values()) == rep["n_after_balance"]
    # the split hash must be INDEPENDENT of the sampler's acceptance
    # hash: a knuth-keyed split after knuth-keyed balancing routed
    # ~all survivors into train (the affine-correlation bug) — val and
    # test must retain their expected share
    assert sizes["val"] + sizes["test"] >= 0.02 * rep["n_after_balance"]
    assert sizes["train"] >= 0.7 * rep["n_after_balance"]


def test_cluster_balance_missing_embeddings_pass_through(spark, tmp_path_factory, capsys):
    """Docs absent from the embeddings table must survive unsampled —
    and must NOT form a competing minimum stratum that collapses the
    balanced corpus."""
    import pyspark.sql.functions as SF

    src_docs = "/root/testdata/sf0.001/documents.parquet"
    emb_half = str(tmp_path_factory.mktemp("emb_half") / "emb.parquet")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        SF.col("vec_id") % 2 == 0
    ).write.parquet(emb_half)
    out = str(tmp_path_factory.mktemp("corpus_half"))
    rep = _run(
        capsys,
        src_docs, out, "--no-pii",
        "--embeddings", emb_half,
        "--cluster-balance", "3",
    )
    # roughly half the filtered docs lack an embedding; they all pass
    # through, so the balanced corpus can never collapse below them
    assert rep["n_after_balance"] >= 0.4 * rep["n_after_filters"]


def test_tokenize_and_pack_path(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("corpus_packed"))
    rep = _run(
        capsys,
        SRC,
        out,
        "--no-pii",
        "--tokenize", "64",
        "--pack", "128",
        "--records-per-shard", "200",
    )
    assert rep["vocab_size"] > 64
    train = spark.read.parquet(f"{out}/train")
    assert train.columns == ["seq_id", "input_ids", "n_tokens", "n_docs", "fill_frac"]
    # every sequence except at most the last is exactly seq_len
    assert train.filter("n_tokens != 128").count() <= 1
    assert rep["splits"]["train"]["rows"] == train.count() > 0
