"""--output-format jsonl: gzipped JSON-lines training shards."""

from __future__ import annotations

import glob
import gzip
import json

import pytest

from solana_snapshot_etl_tools_spark import corpus_cli

SRC = "/root/testdata/sf0.001/documents.parquet"


def _run(capsys, *argv):
    assert corpus_cli.main(list(argv)) == 0
    return json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )


def test_jsonl_splits_match_parquet_run(spark, tmp_path_factory, capsys):
    outp = str(tmp_path_factory.mktemp("jl_parquet"))
    outj = str(tmp_path_factory.mktemp("jl_jsonl"))
    rep_p = _run(capsys, SRC, outp, "--no-pii")
    rep_j = _run(capsys, SRC, outj, "--no-pii", "--output-format", "jsonl")
    assert rep_j["splits"]["train"]["format"] == "jsonl"
    for name in ("train", "val", "test"):
        assert rep_j["splits"][name]["rows"] == rep_p["splits"][name]["rows"]
    # the shards are real gzipped JSON lines a loader ingests directly
    files = glob.glob(f"{outj}/train/part-*.json.gz")
    assert files
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert len(rows) == rep_j["splits"]["train"]["rows"]
    assert all({"doc_id", "text"} <= set(r) for r in rows)
    # content identity with the parquet run's train split
    pq_ids = {r.doc_id for r in spark.read.parquet(f"{outp}/train").collect()}
    assert {r["doc_id"] for r in rows} == pq_ids


def test_jsonl_packed_token_shards(spark, tmp_path_factory, capsys):
    """Tokenize+pack to jsonl: int-array rows serialize as JSON arrays
    — the exact shape a training loader's collate step wants."""
    out = str(tmp_path_factory.mktemp("jl_pack"))
    rep = _run(capsys, SRC, out, "--no-pii", "--tokenize", "50",
               "--pack", "128", "--output-format", "jsonl")
    assert rep["splits"]["train"]["rows"] > 0
    f = sorted(glob.glob(f"{out}/train/part-*.json.gz"))[0]
    with gzip.open(f, "rt") as fh:
        row = json.loads(fh.readline())
    assert isinstance(row["input_ids"], list)
    assert all(isinstance(t, int) for t in row["input_ids"])


def test_jsonl_rejects_parquet_only_stages(tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("jl_rej"))
    for extra in (["--bucket-by", "doc_id"],
                  ["--zorder", "doc_id,n_chars"],
                  ["--manifest-out"]):
        with pytest.raises(SystemExit):
            corpus_cli.main([SRC, out, "--output-format", "jsonl", *extra])
        err = capsys.readouterr().err
        assert "--output-format jsonl" in err
    with pytest.raises(SystemExit):
        corpus_cli.main([SRC, out, "--ingest-stream",
                         "--index-out", f"{out}/idx",
                         "--output-format", "jsonl"])
    assert "--output-format" in capsys.readouterr().err
