"""corpus_diff / diff_summary and the CLI --diff-against gate."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators.diff import (
    corpus_diff,
    diff_summary,
)


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [("a", "same"), ("b", "before"), ("c", "gone")],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [("a", "same"), ("b", "after"), ("d", "fresh")],
        "doc_id string, text string",
    )
    rows = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert rows == {
        "a": "unchanged", "b": "changed", "c": "removed", "d": "added",
    }
    assert diff_summary(old, new) == {
        "added": 1, "removed": 1, "changed": 1, "unchanged": 1,
    }


def test_identity_diff_is_all_unchanged(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = diff_summary(docs, docs)
    assert s["added"] == s["removed"] == s["changed"] == 0
    assert s["unchanged"] == docs.count()


def test_no_text_shuffle_in_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = corpus_diff(docs, docs.limit(10))
    plan = d._jdf.queryExecution().executedPlan().toString()
    # the exchanges move hashes, not text: no text attribute survives
    # past the pre-join projections
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_validation(spark):
    docs = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="lacks column"):
        corpus_diff(docs.drop("text"), docs)


def test_cli_diff_against_prior_run(spark, tmp_path_factory, capsys):
    from solana_snapshot_etl_tools_spark import corpus_cli

    src = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path_factory.mktemp("run1"))
    out2 = str(tmp_path_factory.mktemp("run2"))

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )

    base = run(src, out1, "--no-pii")
    # identical rerun: the regression gate reports NOTHING moved
    rep = run(src, out2, "--no-pii", "--diff-against", out1)
    assert rep["diff"]["added"] == rep["diff"]["removed"] == 0
    assert rep["diff"]["changed"] == 0
    assert rep["diff"]["unchanged"] == base["n_after_filters"]
    # a parameter change moves a population and the diff SEES it
    out3 = str(tmp_path_factory.mktemp("run3"))
    rep3 = run(src, out3, "--no-pii", "--quality", "0.9",
               "--diff-against", out1)
    assert rep3["diff"]["removed"] > 0
    assert rep3["diff"]["added"] == 0
