"""Corpus distribution drift (operators/drift.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import drift as DR
from solana_snapshot_etl_tools_spark.plans.relational import _t
from tests.conftest import SF_DIR


def test_identical_corpora_read_stable(spark):
    docs = _t(spark, SF_DIR, "documents")
    s = {r.feature: (r.psi, r.level)
         for r in DR.drift_summary(
             DR.corpus_drift(docs, docs, lang_col="lang")
         ).collect()}
    assert set(s) == {
        "len_log2", "punct_ratio", "digit_ratio", "upper_ratio", "lang"
    }
    for psi, level in s.values():
        assert abs(psi) < 1e-12 and level == "stable"


def test_planted_shift_is_major_and_localized(spark):
    """Shift every doc to ALL-CAPS short digit strings: upper_ratio,
    digit_ratio and len_log2 must read major; the report names the
    one-sided bins with large psi terms."""
    docs = _t(spark, SF_DIR, "documents")
    shifted = docs.withColumn(
        "text", F.concat(F.lit("12345 SHOUTING "), F.upper(F.substring("text", 1, 8)))
    )
    d = DR.corpus_drift(docs, shifted)
    s = {r.feature: r.level for r in DR.drift_summary(d).collect()}
    assert s["upper_ratio"] == "major"
    assert s["digit_ratio"] == "major"
    assert s["len_log2"] == "major"
    # every psi term is finite despite one-sided bins (Laplace)
    assert all(
        r.psi_term is not None and math.isfinite(r.psi_term)
        for r in d.collect()
    )


def test_new_language_is_one_sided_but_finite(spark):
    old = spark.createDataFrame(
        [("hello world", "en")] * 50, "text string, lang string"
    )
    new = spark.createDataFrame(
        [("hello world", "en")] * 25 + [("hallo welt", "de")] * 25,
        "text string, lang string",
    )
    d = DR.corpus_drift(old, new, lang_col="lang")
    lang_rows = {r.bin: r for r in d.filter(F.col("feature") == "lang").collect()}
    assert lang_rows["de"].n_old == 0 and lang_rows["de"].n_new == 25
    assert math.isfinite(lang_rows["de"].psi_term) and lang_rows["de"].psi_term > 0
    s = {r.feature: r.level for r in DR.drift_summary(d).collect()}
    assert s["lang"] == "major"
    # text itself unchanged: character features stay stable
    assert s["punct_ratio"] == "stable"


def test_psi_matches_hand_computation(spark):
    """Two-bin hand case: PSI from the report equals the formula
    computed directly on the smoothed shares."""
    old = spark.createDataFrame([("en",)] * 90 + [("de",)] * 10, "lang string")
    new = spark.createDataFrame([("en",)] * 50 + [("de",)] * 50, "lang string")
    old = old.withColumn("text", F.lit("x"))
    new = new.withColumn("text", F.lit("x"))
    d = DR.corpus_drift(old, new, lang_col="lang")
    got = (
        DR.drift_summary(d)
        .filter(F.col("feature") == "lang")
        .first()
        .psi
    )
    po_en, po_de = (90 + 0.5) / 101, (10 + 0.5) / 101
    pn_en, pn_de = (50 + 0.5) / 101, (50 + 0.5) / 101
    want = (pn_en - po_en) * math.log(pn_en / po_en) + (
        pn_de - po_de
    ) * math.log(pn_de / po_de)
    assert abs(got - want) < 1e-12


def test_histogram_plan_is_narrow(spark):
    """The histogram never shuffles text: the only exchange keys are
    (feature, bin) — machine-checks the documented scale shape."""
    docs = _t(spark, SF_DIR, "documents")
    plan = (
        DR.feature_histograms(docs, lang_col="lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
    assert "BatchEvalPython" not in plan


def test_cli_drift_against_prior_run(spark, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    src = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path_factory.mktemp("drun1"))
    out2 = str(tmp_path_factory.mktemp("drun2"))

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )

    run(src, out1, "--no-pii")
    # identical rerun: every feature reads stable with ~zero PSI
    rep = run(src, out2, "--no-pii", "--drift-against", out1)
    assert set(rep["drift"]) >= {
        "len_log2", "punct_ratio", "digit_ratio", "upper_ratio"
    }
    assert all(v["level"] == "stable" for v in rep["drift"].values())
    assert all(abs(v["psi"]) < 1e-6 for v in rep["drift"].values())
    # per-bin detail persisted
    bins = spark.read.parquet(f"{out2}/drift_bins")
    assert bins.count() > 0
    assert {"feature", "bin", "psi_term"} <= set(bins.columns)
    # an aggressive quality cut shifts the kept-length distribution
    # and the report SEES it (non-stable or at least larger PSI)
    out3 = str(tmp_path_factory.mktemp("drun3"))
    rep3 = run(src, out3, "--no-pii", "--quality", "0.9",
               "--drift-against", out1)
    assert rep3["drift"]["len_log2"]["psi"] > rep["drift"]["len_log2"]["psi"]


def test_cli_drift_rejected_on_stream(spark, tmp_path_factory, capsys):
    import pytest as _pt

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("dstream"))
    with _pt.raises(SystemExit):
        corpus_cli.main([
            "/root/testdata/sf0.001/documents.parquet", out,
            "--ingest-stream", "--index-out", f"{out}/idx",
            "--drift-against", out,
        ])
    assert "--drift-against" in capsys.readouterr().err


def test_drift_vs_reference_matches_corpus_drift(spark):
    """The persisted-histogram path computes the SAME report as the
    two-corpus path — the reference scan is just amortized."""
    docs = _t(spark, SF_DIR, "documents")
    shifted = docs.withColumn("text", F.upper("text"))
    direct = {
        (r.feature, r.bin): r.psi_term
        for r in DR.corpus_drift(docs, shifted, lang_col="lang").collect()
    }
    ref = DR.feature_histograms(docs, lang_col="lang")
    via_ref = {
        (r.feature, r.bin): r.psi_term
        for r in DR.drift_vs_reference(shifted, ref).collect()
    }
    assert via_ref == direct


def test_drift_vs_reference_drops_lang_when_new_lacks_it(spark):
    docs = _t(spark, SF_DIR, "documents")
    ref = DR.feature_histograms(docs, lang_col="lang")
    feats = {
        r.feature
        for r in DR.drift_vs_reference(docs.drop("lang"), ref)
        .select("feature").distinct().collect()
    }
    assert "lang" not in feats and "len_log2" in feats


@pytest.mark.slow
def test_cli_drift_save_then_reference_compare(spark, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    src = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path_factory.mktemp("dref1"))
    out2 = str(tmp_path_factory.mktemp("dref2"))
    out3 = str(tmp_path_factory.mktemp("dref3"))

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )

    rep1 = run(src, out1, "--no-pii", "--drift-save")
    assert rep1["drift_hist_saved"] is True
    hist = spark.read.parquet(f"{out1}/drift_hist")
    assert {"feature", "bin", "n"} <= set(hist.columns)
    # corpus-vs-corpus and corpus-vs-artifact agree
    rep_corpus = run(src, out2, "--no-pii", "--drift-against", out1)
    rep_artifact = run(src, out3, "--no-pii",
                       "--drift-against", f"{out1}/drift_hist")
    assert rep_artifact["drift"] == rep_corpus["drift"]
    assert all(v["level"] == "stable" for v in rep_artifact["drift"].values())


@pytest.mark.slow
def test_stream_drift_reference_monitor(spark, tmp_path_factory, capsys):
    """--drift-reference on the ingest stream: per-batch PSI rows
    appended to OUT_DIR/drift_log (replay-idempotent — a rerun with no
    new arrivals recomputes nothing), batches monitored against the
    kilobyte --drift-save artifact, never the reference corpus."""
    import json
    import os
    import time

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("stream_drift")
    src0 = "/root/testdata/sf0.001/documents.parquet"

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )

    # reference: a batch run over the full docs table with --drift-save
    ref_out = str(base / "ref")
    run(src0, ref_out, "--no-pii", "--drift-save")

    docs = (
        spark.read.parquet(src0).select("doc_id", "text")
        .orderBy("doc_id").limit(120)
    )
    src = str(base / "arrivals")
    os.makedirs(src)
    # shard 1: in-distribution sample; shard 2: shouting digits
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.concat(F.lit("111 222 333 "), F.upper(F.substring("text", 1, 6))).alias("text"),
    ).coalesce(1).write.mode("append").parquet(src)

    out, idx = str(base / "out"), str(base / "idx")
    rep = run(src, out, "--ingest-stream", "--index-out", idx,
              "--no-pii", "--quality", "0", "--lang", "",
              "--drift-reference", f"{ref_out}/drift_hist")
    assert set(rep["drift_log"]) == {"0", "1"}
    # the shouting-digits batch alarms; the in-distribution one reads
    # at most moderate (it is a small SAMPLE of the reference corpus)
    assert rep["drift_log"]["1"]["worst_level"] == "major"
    assert rep["drift_log"]["1"]["max_psi"] > rep["drift_log"]["0"]["max_psi"]
    log = spark.read.parquet(f"{out}/drift_log")
    assert {"feature", "psi", "level", "batch"} <= set(log.columns)
    n_rows = log.count()
    # rerun with no new arrivals: log unchanged (idempotent)
    rep2 = run(src, out, "--ingest-stream", "--index-out", idx,
               "--no-pii", "--quality", "0", "--lang", "",
               "--drift-reference", f"{ref_out}/drift_hist")
    assert spark.read.parquet(f"{out}/drift_log").count() == n_rows
    assert rep2["drift_log"] == rep["drift_log"]


def test_drift_reference_rejected_in_batch_mode(tmp_path_factory, capsys):
    import pytest as _pt

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("dref_rej"))
    with _pt.raises(SystemExit):
        corpus_cli.main(["/root/testdata/sf0.001/documents.parquet", out,
                         "--drift-reference", out])
    assert "--drift-reference" in capsys.readouterr().err
