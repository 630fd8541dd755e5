"""Model-based quality filter: planted separation recovered, scoring
contract, deterministic Pareto keep rule, save/load roundtrip."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import quality_model as QM

WORDS = (
    "the quick brown fox jumps over a lazy dog while many fine people "
    "read good books about science history art music and nature every day"
).split()
JUNK = ["@@@@", "!!##$$", "zzzz", "0101010101", "%%%", "~~~~~", "####", "&&&&"]


def _clean(i: int) -> str:
    w = [WORDS[(i * 7 + k * 3) % len(WORDS)] for k in range(25)]
    return " ".join(w)


def _junk(i: int) -> str:
    t = [JUNK[(i + k) % len(JUNK)] for k in range(25)]
    return " ".join(t)


def _corpus(spark, n=120, start=0):
    rows = [(start + i, _clean(i), 1.0) for i in range(n)] + [
        (start + n + i, _junk(i), 0.0) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def model(spark):
    return QM.quality_model_train(_corpus(spark), dim=2**14, max_iter=50)


def test_recovers_planted_separation(spark, model):
    held_out = _corpus(spark, n=40, start=10_000)
    scored = QM.quality_model_score(held_out, model)
    rows = scored.join(held_out.select("doc_id", "label"), "doc_id").collect()
    acc = sum(
        1 for r in rows if (r.quality_prob >= 0.5) == (r.label == 1.0)
    ) / len(rows)
    assert acc >= 0.95
    # and the margins are confident, not coin flips
    mean_pos = sum(r.quality_prob for r in rows if r.label == 1.0) / 40
    mean_neg = sum(r.quality_prob for r in rows if r.label == 0.0) / 40
    assert mean_pos > 0.9 > 0.1 > mean_neg


def test_score_contract(spark, model):
    docs = spark.createDataFrame(
        [(1, "good people read books", "x"), (2, None, "y")],
        "doc_id long, text string, extra string",
    )
    out = QM.quality_model_score(docs, model)
    assert out.columns == ["doc_id", "text", "extra", "quality_prob"]
    rows = {r.doc_id: r for r in out.collect()}
    assert 0.0 <= rows[1].quality_prob <= 1.0
    assert rows[2].quality_prob is not None  # null text scores as empty
    assert rows[2].extra == "y"


def test_pareto_keep_is_deterministic_and_monotone(spark):
    n = 4000
    scored = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # scores spread over [0, 1)
        (F.pmod(F.col("id") * 37, F.lit(100)) / 100.0).alias("quality_prob"),
    )
    kept1 = {r.doc_id for r in QM.pareto_keep(scored, alpha=9.0).collect()}
    kept2 = {r.doc_id for r in QM.pareto_keep(scored, alpha=9.0).collect()}
    assert kept1 == kept2  # rerun-identical
    kept_other_seed = {
        r.doc_id for r in QM.pareto_keep(scored, alpha=9.0, seed=7).collect()
    }
    assert kept_other_seed != kept1  # but seed-dependent
    # keep rate rises with score, and the low tail LEAKS (no cliff)
    by_bucket = (
        QM.pareto_keep(scored, alpha=9.0)
        .groupBy((F.col("quality_prob") * 4).cast("int").alias("b"))
        .count()
        .collect()
    )
    counts = {r.b: r["count"] for r in by_bucket}
    assert counts.get(3, 0) > counts.get(0, 0) > 0
    # analytic check: with Lomax-Pareto(alpha), P(keep | score s) =
    # P(X > 1-s) = (2-s)^(-alpha) — the total kept count must match
    # the analytic expectation over the score distribution
    scores = [((i * 37) % 100) / 100.0 for i in range(n)]
    expect = sum((2.0 - s) ** -9.0 for s in scores)
    assert abs(len(kept1) - expect) < 5 * math.sqrt(expect)


def test_filter_threshold_vs_pareto(spark, model):
    docs = _corpus(spark, n=30, start=50_000).drop("label")
    hard = QM.quality_model_filter(docs, model, threshold=0.5)
    # the hard cut keeps (essentially) the clean half only
    assert abs(hard.count() - 30) <= 2
    soft = QM.quality_model_filter(docs, model, alpha=2.0, seed=3)
    # the soft rule keeps the clean half AND leaks some junk
    assert soft.count() >= hard.count()
    with pytest.raises(ValueError):
        QM.quality_model_filter(docs, model, threshold=None, alpha=None)
    with pytest.raises(ValueError):
        QM.pareto_keep(docs.withColumn("quality_prob", F.lit(0.5)), alpha=0)


def test_model_save_load_roundtrip(spark, model, tmp_path_factory):
    from pyspark.ml import PipelineModel

    path = str(tmp_path_factory.mktemp("qmodel") / "m")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    docs = _corpus(spark, n=10, start=90_000).drop("label")
    a = {r.doc_id: r.quality_prob for r in QM.quality_model_score(docs, model).collect()}
    b = {r.doc_id: r.quality_prob for r in QM.quality_model_score(docs, loaded).collect()}
    assert a == b


def test_real_corpus_smoke(spark, model):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    scored = QM.quality_model_score(docs, model)
    assert scored.filter(F.col("quality_prob").isNull()).count() == 0
    assert scored.count() == docs.count()


def test_cli_quality_model_stage(spark, model, tmp_path_factory, capsys):
    """corpus_cli --quality-model drops the junk half of a synthetic
    corpus through the saved model."""
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("qm_cli")
    mpath = str(base / "model")
    model.write().overwrite().save(mpath)
    docs = _corpus(spark, n=40, start=0).drop("label")
    src = str(base / "docs.parquet")
    docs.write.parquet(src)
    out = str(base / "out")
    rc = corpus_cli.main(
        [src, out, "--no-pii", "--quality", "0", "--lang", "",
         "--quality-model", mpath, "--quality-model-threshold", "0.5"]
    )
    assert rc == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    # exact dedup first collapses the generators' repeats; the learned
    # tier then keeps (essentially) the distinct CLEAN docs only
    n_clean = len({_clean(i) for i in range(40)})
    n_junk = len({_junk(i) for i in range(40)})
    assert rep["n_input"] == 80
    assert rep["n_after_dedup"] == n_clean + n_junk
    assert abs(rep["n_after_filters"] - n_clean) <= 1


def test_score_stream_matches_batch(spark, model, tmp_path_factory):
    """The fitted pipeline is transform-only (tokenize/NGram/hash/LR),
    so the SAME model must score a readStream unchanged — the learned
    tier joins the stateless streaming stages."""
    from solana_snapshot_etl_tools_spark.streaming.sinks import (
        run_available_now,
    )

    docs = _corpus(spark, n=25, start=70_000).drop("label")
    d = str(tmp_path_factory.mktemp("qm_stream") / "docs")
    docs.write.parquet(d)
    streamed = run_available_now(
        spark, d, docs.schema, lambda s: QM.quality_model_score(s, model)
    )
    batch = QM.quality_model_score(spark.read.parquet(d), model)
    a = {(r.doc_id, r.quality_prob) for r in streamed.collect()}
    b = {(r.doc_id, r.quality_prob) for r in batch.collect()}
    assert a == b and len(a) == 50


def test_null_text_passes_through_unchanged(spark, model):
    """Scoring must not rewrite a null text to '' in its output —
    downstream null/empty accounting depends on the distinction."""
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in QM.quality_model_score(docs, model).collect()}
    assert out[1].text is None
    assert out[2].text == ""
    # both score as the empty document
    assert out[1].quality_prob == out[2].quality_prob


def test_ingest_stream_honors_quality_model(
    spark, model, tmp_path_factory, capsys
):
    """--quality-model runs unchanged in --ingest-stream mode: the
    junk half of an arriving shard is dropped before the dedup loop."""
    import json as _json
    import os

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("qm_stream_cli")
    mpath = str(base / "model")
    model.write().overwrite().save(mpath)
    src = str(base / "arrivals")
    os.makedirs(src)
    _corpus(spark, n=15, start=0).drop("label").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert corpus_cli.main(
        [src, str(base / "out"), "--ingest-stream",
         "--index-out", str(base / "idx"), "--no-pii",
         "--quality", "0", "--lang", "",
         "--quality-model", mpath, "--quality-model-threshold", "0.5"]
    ) == 0
    rep = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    # distinct clean docs survive; every junk doc is dropped pre-index
    n_clean = len({_clean(i) for i in range(15)})
    assert abs(rep["n_corpus"] - n_clean) <= 1
    ids = {
        r.doc_id
        for r in spark.read.parquet(f"{base}/out/corpus").collect()
    }
    assert all(i < 15 for i in ids)  # junk ids (15..29) all gone
