"""DSIR importance resampling (operators/dsir.py): gram-mode weight
exactness vs an independent Python reference, hashed-mode selection
behavior, Gumbel-top-k determinism, and the no-global-sort top-k."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import dsir as DS

TARGET_TEXTS = [
    "spark streaming joins shuffle partitions across executors",
    "the spark optimizer prunes partitions before the shuffle stage",
    "streaming watermarks bound late data in spark aggregations",
]
RAW_ROWS = [
    (1, "spark shuffle partitions and the streaming optimizer"),
    (2, "a recipe for sourdough bread with rye flour and honey"),
    (3, "spark streaming aggregations shuffle late data"),
    (4, "gardening tips for tomatoes peppers and basil in july"),
    (5, "the optimizer prunes partitions in spark"),
    (6, "medieval castles were built on hilltops for defense"),
    (7, ""),  # tokenless: no weight row
]


def _feats(text: str) -> Counter:
    toks = [t for t in text.strip().lower().split() if t]
    return Counter(toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])])


def _ref_log_weights(raw_rows, target_texts, alpha):
    ct: Counter = Counter()
    cr: Counter = Counter()
    for t in target_texts:
        ct.update(_feats(t))
    for _, t in raw_rows:
        cr.update(_feats(t))
    vocab = set(ct) | set(cr)
    b, nt, nr = len(vocab), sum(ct.values()), sum(cr.values())
    out = {}
    for i, t in raw_rows:
        f = _feats(t)
        if not f:
            continue
        out[i] = sum(
            c
            * (
                math.log(ct[g] + alpha)
                - math.log(nt + alpha * b)
                - math.log(cr[g] + alpha)
                + math.log(nr + alpha * b)
            )
            for g, c in f.items()
        )
    return out


def _frames(spark):
    raw = spark.createDataFrame(RAW_ROWS, "doc_id long, text string")
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET_TEXTS)],
        "doc_id long, text string",
    )
    return raw, target


def test_gram_mode_weights_match_python_reference(spark):
    raw, target = _frames(spark)
    for alpha in (0.1, 1.0):
        got = {
            r.doc_id: r.log_weight
            for r in DS.dsir_log_weights(
                raw, target, n_buckets=None, alpha=alpha
            ).collect()
        }
        want = _ref_log_weights(RAW_ROWS, TARGET_TEXTS, alpha)
        assert set(got) == set(want) == {1, 2, 3, 4, 5, 6}
        for i in want:
            assert got[i] == pytest.approx(want[i], rel=1e-9), (alpha, i)


def test_weights_separate_target_like_docs(spark):
    raw, target = _frames(spark)
    # hashed mode (the production spelling): every target-like doc
    # outweighs every off-topic doc
    got = {
        r.doc_id: r.log_weight
        for r in DS.dsir_log_weights(raw, target).collect()
    }
    assert min(got[1], got[3], got[5]) > max(got[2], got[4], got[6])
    # partition invariance (to the float sum's merge order)
    got2 = {
        r.doc_id: r.log_weight
        for r in DS.dsir_log_weights(raw.repartition(7), target).collect()
    }
    assert set(got) == set(got2)
    for i in got:
        assert got2[i] == pytest.approx(got[i], rel=1e-12), i


def test_top_k_hard_selection_matches_reference_ranking(spark):
    raw, target = _frames(spark)
    want = _ref_log_weights(RAW_ROWS, TARGET_TEXTS, 0.1)
    order = sorted(want, key=lambda i: (-want[i], i))
    for k in (1, 2, 3, 6):
        kept = {
            r.doc_id
            for r in DS.dsir_top_k(
                raw, target, k, n_buckets=None, gumbel=False
            ).collect()
        }
        assert kept == set(order[:k]), k
    out = DS.dsir_top_k(raw, target, 2, gumbel=False)
    assert out.columns == ["doc_id", "text"]


def test_gumbel_selection_deterministic_and_exactly_k(spark):
    raw, target = _frames(spark)
    a = {r.doc_id for r in DS.dsir_top_k(raw, target, 3).collect()}
    b = {
        r.doc_id
        for r in DS.dsir_top_k(raw.repartition(5), target, 3).collect()
    }
    assert a == b and len(a) == 3
    # a different seed is a different draw of the same distribution
    c = {
        r.doc_id
        for r in DS.dsir_top_k(raw, target, 3, seed="other").collect()
    }
    assert len(c) == 3
    # k past the scorable pool: the tokenless doc fills last
    everything = {
        r.doc_id for r in DS.dsir_top_k(raw, target, 100).collect()
    }
    assert everything == {i for i, _ in RAW_ROWS}
    k6 = {r.doc_id for r in DS.dsir_top_k(raw, target, 6).collect()}
    assert 7 not in k6  # tokenless ranks strictly last


def test_dsir_rejects_bad_args(spark):
    raw, target = _frames(spark)
    with pytest.raises(ValueError, match="k >= 1"):
        DS.dsir_top_k(raw, target, 0)
    with pytest.raises(ValueError, match="alpha"):
        DS.dsir_log_weights(raw, target, alpha=0.0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="target corpus has no tokens"):
        DS.dsir_log_weights(raw, empty).collect()


def test_save_load_roundtrip_scores_identical(spark, tmp_path_factory):
    raw, target = _frames(spark)
    base = tmp_path_factory.mktemp("dsir_model")
    for nb in (10_000, None):
        model = DS.dsir_fit(raw, target, n_buckets=nb)
        path = str(base / f"m_{nb}")
        DS.dsir_save(model, path)
        loaded = DS.dsir_load(spark, path)
        assert loaded["n_buckets"] == nb and loaded["salt"] == "dsir"
        fresh = {
            r.doc_id: r.log_weight
            for r in DS.dsir_score(raw, model).collect()
        }
        again = {
            r.doc_id: r.log_weight
            for r in DS.dsir_score(raw, loaded).collect()
        }
        # last-ulp only: the per-doc SUM's merge order follows the
        # table's partitioning, which a parquet roundtrip changes
        assert set(fresh) == set(again)
        for i in fresh:
            assert again[i] == pytest.approx(fresh[i], rel=1e-12), i
        # selection through the loaded model matches the fresh fit
        a = {
            r.doc_id
            for r in DS.dsir_top_k(raw, None, 3, model=model).collect()
        }
        b = {
            r.doc_id
            for r in DS.dsir_top_k(raw, None, 3, model=loaded).collect()
        }
        assert a == b and len(a) == 3
    # exactly one of target/model
    with pytest.raises(ValueError, match="exactly one"):
        DS.dsir_top_k(raw, target, 3, model=model)
    with pytest.raises(ValueError, match="exactly one"):
        DS.dsir_top_k(raw, None, 3)
    # corrupt meta raises loudly
    with pytest.raises(Exception):
        DS.dsir_load(spark, str(base / "nowhere"))


@pytest.mark.slow
def test_cli_dsir_save_then_model_and_stream_post_drain(
    spark, tmp_path_factory, capsys
):
    """--dsir-save persists the fitted model; --dsir-model reuses it
    in batch AND as the post-drain stream stage."""
    import json as _json
    import os

    from solana_snapshot_etl_tools_spark import corpus_cli

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    base = tmp_path_factory.mktemp("dsir_model_cli")
    src = str(base / "docs")
    sparky = "spark shuffle partitions executors streaming optimizer join "
    offtopic = "sourdough bread rye flour honey garden tomato basil sun "
    rows = [(i, sparky + f"variant {i} " * 2) for i in range(10)] + [
        (100 + i, offtopic + f"note {i} " * 2) for i in range(10)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    tgt = str(base / "target")
    spark.createDataFrame(
        [("the spark optimizer shuffles streaming partitions",)],
        "text string",
    ).write.parquet(tgt)
    mdl = str(base / "model")
    rep = run(src, str(base / "o1"), "--no-pii", "--quality", "0",
              "--lang", "", "--dsir-target", tgt, "--dsir-keep", "8",
              "--dsir-save", mdl)
    assert rep["dsir_saved_to"] == mdl and rep["n_after_dsir"] == 8
    rep2 = run(src, str(base / "o2"), "--no-pii", "--quality", "0",
               "--lang", "", "--dsir-model", mdl, "--dsir-keep", "8")
    assert rep2["dsir_model"] == mdl and rep2["n_after_dsir"] == 8

    # stream post-drain: same model, derived views resampled
    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    spark.read.parquet(src).coalesce(1).write.mode("append").parquet(arrivals)
    rep3 = run(arrivals, str(base / "o3"), "--ingest-stream",
               "--index-out", str(base / "idx"), "--no-pii",
               "--quality", "0", "--lang", "",
               "--dsir-model", mdl, "--dsir-keep", "8", "--data-card")
    assert rep3["n_corpus"] == 20        # append-only state whole
    assert rep3["n_after_dsir"] == 8
    assert rep3["data_card"]["n_docs"] == 8

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # target+model exclusive
        corpus_cli.main([src, str(base / "o4"), "--dsir-target", tgt,
                         "--dsir-model", mdl, "--dsir-keep", "5"])
    with _pytest.raises(SystemExit):  # save needs target
        corpus_cli.main([src, str(base / "o5"), "--dsir-model", mdl,
                         "--dsir-keep", "5", "--dsir-save", mdl])


def test_dsir_sample_calibration_and_append_stability(spark):
    """Bernoulli selection ∝ weight: realized keep count lands near
    the calibrated expectation even with clamped (p=1) docs,
    target-like docs keep at a far higher rate, decisions are
    append-stable, and tokenless docs are never kept."""
    sparky = "spark shuffle partitions executors streaming optimizer "
    offtopic = "sourdough bread rye flour honey garden tomato basil "
    rows = (
        [(i, sparky + f"v{i} " * (1 + i % 3)) for i in range(100)]
        + [(1000 + i, offtopic + f"n{i} " * (1 + i % 3)) for i in range(300)]
        + [(9000, "")]
    )
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(0, "the spark optimizer shuffles streaming partitions "
             "across executors")],
        "doc_id long, text string",
    )
    kept = {
        r.doc_id for r in DS.dsir_sample(raw, target, 120).collect()
    }
    assert 9000 not in kept
    # calibrated expectation: binomial spread around 120 (sd ~ 10)
    assert 80 <= len(kept) <= 160, len(kept)
    on = sum(1 for i in kept if i < 1000)
    off = len(kept) - on
    # the sparky 25% of the pool dominates the draw
    assert on >= 2 * off, (on, off)
    # determinism + partition invariance
    kept2 = {
        r.doc_id
        for r in DS.dsir_sample(raw.repartition(11), target, 120).collect()
    }
    assert kept2 == kept
    # append stability needs BOTH the model and the scale held fixed
    # (per-pool calibration is append-unstable by contract): calibrate
    # the scale ONCE on the fit pool (dsir_scale), then growing the
    # pool never flips an old decision
    model = DS.dsir_fit(raw, target)
    c = DS.dsir_scale(raw, model, 120)
    assert 0 < c < float("inf")
    base_kept = {
        r.doc_id
        for r in DS.dsir_sample(
            raw, None, 1, model=model, scale=c
        ).collect()
    }
    assert 80 <= len(base_kept) <= 160  # same draw as the calibrated run
    grown = raw.unionByName(
        spark.createDataFrame(
            [(5000 + i, offtopic + f"x{i}") for i in range(50)],
            "doc_id long, text string",
        )
    )
    grown_kept = {
        r.doc_id
        for r in DS.dsir_sample(
            grown, None, 1, model=model, scale=c
        ).collect()
    }
    assert {i for i in grown_kept if i < 5000} == base_kept
    # while per-pool calibration (no scale) is a NEW draw on the grown
    # pool — the documented stratified_split-style caveat
    recal = {
        r.doc_id
        for r in DS.dsir_sample(grown, None, 120, model=model).collect()
    }
    assert 80 <= len(recal) <= 160
    # infeasible ask keeps every scorable doc
    everything = {
        r.doc_id for r in DS.dsir_sample(raw, target, 10_000).collect()
    }
    assert everything == {i for i, _ in rows if i != 9000}
    with pytest.raises(ValueError, match="exactly one"):
        DS.dsir_sample(raw, target, 10, model=model)
    with pytest.raises(ValueError, match="n_expected"):
        DS.dsir_sample(raw, target, 0)


def test_cli_dsir_sample_stage(spark, tmp_path_factory, capsys):
    """--dsir-sample: the Bernoulli alternative — near-expected keep
    count, target-skewed, exactly-one-rule validation."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("dsir_sample_cli")
    src = str(base / "docs")
    sparky = "spark shuffle partitions executors streaming optimizer "
    offtopic = "sourdough bread rye flour honey garden tomato basil "
    rows = [(i, sparky + f"v{i} " * 2) for i in range(40)] + [
        (100 + i, offtopic + f"n{i} " * 2) for i in range(120)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    tgt = str(base / "target")
    spark.createDataFrame(
        [("the spark optimizer shuffles streaming partitions",)],
        "text string",
    ).write.parquet(tgt)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    out = str(base / "out")
    rep = run(src, out, "--no-pii", "--quality", "0", "--lang", "",
              "--dsir-target", tgt, "--dsir-sample", "50")
    assert 30 <= rep["n_after_dsir"] <= 75
    kept = set()
    for name, sz in rep["splits"].items():
        if sz["rows"]:
            kept |= {
                r.doc_id
                for r in spark.read.parquet(f"{out}/{name}").collect()
            }
    on = sum(1 for i in kept if i < 100)
    assert on >= (len(kept) - on), (on, len(kept))  # target-skewed

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # both rules
        corpus_cli.main([src, out, "--dsir-target", tgt,
                         "--dsir-keep", "5", "--dsir-sample", "5"])
    with _pytest.raises(SystemExit):  # rule without source
        corpus_cli.main([src, out, "--dsir-sample", "5"])

def test_calibrate_exact_on_peaked_weight_profiles(spark):
    """Advisor r9: on very peaked weight masses the old fixed point
    could stop at the clamp boundary with the ask unmet; the bracketed
    solver must land sum(min(1, c*w)) on n_expected for every profile
    (clamp-heavy tiers, Zipf spectra, exact-boundary ties)."""
    profiles = {
        # n clamp-exact heavies + a near-massless tail (the old break:
        # clamp set alone reaches the ask on the first iterate)
        "clamp_exact": [1000.0] * 3 + [1e-6] * 97,
        # two heavy tiers that cross on successive iterates
        "tiers": [1000.0] * 5 + [30.0] * 50 + [0.01] * 100,
        # continuous Zipf-squared spectrum: crossings on every step
        "zipf2": [1.0 / (i * i) for i in range(1, 400)],
        # heavy head + heterogeneous mid band straddling the boundary
        "straddle": [1000.0] * 3 + [1.9] + [0.1] * 19 + [1e-4] * 50,
    }
    for name, ws in profiles.items():
        for n_expected in (2, 3, 7):
            if n_expected >= len(ws):
                continue
            w = spark.createDataFrame(
                [(i, float(v)) for i, v in enumerate(ws)],
                "doc_id long, _w double",
            )
            c = DS._calibrate(w, n_expected, max_iter=8)
            assert c is not None and c > 0, (name, n_expected)
            e = sum(min(1.0, c * v) for v in ws)
            assert abs(e - n_expected) <= 1e-6 * n_expected, (
                name, n_expected, c, e,
            )
    # infeasibility contract unchanged: ask >= pool, or zero mass
    w = spark.createDataFrame(
        [(i, 1.0) for i in range(5)], "doc_id long, _w double"
    )
    assert DS._calibrate(w, 5, 8) is None
    z = spark.createDataFrame(
        [(i, 0.0) for i in range(5)], "doc_id long, _w double"
    )
    assert DS._calibrate(z, 2, 8) is None

@pytest.mark.slow
def test_cli_dsir_sample_scale_stream_posture(spark, tmp_path_factory, capsys):
    """--dsir-sample-scale: the append-stable CLI posture — calibrate
    once (--dsir-sample reports dsir_calibrated_scale), then replay
    the fixed (model, scale) pair on a grown pool without flipping a
    single prior decision. Validation: the flag demands --dsir-model."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("dsir_scale_cli")
    sparky = "spark shuffle partitions executors streaming optimizer "
    offtopic = "sourdough bread rye flour honey garden tomato basil "
    rows = [(i, sparky + f"v{i} " * 2) for i in range(40)] + [
        (100 + i, offtopic + f"n{i} " * 2) for i in range(120)
    ]
    src = str(base / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    grown_rows = rows + [(500 + i, offtopic + f"g{i} " * 2) for i in range(60)]
    grown = str(base / "grown")
    spark.createDataFrame(
        grown_rows, "doc_id long, text string"
    ).write.parquet(grown)
    tgt = str(base / "target")
    spark.createDataFrame(
        [("the spark optimizer shuffles streaming partitions",)],
        "text string",
    ).write.parquet(tgt)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    def kept_ids(out, rep):
        ids = set()
        for name, sz in rep["splits"].items():
            if sz["rows"]:
                ids |= {
                    r.doc_id
                    for r in spark.read.parquet(f"{out}/{name}").collect()
                }
        return ids

    mdl = str(base / "model")
    out1 = str(base / "out1")
    rep1 = run(src, out1, "--no-pii", "--quality", "0", "--lang", "",
               "--dsir-target", tgt, "--dsir-sample", "50",
               "--dsir-save", mdl)
    c = rep1["dsir_calibrated_scale"]
    assert isinstance(c, float) and c > 0
    base_kept = kept_ids(out1, rep1)
    assert 30 <= len(base_kept) <= 75

    # same pool, fixed (model, scale): identical draw
    out2 = str(base / "out2")
    rep2 = run(src, out2, "--no-pii", "--quality", "0", "--lang", "",
               "--dsir-model", mdl, "--dsir-sample-scale", str(c))
    assert rep2["dsir_scale"] == c
    assert kept_ids(out2, rep2) == base_kept

    # grown pool, fixed pair: every prior decision survives verbatim
    out3 = str(base / "out3")
    rep3 = run(grown, out3, "--no-pii", "--quality", "0", "--lang", "",
               "--dsir-model", mdl, "--dsir-sample-scale", str(c))
    grown_kept = kept_ids(out3, rep3)
    assert {i for i in grown_kept if i < 500} == base_kept

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # needs --dsir-model, not target
        corpus_cli.main([src, str(base / "o4"), "--dsir-target", tgt,
                         "--dsir-sample-scale", "0.5"])
    with _pytest.raises(SystemExit):  # two rules at once
        corpus_cli.main([src, str(base / "o5"), "--dsir-model", mdl,
                         "--dsir-sample-scale", "0.5",
                         "--dsir-sample", "5"])
    with _pytest.raises(SystemExit):  # non-positive scale
        corpus_cli.main([src, str(base / "o6"), "--dsir-model", mdl,
                         "--dsir-sample-scale", "0"])
