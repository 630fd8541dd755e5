"""SemDeDup (operators/semdedup.py): exact agreement with a pure
numpy spelling of the paper's triangular-max rule, planted near-dup
groups, chain semantics, partition invariance, and the loud guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import semdedup as SD
from solana_snapshot_etl_tools_spark.operators.cluster import kmeans_fit


def _norm(X):
    X = np.asarray(X, dtype=np.float64)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


def _ref_semdedup(ids, X, centroids, eps):
    """Independent spelling: nearest (normalized) centroid, order by
    (sq_dist desc, id asc), drop on max-cosine-to-earlier >= eps.
    Vectors pass through float32 first — the array<float> column
    quantizes them before the engine ever sees them."""
    Xn = _norm(np.asarray(X, dtype=np.float32).astype(np.float64))
    C = np.asarray(centroids, dtype=np.float64)
    D = (C * C).sum(axis=1)[None, :] - 2.0 * (Xn @ C.T)
    a = np.argmin(D, axis=1)
    d2 = np.maximum(D[np.arange(len(a)), a] + (Xn * Xn).sum(axis=1), 0.0)
    out = {}
    for c in np.unique(a):
        m = a == c
        cids, cd2, CX = np.asarray(ids)[m], d2[m], Xn[m]
        order = np.lexsort((cids, -cd2))
        cids, CX = cids[order], CX[order]
        S = CX @ CX.T
        for i, did in enumerate(cids):
            if i == 0:
                out[did] = (int(c), True, None, None)
                continue
            sims = S[i, :i]
            j = int(np.argmax(sims))
            best = float(sims[j])
            out[did] = (int(c), best < eps, best, int(cids[j]))
    return out


def _emb_df(spark, ids, X):
    return spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, X)],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    # 4 loose blobs with planted tight near-dup knots inside them
    centers = rng.normal(size=(4, 16))
    rows, ids = [], []
    i = 0
    for c in centers:
        for _ in range(30):
            rows.append(c + 0.8 * rng.normal(size=16))
            ids.append(i); i += 1
        knot = c + 0.8 * rng.normal(size=16)
        for _ in range(6):  # six ~identical copies
            rows.append(knot + 0.003 * rng.normal(size=16))
            ids.append(i); i += 1
    X = np.array(rows)
    emb = _emb_df(spark, ids, X)
    model = kmeans_fit(emb, 4, max_iter=25, seed=3, normalize=True)
    dec = SD.semdedup(emb, model=model, threshold=0.92)
    got = {
        r.vec_id: (r.cluster_id, r.kept, r.max_prior_sim, r.witness_id)
        for r in dec.collect()
    }
    want = _ref_semdedup(ids, X, model["centroids"], 0.92)
    assert set(got) == set(want)
    for did in want:
        gc, gk, gs, gw = got[did]
        wc, wk, ws, ww = want[did]
        assert (gc, gk, gw) == (wc, wk, ww), (did, got[did], want[did])
        if ws is None:
            assert gs is None
        else:
            assert gs == pytest.approx(ws, rel=1e-9)
    # each 6-knot collapses to >= 1 survivor and loses most copies
    kept_n = sum(1 for v in got.values() if v[1])
    assert kept_n < len(ids) - 4 * 3  # at least ~3 dropped per knot

    # partition invariance: identical table from a different layout
    dec2 = SD.semdedup(
        emb.repartition(13), model=model, threshold=0.92
    )
    got2 = {
        r.vec_id: (r.cluster_id, r.kept, r.max_prior_sim, r.witness_id)
        for r in dec2.collect()
    }
    assert got2 == got


def test_semdedup_chain_keeps_ends_drops_middle(spark):
    """A~B~C with A≁C: the farthest-first ordering puts the middle
    (nearest the centroid) LAST, so both ends survive — the
    documented divergence from component dedup (which keeps one)."""
    import math

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0]

    emb = _emb_df(spark, [1, 2, 3], np.array([v(0), v(25), v(50)]))
    # one cluster: k=1 (any centroid), eps between cos(25) and cos(50)
    dec = SD.semdedup(emb, 1, threshold=0.85, seed=1)
    rows = {r.vec_id: r for r in dec.collect()}
    assert rows[1].kept and rows[3].kept and not rows[2].kept
    assert rows[2].witness_id in (1, 3)
    # component dedup over the same pairs would keep exactly one
    from solana_snapshot_etl_tools_spark.operators.dedup import (
        semantic_dedup,
    )

    comp = semantic_dedup(emb, threshold=0.85)
    assert {r.keep_id for r in comp.collect()} == {1}


def test_semdedup_filter_and_missing_embeddings(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 6)], "doc_id long, text string"
    )
    # 1 and 2 near-identical; 5 has NO embedding -> passes through
    emb = _emb_df(
        spark,
        [1, 2, 3, 4],
        np.array(
            [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0], [-1.0, 0.0]]
        ),
    )
    out = SD.semdedup_filter(docs, emb, 1, threshold=0.95)
    kept = {r.doc_id for r in out.collect()}
    assert 5 in kept and {3, 4} <= kept
    assert len(kept & {1, 2}) == 1  # one of the near-pair survives
    assert out.columns == docs.columns


def test_semdedup_prefer_col_keeps_best(spark):
    """Quality-first visit order: within a near-dup neighborhood the
    highest-prefer vector is the one kept (it is seen first, so the
    others witness it), regardless of what the default
    farthest-from-centroid order would have picked — and the default
    path is untouched by the feature's existence."""
    import math

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0]

    # 1 and 2 near-identical (cos(3°) ≈ 0.9986); 3 far away
    emb = spark.createDataFrame(
        [
            (1, v(0.0), 0.1),
            (2, v(3.0), 0.9),
            (3, v(90.0), 0.5),
        ],
        "vec_id long, embedding array<double>, quality double",
    )
    dec = {
        r.vec_id: r
        for r in SD.semdedup(
            emb, 1, threshold=0.95, seed=1, prefer_col="quality"
        ).collect()
    }
    assert dec[2].kept and not dec[1].kept and dec[3].kept
    assert dec[1].witness_id == 2
    # flip the quality: now 1 survives the pair
    flipped = emb.withColumn(
        "quality", F.when(F.col("vec_id") == 1, 0.9).otherwise(0.1)
    )
    dec2 = {
        r.vec_id: r
        for r in SD.semdedup(
            flipped, 1, threshold=0.95, seed=1, prefer_col="quality"
        ).collect()
    }
    assert dec2[1].kept and not dec2[2].kept
    # default path (no prefer_col) still runs and keeps exactly one
    base = {
        r.vec_id: r.kept
        for r in SD.semdedup(emb, 1, threshold=0.95, seed=1).collect()
    }
    assert sum(base[i] for i in (1, 2)) == 1 and base[3]


def test_semdedup_filter_prefer_col(spark):
    """prefer_col names a docs column: the near-pair's survivor is the
    higher-quality document; docs without embeddings still pass
    through; output columns unchanged."""
    docs = spark.createDataFrame(
        [(1, "short", 0.1), (2, "the good long copy", 0.95),
         (3, "other", 0.5), (4, "no embedding", 0.7)],
        "doc_id long, text string, quality double",
    )
    emb = _emb_df(
        spark, [1, 2, 3],
        np.array([[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]]),
    )
    out = SD.semdedup_filter(
        docs, emb, 1, threshold=0.95, prefer_col="quality"
    )
    kept = {r.doc_id for r in out.collect()}
    assert kept == {2, 3, 4}
    assert out.columns == docs.columns
    with pytest.raises(ValueError, match="prefer_col"):
        SD.semdedup_filter(docs, emb, 1, prefer_col="nope")


def test_semdedup_filter_rejects_string_ids(spark):
    """A string doc_id would cast to NULL in the long-keyed anti-join
    and silently turn the dedup into a no-op — must raise instead."""
    sdocs = spark.createDataFrame(
        [("a", "doc a"), ("b", "doc b")], "doc_id string, text string"
    )
    emb = _emb_df(spark, [1, 2], np.array([[1.0, 0.0], [0.0, 1.0]]))
    with pytest.raises(ValueError, match="integral"):
        SD.semdedup_filter(sdocs, emb, 1)
    ldocs = spark.createDataFrame(
        [(1, "doc 1")], "doc_id long, text string"
    )
    semb = emb.withColumn("vec_id", F.col("vec_id").cast("string"))
    with pytest.raises(ValueError, match="integral"):
        SD.semdedup_filter(ldocs, semb, 1)


def test_semdedup_zero_vector_always_kept(spark):
    emb = _emb_df(
        spark, [1, 2, 3],
        np.array([[1.0, 0.0], [1.0, 1e-4], [0.0, 0.0]]),
    )
    dec = SD.semdedup(emb, 1, threshold=0.9)
    rows = {r.vec_id: r.kept for r in dec.collect()}
    assert rows[3] is True
    assert sum(rows.values()) == 2  # zero vec + one of the pair


def test_semdedup_guards(spark):
    emb = _emb_df(spark, [1, 2, 3], np.eye(3))
    with pytest.raises(ValueError, match="exactly one"):
        SD.semdedup(emb)
    m = kmeans_fit(emb, 1, normalize=True)
    with pytest.raises(ValueError, match="exactly one"):
        SD.semdedup(emb, 1, model=m)
    with pytest.raises(ValueError, match="threshold"):
        SD.semdedup(emb, 1, threshold=1.0)
    with pytest.raises(ValueError, match="SPHERICAL"):
        SD.semdedup(emb, model=kmeans_fit(emb, 1))
    with pytest.raises(Exception, match="max_cluster_size=2"):
        SD.semdedup(emb, 1, max_cluster_size=2).collect()
    # ragged / NULL embeddings die loudly — in the k-means kernel if
    # fitting here, or in semdedup's own in-group guards with a
    # prefitted model; never a silent wrong answer
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(
        Exception, match="ragged|inhomogeneous|sequence|mismatch"
    ):
        SD.semdedup(ragged, 1, threshold=0.5).collect()
    withnull = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(
        Exception, match="NULL embedding|None|NoneType|unsupported"
    ):
        SD.semdedup(withnull, 1, threshold=0.5).collect()

@pytest.mark.slow
def test_cli_semdedup_batch_and_stream(spark, tmp_path_factory, capsys):
    """--semdedup composes with the batch pipeline (before
    cluster-balance) and with --ingest-stream as a post-drain stage;
    docs without embeddings pass through; validation rules hold."""
    import json as _json
    import os

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("semdedup_cli")
    # 12 docs: ids 1-6 share one embedding knot (near-identical), ids
    # 7-10 distinct, 11-12 have NO embedding
    rng = np.random.default_rng(5)
    rows = [(i, f"document number {i} with plain words") for i in range(1, 13)]
    src = str(base / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    knot = rng.normal(size=8)
    vecs = [(i, (knot + 0.002 * rng.normal(size=8)).tolist()) for i in range(1, 7)]
    vecs += [(i, rng.normal(size=8).tolist()) for i in range(7, 11)]
    embp = str(base / "emb")
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    ).write.parquet(embp)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    out1 = str(base / "out1")
    rep = run(src, out1, "--no-pii", "--quality", "0", "--lang", "",
              "--embeddings", embp, "--semdedup", "0.9",
              "--semdedup-k", "2")
    assert rep["semdedup_k"] == 2
    assert rep["n_semdedup_dropped"] >= 4  # most of the 6-knot dies
    kept = {
        r.doc_id
        for name, sz in rep["splits"].items()
        if sz["rows"]
        for r in spark.read.parquet(f"{out1}/{name}").collect()
    }
    assert {7, 8, 9, 10, 11, 12} <= kept  # distinct + embedding-less
    assert len(kept & {1, 2, 3, 4, 5, 6}) <= 2

    # stream mode: post-drain stage, append-only corpus stays whole
    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(arrivals)
    sout = str(base / "sout")
    srep = run(arrivals, sout, "--ingest-stream", "--index-out",
               str(base / "idx"), "--no-pii", "--quality", "0",
               "--lang", "", "--embeddings", embp, "--semdedup", "0.9",
               "--semdedup-k", "2", "--stratified-split", "lang")
    assert srep["n_corpus"] == 12  # append-only state whole
    assert srep["n_after_semdedup"] == 12 - srep["n_semdedup_dropped"]
    split_ids = {
        r.doc_id
        for name, sz in srep["splits"].items()
        if sz["rows"]
        for r in spark.read.parquet(f"{sout}/{name}").collect()
    }
    assert len(split_ids) == srep["n_after_semdedup"]
    assert {7, 8, 9, 10, 11, 12} <= split_ids

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # needs --embeddings
        corpus_cli.main([src, str(base / "o2"), "--semdedup", "0.9"])
    with _pytest.raises(SystemExit):  # EPS out of range
        corpus_cli.main([src, str(base / "o3"), "--embeddings", embp,
                         "--semdedup", "1.5"])
    with _pytest.raises(SystemExit):  # -k without --semdedup
        corpus_cli.main([src, str(base / "o4"), "--embeddings", embp,
                         "--semdedup-k", "4"])


def test_semdedup_single_shuffle_plan(spark):
    """The vectors cross exactly ONE exchange (the cluster groupBy):
    assignment is computed inline with the vector, not via a join
    that would shuffle them a second time."""
    import re

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    m = kmeans_fit(emb, 4, normalize=True)
    dec = SD.semdedup(emb, model=m, threshold=0.9)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


@pytest.mark.slow
def test_cli_stream_semdedup_model_append_stable(
    spark, tmp_path_factory, capsys
):
    """--semdedup-model in --ingest-stream is the append-stable
    posture: the report records it, the fresh-fit path records (and
    warns) the opposite, and with a held-fixed model the keep/drop
    decisions for already-ingested docs survive a second drain."""
    import json as _json
    import os

    import numpy as np
    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("semdedup_stream_model")
    rng = np.random.default_rng(23)
    X = rng.normal(size=(30, 8))
    X[4:8] = X[3] + 0.002 * rng.normal(size=(4, 8))  # 5-knot in batch 1
    emb = _emb_df(spark, list(range(1, 31)), X)
    embp = str(base / "emb")
    emb.write.parquet(embp)
    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    rows1 = [(i, f"document {i} with plain words") for i in range(1, 21)]
    spark.createDataFrame(
        rows1, "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(arrivals)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    def kept_ids(out_dir, rep):
        ids = set()
        for name, v in rep["splits"].items():
            if v["rows"]:
                ids |= {
                    r.doc_id
                    for r in spark.read.parquet(f"{out_dir}/{name}")
                    .select("doc_id").collect()
                }
        return ids

    sout, idx, mdir = str(base / "sout"), str(base / "idx"), str(base / "km")
    common = ("--ingest-stream", "--index-out", idx, "--no-pii",
              "--quality", "0", "--lang", "", "--embeddings", embp,
              "--semdedup", "0.95", "--stratified-split", "lang")
    # drain 1: fresh fit (saved) — append-UNSTABLE posture, recorded
    rep1 = run(arrivals, sout, *common, "--semdedup-k", "3",
               "--semdedup-save", mdir)
    assert rep1["semdedup_append_stable"] is False
    assert rep1["n_semdedup_dropped"] >= 3  # most of the 5-knot dies
    kept1 = kept_ids(sout, rep1)

    # drain 2: 10 new docs (random vectors, nowhere near the old
    # knot), held-fixed model — decisions for drain-1 docs must not
    # flip, and the report records the stable posture
    rows2 = [(i, f"document {i} with plain words") for i in range(21, 31)]
    spark.createDataFrame(
        rows2, "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(arrivals)
    rep2 = run(arrivals, sout, *common, "--semdedup-model", mdir)
    assert rep2["semdedup_append_stable"] is True
    assert rep2["semdedup_model"] == mdir
    assert rep2["n_corpus"] == 30
    kept2 = kept_ids(sout, rep2)
    assert kept1 == kept2 & set(range(1, 21))


def test_kmeans_save_load_roundtrip_and_cli_model_reuse(
    spark, tmp_path_factory, capsys
):
    """kmeans_save/load: the loaded model is interchangeable with the
    fresh fit (identical semdedup decisions); the CLI's
    --semdedup-save / --semdedup-model pair gives the train-once
    posture; validation rules hold."""
    import json as _json

    import numpy as np
    from solana_snapshot_etl_tools_spark.operators.cluster import (
        kmeans_load,
        kmeans_save,
    )

    base = tmp_path_factory.mktemp("semdedup_model")
    rng = np.random.default_rng(11)
    ids = list(range(1, 41))
    X = rng.normal(size=(40, 8))
    X[20:26] = X[19] + 0.002 * rng.normal(size=(6, 8))  # a 7-knot
    emb = _emb_df(spark, ids, X)
    model = kmeans_fit(emb, 3, normalize=True, seed=5)
    mdir = str(base / "km")
    kmeans_save(model, mdir, spark)
    loaded = kmeans_load(spark, mdir)
    assert loaded["normalize"] is True
    assert np.allclose(loaded["centroids"], model["centroids"])
    assert (loaded["sizes"] == model["sizes"]).all()
    d1 = {(r.vec_id, r.kept) for r in SD.semdedup(
        emb, model=model, threshold=0.95).collect()}
    d2 = {(r.vec_id, r.kept) for r in SD.semdedup(
        emb, model=loaded, threshold=0.95).collect()}
    assert d1 == d2

    # CLI: fit+save on corpus 1, reuse on corpus 2
    docs = spark.createDataFrame(
        [(i, f"document {i} with enough plain words") for i in ids],
        "doc_id long, text string",
    )
    src, embp = str(base / "docs"), str(base / "emb")
    docs.write.parquet(src)
    emb.write.parquet(embp)

    from solana_snapshot_etl_tools_spark import corpus_cli

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    cdir = str(base / "cli_km")
    rep1 = run(src, str(base / "o1"), "--no-pii", "--quality", "0",
               "--lang", "", "--embeddings", embp, "--semdedup", "0.95",
               "--semdedup-k", "3", "--semdedup-save", cdir)
    assert rep1["semdedup_saved_to"] == cdir
    rep2 = run(src, str(base / "o2"), "--no-pii", "--quality", "0",
               "--lang", "", "--embeddings", embp, "--semdedup", "0.95",
               "--semdedup-model", cdir)
    assert rep2["semdedup_model"] == cdir
    assert rep2["semdedup_k"] == 3
    assert rep2["n_semdedup_dropped"] == rep1["n_semdedup_dropped"]

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # save+model together
        corpus_cli.main([src, str(base / "o3"), "--embeddings", embp,
                         "--semdedup", "0.9", "--semdedup-save", cdir,
                         "--semdedup-model", cdir])
    with _pytest.raises(SystemExit):  # -k with a loaded model
        corpus_cli.main([src, str(base / "o4"), "--embeddings", embp,
                         "--semdedup", "0.9", "--semdedup-model", cdir,
                         "--semdedup-k", "4"])
    with _pytest.raises(SystemExit):  # model without --semdedup
        corpus_cli.main([src, str(base / "o5"), "--embeddings", embp,
                         "--semdedup-model", cdir])
