"""Distributed k-means (operators/cluster.py) vs a pure-numpy Lloyd's
reference, plus structure, determinism, and scale-shape properties."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import cluster as C

SF_DIR = "/root/testdata/sf0.001"


def _blobs(n_per=40, d=6, seed=7):
    """Three well-separated blobs; returns (rows, true_label_by_id)."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] * d, [-10.0] * d, [10.0] * (d // 2) + [-10.0] * (d - d // 2)]
    )
    rows, truth = [], {}
    for b, c in enumerate(centers):
        for i in range(n_per):
            vid = b * n_per + i
            v = c + rng.normal(0, 0.5, d)
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = b
    return rows, truth


def _numpy_lloyds(X, init, max_iter, tol=1e-6):
    Cm = init.astype(np.float64).copy()
    for it in range(max_iter):
        a = np.argmin(
            (Cm * Cm).sum(axis=1)[None, :] - 2.0 * (X @ Cm.T), axis=1
        )
        new = Cm.copy()
        for j in range(len(Cm)):
            m = a == j
            if m.any():
                new[j] = X[m].mean(axis=0)
        shift = np.sqrt(((new - Cm) ** 2).sum(axis=1)).max()
        Cm = new
        if shift < tol:
            return Cm, a, it + 1
    return Cm, np.argmin((Cm * Cm).sum(axis=1)[None, :] - 2 * (X @ Cm.T), axis=1), max_iter


def _df(spark, rows, n_part=None):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(n_part) if n_part else df


def test_fit_matches_numpy_reference_under_fixed_init(spark):
    rows, _ = _blobs()
    X = np.array([v for _, v in rows], dtype=np.float64)
    init = X[[0, 40, 80]]
    model = C.kmeans_fit(_df(spark, rows), 3, init=init, max_iter=8)
    refC, refA, ref_iters = _numpy_lloyds(X, init, 8)
    assert np.allclose(model["centroids"], refC, atol=1e-9)
    assert model["n_iter"] == ref_iters
    got = {
        r.vec_id: r.cluster_id
        for r in C.kmeans_assign(_df(spark, rows), model).collect()
    }
    assert [got[i] for i in range(len(rows))] == refA.tolist()
    assert model["sizes"].sum() == len(rows)


def test_recovers_planted_blobs_and_is_partition_robust(spark):
    """Default k-means|| seeding must recover well-separated blobs
    regardless of seed luck (random-point init splits a blob for some
    seeds — the motivating failure) and give layout-tolerant results."""
    rows, truth = _blobs()
    m1 = C.kmeans_fit(_df(spark, rows, 1), 3, seed=5)
    m7 = C.kmeans_fit(_df(spark, rows, 7), 3, seed=5)
    # same seeded init → same trajectory up to float summation order
    assert np.allclose(m1["centroids"], m7["centroids"], atol=1e-8)
    a = {
        r.vec_id: r.cluster_id
        for r in C.kmeans_assign(_df(spark, rows, 7), m1).collect()
    }
    # each true blob lands wholly in one distinct cluster
    blobs = {}
    for vid, b in truth.items():
        blobs.setdefault(b, set()).add(a[vid])
    assert all(len(s) == 1 for s in blobs.values())
    assert len({next(iter(s)) for s in blobs.values()}) == 3
    assert sorted(m1["sizes"]) == [40, 40, 40]
    assert m1["shift"] < 1e-6  # converged, not iteration-capped


def test_empty_clusters_keep_init_centroid(spark):
    rows = [(i, [float(i % 2), 0.0]) for i in range(8)]  # 2 distinct points
    init = np.array([[0.0, 0.0], [1.0, 0.0], [50.0, 50.0]])
    model = C.kmeans_fit(_df(spark, rows), 3, init=init, max_iter=4)
    assert model["sizes"].tolist() == [4, 4, 0]
    assert np.allclose(model["centroids"][2], [50.0, 50.0])
    assert not np.isnan(model["centroids"]).any()


def test_spherical_mode_normalizes_and_assign_uses_model_flag(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [100.0, 1.0]),  # same direction as 0 after normalize
        (2, [0.0, 1.0]),
        (3, [1.0, 90.0]),
    ]
    init = np.array([[1.0, 0.0], [0.0, 1.0]])
    model = C.kmeans_fit(_df(spark, rows), 2, init=init, normalize=True)
    a = {r.vec_id: r.cluster_id for r in C.kmeans_assign(_df(spark, rows), model).collect()}
    assert a[0] == a[1] and a[2] == a[3] and a[0] != a[2]
    # spherical update renormalizes after every mean step: exactly unit
    assert np.allclose(np.linalg.norm(model["centroids"], axis=1), 1, atol=1e-12)


def test_inertia_matches_assign_and_shrinks_with_k(spark):
    """model['inertia'] is the within-cluster squared-distance total
    under the returned centroids (== sum of kmeans_assign sq_dist),
    and more clusters can only lower it — the elbow-curve contract."""
    rows, _ = _blobs(n_per=20)
    df = _df(spark, rows)
    m3 = C.kmeans_fit(df, 3, seed=5)
    total = sum(r.sq_dist for r in C.kmeans_assign(df, m3).collect())
    assert abs(m3["inertia"] - total) < 1e-6 * max(1.0, total)
    m1 = C.kmeans_fit(df, 1, seed=5)
    assert m1["inertia"] > m3["inertia"] > 0


def test_zero_vector_survives_normalize(spark):
    """An all-zero embedding must not kill the job under ANSI
    (DIVIDE_BY_ZERO) nor NaN-poison centroids — it stays the zero
    vector and lands in some cluster."""
    rows = [(0, [0.0, 0.0]), (1, [3.0, 0.0]), (2, [4.0, 0.0]), (3, [0.0, 2.0])]
    model = C.kmeans_fit(
        _df(spark, rows), 2, init=np.array([[1.0, 0.0], [0.0, 1.0]]), normalize=True
    )
    assert not np.isnan(model["centroids"]).any()
    out = C.kmeans_assign(_df(spark, rows), model)
    assert out.count() == 4
    assert out.filter(F.col("sq_dist") < 0).count() == 0  # clamped


def test_sizes_match_assign_populations_at_iteration_cap(spark):
    """model['sizes'] must describe the RETURNED centroids even when
    the loop stops at max_iter (the in-loop counts describe the
    penultimate centroids)."""
    rows, _ = _blobs(n_per=15)
    X = np.array([v for _, v in rows])
    # a deliberately bad init so one update step moves assignments
    init = X[[0, 1, 2]]
    model = C.kmeans_fit(_df(spark, rows), 3, init=init, max_iter=1)
    pops = {
        r.cluster_id: r["count"]
        for r in C.kmeans_assign(_df(spark, rows), model)
        .groupBy("cluster_id")
        .count()
        .collect()
    }
    assert [pops.get(j, 0) for j in range(3)] == model["sizes"].tolist()


def test_init_is_deterministic_and_partition_invariant(spark):
    rows, _ = _blobs(n_per=20)
    i1 = C.kmeans_init(_df(spark, rows, 1), 5, seed=9)
    i2 = C.kmeans_init(_df(spark, rows, 6), 5, seed=9)
    assert np.array_equal(i1, i2)
    i3 = C.kmeans_init(_df(spark, rows, 6), 5, seed=10)
    assert not np.array_equal(i1, i3)
    with pytest.raises(ValueError, match="only"):
        C.kmeans_init(_df(spark, rows[:3]), 5)


def test_assign_stream_matches_batch(spark, tmp_path_factory):
    """Given a fitted model, assignment is a pure narrow transform —
    the SAME function must run unchanged under readStream (the
    engine's batch/stream-parity contract): live corpora can be
    bucketed into domains as they arrive."""
    from solana_snapshot_etl_tools_spark.streaming.sinks import run_available_now

    src = f"{SF_DIR}/embeddings.parquet"
    emb = spark.read.parquet(src)
    model = C.kmeans_fit(emb, 3, max_iter=3, seed=2)
    d = str(tmp_path_factory.mktemp("emb_stream"))
    emb.write.mode("overwrite").parquet(d)
    streamed = run_available_now(
        spark, d, emb.schema, lambda df: C.kmeans_assign(df, model)
    )
    batch = C.kmeans_assign(emb, model)

    def rows(df):
        return sorted(
            (r.vec_id, r.cluster_id, round(r.sq_dist, 9)) for r in df.collect()
        )

    assert rows(streamed) == rows(batch)
    assert streamed.count() == emb.count()


def test_real_corpus_fit_shape_and_coverage(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    model = C.kmeans_fit(emb, 4, max_iter=5, seed=1)
    assert model["centroids"].shape[1] == len(emb.first().embedding)
    assert model["sizes"].sum() == n
    out = C.kmeans_assign(emb, model)
    assert out.count() == n
    assert out.agg(F.count_distinct("cluster_id")).first()[0] >= 2
    # sq_dist is a real squared distance: non-negative everywhere
    assert out.filter(F.col("sq_dist") < -1e-9).count() == 0
