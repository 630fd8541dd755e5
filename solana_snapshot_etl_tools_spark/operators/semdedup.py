"""SemDeDup — semantic dedup bucketed by k-means clusters (Abbas et
al. 2023, arXiv:2303.09540): cluster the embedding space, then drop,
within each cluster, every item that is ≥ ``threshold``-cosine-similar
to any item EARLIER in the cluster's centroid-distance ordering
(farthest-from-centroid first — the paper keeps the outliers and
drops the prototypical copies).

Relation to the rest of the dedup family:

- ``dedup.semantic_dedup`` is the exact/pluggable-candidate COMPONENT
  spelling (keep the min id of each connected component) — the
  validation baseline and the right tool when a candidate pair frame
  already exists (LSH buckets, ANN results);
- THIS module is the published SemDeDup recipe: no global pair frame
  at all — the only pairwise work happens inside a cluster, and the
  decision is the paper's triangular max, not connected components.
  On a chain A~B~C with A≁C the farthest-first ordering puts the
  middle vector last (it is nearest the centroid), so the two ENDS
  survive and the middle drops — components would keep exactly one
  of the three. Dropped items still serve as comparison targets for
  later items (the triangle is over ALL earlier rows), exactly as in
  the paper's max-over-upper-triangular formulation.

Scale shape: the corpus's vectors shuffle ONCE, on the cluster key
(text never enters the plan); per cluster, ONE Arrow group computes
the triangular cosine max in fixed-size blocks (O(block²) memory,
never a cluster-sized matrix), so the per-task cost is bounded by
``max_cluster_size`` — clusters past the cap raise loudly with the
fix (raise k) instead of silently grinding. ``k ≈ n_vectors /
(a few thousand)`` keeps every group small; the paper itself relies
on exactly this pigeonhole.

Determinism: the ordering is (sq_dist DESC, id ASC) under a FIXED
model, and each cluster is processed in one group — the kept set is
invariant to partitioning (pytest-pinned). Zero vectors normalize to
zero, have cosine 0 with everything, and are therefore always kept.

Reference scope note: the reference ETL has no analog; this is part
of the training-data surface the Spark engine adds (SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from solana_snapshot_etl_tools_spark._pickle import register_self

register_self(__name__)

# per-task pairwise work is O(cluster²·d/2): 100k rows of 768-d is
# ~4 Tflop — already generous for one task. Raise k instead.
DEFAULT_MAX_CLUSTER = 100_000

# cosine blocks: 1024² float64 running tiles keep peak memory ~16 MB
# per task regardless of cluster size
_BLOCK = 1024

_DECISION_SCHEMA = (
    "id long, cluster_id int, kept boolean, "
    "max_prior_sim double, witness_id long"
)


def semdedup(
    emb: DataFrame,
    k: int | None = None,
    *,
    model: dict | None = None,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = DEFAULT_MAX_CLUSTER,
    kmeans_max_iter: int = 20,
    seed: int = 42,
    prefer_col: str | None = None,
) -> DataFrame:
    """The SemDeDup decision table: one row per vector —
    ``(id, cluster_id, kept, max_prior_sim, witness_id)``.

    ``kept`` is False iff the vector's max cosine to any EARLIER
    vector of its cluster (farthest-from-centroid first, ties by id)
    reaches ``threshold``; ``witness_id``/``max_prior_sim`` name the
    most-similar earlier vector (the paper's duplicate evidence — the
    witness may itself have been dropped; it is an evidence pointer,
    not a canonical representative). The first vector of a cluster
    has NULL witness columns. Survivors: ``.filter("kept")``.

    Pass ``k`` to fit a spherical k-means here (``cluster.kmeans_fit``
    with ``normalize=True`` — SemDeDup operates in cosine space), or
    a prefitted ``model`` to reuse one fit across corpora/runs
    (exactly one of the two). Clusters larger than
    ``max_cluster_size`` raise with the remedy (raise ``k``).

    ``prefer_col`` (a column of ``emb``; higher = better, NULL = worst,
    NaN sorts after every finite value) re-orders each cluster's visit
    sequence to quality-first (pref DESC, then farthest-from-centroid,
    then id) so the BEST member of every near-dup neighborhood is the
    one kept — the paper's ordering choices are interchangeable by
    construction (any fixed order keeps exactly one ε-representative
    per neighborhood); quality-first picks which one. The column rides
    the same narrow projection as the vectors (no extra join or
    shuffle); the default path is unchanged."""
    if (k is None) == (model is None):
        raise ValueError(
            "semdedup takes exactly one of k (fresh spherical k-means) "
            "or model (a cluster.kmeans_fit result)"
        )
    if not 0.0 < threshold < 1.0:
        raise ValueError(
            f"threshold must be in (0, 1), got {threshold} (SemDeDup's "
            "eps is a cosine bar; >= 1 keeps everything, <= 0 is "
            "degenerate)"
        )
    if max_cluster_size < 1:
        raise ValueError(f"max_cluster_size must be >= 1, got {max_cluster_size}")

    from solana_snapshot_etl_tools_spark.operators.cluster import (
        _argmin_sqdist,
        _prep,
        kmeans_fit,
    )

    if model is None:
        model = kmeans_fit(
            emb, k, id_col=id_col, vec_col=vec_col,
            max_iter=kmeans_max_iter, seed=seed, normalize=True,
        )
    if not model.get("normalize"):
        raise ValueError(
            "semdedup needs a SPHERICAL k-means model "
            "(kmeans_fit(..., normalize=True)): cosine ordering under "
            "an unnormalized model would rank by magnitude, not angle"
        )

    # assignment is computed INLINE with the vector (one narrow Arrow
    # pass, centroids broadcast) instead of kmeans_assign + a join —
    # the join spelling shuffled the vectors on id before the cluster
    # groupBy shuffled them again; this way they cross exactly once
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(
        np.asarray(model["centroids"], dtype=np.float64)
    )

    def assign_gen(batches):
        C = None
        for pdf in batches:
            if C is None:
                C = np.asarray(bc.value, dtype=np.float64)
            if not len(pdf):
                continue
            bad = pdf.loc[pdf["vec"].isna(), "id"].tolist()
            if bad:
                raise ValueError(
                    f"semdedup: NULL embedding for ids {bad[:10]}"
                    f"{'…' if len(bad) > 10 else ''}"
                )
            try:
                X = np.array(pdf["vec"].tolist(), dtype=np.float64)
            except ValueError as e:
                raise ValueError(
                    "semdedup: ragged embedding lengths (ids "
                    f"{pdf['id'].tolist()[:10]}…): {e}"
                ) from None
            a, d2 = _argmin_sqdist(X, C)
            yield pdf.assign(
                cluster_id=a.astype(np.int32), sq_dist=d2
            )

    extra, pref_field = (), ""
    if prefer_col is not None:
        extra = (
            F.coalesce(
                F.col(prefer_col).cast("double"), F.lit(float("-inf"))
            ).alias("pref"),
        )
        pref_field = " pref double,"
    work = _prep(emb, id_col, vec_col, normalize=True, extra=extra).mapInPandas(
        assign_gen,
        f"id long, vec array<double>,{pref_field} cluster_id int, sq_dist double",
    )

    cap = int(max_cluster_size)
    eps = float(threshold)

    def decide(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        cid = int(pdf["cluster_id"].iloc[0])
        if n > cap:
            raise ValueError(
                f"semdedup cluster {cid} holds {n} vectors "
                f"(max_cluster_size={cap}): raise k so the pairwise "
                "block stays bounded"
            )
        bad = pdf.loc[pdf["vec"].isna(), "id"].tolist()
        if bad:
            raise ValueError(
                f"semdedup: NULL embedding for ids {bad[:10]}"
                f"{'…' if len(bad) > 10 else ''} in cluster {cid}"
            )
        if "pref" in pdf.columns:
            # quality-first: pref DESC, then farthest-from-centroid,
            # then id (np.lexsort's LAST key is primary). NaN prefs
            # sort after all finite -pref values => visited last
            order = np.lexsort(
                (
                    pdf["id"].to_numpy(),
                    -pdf["sq_dist"].to_numpy(),
                    -pdf["pref"].to_numpy(),
                )
            )
        else:
            order = np.lexsort(
                (pdf["id"].to_numpy(), -pdf["sq_dist"].to_numpy())
            )
        ids = pdf["id"].to_numpy()[order]
        try:
            X = np.array(pdf["vec"].iloc[order].tolist(), dtype=np.float64)
        except ValueError as e:
            raise ValueError(
                f"semdedup: ragged embedding lengths in cluster {cid} "
                f"(ids {ids[:10].tolist()}…): {e}"
            ) from None
        if X.ndim != 2:
            raise ValueError(
                f"semdedup: ragged embedding lengths in cluster {cid} "
                f"(ids {ids[:10].tolist()}…)"
            )
        msim = np.full(n, -np.inf)
        wit = np.zeros(n, dtype=np.int64)
        # triangular max in (row-block x col-block) tiles: running
        # max/argmax over earlier columns only
        for rs in range(0, n, _BLOCK):
            re_ = min(rs + _BLOCK, n)
            R = X[rs:re_]
            rows = np.arange(rs, re_)
            for cs in range(0, re_, _BLOCK):
                ce = min(cs + _BLOCK, re_)
                S = R @ X[cs:ce].T
                cols = np.arange(cs, ce)
                S[cols[None, :] >= rows[:, None]] = -np.inf
                bmax = S.max(axis=1)
                upd = bmax > msim[rs:re_]
                if upd.any():
                    barg = S.argmax(axis=1) + cs
                    msim[rs:re_][upd] = bmax[upd]
                    wit[rs:re_][upd] = ids[barg[upd]]
        has_prior = np.isfinite(msim)
        wit_out = wit.astype(object)
        wit_out[~has_prior] = None
        return pd.DataFrame(
            {
                "id": ids,
                "cluster_id": np.full(n, cid, dtype=np.int32),
                "kept": ~has_prior | (msim < eps),
                "max_prior_sim": np.where(has_prior, msim, np.nan),
                "witness_id": wit_out,
            }
        )

    out = work.groupBy("cluster_id").applyInPandas(decide, _DECISION_SCHEMA)
    # NaN -> NULL for the no-prior rows (Arrow ships NaN as a double)
    return out.select(
        F.col("id").alias(id_col),
        "cluster_id",
        "kept",
        F.when(
            F.isnan("max_prior_sim"), F.lit(None).cast("double")
        ).otherwise(F.col("max_prior_sim")).alias("max_prior_sim"),
        "witness_id",
    )


def semdedup_filter(
    docs: DataFrame,
    emb: DataFrame,
    k: int | None = None,
    *,
    model: dict | None = None,
    threshold: float = 0.9,
    doc_id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = DEFAULT_MAX_CLUSTER,
    prefer_col: str | None = None,
) -> DataFrame:
    """Apply :func:`semdedup` to a document corpus: documents whose
    embedding was dropped vanish; documents WITHOUT an embedding pass
    through (they cannot be compared — the decontamination stage's
    posture, documented there). All input columns pass through.

    ``prefer_col`` names a quality column of ``docs`` (higher =
    better): it is joined onto the embeddings by id (one extra
    shuffle of (id, pref) longs — opt-in) and each near-dup
    neighborhood keeps its highest-quality member instead of the
    farthest-from-centroid-first default; embeddings with no matching
    doc rank worst (NULL → -inf)."""
    # the anti-join below compares both ids AS LONG; a string id
    # would cast to NULL, never match, and silently turn the whole
    # dedup into a no-op — fail loudly instead (same posture as
    # apply_token_budget_plan's source-key type check)
    for frame, col, arg in (
        (docs, doc_id_col, "doc_id_col"),
        (emb, emb_id_col, "emb_id_col"),
    ):
        t = frame.schema[col].dataType.simpleString()
        if t not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"semdedup_filter: {arg} '{col}' must be an integral "
                f"column (got {t}) — a non-numeric id casts to NULL in "
                "the anti-join and the dedup silently becomes a no-op; "
                "cast or map your ids to long first"
            )
    emb_in, emb_pref = emb, None
    if prefer_col is not None:
        if prefer_col not in docs.columns:
            raise ValueError(
                f"semdedup_filter: prefer_col '{prefer_col}' is not a "
                f"column of docs (has: {docs.columns})"
            )
        pref = docs.select(
            F.col(doc_id_col).cast("long").alias("_pref_id"),
            F.col(prefer_col).cast("double").alias("_pref"),
        )
        emb_in = emb.join(
            pref,
            F.col(emb_id_col).cast("long") == F.col("_pref_id"),
            "left",
        ).drop("_pref_id")
        emb_pref = "_pref"
    dec = semdedup(
        emb_in, k, model=model, threshold=threshold, id_col=emb_id_col,
        vec_col=vec_col, max_cluster_size=max_cluster_size,
        prefer_col=emb_pref,
    )
    dropped = dec.filter(~F.col("kept")).select(
        F.col(emb_id_col).cast("long").alias("_drop_id")
    )
    return docs.join(
        dropped,
        F.col(doc_id_col).cast("long") == F.col("_drop_id"),
        "left_anti",
    )
