"""Incremental dedup for shard ingestion — dedup NEW documents against
an already-deduplicated corpus without ever re-reading it.

At 100 TB the corpus is deduplicated once; every later shard must be
checked against it. Re-running full-corpus dedup per shard is a
corpus-sized job; the right shape is a persisted INDEX (one compact
row per doc per band plus one exact-hash row — tens of bytes per doc,
~1000x smaller than the text) that new shards probe with equi-joins:

- ``build_index(docs)`` -> (doc, band, key) rows: ``band = -1`` holds
  ``xxhash64`` of the text (exact identity), bands ``0..B-1`` hold the
  minhash LSH band hashes from ``operators/dedup.py``'s sketch (same
  constants, so an index built yesterday probes identically today).
  Persist it partitioned/bucketed by ``(band, key)`` — the probe join
  is then co-located and prunes to the shard's keys.
- ``dedup_against_index(new_docs, index)`` flags each new row:
  ``dup_exact`` (identical text already in the corpus or an earlier
  row of this shard — first-id wins, the already-kept copy stays
  canonical) and ``dup_near_candidate`` (shares an LSH band with the
  corpus or shard — Jaccard-likely near-dup). Candidates are FLAGGED,
  not dropped: the index alone cannot exact-verify Jaccard (the old
  texts are not in it), so the caller chooses drop-aggressive or
  verify-with-a-targeted-fetch. Survivors' index rows are returned for
  appending, closing the loop: ``index' = index UNION kept_rows``.

64-bit exact keys: two distinct texts colliding on xxhash64 false-drop
one unique doc; expected collisions are ``n^2 / 2^65`` (~3 docs at
n = 10^10) — the same bounded-loss argument as ``operators/excise.py``
window hashing. ``exact_dedup`` keeps md5 for the one-shot path where
the wider key is free; the index trades that for 8-byte probe keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solana_snapshot_etl_tools_spark.operators.dedup import (
    LSH_BANDS,
    N_HASHES,
    _cache_for_session,
    banded_signature_rows,
    minhash_signatures,
)

EXACT_BAND = -1


def build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = N_HASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """The persistable dedup index of an (already deduplicated)
    corpus: one exact-hash row (band = -1) per doc plus one row per
    LSH band. ~ (bands + 1) x 20 bytes per doc."""
    exact = docs.select(
        F.col(id_col).alias("doc"),
        F.lit(EXACT_BAND).alias("band"),
        F.xxhash64(text_col).alias("key"),
    )
    sig = minhash_signatures(docs, id_col, text_col, k=k, n_hashes=n_hashes)
    # the canonical banding spelling — dedup.py owns it, so the pair
    # generator and every persisted index can never drift apart
    return exact.unionByName(
        banded_signature_rows(sig, bands, n_hashes, key_name="key")
    )


def dedup_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = N_HASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Flag each new row with ``dup_exact`` / ``dup_near_candidate``
    (vs the corpus index AND earlier rows of this shard) and attach
    nothing else — all input columns pass through. Docs shorter than
    the shingle width get no bands (like the sketch itself) and can
    only match exactly.

    Scale shape: the shard's (band, key) rows probe the index with one
    equi-join per kind — co-located and key-pruned when the index is
    bucketed/partitioned by (band, key); within-shard exact identity
    is a groupBy(min); within-shard band collisions a self-join on
    (band, key) keyed min — no shuffle ever carries document text. The
    shard's index rows feed three consumers, so they are cached via
    the dedup session registry (call
    ``dedup.release_session_caches()`` at a query boundary) — without
    it each action re-runs the pandas-UDF minhash sketch of the
    shard."""
    new_idx = _cache_for_session(
        build_index(new_docs, id_col, text_col, k=k, n_hashes=n_hashes, bands=bands)
    )
    probe = new_idx.alias("p")
    old = index.select("band", "key").distinct().alias("ix")
    vs_corpus = (
        probe.join(old, ["band", "key"], "left_semi")
        .groupBy("doc")
        .agg(
            F.max(F.col("band") == EXACT_BAND).alias("_ex_old"),
            F.max(F.col("band") != EXACT_BAND).alias("_nd_old"),
        )
    )
    # within-shard: the first (min) doc of an identical key keeps it
    firsts = new_idx.groupBy("band", "key").agg(F.min("doc").alias("_first"))
    vs_shard = (
        new_idx.join(firsts, ["band", "key"])
        .filter(F.col("doc") != F.col("_first"))
        .groupBy("doc")
        .agg(
            F.max(F.col("band") == EXACT_BAND).alias("_ex_new"),
            F.max(F.col("band") != EXACT_BAND).alias("_nd_new"),
        )
    )
    flags = (
        new_docs.join(
            vs_corpus.withColumnRenamed("doc", id_col), id_col, "left"
        )
        .join(vs_shard.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            *new_docs.columns,
            (F.coalesce("_ex_old", F.lit(False)) | F.coalesce("_ex_new", F.lit(False))).alias(
                "dup_exact"
            ),
            (F.coalesce("_nd_old", F.lit(False)) | F.coalesce("_nd_new", F.lit(False))).alias(
                "dup_near_candidate"
            ),
        )
    )
    return flags


def kept_index_rows(
    flagged: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = N_HASHES,
    bands: int = LSH_BANDS,
    drop_near_candidates: bool = False,
) -> DataFrame:
    """Index rows for the shard's survivors — append to the persisted
    index (``index.unionByName(kept)``) to keep the loop closed.
    ``drop_near_candidates=True`` is the aggressive policy (any band
    collision excludes the doc); the default keeps candidates in the
    corpus and the index."""
    keep = ~F.col("dup_exact")
    if drop_near_candidates:
        keep = keep & ~F.col("dup_near_candidate")
    return build_index(
        flagged.filter(keep).drop("dup_exact", "dup_near_candidate"),
        id_col,
        text_col,
        k=k,
        n_hashes=n_hashes,
        bands=bands,
    )
