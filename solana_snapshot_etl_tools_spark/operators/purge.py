"""Right-to-be-forgotten purge over the ingest loop's persisted state.

Deleting data is the one corpus operation append-only stores make
hard, and the one a governed 100 TB pipeline cannot skip: a takedown
or privacy request must remove documents from EVERY sidecar that
remembers them, or a later probe resurrects them (an index row keeps
blocking "duplicates" of a purged doc; a profile partial keeps
counting it). ``purge_ids`` removes a doc-id set consistently from:

- the stream corpus store (``OUT/corpus``, ``batch=N``-partitioned):
  only partitions CONTAINING purged ids are rewritten (dynamic
  overwrite, the store's own append mechanism); a fully-emptied batch
  partition is removed outright (dynamic overwrite cannot delete);
- the exact+LSH dedup index and minhash signature table
  (``IDX/index``, ``IDX/sigs``): count-verified filtered rewrite with
  the same crash-safe atomic swap ``compact_parquet_dir`` uses (the
  live data is never deleted before its replacement is installed);
- the bloom sidecar (``IDX/bloom``): REBUILT from the remaining
  index — bloom filters cannot delete;
- the profile store (``OUT/profile``): affected batches' partials are
  recomputed from the purged corpus rows; emptied batches' partials
  are removed.

Scale note: the corpus/profile rewrites are partition-scoped (bounded
by how many batches the purged ids touch). The index/sigs rewrite is
a full pass over those stores — compact rows, ~1000× smaller than the
text; at a scale where even that hurts, persist the index bucketed by
``doc`` and swap this for a keyed rewrite.

Every count in the returned audit dict is measured, not assumed —
a purge that silently misses a store is worse than one that fails.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def _exists(path: str) -> bool:
    return os.path.isdir(path) and bool(
        _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        or _glob.glob(os.path.join(path, "*.parquet"))
    )


def _as_key(ids: DataFrame, key_col: str, dtype) -> DataFrame:
    """The purge list cast to the store's own key type (a WARC-derived
    corpus keys docs by hex STRING, the fixtures by long — the join
    must not silently miss on a type mismatch)."""
    return ids.select(
        F.col(ids.columns[0]).cast(dtype).alias(key_col)
    ).filter(F.col(key_col).isNotNull())


def _atomic_filtered_rewrite(
    spark: SparkSession, path: str, ids: DataFrame, key_col: str,
    bcast=F.broadcast,
) -> tuple[int, int]:
    """Rewrite ``path`` minus rows whose ``key_col`` is in ``ids``
    (anti-join; ``bcast`` is identity for over-cap takedown lists),
    with the count-verified temp-dir + rename swap.
    Returns (rows_before, rows_after)."""
    spark.catalog.refreshByPath(path)
    df = spark.read.parquet(path)
    before = df.count()
    kept = df.join(
        bcast(_as_key(ids, key_col, df.schema[key_col].dataType)),
        key_col,
        "left_anti",
    )
    expect = kept.count()
    if expect == before:
        return before, before  # nothing to remove — leave bytes alone
    token = uuid.uuid4().hex[:8]
    tmp = f"{path}._purge.{token}"
    kept.write.mode("overwrite").parquet(tmp)
    check = spark.read.parquet(tmp).count()
    if check != expect:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"purge rewrite of {path} wrote {check} rows, expected "
            f"{expect}; source left untouched"
        )
    old = f"{path}._old.{token}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)
    return before, check


# above this many ids the purge list stops riding a broadcast join:
# a multi-million-row takedown list as a broadcast is a driver/executor
# memory hazard; a shuffled anti-join is the correct shape there
_BROADCAST_ID_CAP = 1_000_000


def purge_ids(
    spark: SparkSession,
    out_dir: str,
    ids: DataFrame,
    index_dir: str | None = None,
    id_col: str = "doc_id",
) -> dict:
    """Remove ``ids`` (a one-column DataFrame of doc ids) from the
    stream state under ``out_dir`` (corpus + profile stores) and,
    when given, the dedup index under ``index_dir`` (index + sigs +
    bloom). Returns the audit dict described in the module doc."""
    ids = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    n_requested = ids.count()
    audit: dict[str, object] = {"n_ids_requested": n_requested}
    _maybe_bcast = (
        F.broadcast if n_requested <= _BROADCAST_ID_CAP else (lambda d: d)
    )

    corpus_path = f"{out_dir}/corpus"
    emptied: list = []
    affected: list = []
    log_ids = ids
    if _exists(corpus_path):
        corpus = spark.read.parquet(corpus_path)
        cids = _as_key(ids, id_col, corpus.schema[id_col].dataType)
        log_ids = cids  # tombstones in the corpus's own key type
        hit = corpus.join(_maybe_bcast(cids), id_col, "left_semi")
        audit["n_corpus_rows_removed"] = hit.count()
        affected = [
            r.batch for r in hit.select("batch").distinct().collect()
        ]
        audit["corpus_batches_affected"] = sorted(affected)
        if affected:
            survivors = corpus.filter(
                F.col("batch").isin(affected)
            ).join(_maybe_bcast(cids), id_col, "left_anti")
            emptied = sorted(
                set(affected)
                - {
                    r.batch
                    for r in survivors.select("batch").distinct().collect()
                }
            )
            (
                survivors.repartition("batch")
                .write.partitionBy("batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(corpus_path)
            )
            # dynamic overwrite cannot DELETE a partition: a batch
            # whose every row was purged must be removed outright
            for b in emptied:
                d = os.path.join(corpus_path, f"batch={b}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
            spark.catalog.refreshByPath(corpus_path)
            audit["corpus_batches_emptied"] = emptied
    else:
        audit["n_corpus_rows_removed"] = 0

    profile_path = f"{out_dir}/profile"
    if _exists(profile_path) and affected:
        from solana_snapshot_etl_tools_spark.operators.profile import (
            corpus_profile,
        )

        store = spark.read.parquet(profile_path)
        stored = {
            r.batch for r in store.select("batch").distinct().collect()
        }
        redo = sorted((set(affected) - set(emptied)) & stored)
        if redo:
            fresh = spark.read.parquet(corpus_path).filter(
                F.col("batch").isin(redo)
            )
            part = corpus_profile(
                fresh.select(id_col, "text", "batch"), by="batch"
            )
            (
                part.repartition("batch")
                .write.partitionBy("batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(profile_path)
            )
        for b in sorted(set(emptied) & stored):
            d = os.path.join(profile_path, f"batch={b}")
            if os.path.isdir(d):
                shutil.rmtree(d)
        spark.catalog.refreshByPath(profile_path)
        audit["profile_batches_recomputed"] = redo

    if index_dir:
        idx_path = f"{index_dir}/index"
        if _exists(idx_path):
            before, after = _atomic_filtered_rewrite(
                spark, idx_path, ids, "doc", bcast=_maybe_bcast
            )
            audit["n_index_rows_removed"] = before - after
            sig_path = f"{index_dir}/sigs"
            if _exists(sig_path):
                b2, a2 = _atomic_filtered_rewrite(
                    spark, sig_path, ids, "doc", bcast=_maybe_bcast
                )
                audit["n_signature_rows_removed"] = b2 - a2
            bloom_path = f"{index_dir}/bloom"
            if _exists(bloom_path):
                from solana_snapshot_etl_tools_spark.operators.incremental import (
                    index_bloom,
                )

                index_bloom(
                    spark.read.parquet(idx_path)
                ).write.mode("overwrite").parquet(bloom_path)
                spark.catalog.refreshByPath(bloom_path)
                audit["bloom_rebuilt"] = True
        else:
            audit["n_index_rows_removed"] = 0

    # tombstone log: the governance trail a takedown needs — WHICH ids
    # were purged and when, appended beside the state it changed. The
    # log is the one store a purge must NOT purge.
    log = log_ids.select(
        id_col,
        F.current_timestamp().alias("purged_at"),
        F.lit(audit.get("n_corpus_rows_removed", 0) > 0).alias(
            "corpus_touched"
        ),
    )
    log.coalesce(1).write.mode("append").parquet(f"{out_dir}/purge_log")
    audit["purge_log"] = f"{out_dir}/purge_log"
    return audit
