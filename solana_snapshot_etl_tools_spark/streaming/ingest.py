"""Streaming shard ingestion — incremental dedup as a Structured
Streaming stage.

The batch story (`operators/incremental.py`) dedups each arriving
shard against a persisted index and appends the survivors; this
module runs the SAME operators under ``foreachBatch``, so a directory
(or Kafka topic, on a cluster with the jar) of incoming shards becomes
a continuously deduplicated corpus:

    per micro-batch:  read index → flag batch vs index AND earlier
    rows of the batch → append kept docs to the corpus → append the
    kept rows' index/signature entries → next batch sees them.

Micro-batch boundaries serialize the index read-modify-append, which
is exactly the loop-closure contract ``kept_index_rows`` documents —
no concurrent-writer coordination is needed because Structured
Streaming already guarantees one batch at a time per query.

Replay idempotence (foreachBatch is at-least-once): a REPLAYED batch's
documents are already in the index, so every row flags ``dup_exact``
and the replay appends nothing — the exact tier self-heals; only
near-candidate *flag statistics* could differ across a replay, never
the kept corpus. This is strictly stronger than the reference's
fire-and-forget delivery (SURVEY ST6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solana_snapshot_etl_tools_spark.operators.dedup import (
    release_session_caches,
)
from solana_snapshot_etl_tools_spark.operators.incremental import (
    build_index,
    dedup_against_index,
    kept_index_rows,
    kept_signature_rows,
    signature_table,
)


def ingest_dedup_stream(
    shards: DataFrame,
    index_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    drop_near_candidates: bool = False,
    available_now: bool = False,
):
    """Start the ingestion query over a streaming ``shards`` frame.
    ``index_dir`` holds ``index/`` (band-partitioned) and ``sigs/``;
    both are created by the first batch (an absent index is the empty
    corpus — ``build_index`` of zero rows supplies the schema), so no
    separate bootstrap step exists. Returns the StreamingQuery."""
    spark = shards.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from solana_snapshot_etl_tools_spark.operators.dedup import (
            _CheckpointHandle,
        )

        try:
            index = spark.read.parquet(f"{index_dir}/index")
        except Exception:  # first batch: empty index, matching schema
            index = build_index(batch_df.limit(0), id_col, text_col)
        try:
            sigs = spark.read.parquet(f"{index_dir}/sigs")
        except Exception:
            sigs = signature_table(batch_df.limit(0), id_col, text_col)
        # MATERIALIZE the flags before any append: flagged's lazy plan
        # READS index/sigs — the paths this batch appends to. A merely
        # persisted frame can be silently recomputed (cache eviction,
        # a later action) AGAINST THE POST-APPEND state, where every
        # kept doc is now its own index hit → dup_exact → the write
        # sees zero rows (observed: the signature append after the
        # index append). localCheckpoint severs the file-source
        # lineage, so every downstream write reads this batch's
        # materialized decision — or fails loudly, never silently
        # recomputes against moved state.
        flagged = dedup_against_index(
            batch_df,
            index,
            old_sigs=sigs,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
        ).localCheckpoint(eager=True)
        handle = _CheckpointHandle(flagged)
        try:
            keep = ~F.col("dup_exact")
            if drop_near_candidates:
                keep = keep & ~F.col("dup_near_candidate")
            kept = flagged.filter(keep).drop(
                "dup_exact", "dup_near_candidate"
            )
            kept.write.mode("append").parquet(corpus_dir)
            kept_index_rows(
                flagged,
                id_col,
                text_col,
                drop_near_candidates=drop_near_candidates,
            ).write.mode("append").partitionBy("band").parquet(
                f"{index_dir}/index"
            )
            kept_signature_rows(
                flagged,
                id_col,
                text_col,
                drop_near_candidates=drop_near_candidates,
            ).write.mode("append").parquet(f"{index_dir}/sigs")
            # the session-level FileStatusCache serves STALE listings
            # for a path appended to in the same session — without an
            # explicit refresh, the NEXT batch's index/sigs read (and
            # any same-session reader of the corpus) silently misses
            # this batch's files
            for p in (f"{index_dir}/index", f"{index_dir}/sigs", corpus_dir):
                spark.catalog.refreshByPath(p)
        finally:
            handle.unpersist()
            release_session_caches()

    writer = (
        shards.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
