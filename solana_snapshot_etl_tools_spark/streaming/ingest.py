"""Streaming shard ingestion — incremental dedup as a Structured
Streaming stage.

The batch story (`operators/incremental.py`) dedups each arriving
shard against a persisted index and appends the survivors; this
module runs the SAME operators under ``foreachBatch``, so a directory
(or Kafka topic, on a cluster with the jar) of incoming shards becomes
a continuously deduplicated corpus:

    per micro-batch:  read the PRIOR batches' index → flag batch vs
    index AND earlier rows of the batch → write kept docs + their
    index/signature entries under this batch's partition → next batch
    sees them.

Micro-batch boundaries serialize the index read-modify-write, which
is exactly the loop-closure contract ``kept_index_rows`` documents —
no concurrent-writer coordination is needed because Structured
Streaming already guarantees one batch at a time per query.

Replay idempotence (foreachBatch is at-least-once): every output —
corpus, index, signatures — is partitioned by ``batch`` and written
with DYNAMIC partition overwrite, and the flags are computed against
strictly PRIOR batches (``batch < batch_id``). A replayed batch
therefore recomputes the identical decision from the identical prior
state and rewrites exactly its own partitions, no matter where the
previous attempt died between the three writes — a crash between
writes can neither duplicate documents nor lose them (pinned by
``test_streaming_ingestion_replay_is_idempotent``). This is strictly
stronger than the reference's fire-and-forget delivery (SURVEY ST6).
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


def _read_prior(spark, path: str, batch_id: int, mk_empty):
    """The path's contents from batches strictly before ``batch_id``,
    or the empty frame on genuine PATH_NOT_FOUND (first batch). Any
    OTHER read failure — permissions, corrupt footer, transient FS —
    raises: treating it as "empty corpus" would silently ingest every
    duplicate in the batch and poison all later batches."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        cls = ""
        try:
            cls = e.getCondition() or ""
        except Exception:
            pass
        if "PATH_NOT_FOUND" in cls or "Path does not exist" in str(e):
            return mk_empty()
        raise
    return df.filter(F.col("batch") < batch_id).drop("batch")


def process_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    corpus_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    drop_near_candidates: bool = False,
) -> None:
    """One micro-batch of the ingestion loop — public so the replay
    contract is directly testable: calling this twice with the same
    (batch_df, batch_id) must leave corpus/index/sigs identical."""
    from solana_snapshot_etl_tools_spark.operators.dedup import (
        _CheckpointHandle,
    )

    spark = batch_df.sparkSession
    index = _read_prior(
        spark,
        f"{index_dir}/index",
        batch_id,
        lambda: build_index(batch_df.limit(0), id_col, text_col),
    )
    sigs = _read_prior(
        spark,
        f"{index_dir}/sigs",
        batch_id,
        lambda: signature_table(batch_df.limit(0), id_col, text_col),
    )
    # MATERIALIZE the flags before any write: flagged's lazy plan
    # READS index/sigs — paths this batch writes to. A merely
    # persisted frame can be silently recomputed (cache eviction, a
    # later action) AGAINST THE POST-WRITE state, where every kept doc
    # is now its own index hit → dup_exact → the write sees zero rows
    # (observed: the signature write after the index write).
    # localCheckpoint severs the file-source lineage, so every
    # downstream write reads this batch's materialized decision — or
    # fails loudly, never silently recomputes against moved state.
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
        kept = flagged.filter(keep).drop("dup_exact", "dup_near_candidate")

        def write_batch(df, path, extra_parts=()):
            # dynamic partition overwrite keyed by batch id = the
            # idempotent foreachBatch write: a replay rewrites exactly
            # its own partitions
            (
                df.withColumn("batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch", *extra_parts)
                .parquet(path)
            )

        write_batch(kept, corpus_dir)
        # sketch the survivors ONCE: the signature frame feeds both
        # the signature write and the index's band rows
        ksigs = kept_signature_rows(
            flagged,
            id_col,
            text_col,
            drop_near_candidates=drop_near_candidates,
        ).persist()
        try:
            write_batch(
                kept_index_rows(
                    flagged,
                    id_col,
                    text_col,
                    drop_near_candidates=drop_near_candidates,
                    sig=ksigs,
                ),
                f"{index_dir}/index",
                extra_parts=("band",),
            )
            write_batch(ksigs, f"{index_dir}/sigs")
        finally:
            ksigs.unpersist()
        # the session-level FileStatusCache serves STALE listings for
        # a path written to in the same session — without an explicit
        # refresh, the NEXT batch's index/sigs read (and any
        # same-session reader of the corpus) silently misses this
        # batch's files
        for p in (f"{index_dir}/index", f"{index_dir}/sigs", corpus_dir):
            spark.catalog.refreshByPath(p)
    finally:
        handle.unpersist()
        release_session_caches()


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
    ``index_dir`` holds ``index/`` (partitioned by (batch, band)) and
    ``sigs/`` (by batch); the corpus is partitioned by batch — the
    ``batch`` column doubles as provenance. All three are created by
    the first batch (an absent index is the empty corpus —
    ``build_index`` of zero rows supplies the schema), so no separate
    bootstrap step exists. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_ingest_batch(
            batch_df,
            batch_id,
            index_dir,
            corpus_dir,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            drop_near_candidates=drop_near_candidates,
        )

    writer = (
        shards.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
