"""Streaming sinks + test harness.

The Kafka writer is the production sink (the reference's five-topic
producer, sender.rs:49-105); it needs the spark-sql-kafka package on
the classpath, so it is gated. For tests and local runs,
``run_available_now`` drives any pipeline over a file source to
completion synchronously (micro-batch replay of a directory).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_kafka(
    routed: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
):
    """Topic-routed Kafka writer: Spark routes on the `topic` column
    natively. At-least-once with checkpointing (stronger than the
    reference's fire-and-forget). Raises a clear error when the Kafka
    connector jars are absent (not bundled in this environment)."""
    try:
        return (
            routed.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "Kafka sink requires the spark-sql-kafka connector on the "
            "classpath (add org.apache.spark:spark-sql-kafka-0-10 via "
            "spark.jars.packages)."
        ) from e


def foreach_batch_push(
    stream: DataFrame,
    consumer: Callable,
    checkpoint_dir: str | None = None,
    mode: str = "partitions",
):
    """K4 analog — the reference dlopens a Geyser plugin and pushes
    each account into it (geyser_plugin.rs:25-60); here any Python
    callable ``consumer(rows: list, epoch_id: int)`` receives the
    micro-batch data. No dlopen, no per-account 300 µs sleep (ST7) —
    Spark backpressure (maxOffsetsPerTrigger / trigger interval)
    replaces the hand rate limit.

    ``mode`` picks where the consumer runs — sized for a 100 TB replay
    where a whole micro-batch cannot land on the driver:

    - ``"partitions"`` (default): consumer invoked EXECUTOR-side once
      per non-empty partition via ``foreachPartition``; nothing is
      materialized on the driver. The consumer must be picklable and
      side-effect through an external system (socket, file, queue).
    - ``"iterate"``: consumer runs driver-side but receives a row
      iterator (``toLocalIterator`` — one partition in memory at a
      time), for consumers that must live in the driver process.
    - ``"collect"``: legacy whole-batch driver delivery; only for
      toy-scale tests.
    """
    if mode == "partitions":

        def push(batch_df: DataFrame, epoch_id: int) -> None:
            def handle(rows_iter) -> None:
                rows = list(rows_iter)
                if rows:
                    consumer(rows, epoch_id)

            batch_df.foreachPartition(handle)

    elif mode == "iterate":

        def push(batch_df: DataFrame, epoch_id: int) -> None:
            consumer(batch_df.toLocalIterator(), epoch_id)

    elif mode == "collect":

        def push(batch_df: DataFrame, epoch_id: int) -> None:
            consumer(batch_df.collect(), epoch_id)

    else:
        raise ValueError(f"unknown mode {mode!r}")

    writer = stream.writeStream.foreachBatch(push).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def debug_file_consumer(rows, epoch_id: int) -> None:
    """Demo Geyser consumer for the CLI (``--geyser
    solana_snapshot_etl_tools_spark.streaming.sinks:debug_file_consumer``):
    appends one line per account (hex pubkey, slot, write_version) to a
    uniquely named file per partition under ``$SPARK_GRAFT_GEYSER_OUT``.
    Runs executor-side — the file tree is the observable analog of the
    reference plugin's side effects."""
    import os
    import uuid as _uuid

    out = os.environ.get("SPARK_GRAFT_GEYSER_OUT", "/tmp/geyser_out")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, f"part-{_uuid.uuid4().hex[:12]}.txt")
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{bytes(r.pubkey).hex()},{r.slot},{r.write_version}\n")


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    schema,
    pipeline: Callable[[DataFrame], DataFrame],
    query_name: str | None = None,
    output_mode: str = "append",
    source_options: dict | None = None,
    collect_progress: list | None = None,
) -> DataFrame:
    """Drive `pipeline` as a real Structured Streaming query over a
    parquet file source with availableNow semantics; returns the
    complete result as a batch DataFrame read back from the memory
    sink. Used by tests to prove batch/stream parity.

    ``source_options`` passes file-source options through (e.g.
    ``{"maxFilesPerTrigger": "1"}`` to force one micro-batch per file —
    how the watermark tests advance event time across batches).
    ``collect_progress``, when given a list, receives the query's
    recentProgress dicts after termination (state-operator metrics:
    eviction counts, late-row drops)."""
    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(source_dir)
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if collect_progress is not None:
        collect_progress.extend(q.recentProgress)
    return spark.sql(f"SELECT * FROM {name}")


# ship by value inside serialized tasks (workers don't share the
# driver's sys.path — see _pickle.py); needed for consumers passed to
# foreachPartition, e.g. debug_file_consumer via the CLI --geyser flag
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
