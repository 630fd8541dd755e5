"""Batch sinks K1/K3 (reference csv.rs, programs.rs).

- CSV sink: the 4-column base58 projection written with Spark's
  distributed CSV writer (header, one dir of part files — the
  scalable analog of the reference's stdout stream).
- Programs tar sink: one ``<base58 pubkey>.so`` entry per program
  (programs.rs:25-62). Tar is an inherently sequential container, so
  the entries stream through the driver via ``toLocalIterator`` —
  constant memory, single pass, same topology as the reference's
  single-threaded tar writer. The scalable alternative for bulk use
  is per-program files via the partitioned writer; both provided.
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame

from solana_snapshot_etl_tools_spark.functions.base58 import b58encode
from solana_snapshot_etl_tools_spark.operators.decoders import csv_projection


def write_csv(raw: DataFrame, path: str) -> None:
    """K1: (pubkey, owner, data_len, lamports) base58 CSV."""
    csv_projection(raw).write.mode("overwrite").option("header", True).csv(path)


def write_programs_tar(program_elfs: DataFrame, tar_path: str) -> int:
    """K3: stream (pubkey, elf) rows into a tar of ``<base58>.so``
    entries (mode 0644, programs.rs:56-59). Returns entry count."""
    n = 0
    with tarfile.open(tar_path, "w") as tf:
        for row in program_elfs.select("pubkey", "elf").toLocalIterator():
            info = tarfile.TarInfo(name=f"{b58encode(bytes(row.pubkey))}.so")
            info.size = len(row.elf)
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(bytes(row.elf)))
            n += 1
    return n


def read_programs_tar(spark, tar_path: str) -> DataFrame:
    """S6: the opcode-stats input — a tar of ELFs, one per program,
    program id from the ``<base58>.so`` entry name
    (bin/solana-opcode-stats/main.rs:30-53)."""
    from solana_snapshot_etl_tools_spark.functions.base58 import b58decode

    rows = []
    with tarfile.open(tar_path, "r|*") as tf:
        for entry in tf:
            if not entry.isfile() or not entry.name.endswith(".so"):
                continue
            pid = b58decode(entry.name.rsplit("/", 1)[-1][:-3])
            rows.append((pid, tf.extractfile(entry).read()))
    return spark.createDataFrame(rows, "program_id binary, elf binary")


def write_program_files(program_elfs: DataFrame, out_dir: str) -> None:
    """Scale path for K3: distributed per-program files (each executor
    writes its partition's programs directly to shared storage)."""
    from solana_snapshot_etl_tools_spark.functions.base58 import b58encode as enc

    def write_partition(rows):
        import os

        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            with open(os.path.join(out_dir, f"{enc(bytes(row.pubkey))}.so"), "wb") as f:
                f.write(bytes(row.elf))

    program_elfs.select("pubkey", "elf").foreachPartition(write_partition)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    records_per_shard: int = 65536,
    order_col: str | None = None,
    compression: str = "zstd",
    drop_order_col: bool = False,
    format: str = "parquet",
) -> DataFrame:
    """Training-pipeline sink: pack a cleaned corpus into uniformly
    sized shards, the layout a downstream training loader streams
    (one shard ≈ one loader work unit).

    - ``repartitionByRange(order_col)`` makes shards contiguous and
      balanced (range boundaries come from Spark's reservoir sample —
      one extra narrow pass, the price of deterministic shard
      membership); without an order column the split is hash-based.
    - ``sortWithinPartitions`` fixes row order inside each shard, so
      a rewrite of the same input is byte-stable modulo parquet
      metadata.
    - ``maxRecordsPerFile`` caps stragglers if a range boundary lands
      unevenly.

    ``format``: ``'parquet'`` (default, zstd) or ``'jsonl'`` —
    gzipped JSON-lines shards, the wire format most training loaders
    ingest directly (one JSON object per line; binary columns encode
    as base64, int arrays as JSON arrays). Same sharding/ordering
    machinery; the manifest read-back counts text lines so it never
    needs schema inference.

    Returns the shard manifest as a DataFrame (shard file, rows) from
    a column-less read-back of the written shards."""
    import math

    from pyspark.sql import functions as F

    if format not in ("parquet", "jsonl"):
        raise ValueError(f"format must be parquet or jsonl, got {format!r}")
    n = df.count()
    shards = max(1, math.ceil(n / records_per_shard))
    if order_col is not None:
        packed = df.repartitionByRange(shards, F.col(order_col)).sortWithinPartitions(
            order_col
        )
        if drop_order_col:
            # a synthetic order key (e.g. a shuffle hash) has fixed
            # the layout; it need not land in the shards themselves
            packed = packed.drop(order_col)
    else:
        packed = df.repartition(shards)
    spark = df.sparkSession
    if format == "jsonl":
        (
            packed.write.mode("overwrite")
            .option("maxRecordsPerFile", records_per_shard)
            .option("compression", "gzip")
            .json(out_dir)
        )
        return (
            spark.read.text(out_dir)
            .groupBy(F.input_file_name().alias("shard"))
            .count()
            .withColumnRenamed("count", "rows")
        )
    (
        packed.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .option("compression", compression)
        .parquet(out_dir)
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy(F.input_file_name().alias("shard"))
        .count()
        .withColumnRenamed("count", "rows")
    )


def estimate_parquet_row_bytes(
    df: DataFrame,
    sample_rows: int = 2048,
    compression: str = "zstd",
    total_rows: int | None = None,
) -> float:
    """Estimate on-disk parquet bytes per row by actually encoding a
    bounded sample (pyarrow in-memory write, same codec) — dictionary
    and compression effects included, which a schema-width guess gets
    wrong by 10× on text. Driver-side cost is capped at
    ``sample_rows`` rows regardless of input size.

    Pass ``total_rows`` (a count the caller usually already has) to
    draw a seeded Bernoulli sample across ALL partitions before the
    limit — a bare ``limit`` reads the head of the frame, which is a
    biased sample whenever row sizes correlate with frame order
    (post-clustering, per-source ordering...). Without it the head
    sample is used, documented bias and all."""
    import pyarrow.parquet as pq

    if total_rows is not None and total_rows > sample_rows:
        frac = min(1.0, 2.0 * sample_rows / total_rows)
        df = df.sample(fraction=frac, seed=7)
    sample = df.limit(sample_rows).toArrow()
    n = sample.num_rows
    if n == 0:
        raise ValueError("cannot estimate row size of an empty frame")
    buf = io.BytesIO()
    pq.write_table(sample, buf, compression=compression)
    return buf.getbuffer().nbytes / n


def write_sized_parquet(
    df: DataFrame,
    out_dir: str,
    target_mb: int = 512,
    order_col: str | None = None,
    compression: str = "zstd",
    sample_rows: int = 2048,
) -> int:
    """Write parquet with files sized for the CLUSTER, not the tasks.

    The two layout failure modes at 100 TB are both writer-side: a
    shuffle with thousands of tasks writes thousands of KB-files per
    stage (NameNode/listing pressure, per-file open cost swamps the
    scan), and an unpartitioned write emits multi-GB files a reader
    cannot split finer than the row-group. This sink measures the
    corpus's actual encoded bytes-per-row on a bounded sample, then
    repartitions so each output file lands near ``target_mb`` (the
    128 MiB–1 GiB sweet spot for object stores and
    ``maxPartitionBytes``-sized rescans).

    With ``order_col`` the files are range-contiguous on that column —
    pair with a sorted column a reader filters on and parquet min/max
    row-group pruning skips whole files. Returns the file count."""
    import math

    from pyspark.sql import functions as F

    n = df.count()
    bytes_per_row = estimate_parquet_row_bytes(
        df, sample_rows, compression, total_rows=n
    )
    files = max(1, math.ceil(n * bytes_per_row / (target_mb << 20)))
    if order_col is not None:
        packed = df.repartitionByRange(files, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    else:
        packed = df.repartition(files)
    packed.write.mode("overwrite").option("compression", compression).parquet(out_dir)
    return files
