"""Token-sequence packing: concatenate the tokenized corpus (in doc-id
order, with an EOS separator) and chop it into fixed-length training
sequences — the standard GPT-style pretraining layout. Sits between
``operators/bpe.py`` (ids) and ``operators/sinks.py:
write_training_shards`` (files).

Determinism contract: the output is a pure function of the input
table and ``seq_len`` — independent of partition count, cluster size
and execution order (including under duplicate doc ids, whose order
is fixed by a (length, content-hash) tiebreak) — because every
token's GLOBAL offset in the virtual concatenated stream is computed
exactly, not approximated per-partition:

1. global prefix sums of per-doc lengths use the classic scalable
   two-pass shape — range-repartition by id, a PARALLEL window
   (partitioned by shuffle partition, ordered by id) for within-
   partition cumsums, and one driver-side prefix over the per-
   partition totals (#partitions rows — kilobytes at any scale;
   the legitimate driver-side shape, cf. the ANN codebooks). No
   global single-partition window anywhere;
2. a doc spanning sequence boundaries is SPLIT across them (narrow
   per-row slice arithmetic), so sequences are exactly ``seq_len``
   tokens with no padding waste — only the final sequence can be
   partial (``fill_frac < 1``);
3. reassembly is one groupBy(seq_id) with sort_array over (offset,
   piece) structs — each group holds ≤ seq_len tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def pack_token_sequences(
    enc: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    eos_id: int | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Pack (id, token_ids) rows into (seq_id, input_ids, n_tokens,
    n_docs, fill_frac) with ``input_ids`` exactly ``seq_len`` long
    except the final sequence. ``eos_id`` (if given) is appended to
    every document before packing. Empty documents contribute only
    their EOS (or nothing without one)."""
    toks = F.col(tokens_col)
    if eos_id is not None:
        toks = F.concat(toks, F.array(F.lit(eos_id).cast("int")))
    spark = enc.sparkSession
    n_part = num_ranges or spark.sparkContext.defaultParallelism
    d = (
        enc.select(F.col(id_col).alias("_id"), toks.alias("_t"))
        .withColumn("_n", F.size("_t").cast("long"))
        .filter(F.col("_n") > 0)
        .repartitionByRange(n_part, "_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    # pass 1: per-range totals → driver prefix (one tiny collect)
    totals = {
        r._pid: r.tot
        for r in d.groupBy("_pid").agg(F.sum("_n").alias("tot")).collect()
    }
    base, acc = {0: 0}, 0  # dummy entry keeps create_map non-empty on empty input
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    base_map = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv]
    )
    # pass 2: parallel within-range cumsum; _end is the global offset
    # just past this doc's last token. The window order carries a
    # deterministic tiebreak beyond _id — duplicate ids would
    # otherwise make the cumsum (and thus the packing) depend on
    # execution order; with (_n, xxhash64(_t)) the only remaining
    # ties are fully identical rows, which are interchangeable in the
    # output (pinned by pytest).
    win = W.partitionBy("_pid").orderBy(
        "_id", "_n", F.xxhash64("_t")
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    d = d.withColumn(
        "_end", base_map[F.col("_pid")] + F.sum("_n").over(win)
    ).withColumn("_start", F.col("_end") - F.col("_n"))
    # split each doc into per-sequence pieces (narrow)
    L = seq_len
    pieces = F.transform(
        F.sequence(
            # integer div — exact at any stream length (no double round-trip)
            F.expr(f"_start div {L}"),
            F.expr(f"(_end - 1) div {L}"),
        ),
        lambda s: F.struct(
            s.alias("seq_id"),
            F.greatest(s * L, F.col("_start")).alias("pos"),
            F.slice(
                F.col("_t"),
                (F.greatest(s * L, F.col("_start")) - F.col("_start") + 1).cast(
                    "int"
                ),
                (
                    F.least((s + 1) * L, F.col("_end"))
                    - F.greatest(s * L, F.col("_start"))
                ).cast("int"),
            ).alias("piece"),
        ),
    )
    return (
        d.select(F.explode(pieces).alias("p"))
        .groupBy(F.col("p.seq_id").alias("seq_id"))
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("p.pos", "p.piece"))
                    ),
                    lambda x: x["piece"],
                )
            ).alias("input_ids"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "seq_id",
            "input_ids",
            F.size("input_ids").cast("long").alias("n_tokens"),
            "n_docs",
            (F.size("input_ids") / F.lit(float(L))).alias("fill_frac"),
        )
    )
