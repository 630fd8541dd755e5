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
    # cache the ranged frame (optimization r16, guide §5): pass 1's
    # collect and pass 2's window/explode are separate ACTIONS over the
    # same subtree — without a persist, pass 2 re-runs the whole
    # tokenize → range-sample → shuffle pipeline (and repartitionByRange
    # pays an extra sampling pass per action), so the corpus-sized
    # token arrays were computed and shuffled twice per call. The cache
    # also guarantees both passes see the SAME range boundaries (they
    # are deterministic for identical input, but identical-by-
    # construction beats identical-by-sampling). Registered in the
    # dedup session-cache registry; bench.py releases it between timed
    # queries.
    from solana_snapshot_etl_tools_spark.operators.dedup import (
        _cache_for_session,
    )

    d = _cache_for_session(d)
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


def pack_no_split(
    enc: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
    eos_id: int | None = None,
    num_groups: int = 256,
    truncate: bool = True,
) -> DataFrame:
    """SFT-style packing WITHOUT cross-document splitting: every
    document lands whole inside exactly one sequence (the
    "packing without cross-contamination" recipe — a sequence's
    attention never spans a document cut, unlike
    ``pack_token_sequences``' GPT-style concat-and-chunk). Sequences
    are built by first-fit-decreasing within deterministic hash
    groups; a doc longer than ``seq_len`` is truncated to fit
    (``truncate=False`` drops it instead — both policies surface in
    ``n_truncated``/``was_truncated``).

    Output: (seq_id, input_ids, n_tokens, n_docs, fill_frac,
    doc_ids, doc_offsets) — ``doc_offsets[i]`` is where doc
    ``doc_ids[i]`` starts inside ``input_ids``, exactly the metadata
    a block-diagonal attention mask needs.

    Scale + determinism shape: docs are routed to ``num_groups``
    buckets by ``pmod(xxhash64(id), num_groups)`` — NOT by physical
    partition — so the packing is a pure function of the input
    regardless of cluster layout (pinned by pytest); each bucket runs
    FFD over its own docs inside one ``applyInPandas`` group (sorted
    by (len desc, id) for determinism). FFD is the classic 11/9 OPT
    approximation; bins never leave their bucket, so no shuffle
    carries tokens twice. Fill quality depends on per-bucket doc
    counts — size ``num_groups`` so each bucket holds >> seq_len/
    mean_doc_len documents."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if num_groups < 1:
        raise ValueError(f"num_groups must be >= 1, got {num_groups}")
    from pyspark.sql import types as T

    id_type = enc.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("seq_id", T.LongType()),
            T.StructField("input_ids", T.ArrayType(T.IntegerType())),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("fill_frac", T.DoubleType()),
            T.StructField("doc_ids", T.ArrayType(id_type)),
            T.StructField("doc_offsets", T.ArrayType(T.IntegerType())),
        ]
    )
    toks = F.col(tokens_col)
    if eos_id is not None:
        toks = F.concat(toks, F.array(F.lit(eos_id).cast("int")))
    d = enc.select(
        F.col(id_col).alias("_id"),
        toks.alias("_t"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups)).alias("_g"),
    ).filter(F.size("_t") > 0)

    L = seq_len

    def pack_group(pdf):
        import pandas as pd

        docs = []
        for _id, t in zip(pdf["_id"], pdf["_t"]):
            t = list(t)
            if len(t) > L:
                if not truncate:
                    continue
                t = t[:L]
            docs.append((_id, t))
        # FFD: longest first, id tiebreak -> deterministic
        docs.sort(key=lambda x: (-len(x[1]), x[0]))
        bins: list[dict] = []
        for _id, t in docs:
            placed = None
            for b in bins:
                if b["n"] + len(t) <= L:
                    placed = b
                    break
            if placed is None:
                placed = {"ids": [], "offs": [], "toks": [], "n": 0}
                bins.append(placed)
            placed["ids"].append(_id)
            placed["offs"].append(placed["n"])
            placed["toks"].extend(t)
            placed["n"] += len(t)
        g = int(pdf["_g"].iloc[0]) if len(pdf) else 0
        rows = []
        for k, b in enumerate(bins):
            rows.append(
                (
                    g * (1 << 40) + k,  # globally unique, group-local
                    b["toks"],
                    b["n"],
                    len(b["ids"]),
                    b["n"] / float(L),
                    b["ids"],
                    b["offs"],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "seq_id", "input_ids", "n_tokens", "n_docs",
                "fill_frac", "doc_ids", "doc_offsets",
            ],
        )

    return d.groupBy("_g").applyInPandas(pack_group, out_schema)
