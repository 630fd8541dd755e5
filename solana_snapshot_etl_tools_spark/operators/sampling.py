"""Stratum-balanced corpus sampling — the generic form of the
declared ``sample_balanced_lang`` query (plans/llm_ops.py), usable
with ANY stratum column: language, source domain, or the cluster ids
produced by ``operators/cluster.py`` (cluster-then-balance is the
standard recipe for flattening topic skew in a pretraining mixture).

Scale shape (same as the declared query, pinned there): stratum sizes
come from a tiny groupBy aggregate broadcast back onto the corpus —
never a global or per-stratum window (a ``min() over ()`` would
funnel every row through one partition; a per-stratum window still
sorts the corpus). Acceptance is a deterministic per-row hash
threshold — stable across engines, partitionings, and corpus appends
(an id keeps or loses its slot only if its OWN stratum's count
changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions.hashing import _2_32, knuth_hash32


def balanced_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    target: int | None = None,
) -> DataFrame:
    """Downsample every stratum to ~``target`` rows (expectation;
    strata already below target pass through whole). ``target=None``
    equalizes to the SMALLEST stratum — the ``sample_balanced_lang``
    semantics. Returns the input rows that survive, all columns
    intact. A NULL stratum is a stratum like any other (the count join
    is null-safe — a plain equi-join would silently drop every
    NULL-stratum row from the corpus)."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_cnt"))
    counts = counts.withColumnRenamed(stratum_col, "_stratum")
    h = knuth_hash32(F.col(id_col)).cast("double")
    out = df.join(
        F.broadcast(counts),
        F.col(stratum_col).eqNullSafe(F.col("_stratum")),
    )
    if target is None:
        tgt = counts.agg(F.min("_cnt").alias("_tgt"))
        out = out.crossJoin(F.broadcast(tgt))
    else:
        out = out.withColumn("_tgt", F.lit(int(target)))
    # accept iff h/2^32 < tgt/cnt, spelled in double to survive
    # cnt > 2^31 strata (see the declared query's overflow note)
    return out.filter(
        h * F.col("_cnt") < F.col("_tgt").cast("double") * F.lit(float(_2_32))
    ).select(*df.columns)
