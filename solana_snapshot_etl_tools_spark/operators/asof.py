"""As-of join — an operator Spark lacks natively (SURVEY.md §2.7 /
pyspark guide "common OLAP patterns").

Implementation is the scalable union+window form, not a range cross
join and not per-group pandas:

1. tag left (probe) and right (reference) rows, union them;
2. one shuffle: partition by key, sort by (ts, tag) — reference rows
   sort before probe rows at equal timestamps, giving the standard
   "most recent right row with r.ts <= l.ts" semantics;
3. running ``last(right_struct, ignoreNulls)`` carries the latest
   reference row forward; probe rows then project it.

Cost at scale: exactly one shuffle of |L|+|R| rows on the join key —
same shape as a sort-merge join, robust to arbitrary time skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the most recent right row of the
    same ``key`` with ``right.ts <= left.ts`` (null struct fields when
    none exists). Output: all left columns + prefixed right columns."""
    l_cols = left.columns
    r_cols = [c for c in right.columns if c != key]
    r_struct = F.struct(*[F.col(c) for c in r_cols])
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        r_struct.alias("_r"),
    )
    unioned = l_tag.withColumn("_r", F.lit(None).cast(r_tag.schema["_r"].dataType)) \
        .unionByName(
            r_tag.withColumn("_l", F.lit(None).cast(l_tag.schema["_l"].dataType))
        )
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        *[F.col(f"_last_r.{c}").alias(f"{right_prefix}{c}") for c in r_cols],
    )
    return out
