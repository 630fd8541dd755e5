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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    key: str | None = None,
    bucket: int = 3600,
    right_prefix: str = "r_",
    max_spans: int = 10_000,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose closed
    intervals intersect (``ls <= re AND rs <= le``), optionally also
    matching on ``key``.

    Spark plans the naive two-inequality predicate as a broadcast
    nested loop / cartesian — O(|L|·|R|) and a non-starter at scale.
    This is the standard bucketed overlap join instead:

    1. each side explodes its interval into the ``bucket``-wide cells
       it covers (``sequence(floor(s/B), floor(e/B))`` — pure codegen);
    2. one equi-join on (key, cell) — shuffle-partitionable, AQE/skew
       machinery applies, NO nested loop;
    3. the exact overlap predicate filters false bucket neighbors;
    4. a pair overlapping many shared cells is emitted ONCE, with no
       distinct shuffle: only the cell equal to
       ``max(floor(ls/B), floor(rs/B))`` — the first cell the two
       intervals share — reports the pair.

    Cost: one shuffle of (rows × cells-per-interval). Pick ``bucket``
    near the typical interval length so most rows explode to 1-2
    cells; a row spanning more than ``max_spans`` cells fails LOUDLY
    (executor-side ``raise_error``, no extra pass) rather than
    silently exploding the stage — raise ``bucket`` instead.

    Bounds must be numeric (cast timestamps to epoch seconds first).
    Rows with NULL bounds cannot overlap anything and are dropped,
    matching the SQL predicate's NULL semantics.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    for c, df, side in ((ls, left, "left"), (le, left, "left"),
                        (rs, right, "right"), (re_, right, "right")):
        if c not in df.columns:
            raise ValueError(f"{side} bounds column {c!r} not in {df.columns}")
    if key is not None and (key not in left.columns or key not in right.columns):
        raise ValueError(f"join key {key!r} must exist on both sides")
    if bucket <= 0:
        raise ValueError(f"bucket must be positive, got {bucket}")
    overlap_cols = [f"{right_prefix}{c}" for c in right.columns]
    clash = set(left.columns) & set(overlap_cols)
    if clash:
        raise ValueError(f"right_prefix {right_prefix!r} collides with {clash}")
    # the internal scratch columns would silently overwrite (then drop)
    # same-named input columns — refuse loudly instead
    scratch = {"_cell", "_jk"} & (set(left.columns) | set(right.columns) | set(overlap_cols))
    if scratch:
        raise ValueError(
            f"interval_join reserves columns {sorted(scratch)} for its "
            "bucketing scratch space; rename them on the input"
        )

    def cells(s: str, e: str):
        lo = F.floor(F.col(s).cast("double") / bucket).cast("long")
        hi = F.floor(F.col(e).cast("double") / bucket).cast("long")
        seq = F.sequence(lo, hi)
        return F.when(F.size(seq) <= max_spans, seq).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join: a row spans more than {max_spans} "
                        f"bucket cells (bucket={bucket}); raise `bucket` "
                        "to match your interval lengths: "
                    ),
                    F.size(seq).cast("string"),
                )
            ).cast("array<long>")
        )

    l = left.filter(F.col(ls).isNotNull() & F.col(le).isNotNull()).withColumn(
        "_cell", F.explode(cells(ls, le))
    )
    r = right.filter(F.col(rs).isNotNull() & F.col(re_).isNotNull()).select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    prs, pre = f"{right_prefix}{rs}", f"{right_prefix}{re_}"
    r = r.withColumn("_cell", F.explode(cells(prs, pre)))
    # the key rides INSIDE the equi-join (shuffle key = (key, cell)),
    # never as a post-filter — otherwise every key sharing a time cell
    # would collide in one shuffle partition
    join_keys = ["_cell"]
    if key is not None:
        r = r.withColumn("_jk", F.col(f"{right_prefix}{key}"))
        l = l.withColumn("_jk", F.col(key))
        join_keys = ["_jk", "_cell"]
    first_shared = F.greatest(
        F.floor(F.col(ls).cast("double") / bucket).cast("long"),
        F.floor(F.col(prs).cast("double") / bucket).cast("long"),
    )
    return (
        l.join(r, on=join_keys, how="inner")
        .filter((F.col(ls) <= F.col(pre)) & (F.col(prs) <= F.col(le)))
        .filter(F.col("_cell") == first_shared)
        .drop("_cell", "_jk")
    )
