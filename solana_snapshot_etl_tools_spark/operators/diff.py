"""Corpus snapshot diff: what changed between two pipeline runs.

Incremental pipelines live and die on being able to answer "what did
this rerun actually change?" without eyeballing terabytes: a tuned
filter threshold should move a known population, a refactor should
move NOTHING, and a silent upstream change shows up here first.

Scale shape: both sides are reduced to (id, xxhash64(text)) BEFORE the
join, so the full-outer comparison shuffles 16-byte rows, never
document text. One shuffle each side, one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Row-level diff: (id, status) with status ∈ added | removed |
    changed | unchanged. ``added`` = id only in ``new``; ``removed`` =
    only in ``old``; ``changed`` = same id, different text hash."""
    for side, df in (("old", old), ("new", new)):
        for c in (id_col, text_col):
            if c not in df.columns:
                raise ValueError(f"{side} side lacks column {c!r}")
    o = old.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("_oh")
    )
    n = new.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("_nh")
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, int]:
    """{'added': n, 'removed': n, 'changed': n, 'unchanged': n} —
    always all four keys, zero-filled."""
    rows = (
        corpus_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    out.update({r.status: r.n for r in rows})
    return out
