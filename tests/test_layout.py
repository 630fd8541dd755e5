"""Z-order layout: key mechanics and the pruning it actually buys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import layout as L


@pytest.fixture(scope="module")
def grid(spark):
    # 64k points on a 256x256 uniform grid: the classic z-order demo.
    return (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
        .cache()
    )


def test_key_matches_reference_interleave(spark):
    # 3-bit toy grid vs a hand-computed Morton table.
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.k
        for r in df.withColumn(
            "k", L.zorder_key(df, ["x", "y"], bits=3, ranges={"x": (0, 7), "y": (0, 7)})
        ).collect()
    }

    def morton(x, y):
        k = 0
        for b in range(3):
            k |= ((x >> b) & 1) << (2 * b)
            k |= ((y >> b) & 1) << (2 * b + 1)
        return k

    assert got == {(x, y): morton(x, y) for x in range(8) for y in range(8)}
    # all 64 cells distinct — the key is a bijection on the grid
    assert len(set(got.values())) == 64


def test_key_handles_nulls_and_negatives(spark):
    df = spark.createDataFrame(
        [(-100, 5), (0, None), (100, -5)], "a long, b long"
    )
    vals = df.withColumn("k", L.zorder_key(df, ["a", "b"], bits=8)).collect()
    assert all(r.k is not None and r.k >= 0 for r in vals)


def test_validation(spark, grid):
    with pytest.raises(ValueError, match="2-4"):
        L.zorder_key(grid, ["x"])
    with pytest.raises(ValueError, match="not in"):
        L.zorder_key(grid, ["x", "nope"])
    with pytest.raises(ValueError, match="overflows"):
        L.zorder_key(grid, ["x", "y"], bits=40)
    allnull = grid.select(F.lit(None).cast("long").alias("x"), "y")
    with pytest.raises(ValueError, match="all-NULL"):
        L.zorder_key(allnull, ["x", "y"])


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    L.write_zordered(grid, zdir, ["x", "y"], num_files=16)
    # strawman: sorted by x only (perfect on x, useless on y)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(sdir)
    )
    z = L.file_pruning_stats(spark, zdir, ["x", "y"]).collect()
    s = L.file_pruning_stats(spark, sdir, ["x", "y"]).collect()

    def mean(rows, col):
        return sum(r[col] for r in rows) / len(rows)

    # single-column sort: x prunes hard, y not at all
    assert mean(s, "x_span_frac") < 0.15
    assert mean(s, "y_span_frac") > 0.95
    # z-order: BOTH dimensions prune to compact boxes
    assert mean(z, "x_span_frac") < 0.5
    assert mean(z, "y_span_frac") < 0.5
    # and no data was lost or mutated
    got = spark.read.parquet(zdir)
    assert got.count() == 256 * 256
    assert sorted(got.columns) == ["x", "y"]
    assert got.select(F.sum("x"), F.sum("y")).collect() == grid.select(
        F.sum("x"), F.sum("y")
    ).collect()


def test_pinned_ranges_are_respected(spark, grid, tmp_path):
    # writing the lower-left quadrant with the FULL grid pinned must
    # put every key in the low quarter of the keyspace
    quad = grid.filter((F.col("x") < 128) & (F.col("y") < 128))
    k = L.zorder_key(
        quad, ["x", "y"], bits=8, ranges={"x": (0, 255), "y": (0, 255)}
    )
    hi = quad.select(F.max(k).alias("m")).collect()[0].m
    assert hi < (1 << 16) / 4
