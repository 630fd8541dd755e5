"""Scale utilities: unsigned u64 views, salted skew join."""

from __future__ import annotations

import decimal
import struct

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.functions.binary import (
    le_u64,
    le_u64_decimal,
    unsigned_view,
)
from solana_snapshot_etl_tools_spark.operators.skew import salted_join
from solana_snapshot_etl_tools_spark.plans.relational import _t
from tests.conftest import SF_DIR


def test_u64_decimal_view(spark):
    vals = [0, 1, 2**63, 2**64 - 1, 123456789012345678]
    df = spark.createDataFrame([(struct.pack("<Q", v),) for v in vals], "b binary")
    got = df.select(
        le_u64_decimal(F.col("b"), 0).alias("u"),
        le_u64(F.col("b"), 0).alias("i"),
    ).collect()
    for v, r in zip(vals, got):
        assert r.u == decimal.Decimal(v)
        assert unsigned_view(F.lit(r.i).cast("long")) is not None
    # and the reinterpretation round-trips the wraparound column
    back = df.select(unsigned_view(le_u64(F.col("b"), 0)).alias("u")).collect()
    assert [int(r.u) for r in back] == vals


def test_salted_join_equals_plain_join(spark):
    e = _t(spark, SF_DIR, "events").select("user_id", "event_id", "event_type")
    dim = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    plain = e.join(dim, "user_id").select("event_id", "n_events")
    salted = salted_join(e, dim, "user_id", salt=8).select("event_id", "n_events")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_spreads_concentrated_hot_key(spark):
    """The default salt source must spread a hot key even when its rows
    all arrive in ONE input partition (the spark_partition_id trap)."""
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.skew import salted_join

    big = spark.range(1000).coalesce(1).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([("hot", 1)], "k string, m int")
    b = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns], F.monotonically_increasing_id()),
            F.lit(8),
        ).cast("int"),
    )
    n_buckets = b.select("_salt").distinct().count()
    assert n_buckets >= 6  # spread across most of the 8 salt buckets
    joined = salted_join(big, small, "k", salt=8)
    assert joined.count() == 1000


def test_spread_small_input(spark):
    """A 1-partition input spreads to defaultParallelism; an input
    already at/above parallelism passes through without a shuffle."""
    from solana_snapshot_etl_tools_spark.operators.dedup import spread_small_input

    target = spark.sparkContext.defaultParallelism
    small = spark.range(1000).coalesce(1)
    assert spread_small_input(small).rdd.getNumPartitions() == target
    big = spark.range(1000).repartition(target + 4)
    # already parallel: identical plan back (no added repartition)
    assert spread_small_input(big) is big


def test_cosine_pairs_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.similarity import cosine_pairs

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).cast("array<float>").alias("embedding"),
    )
    with pytest.raises(ValueError, match="quadratic"):
        cosine_pairs(emb, max_rows=10)
    assert cosine_pairs(emb, threshold=-2.0, max_rows=100).count() == 50 * 49 // 2
