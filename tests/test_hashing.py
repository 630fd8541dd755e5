"""functions/hashing.py: the overflow-free Knuth hash — naive-spelling
equivalence where the naive spelling is safe, and correctness at ids
where the naive spelling overflows int64."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.functions.hashing import (
    _2_32,
    KNUTH,
    knuth_hash32,
)


def _vals(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    return {r.id: r.h for r in df.select("id", knuth_hash32(F.col("id")).alias("h")).collect()}


def test_matches_python_reference_everywhere(spark):
    ids = [0, 1, 7, 65535, 65536, 2**31 - 1, 2**31, 10**10, 2**62, 2**63 - 1]
    got = _vals(spark, ids)
    assert got == {i: (i * KNUTH) % _2_32 for i in ids}


def test_safe_at_ids_where_naive_spelling_overflows(spark):
    """id * KNUTH exceeds int64 for id >= ~3.47e9 — the split spelling
    must keep producing the mathematically-correct value (verified
    against python bigints) instead of wrapping or raising under
    ANSI."""
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        big = [2**63 - 1, 2**62 + 12345, 10**18]
        got = _vals(spark, big)
        assert got == {i: (i * KNUTH) % _2_32 for i in big}
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")


def test_identical_to_the_declared_query_spelling(spark):
    """Must stay bit-identical to plans/llm_ops._knuth_h — split and
    sampling oracles depend on the shared spelling."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops import _knuth_h

    df = spark.createDataFrame([(i * 977 + 3,) for i in range(500)], "id long")
    mismatch = df.select(
        (knuth_hash32(F.col("id")) != _knuth_h(F.col("id"))).alias("d")
    ).filter("d").count()
    assert mismatch == 0
