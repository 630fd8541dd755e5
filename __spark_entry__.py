"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` is the
declared operator inventory (SURVEY.md §2); ``oracle_sql()`` gives the
DuckDB-equivalent SQL per query. Solana ETL decode queries run the
engine's decoders over a deterministic binary fixture and their
oracles are pre-pack ground-truth ``VALUES`` literals — value-level
correctness, not just row counts (see
solana_snapshot_etl_tools_spark/fixtures.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from solana_snapshot_etl_tools_spark.plans import llm_ops, relational, relational2, solana


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(relational2.QUERIES)
    out.update(solana.QUERIES)
    out.update(llm_ops.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(relational2.ORACLES)
    out.update(solana.oracles())
    out.update(llm_ops.ORACLES)
    return out
