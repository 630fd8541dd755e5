"""Bucketed layout: write-time shuffle buys shuffle-free joins/aggs.

The assertions here are PLAN assertions — the point of bucketing is
physical (no Exchange), so row-equality alone would not test it.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import bucketing as B

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    B.write_bucketed(
        orders,
        "t_orders_b",
        str(root / "orders"),
        bucket_col="o_orderkey",
        num_buckets=4,
        sort_cols=["o_orderkey"],
    )
    B.write_bucketed(
        lineitem,
        "t_lineitem_b",
        str(root / "lineitem"),
        bucket_col="l_orderkey",
        num_buckets=4,
        sort_cols=["l_orderkey"],
    )
    yield root
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_one_file_per_bucket(spark, bucketed_pair):
    # The pre-write repartition must keep the file count at exactly
    # num_buckets (modulo empty buckets), not tasks × buckets.
    files = [
        f
        for f in glob.glob(str(bucketed_pair / "orders" / "*.parquet"))
        if not os.path.basename(f).startswith("_")
    ]
    assert 1 <= len(files) <= 4


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    spec = B.bucket_spec(spark, "t_orders_b")
    assert spec == {
        "num_buckets": 4,
        "bucket_cols": ["o_orderkey"],
        "sort_cols": ["o_orderkey"],
    }
    # A plain parquet view is not bucketed.
    spark.read.parquet(f"{SF_DIR}/region.parquet").createOrReplaceTempView("v_region")
    assert B.bucket_spec(spark, "v_region") is None


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.table("t_lineitem_b").withColumnRenamed("l_orderkey", "o_orderkey")
        # co_located_join guards the raw-table path; the rename above is
        # only for the manual-join plan check below.
        joined = spark.table("t_orders_b").join(left, on="o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_rows_match_plain_join(spark, bucketed_pair):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    got = (
        spark.table("t_orders_b")
        .join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    agg = spark.table("t_lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert "Exchange" not in _plan(agg)


def test_co_located_join_guard(spark, bucketed_pair, tmp_path):
    # Same key, same count: allowed (via a rename-compatible key pair it
    # must REFUSE, since bucket columns differ from the join key list).
    with pytest.raises(ValueError, match="bucketed on"):
        B.co_located_join(spark, "t_orders_b", "t_lineitem_b", on="o_orderkey")
    # Mismatched bucket count: refused loudly.
    orders = spark.table("t_orders_b")
    B.write_bucketed(
        orders,
        "t_orders_b8",
        str(tmp_path / "orders8"),
        bucket_col="o_orderkey",
        num_buckets=8,
    )
    try:
        renamed = spark.table("t_lineitem_b").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        B.write_bucketed(
            renamed,
            "t_lineitem_b4k",
            str(tmp_path / "li4"),
            bucket_col="o_orderkey",
            num_buckets=4,
        )
        with pytest.raises(ValueError, match="bucket counts differ"):
            B.co_located_join(spark, "t_orders_b8", "t_lineitem_b4k", on="o_orderkey")
        # And the happy path returns the join.
        B.write_bucketed(
            renamed,
            "t_lineitem_b8",
            str(tmp_path / "li8"),
            bucket_col="o_orderkey",
            num_buckets=8,
        )
        out = B.co_located_join(spark, "t_orders_b8", "t_lineitem_b8", on="o_orderkey")
        assert out.count() > 0
    finally:
        for t in ("t_orders_b8", "t_lineitem_b4k", "t_lineitem_b8"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_register_bucketed_reattaches(spark, bucketed_pair):
    # Simulate a fresh catalog: drop the entry, re-attach from disk.
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.table("t_orders_b").schema.fields
    )
    n = spark.table("t_orders_b").count()
    spark.sql("DROP TABLE t_orders_b")
    df = B.register_bucketed(
        spark,
        "t_orders_b",
        str(bucketed_pair / "orders"),
        schema_ddl=schema_ddl,
        bucket_col="o_orderkey",
        num_buckets=4,
        sort_cols=["o_orderkey"],
    )
    assert df.count() == n
    assert B.bucket_spec(spark, "t_orders_b")["num_buckets"] == 4


def test_spec_sidecar_round_trip_no_caller_spec(spark, bucketed_pair):
    """write_bucketed leaves _bucket_spec.json beside the data;
    register_bucketed re-attaches from it alone — no caller guess."""
    spec = B.read_bucket_spec(spark, str(bucketed_pair / "orders"))
    assert spec["bucket_col"] == "o_orderkey"
    assert spec["num_buckets"] == 4
    assert spec["sort_cols"] == ["o_orderkey"]
    assert "o_orderkey" in spec["schema_ddl"]
    n = spark.table("t_orders_b").count()
    spark.sql("DROP TABLE t_orders_b")
    try:
        df = B.register_bucketed(
            spark, "t_orders_sc", str(bucketed_pair / "orders")
        )
        assert df.count() == n
        assert B.bucket_spec(spark, "t_orders_sc")["num_buckets"] == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_sc")
        # restore the module fixture's catalog entry for later tests
        B.register_bucketed(spark, "t_orders_b", str(bucketed_pair / "orders"))


def test_spec_sidecar_contradiction_is_loud(spark, bucketed_pair):
    with pytest.raises(ValueError, match="contradicts"):
        B.register_bucketed(
            spark,
            "t_orders_bad",
            str(bucketed_pair / "orders"),
            bucket_col="o_custkey",  # wrong on purpose
        )
    with pytest.raises(ValueError, match="contradicts"):
        B.register_bucketed(
            spark,
            "t_orders_bad",
            str(bucketed_pair / "orders"),
            num_buckets=8,  # wrong on purpose
        )
    # a stale schema naming a renamed column would CREATE a table
    # whose parquet name resolution silently yields all-NULL columns
    with pytest.raises(ValueError, match="schema_ddl"):
        B.register_bucketed(
            spark,
            "t_orders_bad",
            str(bucketed_pair / "orders"),
            schema_ddl="wrong_col string",
        )
    # ...but a formatting-only difference (no backticks, case) is NOT
    # a contradiction
    loose = B.read_bucket_spec(spark, str(bucketed_pair / "orders"))[
        "schema_ddl"
    ].replace("`", "").upper()
    spark.sql("DROP TABLE IF EXISTS t_orders_fmt")
    try:
        df = B.register_bucketed(
            spark, "t_orders_fmt", str(bucketed_pair / "orders"),
            schema_ddl=loose,
        )
        assert df.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_fmt")


def test_missing_sidecar_requires_explicit_trust(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "k")
    # plain parquet dir: bucketed by NOBODY, no sidecar
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    with pytest.raises(ValueError, match="sidecar"):
        B.register_bucketed(
            spark, "t_plain", plain,
            schema_ddl="k bigint", bucket_col="k", num_buckets=2,
        )
    # trust_caller_spec without the full spec is also refused
    with pytest.raises(ValueError, match="full spec"):
        B.register_bucketed(
            spark, "t_plain", plain, trust_caller_spec=True
        )
    # the acknowledged-risk path still works (foreign-writer data)
    try:
        out = B.register_bucketed(
            spark, "t_plain", plain,
            schema_ddl="k bigint", bucket_col="k", num_buckets=2,
            trust_caller_spec=True,
        )
        assert out.count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_plain")


def test_tampered_sidecar_spec_is_what_register_uses(spark, tmp_path):
    """The sidecar is the source of truth: registration follows it,
    so corrupting it changes the attach — which is exactly why the
    contradiction check above exists for callers who pass a spec."""
    df = spark.range(100).withColumnRenamed("id", "k")
    B.write_bucketed(df, "t_tam", str(tmp_path / "t"), bucket_col="k",
                     num_buckets=4)
    spark.sql("DROP TABLE t_tam")
    B.write_bucket_spec(
        spark, str(tmp_path / "t"),
        {"bucket_col": "k", "num_buckets": 8, "sort_cols": [],
         "schema_ddl": "k bigint"},
    )
    with pytest.raises(ValueError, match="contradicts"):
        B.register_bucketed(spark, "t_tam", str(tmp_path / "t"),
                            num_buckets=4)


def test_write_bucketed_validates(spark):
    df = spark.range(4)
    with pytest.raises(ValueError, match="not in"):
        B.write_bucketed(df, "t_x", "/tmp/x", bucket_col="nope", num_buckets=2)
    with pytest.raises(ValueError, match=">= 1"):
        B.write_bucketed(df, "t_x", "/tmp/x", bucket_col="id", num_buckets=0)


def test_sorted_bucket_scan_drops_the_sort_too(spark, bucketed_pair):
    import re

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.table("t_lineitem_b").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        joined = spark.table("t_orders_b").join(left, on="o_orderkey")
        # without the conf: Exchange-free but still sorting both sides
        assert len(re.findall(r"\bSort \[", _plan(joined))) == 2
        B.enable_sorted_bucket_scan(spark)
        joined2 = spark.table("t_orders_b").join(left, on="o_orderkey")
        plan2 = _plan(joined2)
        assert "Exchange" not in plan2
        assert re.findall(r"\bSort \[", plan2) == []
        assert "SortMergeJoin" in plan2
        # and the rows are still the join's rows
        assert joined2.count() == joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
