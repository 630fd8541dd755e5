"""interval_join: bucketed overlap join vs the DuckDB inequality oracle."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from solana_snapshot_etl_tools_spark.operators.asof import interval_join


def _mk(seed: int, n: int, key_vals=None, span=(0, 40)):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randint(0, 1000)
        e = s + rng.randint(*span)
        rows.append(
            {
                "id": i,
                "k": rng.choice(key_vals) if key_vals else None,
                "s": s,
                "e": e,
            }
        )
    return pd.DataFrame(rows)


def _oracle(lp: pd.DataFrame, rp: pd.DataFrame, keyed: bool):
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    keycond = "AND l.k = r.k" if keyed else ""
    rows = con.execute(
        f"SELECT l.id, r.id FROM l, r "
        f"WHERE l.s <= r.e AND r.s <= l.e {keycond}"
    ).fetchall()
    con.close()
    return sorted(rows)


@pytest.mark.parametrize("bucket", [1, 7, 50, 1000])
def test_matches_duckdb_inequality_join(spark, bucket):
    lp, rp = _mk(1, 120), _mk(2, 90)
    got = interval_join(
        spark.createDataFrame(lp.drop(columns="k")),
        spark.createDataFrame(rp.drop(columns="k")),
        left_bounds=("s", "e"),
        right_bounds=("s", "e"),
        bucket=bucket,
    )
    pairs = sorted((r.id, r.r_id) for r in got.collect())
    assert pairs == _oracle(lp, rp, keyed=False)
    # once per pair, even when intervals share many bucket cells
    assert len(pairs) == len(set(pairs))


def test_keyed_matches_duckdb(spark):
    lp = _mk(3, 150, key_vals=["a", "b", "c"])
    rp = _mk(4, 150, key_vals=["a", "b", "c"])
    got = interval_join(
        spark.createDataFrame(lp),
        spark.createDataFrame(rp),
        left_bounds=("s", "e"),
        right_bounds=("s", "e"),
        key="k",
        bucket=16,
    )
    pairs = sorted((r.id, r.r_id) for r in got.collect())
    assert pairs == _oracle(lp, rp, keyed=True)


def test_key_is_in_the_shuffle_join_not_a_post_filter(spark):
    lp = _mk(5, 30, key_vals=["a", "b"])
    rp = _mk(6, 30, key_vals=["a", "b"])
    out = interval_join(
        spark.createDataFrame(lp),
        spark.createDataFrame(rp),
        left_bounds=("s", "e"),
        right_bounds=("s", "e"),
        key="k",
        bucket=16,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # both the key alias and the cell appear as join keys
    assert "_jk" in plan and "_cell" in plan


def test_null_bounds_drop(spark):
    l = spark.createDataFrame([(1, None, 5), (2, 0, 10)], "id long, s long, e long")
    r = spark.createDataFrame([(9, 1, 2)], "id long, s long, e long")
    got = interval_join(
        l, r, left_bounds=("s", "e"), right_bounds=("s", "e"), bucket=4
    ).collect()
    assert [(x.id, x.r_id) for x in got] == [(2, 9)]


def test_overlong_interval_fails_loudly(spark):
    l = spark.createDataFrame([(1, 0, 10_000_000)], "id long, s long, e long")
    r = spark.createDataFrame([(9, 1, 2)], "id long, s long, e long")
    with pytest.raises(Exception, match="spans more than"):
        interval_join(
            l, r, left_bounds=("s", "e"), right_bounds=("s", "e"),
            bucket=10, max_spans=100,
        ).collect()


def test_validation(spark):
    l = spark.createDataFrame([(1, 0, 5)], "id long, s long, e long")
    with pytest.raises(ValueError, match="not in"):
        interval_join(l, l, left_bounds=("nope", "e"), right_bounds=("s", "e"))
    with pytest.raises(ValueError, match="positive"):
        interval_join(l, l, left_bounds=("s", "e"), right_bounds=("s", "e"),
                      bucket=0)
    with pytest.raises(ValueError, match="both sides"):
        interval_join(l, l.drop("id"), left_bounds=("s", "e"),
                      right_bounds=("s", "e"), key="id")
    with pytest.raises(ValueError, match="collides"):
        clash = l.withColumnRenamed("id", "r_id")
        interval_join(clash, l, left_bounds=("s", "e"),
                      right_bounds=("s", "e"))


def test_reserved_scratch_columns_rejected(spark):
    """A pre-existing _cell/_jk column would be silently overwritten
    by the bucketing scratch space and then dropped — refuse loudly."""
    l = spark.createDataFrame([(1, 0, 5)], "id long, s long, e long")
    for col in ("_cell", "_jk"):
        tainted = l.withColumn(col, l.id)
        with pytest.raises(ValueError, match="reserves columns"):
            interval_join(tainted, l, left_bounds=("s", "e"),
                          right_bounds=("s", "e"))
        with pytest.raises(ValueError, match="reserves columns"):
            interval_join(l, tainted, left_bounds=("s", "e"),
                          right_bounds=("s", "e"))


hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

_iv = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 60)), min_size=1, max_size=40
)


@settings(max_examples=8, deadline=None)
@given(ls=_iv, rs=_iv, bucket=st.sampled_from([1, 3, 17, 64, 500]),
       seed=st.integers(0, 10))
def test_property_matches_duckdb(spark, ls, rs, bucket, seed):
    lp = pd.DataFrame(
        [{"id": i, "s": s, "e": s + w} for i, (s, w) in enumerate(ls)]
    )
    rp = pd.DataFrame(
        [{"id": i, "s": s, "e": s + w} for i, (s, w) in enumerate(rs)]
    )
    got = interval_join(
        spark.createDataFrame(lp),
        spark.createDataFrame(rp),
        left_bounds=("s", "e"),
        right_bounds=("s", "e"),
        bucket=bucket,
    )
    pairs = sorted((r.id, r.r_id) for r in got.collect())
    assert pairs == _oracle(lp, rp, keyed=False)
    assert len(pairs) == len(set(pairs))
