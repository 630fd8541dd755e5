"""Differential harness: Spark result vs DuckDB oracle.

Mimics the driver's check (row count + column names + order-insensitive
values) but stricter locally: exact value equality after canonical
normalization, so any engine-semantics drift fails tests before the
driver sees it.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb


def _norm(v) -> str:
    """Canonical, always-sortable string form of a cell value."""
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"  # exact repr
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return f"s:{v}"


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def assert_matches(spark_df, oracle_sql: str, sf_dir: str):
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    assert sorted(s_cols) == sorted(o_cols), f"columns: {s_cols} vs {o_cols}"
    s_rows = spark_df.collect()
    assert len(s_rows) == len(o_rows), f"rowcount: {len(s_rows)} vs {len(o_rows)}"
    # order-insensitive: sort by column name, then normalized row tuples
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = [o_cols.index(s_cols[i]) for i in order]
    s_set = sorted(tuple(_norm(r[i]) for i in order) for r in s_rows)
    o_set = sorted(tuple(_norm(r[i]) for i in o_order) for r in o_rows)
    for a, b in zip(s_set, o_set):
        assert a == b, f"row mismatch:\n spark={a}\n duck ={b}"
