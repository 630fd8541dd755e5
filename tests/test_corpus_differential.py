"""Differential tests: every declared query vs its DuckDB oracle —
exactly what the driver's t2 gate does, run at sf0.001 for speed and
strict (exact value) locally."""

from __future__ import annotations

import pytest

from tests.compare import assert_matches
from tests.conftest import SF_DIR

import __spark_entry__ as entry_mod


def _cases():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, name, fn, oracle):
    df = fn(spark, SF_DIR)
    if oracle is None:
        # rows-only contract for non-SQL-expressible ops
        assert df.count() >= 0
        return
    assert_matches(df, oracle, SF_DIR)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
