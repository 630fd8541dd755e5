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


_PARA_CORPUS = [
    (1, "The Daily Site\n\nUnique article one about ships.\n\nContact us at HQ!"),
    (2, "the daily site\n\nUnique article two, about trains.\n\nCONTACT US AT HQ"),
    (3, "The Daily Site 2024\n\nA third piece entirely.\n\nfooter here"),
    (4, "A third piece, entirely!\n\n\n\n   \n\nsingleton paragraph"),
    (5, None),
    (6, ""),
]
_PARA_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(lower({c}),"
    " '\\d+', '', 'g'), '[^\\p{{L}}\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)
_PARA_BASE_SQL = """
WITH parts AS (
  SELECT doc_id, text, string_split(coalesce(text, ''), e'\\n\\n') AS ps
  FROM documents
),
paras AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, ps[CAST(u.i AS INT)] AS para
  FROM parts, unnest(range(1, len(ps) + 1)) AS u(i)
),
keyed AS (
  SELECT doc_id, pos, {norm} AS norm FROM paras
),
dupes AS (
  SELECT doc_id, pos, norm,
         row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
  FROM keyed WHERE length(norm) >= 1
)
"""


def _para_duck(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


def test_dedup_paragraphs_duckdb_parity_prototype(spark):
    """VERDICT r6 item 4: the CCNet paragraph dedup has an exact SQL
    spelling (split -> normalized key -> first-(doc,pos)-wins ->
    indexed rebuild) — proven against DuckDB on a corpus with
    boilerplate headers/footers, case/punct/digit jitter, empty and
    whitespace-only paragraphs, and null/empty documents."""
    from solana_snapshot_etl_tools_spark.operators.paragraphs import (
        dedup_paragraphs,
    )

    df = spark.createDataFrame(_PARA_CORPUS, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.text, r.n_paragraphs, r.n_removed_paragraphs)
        for r in dedup_paragraphs(df).collect()
    )
    con = _para_duck(_PARA_CORPUS)
    sql = _PARA_BASE_SQL.format(norm=_PARA_NORM_SQL.format(c="para")) + """
, removed AS (SELECT doc_id, pos FROM dupes WHERE rn > 1),
rebuilt AS (
  SELECT p.doc_id,
         string_agg(p.para, e'\\n\\n' ORDER BY p.pos)
           FILTER (WHERE r.pos IS NULL) AS new_text,
         count(*) AS n_paragraphs,
         count(r.pos) AS n_removed
  FROM paras p LEFT JOIN removed r
    ON p.doc_id = r.doc_id AND p.pos = r.pos
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(b.new_text, '') END AS text,
       CASE WHEN d.text IS NULL THEN 0 ELSE b.n_paragraphs END AS n_paragraphs,
       CAST(b.n_removed AS INT) AS n_removed
FROM documents d JOIN rebuilt b USING (doc_id)
"""
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    assert got == want
    # and the duplicated boilerplate really was removed exactly once
    by_id = {r[0]: r for r in got}
    assert by_id[2][3] == 2  # header + footer both removed from doc 2
    assert by_id[3][3] == 1  # "The Daily Site 2024" normalizes to doc 1's header
    assert by_id[4][3] == 1  # cross-doc copy of doc 3's article para


def test_paragraph_dup_stats_duckdb_parity_prototype(spark):
    """Measurement side of the same spelling: per-duplicated-paragraph
    (n_occurrences, n_docs, owner_doc, owner_pos) rows match DuckDB
    (keys dropped — xxhash64 vs the raw normalized string)."""
    from solana_snapshot_etl_tools_spark.operators.paragraphs import (
        paragraph_dup_stats,
    )

    df = spark.createDataFrame(_PARA_CORPUS, "doc_id long, text string")
    got = sorted(
        (r.n_occurrences, r.n_docs, r.owner_doc, r.owner_pos)
        for r in paragraph_dup_stats(df).collect()
    )
    con = _para_duck(_PARA_CORPUS)
    sql = _PARA_BASE_SQL.format(norm=_PARA_NORM_SQL.format(c="para")) + """
SELECT count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       first(doc_id ORDER BY doc_id, pos) AS owner_doc,
       first(pos ORDER BY doc_id, pos) AS owner_pos
FROM dupes GROUP BY norm HAVING count(*) > 1
"""
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    assert got == want and len(got) >= 3
