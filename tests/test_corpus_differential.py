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


# ---------------------------------------------------------------------------
# Stupid-backoff LM scorer: DuckDB SQL parity prototype (the
# paragraph-dedup precedent). A SECOND independent oracle beside the
# pure-Python reference in test_ngram_lm.py: n-gram counts via
# pre-exploded grams (single-BOS convention), scoring via per-role
# correlated lookups + the greatest-order CASE — spelled entirely in
# SQL for the fixed order n=3 the prototype pins.
# ---------------------------------------------------------------------------

_LM_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                     '\\s+'), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
),
padded AS (
  SELECT doc_id, ['<s>', '<s>'] || t || ['</s>'] AS p
  FROM toks WHERE len(t) > 0
)
"""
_LM_TOTAL_SQL = _LM_SQL + """
SELECT sum(len(p) - 2) FROM padded
"""
_LM_COUNTS_SQL = _LM_SQL + """
, grams AS (
  -- single-BOS convention: starts >= n-1 = 2, so every counted gram
  -- holds at most one BOS (count(<s>) = 1 per document)
  SELECT o.o AS o,
         array_to_string(p[CAST(u.s AS INT):CAST(u.s + o.o - 1 AS INT)],
                         chr(31)) AS g
  FROM padded, unnest([1, 2, 3]) AS o(o),
       unnest(range(2, len(p) - o.o + 2)) AS u(s)
)
SELECT o, g, count(*) AS cnt FROM grams
GROUP BY o, g HAVING (o = 1 OR count(*) >= {mc})
"""
_LM_SCORE_SQL = _LM_SQL.format(table="score") + """
, pos AS (
  SELECT doc_id, CAST(u.s AS INT) AS i, p
  FROM padded, unnest(range(3, len(p) + 1)) AS u(s)
),
looked AS (
  SELECT doc_id, i,
    coalesce((SELECT cnt FROM counts c
              WHERE c.o = 1 AND c.g = p[i]), 0) AS g1,
    coalesce((SELECT cnt FROM counts c
              WHERE c.o = 2
                AND c.g = array_to_string(p[i-1:i], chr(31))), 0) AS g2,
    coalesce((SELECT cnt FROM counts c
              WHERE c.o = 3
                AND c.g = array_to_string(p[i-2:i], chr(31))), 0) AS g3,
    coalesce((SELECT cnt FROM counts c
              WHERE c.o = 1 AND c.g = p[i-1]), 0) AS c2,
    coalesce((SELECT cnt FROM counts c
              WHERE c.o = 2
                AND c.g = array_to_string(p[i-2:i-1], chr(31))), 0) AS c3
  FROM pos
),
perpos AS (
  -- the backoff recursion unrolled, highest order with a nonzero
  -- gram count (and context) wins; OOV floor = 0.4^2 / total
  SELECT doc_id,
    CASE WHEN g3 > 0 AND c3 > 0 THEN ln(g3 * 1.0 / c3)
         WHEN g2 > 0 AND c2 > 0 THEN ln(g2 * 1.0 / c2) + ln(0.4)
         WHEN g1 > 0 THEN ln(g1 * 1.0 / {total}) + 2 * ln(0.4)
         ELSE ln(0.4 * 0.4 / {total}) END AS lp
  FROM looked
)
SELECT doc_id, count(*) AS n_tokens, avg(lp) AS avg_logprob,
       exp(-avg(lp)) AS perplexity
FROM perpos GROUP BY doc_id
"""


@pytest.mark.parametrize("min_count", [1, 2])
def test_lm_score_duckdb_parity_prototype(spark, min_count):
    """VERDICT r7 item 3: the distributed stupid-backoff scorer
    (melt -> one count-table equi-join -> fold) matches an
    independent all-SQL DuckDB spelling of the same math — counts,
    totals, per-document n_tokens/avg_logprob/perplexity — on a
    corpus exercising OOV, unseen-order backoff, single-token docs,
    unscorable rows, and (min_count=2) pruning."""
    import duckdb

    from solana_snapshot_etl_tools_spark.operators import ngram_lm as LM
    from tests.test_ngram_lm import SCORE, TRAIN

    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = LM.ngram_lm_train(train, n=3, min_count=min_count)
    got = {
        r.doc_id: (r.n_tokens, r.avg_logprob, r.perplexity)
        for r in LM.lm_score(score, model).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE train (doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE score (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO train VALUES (?, ?)", TRAIN)
    con.executemany("INSERT INTO score VALUES (?, ?)", SCORE)
    con.execute(
        "CREATE TABLE counts AS "
        + _LM_COUNTS_SQL.format(table="train", mc=min_count)
    )
    # the SQL total must equal the model's (predicted positions:
    # real tokens + EOS per scorable training doc)
    total = con.execute(_LM_TOTAL_SQL.format(table="train")).fetchone()[0]
    assert total == model["total"]
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            _LM_SCORE_SQL.format(total=total)
        ).fetchall()
    }
    con.close()
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12), d
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-12), d


def test_decontaminate_embedding_duckdb_parity_prototype(spark):
    """The embedding decontaminator has an exact SQL spelling —
    cross-join cosine, threshold, best-match-per-doc with min-id
    tiebreak — proven against DuckDB's list_cosine_similarity on the
    real embeddings table with the bench side sampled from it (so
    self-matches at cosine 1 are guaranteed present). Both engine
    paths (exact broadcast scan and LSH-bucketed candidates) must
    agree with it on (doc, bench) pairs and on scores to float
    tolerance."""
    import duckdb
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.decontam import (
        decontaminate_embedding,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    dims = len(emb.first().embedding)
    bench = emb.orderBy("doc_id").limit(12).select(
        F.col("doc_id").alias("bench_id"), "embedding"
    )
    threshold = 0.9

    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            WITH corpus AS (
              SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v
              FROM read_parquet('{SF_DIR}/embeddings.parquet')
            ),
            bench AS (
              SELECT doc_id AS bench_id, v FROM corpus
              ORDER BY doc_id LIMIT 12
            ),
            scored AS (
              SELECT c.doc_id, b.bench_id,
                     list_cosine_similarity(c.v, b.v) AS cos
              FROM corpus c CROSS JOIN bench b
            ),
            best AS (
              SELECT doc_id, bench_id, cos, row_number() OVER (
                PARTITION BY doc_id ORDER BY cos DESC, bench_id
              ) AS rn
              FROM scored WHERE cos >= {threshold}
            )
            SELECT doc_id, bench_id, cos FROM best WHERE rn = 1
            """
        ).fetchall()
    }
    con.close()
    assert want, "bench sample must contaminate at least itself"

    for method in ("broadcast", "lsh"):
        got = {
            r.doc_id: (r.bench_id, r.cosine)
            for r in decontaminate_embedding(
                emb, bench, threshold=threshold, dims=dims, method=method,
                n_tables=16, n_planes=8,
            ).collect()
        }
        assert set(got) == set(want), method
        for doc, (bid, cos) in want.items():
            gbid, gcos = got[doc]
            assert gbid == bid, (method, doc)
            assert abs(gcos - cos) < 1e-9, (method, doc)


def test_term_blocklist_duckdb_parity_prototype(spark):
    """The C4 term-blocklist density has an exact SQL spelling —
    tokenize, per-length n-grams via list_slice, join vs the term
    table, per-doc count over ALL rows — proven against DuckDB on an
    ASCII corpus (the two engines' \\w-class tokenizers agree there;
    the operator's unicode classes are pinned separately in
    tests/test_safety.py)."""
    import duckdb

    from solana_snapshot_etl_tools_spark.operators.safety import (
        term_blocklist_stats,
    )

    rows = [
        (1, "a clean document with plain text"),
        (2, "BadWord appears twice: badword!"),
        (3, "the rude phrase here and one ugly word"),
        (4, "classy scunthorpe subclass"),
        (5, ""),
        (6, None),
        (7, "rude phrase"),
    ]
    terms = ["badword", "rude phrase here", "ugly"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_hits, round(r.hit_ratio, 9))
        for r in term_blocklist_stats(df, terms).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    con.execute("CREATE TABLE terms(gram VARCHAR, k INT)")
    con.executemany(
        "INSERT INTO terms VALUES (?, ?)",
        [(t, len(t.split())) for t in terms],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(
                       string_split_regex(lower(coalesce(text, '')),
                                          '[^a-z0-9]+'),
                       x -> len(x) > 0) AS t
              FROM docs
            ),
            grams AS (
              SELECT doc_id,
                     unnest([array_to_string(list_slice(t, i, i + k - 1), ' ')
                             for i in range(1, len(t) - k + 2)]) AS gram
              FROM toks, (SELECT DISTINCT k FROM terms) ks
            ),
            hits AS (
              SELECT doc_id, count(*) AS n_hits
              FROM grams JOIN terms USING (gram)
              GROUP BY doc_id
            )
            SELECT doc_id,
                   len(t) AS n_tokens,
                   coalesce(n_hits, 0) AS n_hits,
                   round(CASE WHEN len(t) > 0
                         THEN coalesce(n_hits, 0) / len(t)
                         ELSE 0.0 END, 9) AS hit_ratio
            FROM toks LEFT JOIN hits USING (doc_id)
            ORDER BY doc_id
            """
        ).fetchall()
    )
    con.close()
    assert got == want
    # and the planted truth, independently of both engines
    by_id = {g[0]: g for g in got}
    assert by_id[2][2] == 2 and by_id[3][2] == 2 and by_id[4][2] == 0


def test_source_cap_hash_mode_duckdb_parity_prototype(spark):
    """The DEFAULT source_cap mode ranks by xxhash64(doc_id, salt) —
    DuckDB has no bit-compatible xxhash64, so the Spark-computed rank
    key is exported as a column and DuckDB spells the full cap logic
    (per-source rank by (key, id), keep rank <= cap) in SQL over it.
    This pins the boundary-bucket machinery (bucketing, running
    total, residual quota, edge ranking) against the plain windowed
    statement of the semantics, on the real sf0.001 corpus where
    sources are genuinely over and under the cap."""
    import duckdb
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators import domains as DOM

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    # the exact key the operator's default mode uses (salt included)
    keyed = docs.withColumn(
        "_key", F.xxhash64(F.col("doc_id"), F.lit("source-cap"))
    )
    pdf = keyed.toPandas()
    con = duckdb.connect()
    con.register("keyed", pdf)
    for cap in (1, 7, 40):
        want = sorted(
            r[0]
            for r in con.execute(
                f"""
                SELECT doc_id FROM (
                  SELECT doc_id, row_number() OVER (
                    PARTITION BY source ORDER BY _key, doc_id
                  ) AS rn
                  FROM keyed
                ) WHERE rn <= {cap}
                """
            ).fetchall()
        )
        got = sorted(
            r.doc_id
            for r in DOM.source_cap(docs, cap).select("doc_id").collect()
        )
        assert got == want, f"cap={cap}"


def test_dsir_weights_duckdb_parity_prototype(spark):
    """Gram-mode DSIR log weights (operators/dsir.py) spelled fully in
    DuckDB SQL — featurize (uni+bigrams of the lowercased whitespace
    tokens), add-alpha smooth both distributions over the union
    vocabulary, per-doc weighted log-ratio sum — on the real sf0.001
    corpus with a slice of itself as the target."""
    import duckdb

    from solana_snapshot_etl_tools_spark.operators import dsir as DS

    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    target = raw.filter("doc_id % 17 = 0")
    alpha = 0.1
    got = {
        r.doc_id: r.log_weight
        for r in DS.dsir_log_weights(
            raw, target, n_buckets=None, alpha=alpha
        ).collect()
    }

    con = duckdb.connect()
    feats = """
    WITH docs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM read_parquet('{src}/documents.parquet') {where}
    ),
    uni AS (SELECT doc_id, unnest(toks) AS g FROM docs),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS g
      FROM docs
    )
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
    GROUP BY 1, 2
    """
    con.execute(
        "CREATE TABLE rf AS " + feats.format(src=SF_DIR, where="")
    )
    con.execute(
        "CREATE TABLE tf AS "
        + feats.format(src=SF_DIR, where="WHERE doc_id % 17 = 0")
    )
    want = dict(
        con.execute(
            f"""
        WITH t AS (SELECT g, sum(c) ct FROM tf GROUP BY g),
        r AS (SELECT g, sum(c) cr FROM rf GROUP BY g),
        tab AS (
          SELECT coalesce(t.g, r.g) AS g,
                 coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
          FROM t FULL OUTER JOIN r ON t.g = r.g
        ),
        consts AS (
          SELECT count(*) AS b, sum(ct) AS nt, sum(cr) AS nr FROM tab
        )
        SELECT rf.doc_id,
               sum(rf.c * (ln(tab.ct + {alpha}) - ln(nt + {alpha} * b)
                         - ln(tab.cr + {alpha}) + ln(nr + {alpha} * b)))
        FROM rf JOIN tab ON rf.g = tab.g CROSS JOIN consts
        GROUP BY rf.doc_id
        """
        ).fetchall()
    )
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9), i


def test_perplexity_bucket_assignment_duckdb_parity_prototype(spark):
    """The bucket ASSIGNMENT fold (count of cutoffs strictly below the
    value, inclusive upper bounds) spelled in DuckDB SQL over the
    Spark-computed perplexities and cutoffs — pins the fold logic
    independent of the percentile sketch."""
    import duckdb
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators import ngram_lm as LM

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    model = LM.ngram_lm_train(docs, n=2, min_count=1)
    out = LM.perplexity_buckets(docs, model)
    rows = out.select("doc_id", "perplexity", "ppl_bucket").collect()
    scored = [(r.doc_id, r.perplexity) for r in rows if r.perplexity is not None]
    got = {r.doc_id: r.ppl_bucket for r in rows if r.perplexity is not None}
    # the SAME cutoffs the operator used (its one-row aggregate)
    cuts = (
        LM.lm_score(docs, model)
        .agg(
            F.percentile_approx(
                "perplexity", F.array(F.lit(1 / 3), F.lit(2 / 3)), F.lit(10_000)
            )
        )
        .collect()[0][0]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE s (doc_id BIGINT, ppl DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?, ?)", scored)
    want = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   ['head','middle','tail'][
                     1 + (CASE WHEN ppl > {cuts[0]!r} THEN 1 ELSE 0 END)
                       + (CASE WHEN ppl > {cuts[1]!r} THEN 1 ELSE 0 END)
                   ]
            FROM s
            """
        ).fetchall()
    )
    assert got == want
