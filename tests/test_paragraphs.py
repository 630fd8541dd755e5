"""Paragraph-level dedup: pure-Python reference equivalence, canonical
ownership, normalization matching, rebuild exactness, stats."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import paragraphs as P


def _norm(s: str) -> str:
    s = s.lower()
    s = re.sub(r"\d+", "", s)
    s = re.sub(r"[^\w\s]|_", "", s, flags=re.UNICODE)
    s = re.sub(r"[0-9]", "", s)
    return re.sub(r"\s+", " ", s).strip()


def _reference(rows, sep="\n\n", min_norm_chars=1):
    """First-occurrence-wins paragraph dedup, the obvious sequential
    spelling."""
    seen = {}
    for doc_id, text in sorted(rows):
        if text is None:
            continue
        for pos, para in enumerate(text.split(sep)):
            n = _norm(para)
            if len(n) >= min_norm_chars and n not in seen:
                seen[n] = (doc_id, pos)
    out = {}
    for doc_id, text in rows:
        if text is None:
            out[doc_id] = (None, 0, 0)
            continue
        parts = text.split(sep)
        kept, removed = [], 0
        for pos, para in enumerate(parts):
            n = _norm(para)
            if len(n) >= min_norm_chars and seen.get(n) != (doc_id, pos):
                removed += 1
            else:
                kept.append(para)
        out[doc_id] = (sep.join(kept), len(parts), removed)
    return out


CORPUS = [
    (1, "alpha beta\n\nshared footer text\n\nunique one"),
    (2, "unique two\n\nShared Footer, TEXT!\n\nunique three"),  # norm-dup
    (3, "shared footer text\n\nshared footer text"),  # all dups
    (4, "unique four"),
    (5, None),
    (6, ""),
    (7, "x\n\n\n\nx"),  # short/empty paragraphs are exempt; 'x' dedups
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_paragraphs, r.n_removed_paragraphs)
        for r in P.dedup_paragraphs(df).collect()
    }
    assert got == _reference(CORPUS)


def test_canonical_ownership_and_rebuild(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r for r in P.dedup_paragraphs(df).collect()}
    # doc 1 owns the footer (min doc); docs 2/3 lose their copies,
    # including doc 3's SECOND copy of its own first paragraph... which
    # doc 1 already owns, so doc 3 keeps nothing
    assert got[1].text == CORPUS[0][1]
    assert got[2].text == "unique two\n\nunique three"
    assert got[3].text == "" and got[3].n_removed_paragraphs == 2
    assert got[4].text == "unique four"
    assert got[5].text is None
    assert got[6].text == ""  # empty text: one empty exempt paragraph
    # doc 7: the empty middle paragraphs are exempt (spacing kept);
    # the second 'x' is a dup of the first
    assert got[7].text == "x\n\n" and got[7].n_removed_paragraphs == 1


def test_normalization_is_the_match_key(spark):
    rows = [(1, "Hello, World!"), (2, "hello world"), (3, "hello  world 99")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_removed_paragraphs for r in P.dedup_paragraphs(df).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = {(r.doc_id, r.text) for r in P.dedup_paragraphs(df.coalesce(1)).collect()}
    b = {(r.doc_id, r.text) for r in P.dedup_paragraphs(df.repartition(13)).collect()}
    assert a == b


def test_extra_columns_pass_through(spark):
    rows = [(1, "same para", "en"), (2, "same para", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: (r.lang, r.text) for r in P.dedup_paragraphs(df).collect()}
    assert got == {1: ("en", "same para"), 2: ("fr", "")}


def test_dup_stats(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    stats = {
        (r.owner_doc, r.owner_pos): (r.n_occurrences, r.n_docs)
        for r in P.paragraph_dup_stats(df).collect()
    }
    # footer: docs 1,2,3 with doc 3 twice → 4 occurrences in 3 docs
    assert stats[(1, 1)] == (4, 3)
    # 'x' appears twice in doc 7 only
    assert stats[(7, 0)] == (2, 1)
    assert len(stats) == 2


def test_real_corpus_smoke(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = P.dedup_paragraphs(docs.select("doc_id", "text"), sep="\n")
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_removed_paragraphs").alias("removed"),
    ).collect()[0]
    assert agg.n == docs.count()  # every row passes through
    assert agg.removed >= 0


def test_plan_no_paragraph_text_in_exchanges(spark):
    """The docstring's scale claim, pinned: no Exchange ever carries
    exploded paragraph text; document text appears in at most the one
    rebuild-join exchange; no cartesian product."""
    import contextlib
    import io
    import re

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        P.dedup_paragraphs(df).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    exchanges = [b for b in blocks if b.splitlines()[0].endswith("Exchange")]
    assert len(exchanges) >= 3  # key-min, join-back, per-doc collect
    assert all("para#" not in b for b in exchanges)
    with_text = [b for b in exchanges if re.search(r"\btext#", b)]
    assert len(with_text) <= 1


# --- line-wise boilerplate removal ----------------------------------------------


def test_boilerplate_filter_removes_every_copy(spark):
    from solana_snapshot_etl_tools_spark.operators.paragraphs import (
        boilerplate_filter,
    )

    rows = [
        (1, "Cookie notice!\nunique article one\ncookie notice"),
        (2, "cookie Notice\nanother piece entirely"),
        (3, "COOKIE notice\nthird story here\nfooter text"),
        (4, "no banners at all\nfooter text"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_filter(df, 3).collect()}
    # "cookie notice" normalizes equal across 3 docs -> every copy
    # dies, INCLUDING the first and doc 1's second occurrence
    assert out[1].text == "unique article one"
    assert out[1].n_removed_lines == 2
    assert out[2].text == "another piece entirely"
    # "footer text" is in only 2 docs: below min_doc_freq 3, survives
    assert out[3].text == "third story here\nfooter text"
    assert out[4].text == "no banners at all\nfooter text"
    assert out[5].text is None and out[5].n_removed_lines == 0
    assert out[6].text == "" and out[6].n_lines == 1
    # at threshold 2 the footer dies too
    out2 = {
        r.doc_id: r.text for r in boilerplate_filter(df, 2).collect()
    }
    assert out2[3] == "third story here" and out2[4] == "no banners at all"
    # within-doc repeats count ONCE toward doc frequency: a line
    # repeated 5 times in one doc is not boilerplate
    df3 = spark.createDataFrame(
        [(1, "same line\n" * 5 + "tail"), (2, "other text")],
        "doc_id long, text string",
    )
    out3 = {r.doc_id: r.text for r in boilerplate_filter(df3, 2).collect()}
    assert out3[1].startswith("same line")
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 2"):
        boilerplate_filter(df, 1)


def test_boilerplate_filter_duckdb_parity_prototype(spark):
    """The whole rule in DuckDB SQL over the real corpus with a
    planted banner: normalize lines, count distinct docs per
    normalized line, rebuild docs without the hot lines."""
    import duckdb

    from solana_snapshot_etl_tools_spark.operators.paragraphs import (
        boilerplate_filter,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(60)
        .withColumn(
            "text",
            F.concat(F.lit("Subscribe NOW!\n"), F.col("text"),
                     F.lit("\nsubscribe now")),
        )
    )
    got = {
        r.doc_id: r.text
        for r in boilerplate_filter(docs, 10).collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = dict(
        con.execute(
            """
            WITH lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS pos
              FROM docs
            ),
            keyed AS (
              SELECT doc_id, pos, line,
                     trim(regexp_replace(regexp_replace(regexp_replace(
                       lower(line), '[0-9]+', '', 'g'),
                       '[^\\p{L}\\s]', '', 'g'),
                       '\\s+', ' ', 'g')) AS norm
              FROM lines
            ),
            hot AS (
              SELECT norm FROM keyed WHERE len(norm) >= 1
              GROUP BY norm HAVING count(DISTINCT doc_id) >= 10
            )
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos)
                     FILTER (WHERE norm NOT IN (SELECT norm FROM hot)
                             OR len(norm) < 1)
            FROM keyed GROUP BY doc_id
            """
        ).fetchall()
    )
    assert set(got) == set(want)
    for i in want:
        assert got[i] == (want[i] or ""), i


def test_boilerplate_filter_paragraph_granularity(spark):
    """sep='\\n\\n' switches the unit to paragraphs — a banner
    paragraph containing internal newlines dies whole."""
    from solana_snapshot_etl_tools_spark.operators.paragraphs import (
        boilerplate_filter,
    )

    banner = "Follow us:\ntwitter facebook"
    rows = [
        (1, f"{banner}\n\nstory one"),
        (2, f"{banner}\n\nstory two"),
        (3, f"story three\n\n{banner}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.text
        for r in boilerplate_filter(df, 3, sep="\n\n").collect()
    }
    assert out == {1: "story one", 2: "story two", 3: "story three"}
    # at line granularity only the banner's LINES die (both of them)
    out2 = {
        r.doc_id: r.text
        for r in boilerplate_filter(df, 3, sep="\n").collect()
    }
    assert out2[1] == "\nstory one"  # the blank separator line survives


def test_frequent_lines_discovery(spark):
    """frequent_lines: exact distinct-doc frequencies under
    boilerplate_filter's normalization, descending, bounded to top,
    with short lines exempt; suggest_boilerplate_min_df is the pure
    0.5%-of-docs rule."""
    rows = [
        (1, "Subscribe to our newsletter!\nstory one\ncookie notice"),
        (2, "subscribe to our NEWSLETTER\nstory two\ncookie notice"),
        (3, "Subscribe, to our newsletter\nstory three"),
        (4, "story four\ncookie notice"),
        (5, None),
        (6, "x\nSubscribe to our newsletter"),  # 'x' is 1 char, counted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.line, r.doc_freq) for r in P.frequent_lines(df, top=10).collect()]
    # banner: docs 1,2,3,6 (all normalize identically); cookie: 1,2,4
    assert got[0] == ("subscribe to our newsletter", 4)
    assert got[1] == ("cookie notice", 3)
    # singleton lines never appear (min_doc_freq=2 floor)
    assert all(f >= 2 for _, f in got)
    assert {l for l, _ in got} == {"subscribe to our newsletter", "cookie notice"}
    # top bound respected
    assert [r.line for r in P.frequent_lines(df, top=1).collect()] == [
        "subscribe to our newsletter"
    ]
    # min_norm_chars exempts short lines from the report too
    rows2 = rows + [(7, "x\nstory seven")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got2 = {r.line: r.doc_freq for r in P.frequent_lines(df2, top=10).collect()}
    assert got2.get("x") == 2
    assert "x" not in {
        r.line
        for r in P.frequent_lines(df2, top=10, min_norm_chars=2).collect()
    }

    import pytest

    with pytest.raises(ValueError, match="top"):
        P.frequent_lines(df, top=0)
    with pytest.raises(ValueError, match="min_doc_freq"):
        P.frequent_lines(df, min_doc_freq=1)
    assert P.suggest_boilerplate_min_df(0) == 2
    assert P.suggest_boilerplate_min_df(400) == 2
    assert P.suggest_boilerplate_min_df(1000) == 5
    assert P.suggest_boilerplate_min_df(1001) == 6
    assert P.suggest_boilerplate_min_df(100, doc_share=0.1) == 10
    with pytest.raises(ValueError, match="doc_share"):
        P.suggest_boilerplate_min_df(10, doc_share=0.0)
    with pytest.raises(ValueError, match="n_docs"):
        P.suggest_boilerplate_min_df(-1)


def test_frequent_lines_no_line_text_in_count_shuffle(spark):
    """The counting side must shuffle hashed keys, not line text —
    the boilerplate_filter scale contract. Only the bounded winner
    recovery may move strings."""
    df = spark.createDataFrame(
        [(i, "shared banner line\nbody " + "w" * 50) for i in range(20)],
        "doc_id long, text string",
    )
    plan = (
        P.frequent_lines(df, top=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the winner set arrives broadcast — the count pipeline's exchange
    # carries (doc, key) longs only
    assert "BroadcastExchange" in plan or "Broadcast" in plan
