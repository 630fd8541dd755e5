"""Gopher quality flags (operators/quality.py): one planted violation
per rule, pass-through of clean prose, and plan narrowness."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators.quality import gopher_quality_flags

GOOD = (
    "this is a perfectly ordinary paragraph of english prose with the "
    "usual mixture of short and longer words that any web document "
    "would contain and it keeps going for long enough to pass the "
    "minimum word count rule while staying well clear of every other "
    "threshold because it has no bullets no ellipses and no symbols "
    "just plain sentences that read the way normal writing reads"
)


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in gopher_quality_flags(df).collect()}


def test_clean_prose_passes_all_rules(spark):
    got = _flags(spark, [(1, GOOD)])[1]
    assert got["passes_gopher"] is True
    assert all(v for k, v in got.items() if k.startswith("ok_"))


def test_each_rule_fails_on_its_planted_violation(spark):
    rows = [
        (1, "too few words here"),  # word count
        (2, " ".join(["pneumonoultramicroscopic"] * 60)),  # mean word len high
        (3, GOOD + " " + "# " * 60),  # symbol ratio
        (4, "\n".join(["- a bullet item of text"] * 10)),  # bullet lines
        (5, "\n".join([GOOD[:40] + "..."] * 10)),  # ellipsis lines
        (6, " ".join(["12345"] * 80)),  # alpha words
        (7, " ".join([f"w{i}x" for i in range(80)])),  # no stopwords
    ]
    got = _flags(spark, rows)
    assert got[1]["ok_word_count"] is False
    assert got[2]["ok_mean_word_len"] is False
    assert got[3]["ok_symbol_ratio"] is False
    assert got[4]["ok_bullet_lines"] is False
    assert got[5]["ok_ellipsis_lines"] is False
    assert got[6]["ok_alpha_words"] is False
    assert got[7]["ok_stopwords"] is False
    assert all(not v["passes_gopher"] for v in got.values())


def test_symbol_ratios_are_tested_separately(spark):
    """The published rule bounds EACH symbol's ratio at 0.1 — a doc
    with 8% hashes and 8% ellipses passes (a summed ratio of 0.16
    would wrongly reject it)."""
    words = GOOD.split()
    n = len(words)
    k = int(0.08 * n)
    doc = " ".join(words) + " " + "# " * k + "... " * k
    got = _flags(spark, [(1, doc)])[1]
    assert got["ok_symbol_ratio"] is True


def test_crlf_tabs_and_unicode_ellipsis_are_caught(spark):
    rows = [
        # CRLF line endings: the trailing \r must not hide the ellipsis
        (1, "\r\n".join([GOOD[:40] + "..."] * 10)),
        # tab-indented bullets still count as bullet lines
        (2, "\n".join(["\t- a bullet item of text"] * 10)),
        # the single-char Unicode ellipsis counts like '...'
        (3, "\n".join([GOOD[:40] + "…"] * 10)),
    ]
    got = _flags(spark, rows)
    assert got[1]["ok_ellipsis_lines"] is False
    assert got[2]["ok_bullet_lines"] is False
    assert got[3]["ok_ellipsis_lines"] is False


def test_stopword_rule_unglues_punctuation_and_uses_paper_list(spark):
    """Gopher A1.1 filters on word identity: 'the,' and 'of.' must
    count (whitespace tokenization alone would miss them), and the
    list is the paper's own eight words — 'is'/'a'/'in' from generic
    stop lists must NOT satisfy the rule."""
    filler = " ".join(f"w{i}x" for i in range(60))
    rows = [
        (1, f"the, end. of. {filler}"),  # glued punctuation: 2 hits
        (2, f"is a in on for la {filler}"),  # generic-list words: 0 hits
        (3, f"that... (with) {filler}"),  # brackets/ellipsis stripped
    ]
    got = _flags(spark, rows)
    assert got[1]["ok_stopwords"] is True
    assert got[2]["ok_stopwords"] is False
    assert got[3]["ok_stopwords"] is True


def test_real_corpus_and_narrow_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = gopher_quality_flags(docs)
    n = docs.count()
    assert out.count() == n  # pass-through, one row per doc
    assert out.columns[: len(docs.columns)] == docs.columns
    # the synthetic corpus is tech-word salad: A1.1's faithful
    # stop-word rule (the paper's own eight words, ≥2 distinct) is
    # SUPPOSED to reject it — that's the rule detecting non-natural
    # text. Other rules must still mostly pass (it is word-shaped).
    stats = {
        c: v
        for c, v in zip(
            [c for c in out.columns if c.startswith("ok_")],
            out.agg(
                *[
                    F.sum(F.col(c).cast("int"))
                    for c in out.columns
                    if c.startswith("ok_")
                ]
            ).first(),
        )
    }
    assert stats["ok_stopwords"] == 0  # faithful list kills word salad
    assert stats["ok_mean_word_len"] == n
    assert stats["ok_alpha_words"] == n
    # a relaxed per-corpus list (the override parameter) lets the
    # natural-prose-adjacent docs through
    relaxed = gopher_quality_flags(
        docs, stopwords=["the", "scan", "join", "sort", "window"]
    )
    n_pass = relaxed.filter(F.col("passes_gopher")).count()
    assert 0 < n_pass <= n
    # a narrow map: no exchange, no UDF stage
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_gopher_stopwords_non_latin_and_case(spark):
    """The stopword override must work for the corpora it exists for:
    non-Latin scripts survive edge-stripping, uppercase user input
    matches the lowercased tokens, and an explicit empty list is an
    error rather than a silent reject-everything."""
    import pytest as _pytest

    from solana_snapshot_etl_tools_spark.operators.quality import (
        gopher_quality_flags,
    )

    ru = " ".join(["и в не на слово текст пример давно"] * 10)
    df = spark.createDataFrame([(1, ru)], "doc_id long, text string")
    out = gopher_quality_flags(df, stopwords=["и", "в", "не"]).collect()[0]
    assert out.ok_stopwords  # Cyrillic tokens are not stripped to ''
    assert out.ok_alpha_words  # \p{L}, not [a-z]

    en = " ".join(["the cat and the dog sat with a book nearby today"] * 8)
    df2 = spark.createDataFrame([(1, en)], "doc_id long, text string")
    up = gopher_quality_flags(df2, stopwords=["The", "AND", "WITH"]).collect()[0]
    assert up.ok_stopwords  # case-insensitive override

    with _pytest.raises(ValueError):
        gopher_quality_flags(df2, stopwords=[])
