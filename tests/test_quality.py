"""Gopher quality flags (operators/quality.py): one planted violation
per rule, pass-through of clean prose, and plan narrowness."""

from __future__ import annotations

import pytest

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


# --- FineWeb line-level rules -----------------------------------------------

from solana_snapshot_etl_tools_spark.operators.quality import (
    fineweb_quality_flags,
)


def _fw(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r.asDict() for r in fineweb_quality_flags(df, **kw).collect()
    }


def test_fineweb_signals_hand_computed(spark):
    good = "\n".join(
        f"this line is a complete sentence number {i} with plain words."
        for i in range(10)
    )
    rows = [
        (1, good),
        # 0/3 lines end in punctuation
        (2, "a heading\nanother heading here\nyet another heading line"),
        # duplicated line mass: 'nav' x3 (9 chars of 9+30+9+9)... see math
        (3, "navmenu\n" + "x" * 30 + "\nnavmenu\nnavmenu"),
        # 3/4 lines short
        (4, "hi\nok\nno\n" + "y" * 40),
        (5, ""),          # no lines at all
        (6, "\n \n\t\n"),  # only blank lines
        (7, None),
    ]
    got = _fw(spark, rows)
    assert got[1]["passes_fineweb"] is True
    assert got[1]["punct_line_frac"] == 1.0
    assert got[1]["dup_line_char_frac"] == 0.0

    assert got[2]["punct_line_frac"] == 0.0
    assert got[2]["ok_punct_lines"] is False

    # doc 3: lines navmenu(7) x30(30) navmenu(7) navmenu(7) -> dup
    # chars 21 of 51
    assert got[3]["dup_line_char_frac"] == 21 / 51
    assert got[3]["ok_dup_line_chars"] is False

    assert got[4]["short_line_frac"] == 0.75
    assert got[4]["ok_short_lines"] is False

    for d in (5, 6, 7):
        assert got[d]["passes_fineweb"] is False
        assert got[d]["punct_line_frac"] is None
        assert got[d]["dup_line_char_frac"] is None


def test_fineweb_threshold_edges(spark):
    # exactly 0.12 punct-line fraction FAILS (paper removes <= 0.12):
    # 3/25 = 0.12
    lines = ["end."] * 3 + [f"plain line {i} without stop" for i in range(22)]
    got = _fw(spark, [(1, "\n".join(lines))])
    assert got[1]["punct_line_frac"] == 3 / 25
    assert got[1]["ok_punct_lines"] is False
    # exactly the dup threshold fails too (remove when >= 0.1):
    # one dup pair of 10-char lines among 200 total chars -> 0.1
    dup = ["d" * 10, "d" * 10]
    fill = ["f" * 36 + str(i) + "." for i in range(4)]  # hmm lengths
    # build exact: total 200, dup 20
    filler = ["g" * 60 + ".", "h" * 60 + ".", "i" * 57 + "."]
    doc = "\n".join(dup + filler)
    tot = sum(len(l) for l in dup + filler)
    got2 = _fw(spark, [(1, doc)])
    assert got2[1]["dup_line_char_frac"] == 20 / tot
    assert (got2[1]["ok_dup_line_chars"] is False) == (20 / tot >= 0.1)
    # custom punctuation set
    got3 = _fw(
        spark, [(1, "line one!\nline two!")], terminal_punct=["!"],
    )
    assert got3[1]["punct_line_frac"] == 1.0


def test_fineweb_matches_python_reference_on_corpus(spark):
    """Exact differential vs an independent Python spelling over the
    real documents table (with planted newline structure: the
    synthetic corpus is single-line, so wrap it)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(200)
        # fold each doc into pseudo-lines every ~40 chars so the line
        # rules have real structure to chew on
        .withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"(.{40,}?)\s", r"$1\n"),
        )
    )
    got = {
        r.doc_id: (
            r.punct_line_frac,
            r.dup_line_char_frac,
            r.short_line_frac,
            r.passes_fineweb,
        )
        for r in fineweb_quality_flags(docs).collect()
    }

    def ref(text):
        if text is None:
            return (None, None, None, False)
        lines = [l.strip() for l in text.split("\n")]
        lines = [l for l in lines if l]
        if not lines:
            return (None, None, None, False)
        n = len(lines)
        punct = sum(1 for l in lines if l[-1] in '.!?"') / n
        short = sum(1 for l in lines if len(l) < 30) / n
        from collections import Counter

        cnt = Counter(lines)
        tot = sum(len(l) for l in lines)
        dupc = sum(len(l) for l in lines if cnt[l] >= 2)
        dup = dupc / tot
        ok = punct > 0.12 and dup < 0.1 and short < 0.67
        return (punct, dup, short, ok)

    import pytest as _pytest

    for r in docs.collect():
        w = ref(r.text)
        g = got[r.doc_id]
        assert g[3] == w[3], (r.doc_id, g, w)
        for gi, wi in zip(g[:3], w[:3]):
            if wi is None:
                assert gi is None
            else:
                assert gi == _pytest.approx(wi, rel=1e-12)


def test_fineweb_plan_is_narrow(spark):
    docs = spark.createDataFrame(
        [(1, "a line.\nanother line.")], "doc_id long, text string"
    )
    plan = fineweb_quality_flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_cli_fineweb_flag_batch_and_stream(spark, tmp_path_factory, capsys):
    """--fineweb drops rule-failing docs in both modes (a stateless
    column filter, like --gopher)."""
    import json as _json
    import os

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("fineweb_cli")
    good = "\n".join(
        f"this line is a complete ordinary sentence number {i}."
        for i in range(8)
    )
    listicle = "\n".join(f"item {i}" for i in range(20))
    rows = [(1, good), (2, listicle), (3, good + "\nand one more line.")]
    src = str(base / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    rep = run(src, str(base / "out"), "--no-pii", "--quality", "0",
              "--lang", "", "--fineweb")
    assert rep["n_after_filters"] == 2  # the listicle died

    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(arrivals)
    srep = run(arrivals, str(base / "sout"), "--ingest-stream",
               "--index-out", str(base / "idx"), "--no-pii",
               "--quality", "0", "--lang", "", "--fineweb")
    assert srep["n_corpus"] == 2
