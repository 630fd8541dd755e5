"""HTML → text extraction (functions/html.py): known-vector
exactness, entity decoding, structure preservation, junk tolerance,
and the composition into the paragraph-level operators it feeds."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.functions import html as H


def _one(spark, doc, fn=None):
    df = spark.createDataFrame([(doc,)], "html string")
    col = (fn or H.html_to_text)(F.col("html"))
    return df.select(col.alias("v")).collect()[0].v


def test_basic_page(spark):
    doc = """<!DOCTYPE html><html><head><title>My &amp; Page</title>
    <style>body { color: red }</style>
    <script>var x = "<p>not text</p>";</script></head>
    <body><h1>Header</h1>
    <p>First paragraph with <b>bold</b> and <a href="/x">a link</a>.</p>
    <p>Second&nbsp;paragraph &mdash; with entities &lt;tag&gt;.</p>
    <!-- a comment with <p>markup</p> inside -->
    <div>footer text</div></body></html>"""
    text = _one(spark, doc)
    assert "not text" not in text and "color: red" not in text
    assert "comment" not in text
    lines = [l for l in text.split("\n") if l]
    assert lines[0] == "Header"
    assert lines[1] == "First paragraph with bold and a link."
    assert lines[2] == "Second paragraph — with entities <tag>."
    assert lines[3] == "footer text"
    # the title element is head content, dropped from the body text
    assert "My & Page" not in text
    assert _one(spark, doc, H.html_title) == "My & Page"


def test_entities_and_whitespace(spark):
    assert _one(spark, "a &amp;&amp; b &copy; &hellip;") == "a && b © …"
    assert _one(spark, "x   \t  y\r\n\r\n\r\nz") == "x y\n\nz"


def test_plain_text_and_edges(spark):
    assert _one(spark, "no markup at all") == "no markup at all"
    assert _one(spark, "") == ""
    assert _one(spark, None) is None
    # unclosed script degrades (drops the tail), never errors
    assert isinstance(_one(spark, "<script>var x = 1; <p>hi"), str)
    # comparison operators in text are not tags
    assert _one(spark, "if a < b and b > c") == "if a < b and b > c"
    assert _one(spark, "<p>no title</p>", H.html_title) is None


def test_block_structure_feeds_paragraph_dedup(spark):
    """Extracted block boundaries are real paragraph boundaries: the
    repeated footer <div> across pages is exactly what
    dedup_paragraphs removes."""
    from solana_snapshot_etl_tools_spark.operators.paragraphs import (
        dedup_paragraphs,
    )

    footer = "<div>Copyright Example Corp - all rights reserved</div>"
    pages = [
        (1, f"<p>alpha body one</p>{footer}"),
        (2, f"<p>beta body two</p>{footer}"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string").select(
        "doc_id",
        F.regexp_replace(
            H.html_to_text(F.col("html")), r"\n+", "\n\n"
        ).alias("text"),
    )
    out = {r.doc_id: r for r in dedup_paragraphs(df).collect()}
    assert out[1].n_removed_paragraphs == 0
    assert out[2].n_removed_paragraphs == 1  # the shared footer
    assert "Copyright" in out[1].text and "Copyright" not in out[2].text


def test_escaped_entities_decode_once(spark):
    """Review r8: '&amp;' must decode LAST — decoding it first turned
    '&amp;lt;' into a phantom '<' (double-decode), corrupting any page
    that DISCUSSES html."""
    assert _one(spark, "use &amp;lt;b&amp;gt; for bold") == "use &lt;b&gt; for bold"
    assert _one(spark, "<p>a &amp;amp; b</p>") == "a &amp; b"
    assert (
        _one(spark, "<title>x &amp;lt; y</title>", H.html_title)
        == "x &lt; y"
    )


def test_extractor_never_errors_fuzz(spark):
    """The heuristic contract: pathological markup degrades, never
    errors — fuzz over tag-soup alphabets in one Spark job."""
    import pytest as _pytest

    hypothesis = _pytest.importorskip("hypothesis")
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.text(alphabet="<>&;/ab c!-=\"'\n", max_size=80),
            min_size=1,
            max_size=8,
        )
    )
    def check(docs):
        df = spark.createDataFrame([(d,) for d in docs], "html string")
        out = [
            r.v
            for r in df.select(
                H.html_to_text(F.col("html")).alias("v"),
                H.html_title(F.col("html")).alias("t"),
            ).collect()
        ]
        assert len(out) == len(docs)
        for v in out:
            assert v is None or isinstance(v, str)

    check()


# --- robots/noai compliance ---------------------------------------------------

from solana_snapshot_etl_tools_spark.functions.html import (
    html_noai,
    html_robots_directives,
)


def test_html_robots_directives_and_noai(spark):
    rows = [
        (1, '<html><head><meta name="robots" content="noindex, noai">'
            '</head><body>x</body></html>'),
        (2, '<html><head><meta content="NOAI" name="ROBOTS"></head>y'),
        (3, '<html><head><meta name="robots" content="index,follow">'
            '</head>z</html>'),
        (4, '<html>no meta at all</html>'),
        (5, None),
        (6, '<meta name="googlebot" content="noimageai">'),
        # 'noai' as CONTENT of an unrelated meta must not match
        (7, '<meta name="description" content="noai as a word">'),
        # nor as a substring of another directive
        (8, '<meta name="robots" content="noaiety">'),
    ]
    df = spark.createDataFrame(rows, "i long, h string")
    got = {
        r.i: (r.d, r.noai)
        for r in df.select(
            "i",
            html_robots_directives(F.col("h")).alias("d"),
            html_noai(F.col("h")).alias("noai"),
        ).collect()
    }
    assert got[1] == ("noindex, noai", True)
    assert got[2] == ("noai", True)
    assert got[3] == ("index,follow", False)
    assert got[4] == (None, False)
    assert got[5] == (None, None)
    assert got[6] == ("noimageai", True)
    assert got[7] == (None, False)
    assert got[8] == ("noaiety", False)


@pytest.mark.slow
def test_cli_respect_noai_batch_and_stream(spark, tmp_path_factory, capsys):
    import json as _json
    import os

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("noai_cli")
    body = "<p>a perfectly ordinary paragraph of words for the corpus</p>"
    rows = [
        (1, f"<html><head><title>a</title></head><body>{body} one</body></html>"),
        (2, '<html><head><meta name="robots" content="noai"></head>'
            f"<body>{body} two</body></html>"),
        (3, f"<html><body>{body} three</body></html>"),
    ]
    src = str(base / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    rep = run(src, str(base / "out"), "--no-pii", "--quality", "0",
              "--lang", "", "--html-extract", "--respect-noai")
    assert rep["n_input"] == 2  # the noai page died before extraction

    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(arrivals)
    srep = run(arrivals, str(base / "sout"), "--ingest-stream",
               "--index-out", str(base / "idx"), "--no-pii",
               "--quality", "0", "--lang", "", "--html-extract",
               "--respect-noai")
    assert srep["n_corpus"] == 2

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # needs --html-extract
        corpus_cli.main([src, str(base / "o2"), "--respect-noai"])
