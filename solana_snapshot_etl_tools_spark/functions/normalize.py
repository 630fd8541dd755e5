"""Unicode text normalization — the cleanup pass a web corpus runs
BEFORE any text-reading stage (tokenizers, hashes, quality rules all
change behavior on un-normalized text: a full-width Ａ, a ligature ﬁ,
or a zero-width space makes visually identical documents hash apart
and tokenize differently).

Two tiers, matching how the work distributes:

- :func:`strip_control_chars` / :func:`collapse_whitespace` are pure
  JVM ``regexp_replace`` chains — they fold into the scan's codegen
  stage like ``html_to_text`` does, zero Python cost;
- :func:`nfkc_normalize` applies Unicode NFKC, which Spark SQL has no
  built-in for — it is the one Arrow-batched pandas UDF here
  (``Series.str.normalize``, vectorized per batch; never a
  row-at-a-time Python UDF).

``normalize_text`` composes the standard order: control/invisible
strip → NFKC → whitespace collapse (NFKC can CREATE spaces, e.g.
ideographic space U+3000 → ' ', so the collapse runs last).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# C0 + C1 control blocks except \t \n \r, plus the invisible
# formatting characters crawl text is full of: zero-width space/
# non-joiner/joiner (200B-200D), word joiner (2060), BOM/ZWNBSP
# (FEFF), soft hyphen (00AD), and the deprecated bidi embedding
# controls (202A-202E)
_CONTROL_RE = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F"
    "\\u200B-\\u200D\\u2060\\uFEFF\\u00AD\\u202A-\\u202E]"
)


def strip_control_chars(col: Column) -> Column:
    """Remove control and invisible-formatting characters (keeps
    tab/newline/CR). One codegen'd ``regexp_replace``."""
    return F.regexp_replace(col, _CONTROL_RE, "")


def collapse_whitespace(col: Column) -> Column:
    """Canonical inline whitespace: CRLF/CR become LF first (web text
    mixes all three), runs of spaces/tabs become one space, space
    around a newline is dropped, runs of 3+ newlines become exactly
    two (paragraph break), and the ends are trimmed. Newlines inside
    survive — paragraph structure is a signal later stages (paragraph
    dedup, Gopher rules) read."""
    out = F.regexp_replace(col, "\\r\\n?", "\n")
    out = F.regexp_replace(out, "[ \\t]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{3,}", "\n\n")
    return F.trim(out)


def _nfkc_series(s):
    return s.str.normalize("NFKC")


# built lazily: the pandas_udf decorator resolves its return type
# against the ACTIVE session, so a module-import-time UDF would
# require a SparkContext before any caller created one
_NFKC_UDF = None


def nfkc_normalize(col: Column) -> Column:
    """Unicode NFKC compatibility normalization — full-width forms,
    ligatures, superscripts, and compatibility variants collapse to
    their canonical text (ﬁ → fi, Ａ → A, ① → 1). Arrow-batched
    pandas UDF (Spark SQL has no Unicode-normalize built-in)."""
    global _NFKC_UDF
    if _NFKC_UDF is None:
        from pyspark.sql.functions import pandas_udf

        _NFKC_UDF = pandas_udf(_nfkc_series, "string")
    return _NFKC_UDF(col)


def normalize_text(col: Column, nfkc: bool = True) -> Column:
    """The standard composition: strip control/invisible characters,
    NFKC (optional — the only Python-side step), collapse whitespace.
    NULL passes through NULL. Idempotent: a second application is the
    identity (pinned by test)."""
    out = strip_control_chars(col)
    if nfkc:
        out = nfkc_normalize(out)
    return collapse_whitespace(out)


# ship the pandas UDF inside the task — workers do not share the
# driver's sys.path (see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
