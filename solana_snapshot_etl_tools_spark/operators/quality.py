"""Gopher-rule document quality flags (Rae et al. 2021, "Scaling
Language Models: ... Gopher", §A1.1) — the canonical published filter
suite for web-scale pretraining corpora. Complements the engine's
scalar ``functions/text.py:quality_score`` (a composite heuristic)
with the individual, interpretable pass/fail rules pipelines actually
tune: each rule is its own boolean column, so a corpus build can
report WHY documents were dropped, not just how many.

Every rule is a pure column expression over the token array (computed
once per row) — whole-stage codegen, no UDF, no shuffle; the operator
is a narrow map safe to run inline in any scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions.text import tokens

# Gopher §A1.1 thresholds (the published defaults)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORDS_PRESENT = 2
# Gopher A1.1's own stop-word list — deliberately NOT the engine's
# generic STOPWORDS['en'] (that list is a language-ID feature set;
# the paper's rule names these exact eight words)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    min_stopwords: int = MIN_STOPWORDS_PRESENT,
) -> DataFrame:
    """All Gopher rules as named boolean columns plus their
    conjunction ``passes_gopher``; input columns pass through.
    ``stopwords`` overrides the paper's eight-word list (faithful
    default) — e.g. for non-English corpora, where A1.1's English
    list would reject everything.

    Rules (a doc PASSES when):
    - ``ok_word_count``: 50 <= #words <= 100k
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: '#'/words <= 0.1 AND ellipses/words <= 0.1
      (each symbol tested separately, per the published rule; the
      Unicode single-char ellipsis counts too)
    - ``ok_bullet_lines``: <= 90% of lines start with a bullet
    - ``ok_ellipsis_lines``: <= 30% of lines end with an ellipsis
    - ``ok_alpha_words``: >= 80% of words contain a letter
    - ``ok_stopwords``: >= 2 distinct words from Gopher A1.1's own
      eight-word stop list (the, be, to, of, and, that, have, with);
      punctuation is stripped from token edges before matching so
      'the,' counts — the paper filters on word identity, and
      whitespace tokenization alone would make the rule stricter
      than published. Residual deviation: matching is on lowercased
      surface forms only ('be' does not match 'is'/'was' — the paper
      does not specify lemmatization, so none is applied).
    Lines split on ``\\r?\\n``; leading/trailing whitespace (incl.
    tabs and a stray ``\\r``) is tolerated around bullets/ellipses —
    CRLF web text must not silently pass the line rules.
    """
    t = F.col(text_col)
    w = tokens(t)
    nw = F.size(w)
    # mean word length over the words themselves (token_count-safe on
    # empty text: guard the division by the word-count rule's floor)
    total_chars = F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x))
    mean_len = total_chars / F.greatest(nw, F.lit(1))
    hash_count = F.regexp_count(t, F.lit("#"))
    ellipsis_count = F.regexp_count(t, F.lit(r"(\.\.\.|…)"))
    lines = F.split(t, r"\r?\n")
    nl = F.size(lines)
    bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    # \p{L}: the published rule is "contains an alphabetic character",
    # and [a-z] would fail every Cyrillic/CJK/Greek word (and strip
    # accented edges) — the exact corpora the stopword override
    # targets
    alpha_words = F.size(F.filter(w, lambda x: x.rlike(r"\p{L}")))
    if stopwords is not None and not stopwords:
        raise ValueError(
            "stopwords must be a non-empty list (pass None for the "
            "Gopher A1.1 default) — an empty list would silently fail "
            "ok_stopwords for every document"
        )
    sw = F.array(
        *[
            F.lit(s.lower())  # tokens are lowercased; 'The' must match
            for s in sorted(
                stopwords if stopwords is not None else GOPHER_STOPWORDS
            )
        ]
    )
    bare = F.transform(
        w,
        lambda x: F.regexp_replace(
            x, r"^[^\p{L}\p{N}]+|[^\p{L}\p{N}]+$", ""
        ),
    )
    n_stop = F.size(F.array_intersect(F.array_distinct(bare), sw))

    word_floor = F.greatest(nw, F.lit(1))
    flags: dict[str, Column] = {
        "ok_word_count": (nw >= MIN_WORDS) & (nw <= MAX_WORDS),
        "ok_mean_word_len": (mean_len >= MIN_MEAN_WORD_LEN)
        & (mean_len <= MAX_MEAN_WORD_LEN),
        "ok_symbol_ratio": (
            hash_count <= F.lit(MAX_SYMBOL_WORD_RATIO) * word_floor
        )
        & (ellipsis_count <= F.lit(MAX_SYMBOL_WORD_RATIO) * word_floor),
        "ok_bullet_lines": bullet_lines <= F.lit(MAX_BULLET_LINE_FRAC) * nl,
        "ok_ellipsis_lines": ellipsis_lines
        <= F.lit(MAX_ELLIPSIS_LINE_FRAC) * nl,
        "ok_alpha_words": alpha_words
        >= F.lit(MIN_ALPHA_WORD_FRAC) * word_floor,
        "ok_stopwords": n_stop >= min_stopwords,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    return docs.select(
        *docs.columns,
        *[c.alias(n) for n, c in flags.items()],
        passes.alias("passes_gopher"),
    )


# FineWeb §3.4 custom-filter thresholds (Penedo et al. 2024 — the
# three line-level rules FineWeb adds on top of the Gopher/C4 suites,
# with their published cut points)
MIN_PUNCT_LINE_FRAC = 0.12
MAX_DUP_LINE_CHAR_FRAC = 0.1
MAX_SHORT_LINE_FRAC = 0.67
SHORT_LINE_CHARS = 30
# C4's terminal-punctuation set (period, exclamation, question,
# closing quote) — what "a line ends with punctuation" means there
TERMINAL_PUNCT = [".", "!", "?", '"']


def fineweb_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    min_punct_line_frac: float = MIN_PUNCT_LINE_FRAC,
    max_dup_line_char_frac: float = MAX_DUP_LINE_CHAR_FRAC,
    max_short_line_frac: float = MAX_SHORT_LINE_FRAC,
    short_line_chars: int = SHORT_LINE_CHARS,
    terminal_punct: list[str] | None = None,
) -> DataFrame:
    """FineWeb's three line-level rules as signal + flag columns;
    input columns pass through. Lines are newline-split and trimmed;
    EMPTY lines don't count (a doc of blank lines has no lines). A
    doc with zero lines fails all three rules (nothing measurable =
    nothing keepable — the Gopher suite's posture for empty docs).

    - ``punct_line_frac`` / ``ok_punct_lines``: fraction of lines
      ending in terminal punctuation; FAIL when <= ``0.12`` (FineWeb
      removes those docs — boilerplate/navigation pages).
    - ``dup_line_char_frac`` / ``ok_dup_line_chars``: fraction of
      line characters belonging to lines that occur >= 2 times in the
      SAME document (every copy counts); FAIL when >= ``0.1``.
    - ``short_line_frac`` / ``ok_short_lines``: fraction of lines
      under ``30`` characters; FAIL when >= ``0.67`` (listicles/menu
      pages).
    - ``passes_fineweb``: the conjunction.

    Scale shape: pure column expressions — the duplicated-line mass
    is computed by SORTING the doc's line array and comparing sorted
    neighbors via ``zip_with`` (O(n log n) per doc, never an
    ``element_at(derived, i)`` O(n²) lambda, and no explode/shuffle);
    whole-stage codegen end to end, safe inline in a 100 TB scan."""
    punct = TERMINAL_PUNCT if terminal_punct is None else list(terminal_punct)
    if not punct:
        raise ValueError("terminal_punct must name at least one character")
    c = F.col(text_col)
    # trim ALL whitespace (F.trim strips spaces only — a tab-only
    # line would otherwise count as content); \s is ASCII whitespace
    lines = F.filter(
        F.transform(
            F.split(c, r"\n"),
            lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
        ),
        lambda l: F.length(l) > 0,
    )
    n = F.size(lines)

    n_punct = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, -1, 1).isin(punct),
        )
    )
    n_short = F.size(
        F.filter(lines, lambda l: F.length(l) < short_line_chars)
    )

    srt = F.array_sort(lines)
    null_s = F.array(F.lit(None).cast("string"))
    tail_len = F.greatest(n - 1, F.lit(0))
    prev = F.concat(null_s, F.slice(srt, 1, tail_len))
    nxt = F.concat(F.slice(srt, 2, tail_len), null_s)
    eq_prev = F.zip_with(srt, prev, lambda a, b: F.coalesce(a == b, F.lit(False)))
    eq_next = F.zip_with(srt, nxt, lambda a, b: F.coalesce(a == b, F.lit(False)))
    is_dup = F.zip_with(eq_prev, eq_next, lambda a, b: a | b)
    lens = F.transform(srt, lambda x: F.length(x))
    dup_chars = F.aggregate(
        F.zip_with(lens, is_dup, lambda l, d: F.when(d, l).otherwise(F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    total_chars = F.aggregate(
        lens, F.lit(0).cast("long"), lambda acc, x: acc + x
    )

    nd = n.cast("double")
    punct_frac = F.when(n > 0, n_punct / nd)
    short_frac = F.when(n > 0, n_short / nd)
    dup_frac = F.when(total_chars > 0, dup_chars / total_chars.cast("double"))

    ok_punct = F.coalesce(punct_frac > min_punct_line_frac, F.lit(False))
    ok_dup = F.coalesce(dup_frac < max_dup_line_char_frac, F.lit(False))
    ok_short = F.coalesce(short_frac < max_short_line_frac, F.lit(False))
    return docs.select(
        "*",
        punct_frac.alias("punct_line_frac"),
        dup_frac.alias("dup_line_char_frac"),
        short_frac.alias("short_line_frac"),
        ok_punct.alias("ok_punct_lines"),
        ok_dup.alias("ok_dup_line_chars"),
        ok_short.alias("ok_short_lines"),
        (ok_punct & ok_dup & ok_short).alias("passes_fineweb"),
    )
