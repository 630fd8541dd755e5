"""Text-analysis column expressions for large-scale training-data
pipelines: tokenization, shingling, language ID, quality scoring,
fingerprinting.

All pure Catalyst expressions (no Python in the hot path) and written
for cross-engine determinism: integer counts divided once in double,
explicit char classes instead of locale-dependent ones.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# small built-in stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "los", "las", "y", "en", "que", "un", "una"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "auf", "zu"],
    "fr": ["le", "les", "et", "est", "dans", "pour", "sur", "une", "au", "du"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: word pieces + standalone punctuation marks."""
    return F.regexp_count(col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")).cast("long")


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct character k-grams of the lowercased text (the unit for
    n-gram Jaccard / MinHash dedup). NB: Spark's sequence(1, n) turns
    DESCENDING for n < 1, so texts shorter than k are guarded to an
    empty array explicitly."""
    t = F.lower(col)
    arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (k - 1)),
            lambda i: F.substring(t, i, k),
        )
    )
    return F.when(F.length(t) >= k, arr).otherwise(
        F.array().cast("array<string>")
    )


def punct_ratio(col: Column) -> Column:
    n_punct = F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]"))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_hits(col: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t))).cast(
        "long"
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return stopword_hits(col, lang) / F.greatest(token_count(col), F.lit(1))


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID over {en, es, de, fr}; 'und' when no
    stopword of any list appears. Ties break in en>es>de>fr order
    (the CASE evaluation order)."""
    en, es, de, fr = (stopword_hits(col, lg) for lg in ("en", "es", "de", "fr"))
    return (
        F.when(en + es + de + fr == 0, "und")
        .when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword density
    and moderate token length, penalizes punctuation load and extreme
    shortness. Fixed evaluation shape so engines agree bit-for-bit."""
    len_term = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(col, "en") * 4.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(col) * 5.0, F.lit(0.0))
    return (len_term * 0.4 + sw_term * 0.3) + punct_term * 0.3


def normalized_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    s = F.regexp_replace(F.lower(col), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(s, " +", " "))


def fingerprint_md5(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col).cast("binary"))


# --- PII detection / redaction ----------------------------------------------
# Patterns are deliberately restricted to syntax that Java regex
# (Spark) and RE2 (DuckDB) interpret identically — character classes,
# bounded repetition, no lookaround, no backreferences — so the same
# pattern string drives both the engine and the oracle. Redaction
# order matters (emails contain dots that could partially look like
# other patterns), so `redact_pii` applies the patterns in the fixed
# PII_PATTERNS order.

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{2} [0-9]{3} [0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (email/phone/ipv4)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("long")


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder — the scrub
    step a training corpus runs before tokenization. Pure chained
    ``regexp_replace``; one codegen'd projection, no UDF."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


# --- Unicode script detection ---------------------------------------------------
#
# The routing signal lang_id's trigram heuristic cannot give: which
# WRITING SYSTEM a document uses. Multilingual curation branches on it
# (per-script tokenizers, per-script quality thresholds) before any
# language call is trustworthy. Pure JVM regexp_count over Java's
# \p{Is<Script>} classes — no UDF.

SCRIPT_PATTERNS = {
    "latin": r"\p{IsLatin}",
    "cyrillic": r"\p{IsCyrillic}",
    "cjk": r"[\p{IsHan}\p{IsHiragana}\p{IsKatakana}]",
    "arabic": r"\p{IsArabic}",
    "devanagari": r"\p{IsDevanagari}",
    "hangul": r"\p{IsHangul}",
    "greek": r"\p{IsGreek}",
    "hebrew": r"\p{IsHebrew}",
}


def script_ratio(col: Column, script: str) -> Column:
    """Fraction of the text's LETTER characters in the given script
    (keys of ``SCRIPT_PATTERNS``); 0.0 when the text has no letters."""
    if script not in SCRIPT_PATTERNS:
        raise ValueError(
            f"unknown script {script!r}; one of {sorted(SCRIPT_PATTERNS)}"
        )
    letters = F.regexp_count(col, F.lit(r"\p{L}"))
    hits = F.regexp_count(col, F.lit(SCRIPT_PATTERNS[script]))
    return F.when(letters > 0, hits.cast("double") / letters).otherwise(
        F.lit(0.0)
    )


def dominant_script(col: Column) -> Column:
    """The script with the most characters in the text; ties break
    toward the earlier entry in ``SCRIPT_PATTERNS`` order, and text
    with no character of ANY known script (including empty/NULL) is
    ``'unknown'``. One ``greatest`` over (count, -position) structs —
    still a single codegen'd projection."""
    names = list(SCRIPT_PATTERNS)
    ranked = [
        F.struct(
            F.regexp_count(F.coalesce(col, F.lit("")), F.lit(p)).alias("c"),
            F.lit(-i).alias("ni"),
        )
        for i, p in enumerate(SCRIPT_PATTERNS.values())
    ]
    best = F.greatest(*ranked)
    return F.when(
        best["c"] > 0,
        F.element_at(
            F.array(*[F.lit(n) for n in names]), (-best["ni"]) + F.lit(1)
        ),
    ).otherwise(F.lit("unknown"))
