"""Paragraph-level exact deduplication — the CCNet granularity
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", 2020 §4.1: duplicated *paragraphs* are removed
by normalized hash; boilerplate headers/footers/navigation repeat
across pages whose full documents are unique, so document-level dedup
never catches them). Complements the engine's other granularities:
`dedup.py` (whole document), `operators/excise.py` (arbitrary ≥k-char
spans). Paragraphs are the cheap high-yield middle: split points are
free, normalization kills case/punctuation jitter, and one hash per
paragraph replaces excise's per-position windows.

Semantics: the FIRST occurrence (min (doc, position)) of each
normalized paragraph is canonical and survives; every later
occurrence (a later position of the same doc, or any other doc) is
removed. Documents are rebuilt with surviving paragraphs in original
order; all rows pass through with removal stats (skip-not-fail over
null/empty text).

Scale shape (no text in the decision shuffles): paragraphs explode
narrowly, the decision pipeline shuffles only (key, doc, pos) longs —
groupBy key → min struct, join back on key, collect_set of removed
POSITIONS per doc. No PARAGRAPH text ever shuffles (plan-pinned); the
rebuild re-splits the original text map-side with a higher-order
indexed ``filter``, joining only the compact (doc → removed
positions) table back to the docs. That join is the one place
document text meets an exchange: under AQE a boilerplate-light
corpus's removed side broadcasts and the text never crosses the
network; worst case the text crosses ONE equi-join shuffle —
the same cost class as ``exact_dedup``'s canonical join, and
``doc_len``-bounded, never exploded.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

DEFAULT_SEP = "\n\n"


def _norm_para(c: F.Column) -> F.Column:
    """CCNet-style normalization before hashing: lowercase, digits
    out, punctuation out, whitespace collapsed — so 'Hello, World!'
    and 'hello world' are the same paragraph."""
    c = F.lower(c)
    c = F.regexp_replace(c, r"\d+", "")
    c = F.regexp_replace(c, r"[^\p{L}\s]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = DEFAULT_SEP,
    min_norm_chars: int = 1,
) -> DataFrame:
    """(id, text, ...) → same rows with duplicated paragraphs removed
    and ``n_paragraphs`` / ``n_removed_paragraphs`` stats appended.

    ``sep`` is a LITERAL separator (split and rebuild must be exact
    inverses, so no regex). Paragraphs whose normalized form is
    shorter than ``min_norm_chars`` are exempt — with the default 1,
    whitespace-only paragraphs never count as duplicates of each
    other, which would otherwise collapse spacing structure.
    """
    if min_norm_chars < 0:
        raise ValueError(f"min_norm_chars must be >= 0, got {min_norm_chars}")
    pat = re.escape(sep)
    doc = F.col(id_col)
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), pat, -1)

    paras = docs.select(
        doc.alias("doc"), F.posexplode_outer(parts).alias("pos", "para")
    )
    keyed = (
        paras.withColumn("_norm", _norm_para(F.col("para")))
        .filter(F.length("_norm") >= min_norm_chars)
        .select("doc", "pos", F.xxhash64("_norm").alias("key"))
    )
    first = keyed.groupBy("key").agg(
        F.min(F.struct("doc", "pos")).alias("_first")
    )
    removed = (
        keyed.join(first, "key")
        .filter(F.struct("doc", "pos") != F.col("_first"))
        .groupBy("doc")
        .agg(F.collect_set("pos").alias("_removed"))
    )
    return _rebuild_without(
        docs, removed, parts, id_col, text_col, sep,
        "n_paragraphs", "n_removed_paragraphs",
    )


def _rebuild_without(
    docs, removed, parts, id_col, text_col, sep, n_name, removed_name
):
    """Map-side rebuild shared by the paragraph-granularity filters:
    join ONLY the compact (doc → removed positions) table back and
    re-split the original text with a higher-order indexed filter —
    paragraph text never shuffles."""
    keep = F.filter(
        parts,
        lambda _x, i: F.col("_removed").isNull()
        | ~F.array_contains(F.col("_removed"), i),
    )
    out = docs.join(
        removed.withColumnRenamed("doc", id_col), id_col, "left"
    )
    return out.select(
        *[c for c in docs.columns if c != text_col],
        F.when(F.col(text_col).isNull(), F.lit(None))
        .otherwise(F.array_join(keep, sep))
        .alias(text_col),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(parts))
        .alias(n_name),
        F.coalesce(F.size("_removed"), F.lit(0)).alias(removed_name),
    )


def boilerplate_filter(
    docs: DataFrame,
    min_doc_freq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_norm_chars: int = 1,
) -> DataFrame:
    """RefinedWeb/C4 line-wise boilerplate removal: a normalized LINE
    that appears in at least ``min_doc_freq`` DISTINCT documents is
    navigation/footer/cookie-banner boilerplate — EVERY occurrence is
    removed, including the first (unlike :func:`dedup_paragraphs`,
    whose duplicated content has a canonical copy worth keeping,
    boilerplate has none). Default granularity is the single line
    (``sep="\\n"``) — the recipes' unit; pass ``"\\n\\n"`` for
    paragraph-level. Stats columns ``n_lines`` /
    ``n_removed_lines`` append; null text passes through.

    Within one document a repeated line counts ONCE toward its
    document frequency (the count is distinct-docs, not occurrences).

    Scale shape: same as :func:`dedup_paragraphs` — the decision
    pipeline shuffles (key, doc, pos) longs (one partial-aggregable
    distinct-doc count per key), the rebuild is map-side, text meets
    at most the one (doc → removed positions) equi-join."""
    if min_doc_freq < 2:
        raise ValueError(
            f"min_doc_freq must be >= 2, got {min_doc_freq} (1 would "
            "remove every non-exempt line)"
        )
    import re as _re

    pat = _re.escape(sep)
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), pat, -1)
    lines = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode_outer(parts).alias("pos", "para"),
    )
    keyed = (
        lines.withColumn("_norm", _norm_para(F.col("para")))
        .filter(F.length("_norm") >= min_norm_chars)
        .select("doc", "pos", F.xxhash64("_norm").alias("key"))
    )
    hot = (
        keyed.groupBy("key")
        .agg(F.count_distinct("doc").alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("key")
    )
    removed = (
        keyed.join(hot, "key", "left_semi")
        .groupBy("doc")
        .agg(F.collect_set("pos").alias("_removed"))
    )
    return _rebuild_without(
        docs, removed, parts, id_col, text_col, sep,
        "n_lines", "n_removed_lines",
    )


def paragraph_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = DEFAULT_SEP,
    min_norm_chars: int = 1,
) -> DataFrame:
    """Measurement side: one row per duplicated normalized paragraph
    — (key, n_occurrences, n_docs, owner_doc, owner_pos) — the
    paragraph-granularity analog of ``dedup.dup_span_stats``."""
    pat = re.escape(sep)
    paras = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")), pat, -1)
        ).alias("pos", "para"),
    )
    keyed = (
        paras.withColumn("_norm", _norm_para(F.col("para")))
        .filter(F.length("_norm") >= min_norm_chars)
        .select("doc", "pos", F.xxhash64("_norm").alias("key"))
    )
    return (
        keyed.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc").alias("n_docs"),
            F.min(F.struct("doc", "pos")).alias("_first"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            "key",
            "n_occurrences",
            "n_docs",
            F.col("_first.doc").alias("owner_doc"),
            F.col("_first.pos").alias("owner_pos"),
        )
    )


def frequent_lines(
    docs: DataFrame,
    top: int = 20,
    min_doc_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_norm_chars: int = 1,
) -> DataFrame:
    """Boilerplate DISCOVERY: the ``top`` normalized lines by
    distinct-document frequency — under exactly the normalization and
    line split :func:`boilerplate_filter` removes with, so the report
    previews precisely which lines a given ``--boilerplate-min-df``
    would strip. Returns ``(line, doc_freq)`` descending, the
    returned rows ordered with ties by line. WHICH equal-frequency
    lines survive the ``top`` boundary cut is deterministic but
    hash-ordered (xxhash64 of the line), not lexicographic: breaking
    boundary ties by line would require every candidate line's TEXT
    to cross the counting shuffle — the exact cost this design
    avoids (text is recovered only for the <= ``top`` winners). For
    a discovery report the distinction is cosmetic; raise ``top`` if
    a boundary-tied line you expected is missing.

    Scale shape: the counting side shuffles only (key, doc) longs —
    the same decision pipeline as ``boilerplate_filter``; line TEXT
    crosses a shuffle only for the <= ``top`` winning keys, recovered
    via a broadcast semi-join of the bounded winner set against the
    re-derived lines."""
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    if min_doc_freq < 2:
        raise ValueError(
            f"min_doc_freq must be >= 2, got {min_doc_freq} (every "
            "line appears in >= 1 document)"
        )
    pat = re.escape(sep)
    lines = docs.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")), pat, -1)
        ).alias("para"),
    )
    keyed = (
        lines.withColumn("_norm", _norm_para(F.col("para")))
        .filter(F.length("_norm") >= min_norm_chars)
        .select("doc", F.xxhash64("_norm").alias("key"))
    )
    winners = (
        keyed.groupBy("key")
        .agg(F.count_distinct("doc").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .orderBy(F.desc("doc_freq"), "key")
        .limit(top)
    )
    norms = (
        lines.select(_norm_para(F.col("para")).alias("line"))
        .filter(F.length("line") >= min_norm_chars)
        .select("line", F.xxhash64("line").alias("key"))
    )
    from pyspark.sql.functions import broadcast

    return (
        norms.join(broadcast(winners), "key")
        .groupBy("key", "doc_freq")
        .agg(F.min("line").alias("line"))
        .select("line", "doc_freq")
        .orderBy(F.desc("doc_freq"), "line")
    )


def suggest_boilerplate_min_df(n_docs: int, doc_share: float = 0.005) -> int:
    """The measurement-to-action bridge for ``boilerplate_filter``: a
    line present in at least ``doc_share`` of the corpus's documents
    (RefinedWeb-style "site-wide template" reasoning — default 0.5%)
    is boilerplate, so the suggested ``min_doc_freq`` is
    ``max(2, ceil(doc_share * n_docs))``. Pure arithmetic so callers
    (and tests) can recompute it bit-for-bit from the report's doc
    count."""
    import math

    if n_docs < 0:
        raise ValueError(f"n_docs must be >= 0, got {n_docs}")
    if not 0.0 < doc_share <= 1.0:
        raise ValueError(f"doc_share must be in (0, 1], got {doc_share}")
    return max(2, math.ceil(doc_share * n_docs))
