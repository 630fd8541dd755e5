"""Term-blocklist safety scoring — the wordlist NSFW/toxicity filter
of a pretraining pipeline (the C4 "bad words" rule: score documents
by their blocklisted-term density and drop or route the offenders).

Matching is at TOKEN granularity, not substring: "class" must not hit
a 3-letter blocklist entry (the classic Scunthorpe failure of substring
rules), so text is split into lowercase word tokens and the blocklist
is matched against tokens (single-word terms) and token n-grams
(multi-word phrases — each phrase counts ONE hit).

Scale shape: the blocklist is driver-state by nature (KBs-MBs,
loudly capped) and broadcasts; the corpus side is one narrow
tokenize + per-phrase-length gram explode feeding a broadcast
semi-join and a partial-aggregable per-doc count — text never
shuffles, and a document with zero hits costs only its explode rows.
No UDF anywhere; the tokenizer is the same split expression the
quality heuristics use.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# far above any curated wordlist; a million-term "blocklist" is a
# data-quality bug, not a bigger list
MAX_TERMS = 250_000


def _word_tokens(c: Column) -> Column:
    """Lowercase word tokens: letter/digit runs, everything else is a
    separator. NULL text tokenizes to an empty array."""
    return F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), r"[^\p{L}\p{N}]+"),
        lambda t: F.length(t) > 0,
    )


def _normalize_terms(terms) -> dict[int, list[str]]:
    """Blocklist terms normalized EXACTLY like document tokens
    (lowercase, tokenized), grouped by phrase length in words."""
    by_len: dict[int, list[str]] = {}
    seen = set()
    n = 0
    for t in terms:
        if t is None:
            continue
        n += 1
        if n > MAX_TERMS:
            raise ValueError(
                f"term blocklist exceeds {MAX_TERMS} entries — that is "
                "not a wordlist; pass it as a single-column DataFrame "
                "(term_blocklist_stats joins it distributed, no "
                "driver collection)"
            )
        # [\W_] mirrors the document tokenizer (underscore is a
        # separator there too — \w alone would keep it and create
        # terms no document token can ever equal)
        words = [w for w in re.split(r"[\W_]+", t.lower()) if w]
        if not words:
            continue
        key = " ".join(words)
        if key in seen:
            continue
        seen.add(key)
        by_len.setdefault(len(words), []).append(key)
    return by_len


def term_blocklist_stats(
    df: DataFrame,
    terms,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document blocklist density: ``(id, n_tokens, n_hits,
    hit_ratio)`` for EVERY input row (zero-hit and empty documents
    included — a filter needs the clean rows too). ``n_hits`` counts
    matched token positions for single words plus one per matched
    phrase occurrence; ``hit_ratio = n_hits / n_tokens`` (0.0 for
    empty text). ``terms`` is an in-memory iterable (broadcast) or a
    single-column DataFrame for lists too big to collect — the terms
    then stay distributed end-to-end and only their distinct phrase
    LENGTHS reach the driver."""
    toks = df.select(
        F.col(id_col).alias("_id"), _word_tokens(F.col(text_col)).alias("_t")
    )
    totals = toks.select("_id", F.size("_t").alias("n_tokens"))

    spark = df.sparkSession
    if isinstance(terms, DataFrame):
        # the huge-blocklist path the MAX_TERMS error points at: terms
        # stay distributed — normalized with the SAME tokenization,
        # grouped by phrase length; only the tiny distinct-length list
        # reaches the driver
        tcol = terms.columns[0]
        norm = (
            terms.select(
                F.array_join(_word_tokens(F.col(tcol)), " ").alias("_gram")
            )
            .filter(F.length("_gram") > 0)
            .distinct()
            .withColumn("_k", F.size(F.split(F.col("_gram"), " ")))
        )
        lengths = sorted(r._k for r in norm.select("_k").distinct().collect())
        # no broadcast hint: a list big enough to arrive as a frame
        # may exceed broadcast limits — AQE picks the join strategy
        groups = [
            (k, norm.filter(F.col("_k") == k).select("_gram"))
            for k in lengths
        ]
    else:
        by_len = _normalize_terms(terms)
        groups = [
            (
                k,
                F.broadcast(
                    spark.createDataFrame(
                        [(w,) for w in words], "_gram string"
                    )
                ),
            )
            for k, words in sorted(by_len.items())
        ]
    hit_frames = []
    for k, lst in groups:
        if k == 1:
            grams = toks.select("_id", F.explode("_t").alias("_gram"))
        else:
            grams = toks.filter(F.size("_t") >= k).select(
                "_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("_t") - k),
                        lambda i: F.array_join(
                            F.slice(F.col("_t"), i + 1, k), " "
                        ),
                    )
                ).alias("_gram"),
            )
        hit_frames.append(
            grams.join(lst, "_gram")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("_h"))
        )
    if hit_frames:
        hits = hit_frames[0]
        for hf in hit_frames[1:]:
            hits = hits.unionByName(hf)
        hits = hits.groupBy("_id").agg(F.sum("_h").alias("n_hits"))
    else:
        hits = totals.select("_id", F.lit(0).cast("long").alias("n_hits")).limit(0)

    out = totals.join(hits, "_id", "left").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
    )
    return out.withColumn(
        "hit_ratio",
        F.when(F.col("n_tokens") > 0, F.col("n_hits") / F.col("n_tokens"))
        .otherwise(F.lit(0.0)),
    )


def term_blocklist_filter(
    df: DataFrame,
    terms,
    max_ratio: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose blocklist density is ≤ ``max_ratio``
    (default 0.0 — any hit drops, the strict C4 posture). All columns
    pass through; row-preserving for clean documents, including empty
    and NULL text (nothing objectionable in no text)."""
    if max_ratio < 0:
        raise ValueError(f"max_ratio must be >= 0, got {max_ratio}")
    stats = term_blocklist_stats(df, terms, id_col, text_col)
    keep = stats.filter(F.col("hit_ratio") <= max_ratio).select(
        F.col(id_col).alias("_keep")
    )
    return df.join(
        keep, F.col(id_col) == F.col("_keep"), "left_semi"
    )


# small enough that an InSet literal list stays a cheap plan node;
# beyond this the broadcast-join spelling in term_blocklist_stats is
# the right plan anyway
MAX_COLUMN_TERMS = 10_000


def blocklist_hits_column(
    text: Column,
    terms,
) -> Column:
    """The same hit count as ``term_blocklist_stats`` as ONE column
    expression — zero exchange, no join, runs unchanged inside a
    Structured Streaming row filter (the CLI's stream mode uses it).
    The list compiles into the plan, so it is capped at
    ``MAX_COLUMN_TERMS``; larger lists belong to the join spelling.
    Returns a long (0 for empty/NULL text)."""
    by_len = _normalize_terms(terms)
    n = sum(len(v) for v in by_len.values())
    if n > MAX_COLUMN_TERMS:
        raise ValueError(
            f"blocklist_hits_column caps at {MAX_COLUMN_TERMS} terms "
            f"(got {n}) — use term_blocklist_stats (broadcast join)"
        )
    toks = _word_tokens(text)
    hits = F.lit(0).cast("long")
    for k, words in sorted(by_len.items()):
        if k == 1:
            grams = toks
        else:
            grams = F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        hits = hits + F.size(F.filter(grams, lambda g: g.isin(words)))
    return hits


def blocklist_ratio_column(text: Column, terms) -> Column:
    """``hit_ratio`` as a single column expression (see
    ``blocklist_hits_column``); 0.0 for empty/NULL text."""
    n = F.size(_word_tokens(text))
    h = blocklist_hits_column(text, terms)
    return F.when(n > 0, h.cast("double") / n).otherwise(F.lit(0.0))
