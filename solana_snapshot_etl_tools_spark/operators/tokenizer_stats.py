"""Tokenizer evaluation over an encoded corpus — fertility and vocab
utilization.

Before committing a tokenizer to a pretraining run, pipelines compare
candidates on (a) **fertility** — subword tokens emitted per
whitespace word (lower = cheaper training for the same text; ~1.3-1.6
is typical for English BPE), (b) **compression** — characters per
token, and (c) **vocab utilization** — how much of the vocabulary the
corpus actually exercises and how concentrated the token unigram
distribution is (a near-zero-entropy vocab wastes embedding rows).
The reference ETL has no tokenizer surface; this module evaluates the
engine's own trained tokenizers (operators/bpe.py, operators/
unigram.py) on their encode output.

Scale shape: the per-document frame is one equi-join of two
id-partitioned frames plus narrow column math — no explode, no
window. ``vocab_utilization`` is the only token-level pass: one
explode of ``token_ids`` into a map-side-combinable groupBy whose
output is at most ``vocab_size`` rows, so the entropy/coverage math
runs on a frame the size of the VOCABULARY, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# whitespace runs, the same convention token_count/bpe pre-tokenize use
_WS = r"\s+"


def _n_words(c):
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WS))
    )


def token_fertility(
    docs: DataFrame,
    encoded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document tokenizer metrics: join the source text with its
    encoding and derive ``(n_chars, n_words, n_tokens, fertility,
    chars_per_token)``. ``encoded`` is the ``(id, token_ids,
    n_tokens)`` frame ``bpe_encode``/``unigram_encode`` emit. Documents
    with no words (blank text) carry NULL ratios rather than a
    divide-by-zero."""
    enc = encoded.select(id_col, "n_tokens")
    base = docs.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        _n_words(F.col(text_col)).alias("n_words"),
    ).join(enc, id_col)
    nt = F.col("n_tokens").cast("double")
    return base.select(
        id_col,
        "n_chars",
        "n_words",
        "n_tokens",
        F.when(F.col("n_words") > 0, nt / F.col("n_words"))
        .alias("fertility"),
        F.when(F.col("n_tokens") > 0, F.col("n_chars") / nt)
        .alias("chars_per_token"),
    )


def fertility_summary(
    docs: DataFrame,
    encoded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Corpus-level roll-up of :func:`token_fertility` — ONE partial-
    aggregable pass, one driver row. ``corpus_fertility`` is the
    token-weighted ratio (total tokens / total words, the number that
    prices a training run); ``mean_doc_fertility`` is the unweighted
    per-document mean (sensitive to short-doc outliers — a gap between
    the two flags a length-skewed corpus)."""
    per_doc = token_fertility(docs, encoded, id_col, text_col)
    row = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
        F.avg("fertility").alias("mean_doc_fertility"),
    ).collect()[0]
    return {
        "n_docs": row.n_docs,
        "n_chars": int(row.n_chars or 0),
        "n_words": int(row.n_words or 0),
        "n_tokens": int(row.n_tokens or 0),
        "corpus_fertility": (
            row.n_tokens / row.n_words if row.n_words else None
        ),
        "corpus_chars_per_token": (
            row.n_chars / row.n_tokens if row.n_tokens else None
        ),
        "mean_doc_fertility": row.mean_doc_fertility,
    }


def vocab_utilization(
    encoded: DataFrame,
    vocab_size: int,
    top_k: int = 20,
) -> dict:
    """Vocabulary-side health of an encoding: how many of the
    ``vocab_size`` ids the corpus uses at all (``coverage``), the
    Shannon entropy of the token unigram distribution in bits
    (``unigram_entropy_bits`` — the average information per token;
    ``2**entropy`` is the effective vocabulary size), and the
    ``top_k`` most frequent ids with counts. The explode feeds a
    map-side-combined groupBy capped at ``vocab_size`` output rows;
    entropy folds over that small frame, never the corpus."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    freq = (
        encoded.select(F.explode("token_ids").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()  # ≤ vocab_size rows; ONE corpus-wide explode feeds
        # both the stats fold and the top-k below
    )
    try:
        # H = log2(n) - (Σ cnt·log2(cnt)) / n — the whole entropy
        # folds into the same single aggregate as the totals
        total_row = freq.agg(
            F.sum("cnt").alias("n"),
            F.count(F.lit(1)).alias("used"),
            F.sum(F.col("cnt") * F.log2("cnt")).alias("clog"),
        ).collect()[0]
        n = int(total_row.n or 0)
        if n == 0:
            return {
                "n_tokens": 0,
                "n_vocab_used": 0,
                "coverage": 0.0,
                "unigram_entropy_bits": None,
                "effective_vocab": None,
                "top_tokens": [],
            }
        import math

        ent = math.log2(n) - float(total_row.clog) / n
        top = [
            {"token_id": r.tok, "count": r.cnt}
            for r in freq.orderBy(F.desc("cnt"), "tok").limit(top_k).collect()
        ]
    finally:
        freq.unpersist()
    return {
        "n_tokens": n,
        "n_vocab_used": int(total_row.used),
        "coverage": total_row.used / vocab_size,
        "unigram_entropy_bits": ent,
        "effective_vocab": 2.0 ** ent,
        "top_tokens": top,
    }


def fertility_by_stratum(
    docs: DataFrame,
    encoded: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum tokenizer fairness — :func:`fertility_summary`'s
    numbers grouped by a stratum column (language, script, source):
    one row per stratum with ``(n_docs, n_words, n_tokens,
    corpus_fertility, corpus_chars_per_token, fertility_premium)``.

    ``fertility_premium`` is the stratum's token-weighted fertility
    over the corpus-wide one — the multilingual-fairness number the
    tokenizer-equity literature reports (a premium of 2 means this
    language pays twice the tokens per word, i.e. half the effective
    context window and twice the inference cost). Strata with no
    words carry NULL ratios.

    Scale shape: the per-doc join is the same one :func:`token_fertility`
    performs, the roll-up is one partial-aggregable groupBy over
    |strata| rows, and the corpus-wide denominator is a one-row
    aggregate broadcast back as a literal — two tiny jobs."""
    strat = docs.select(
        id_col, F.col(stratum_col).alias("_stratum"), text_col
    )
    per_doc = token_fertility(strat, encoded, id_col, text_col).join(
        strat.select(id_col, "_stratum"), id_col
    )
    rolled = per_doc.groupBy("_stratum").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = rolled.agg(
        F.sum("n_words").alias("w"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    corpus_fert = (tot.t / tot.w) if tot.w else None
    nw = F.col("n_words").cast("double")
    nt = F.col("n_tokens").cast("double")
    fert = F.when(F.col("n_words") > 0, nt / nw)
    premium = (
        (fert / F.lit(float(corpus_fert)))
        if corpus_fert
        else F.lit(None).cast("double")
    )
    return rolled.select(
        F.col("_stratum").alias(stratum_col),
        "n_docs",
        "n_words",
        "n_tokens",
        fert.alias("corpus_fertility"),
        F.when(F.col("n_tokens") > 0, F.col("n_chars") / nt).alias(
            "corpus_chars_per_token"
        ),
        premium.alias("fertility_premium"),
    )
