"""Tokenizer fertility + vocab utilization (operators/tokenizer_stats):
hand-computed exactness on synthetic encodings, degenerate inputs, and
an end-to-end pass over a real trained BPE on the sf0.001 corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import tokenizer_stats as TS

SF_DIR = "/root/testdata/sf0.001"


def _frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello brave new world"),     # 4 words, 21 chars
            (2, "  spaced   out  "),          # 2 words, 16 chars
            (3, ""),                          # 0 words
            (4, "one"),                       # 1 word
        ],
        "doc_id long, text string",
    )
    enc = spark.createDataFrame(
        [
            (1, [5, 6, 7, 8, 9, 10], 6),
            (2, [5, 5, 5], 3),
            (3, [], 0),
            (4, [1, 2], 2),
        ],
        "doc_id long, token_ids array<int>, n_tokens long",
    )
    return docs, enc


def test_token_fertility_exact(spark):
    docs, enc = _frames(spark)
    rows = {r.doc_id: r for r in TS.token_fertility(docs, enc).collect()}
    assert rows[1].n_words == 4 and rows[1].n_tokens == 6
    assert rows[1].fertility == pytest.approx(6 / 4)
    assert rows[1].chars_per_token == pytest.approx(21 / 6)
    assert rows[2].n_words == 2  # leading/trailing runs trimmed
    assert rows[2].fertility == pytest.approx(3 / 2)
    # blank doc: 0 words, NULL ratios — not a divide-by-zero
    assert rows[3].n_words == 0 and rows[3].fertility is None
    assert rows[3].chars_per_token is None
    assert rows[4].fertility == pytest.approx(2.0)


def test_fertility_summary_weighted_vs_mean(spark):
    docs, enc = _frames(spark)
    s = TS.fertility_summary(docs, enc)
    assert s["n_docs"] == 4
    assert s["n_words"] == 7 and s["n_tokens"] == 11
    # token-weighted: all tokens over all words
    assert s["corpus_fertility"] == pytest.approx(11 / 7)
    # unweighted doc mean skips the NULL (blank) doc
    assert s["mean_doc_fertility"] == pytest.approx(
        (6 / 4 + 3 / 2 + 2 / 1) / 3
    )
    assert s["corpus_chars_per_token"] == pytest.approx(
        s["n_chars"] / 11
    )


def test_vocab_utilization_exact(spark):
    enc = spark.createDataFrame(
        [(1, [0, 0, 1, 2], 4)],
        "doc_id long, token_ids array<int>, n_tokens long",
    )
    u = TS.vocab_utilization(enc, vocab_size=8, top_k=2)
    assert u["n_tokens"] == 4 and u["n_vocab_used"] == 3
    assert u["coverage"] == pytest.approx(3 / 8)
    # p = (1/2, 1/4, 1/4) -> H = 1.5 bits, effective vocab 2^1.5
    assert u["unigram_entropy_bits"] == pytest.approx(1.5)
    assert u["effective_vocab"] == pytest.approx(2 ** 1.5)
    assert [t["token_id"] for t in u["top_tokens"]] == [0, 1]
    assert u["top_tokens"][0]["count"] == 2


def test_vocab_utilization_degenerate(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, token_ids array<int>, n_tokens long"
    )
    u = TS.vocab_utilization(empty, vocab_size=4)
    assert u["n_tokens"] == 0 and u["coverage"] == 0.0
    assert u["unigram_entropy_bits"] is None
    with pytest.raises(ValueError, match="vocab_size"):
        TS.vocab_utilization(empty, vocab_size=0)
    # single-token corpus: zero entropy, effective vocab 1
    one = spark.createDataFrame(
        [(1, [3, 3, 3], 3)],
        "doc_id long, token_ids array<int>, n_tokens long",
    )
    u1 = TS.vocab_utilization(one, vocab_size=4)
    assert u1["unigram_entropy_bits"] == pytest.approx(0.0)
    assert u1["effective_vocab"] == pytest.approx(1.0)


def test_real_bpe_end_to_end(spark):
    from solana_snapshot_etl_tools_spark.operators import bpe as B

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
        .limit(120)
    )
    model = B.bpe_train(docs, n_merges=64)
    enc = B.bpe_encode(docs, model)
    s = TS.fertility_summary(docs, enc)
    assert s["n_docs"] == docs.count()
    # BPE never splits below bytes nor merges across words, so the
    # corpus fertility is >= 1 token per word and compression is
    # positive but bounded by the longest merged piece
    assert s["corpus_fertility"] >= 1.0
    assert 0 < s["corpus_chars_per_token"] < 20
    vocab = len(B.bpe_vocab(model))
    u = TS.vocab_utilization(enc, vocab_size=vocab)
    assert 0 < u["n_vocab_used"] <= vocab
    assert 0 < u["coverage"] <= 1.0
    # entropy is bounded by log2(distinct ids actually used)
    assert 0 < u["unigram_entropy_bits"] <= math.log2(u["n_vocab_used"])
    # the summary's token total and the utilization pass's token total
    # are two independent routes to the same number
    assert u["n_tokens"] == s["n_tokens"]


def test_fertility_by_stratum_premium(spark):
    """Per-language fertility fairness: hand-computed premiums; a
    stratum with no words carries NULL ratios; the stratum frame
    agrees with one fertility_summary per slice."""
    docs = spark.createDataFrame(
        [
            (1, "en", "four plain english words"),        # 4 words
            (2, "en", "two words"),                       # 2
            (3, "de", "drei deutsche worte"),             # 3
            (4, "zz", ""),                                # 0 words
        ],
        "doc_id long, lang string, text string",
    )
    enc = spark.createDataFrame(
        [(1, 8), (2, 4), (3, 9), (4, 0)],
        "doc_id long, n_tokens long",
    )
    out = {
        r.lang: r
        for r in TS.fertility_by_stratum(docs, enc, "lang").collect()
    }
    # corpus fertility = (8+4+9+0) / (4+2+3+0) = 21/9
    assert out["en"].corpus_fertility == pytest.approx(12 / 6)
    assert out["de"].corpus_fertility == pytest.approx(9 / 3)
    assert out["en"].fertility_premium == pytest.approx((12 / 6) / (21 / 9))
    assert out["de"].fertility_premium == pytest.approx((9 / 3) / (21 / 9))
    assert out["zz"].corpus_fertility is None
    assert out["zz"].fertility_premium is None
    assert out["en"].n_docs == 2 and out["en"].n_tokens == 12

    # slice-equivalence: each stratum row equals fertility_summary on
    # that slice alone
    for lang in ("en", "de"):
        s = TS.fertility_summary(
            docs.filter(F.col("lang") == lang), enc
        )
        assert s["corpus_fertility"] == pytest.approx(
            out[lang].corpus_fertility
        )
        assert s["n_tokens"] == out[lang].n_tokens
