"""Term-blocklist safety scoring (operators/safety.py): planted-count
exactness, token-not-substring semantics, phrase matching, edge rows,
and the filter contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import safety as S

TERMS = ["badword", "Rude-Phrase Here", "ugly"]


def _docs(spark):
    rows = [
        (1, "a clean document with plain text"),                  # 0 hits / 6
        (2, "BadWord appears twice: badword!"),                   # 2 / 4
        (3, "the rude phrase here and one ugly word"),            # 2 / 8
        (4, "classy scunthorpe subclass"),                        # 0: no substring hits
        (5, ""),                                                  # empty
        (6, None),                                                # null
        (7, "rude phrase"),                                       # partial phrase: 0 / 2
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_exact_counts(spark):
    got = {
        r.doc_id: (r.n_tokens, r.n_hits, r.hit_ratio)
        for r in S.term_blocklist_stats(_docs(spark), TERMS).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}  # every row, hits or not
    assert got[1] == (6, 0, 0.0)
    assert got[2] == (4, 2, pytest.approx(0.5))
    # "rude phrase here" is ONE phrase hit + "ugly" one word hit
    assert got[3] == (8, 2, pytest.approx(0.25))
    assert got[4] == (3, 0, 0.0)  # tokens, never substrings
    assert got[5] == (0, 0, 0.0) and got[6] == (0, 0, 0.0)
    assert got[7] == (2, 0, 0.0)


def test_filter_thresholds(spark):
    docs = _docs(spark)
    strict = {r.doc_id for r in S.term_blocklist_filter(docs, TERMS).collect()}
    assert strict == {1, 4, 5, 6, 7}  # any hit drops; empty/null keep
    lax = {
        r.doc_id
        for r in S.term_blocklist_filter(docs, TERMS, max_ratio=0.3).collect()
    }
    assert lax == {1, 3, 4, 5, 6, 7}  # doc 2 at 0.5 still out
    out = S.term_blocklist_filter(docs, TERMS)
    assert out.columns == ["doc_id", "text"]  # row passthrough, all cols
    with pytest.raises(ValueError, match="max_ratio"):
        S.term_blocklist_filter(docs, TERMS, max_ratio=-1)


def test_term_normalization_and_caps(spark):
    docs = _docs(spark)
    # case/punctuation variants of one term dedupe to one entry and
    # match the same token stream; None terms skipped
    variants = ["BADWORD", "badword", "badword!!!", None, "  "]
    got = {
        r.doc_id: r.n_hits
        for r in S.term_blocklist_stats(docs, variants).collect()
    }
    assert got[2] == 2
    with pytest.raises(ValueError, match="blocklist exceeds"):
        S.term_blocklist_stats(docs, (f"w{i}" for i in range(S.MAX_TERMS + 1)))
    # empty blocklist: all zero hits, every row present
    z = {r.doc_id: r.n_hits for r in S.term_blocklist_stats(docs, []).collect()}
    assert set(z) == {1, 2, 3, 4, 5, 6, 7} and set(z.values()) == {0}


def test_partition_invariance_and_real_corpus(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # pick two real corpus words as a fake blocklist: determinism and
    # ratio sanity on real data
    words = ["scan", "join"]
    a = {
        (r.doc_id, r.n_hits)
        for r in S.term_blocklist_stats(docs.repartition(1), words).collect()
    }
    b = {
        (r.doc_id, r.n_hits)
        for r in S.term_blocklist_stats(docs.repartition(13), words).collect()
    }
    assert a == b
    assert len(a) == docs.count()
    assert any(h > 0 for _, h in a)
    # independent recount on one hit doc
    some_id, some_hits = next((i, h) for i, h in sorted(a) if h > 0)
    text = docs.filter(F.col("doc_id") == some_id).collect()[0].text.lower()
    import re

    toks = [t for t in re.split(r"[^\w]+", text) if t]
    assert some_hits == sum(1 for t in toks if t in words)


def test_column_variant_equals_join_variant(spark):
    """The zero-exchange column spelling and the broadcast-join
    operator are two plans for ONE semantics — exact agreement on the
    planted corpus and on real data."""
    docs = _docs(spark)
    stats = {
        r.doc_id: (r.n_hits, r.hit_ratio)
        for r in S.term_blocklist_stats(docs, TERMS).collect()
    }
    cols = {
        r.doc_id: (r.h, r.ratio)
        for r in docs.select(
            "doc_id",
            S.blocklist_hits_column(F.col("text"), TERMS).alias("h"),
            S.blocklist_ratio_column(F.col("text"), TERMS).alias("ratio"),
        ).collect()
    }
    assert cols == stats

    real = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    words = ["scan", "join", "sort window"]
    a = {
        r.doc_id: r.n_hits
        for r in S.term_blocklist_stats(real, words).collect()
    }
    b = {
        r.doc_id: r.h
        for r in real.select(
            "doc_id", S.blocklist_hits_column(F.col("text"), words).alias("h")
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="caps at"):
        S.blocklist_hits_column(
            F.col("text"), [f"w{i}" for i in range(S.MAX_COLUMN_TERMS + 1)]
        )


def test_dataframe_blocklist_equals_list_blocklist(spark):
    """A blocklist passed as a single-column DataFrame (the
    too-big-to-collect path) produces the identical stats as the
    in-memory list, including phrase terms and the normalization."""
    docs = _docs(spark)
    want = {
        r.doc_id: (r.n_tokens, r.n_hits, r.hit_ratio)
        for r in S.term_blocklist_stats(docs, TERMS).collect()
    }
    bl = spark.createDataFrame(
        [(t,) for t in TERMS + ["BADWORD", None, "  "]], "term string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_hits, r.hit_ratio)
        for r in S.term_blocklist_stats(docs, bl).collect()
    }
    assert got == want
    # and through the filter
    kept = {r.doc_id for r in S.term_blocklist_filter(docs, bl).collect()}
    assert kept == {
        r.doc_id for r in S.term_blocklist_filter(docs, TERMS).collect()
    }
