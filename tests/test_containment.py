"""containment_pairs (operators/dedup.py): the asymmetric quote-
detection case Jaccard misses, a pure-Python reference, and guard
inertness."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import dedup as D

QUOTE = "the quick brown fox jumps over the lazy dog again and again"
LONG = (
    "a very long article with its own substantial content " * 6
    + QUOTE
    + " and then much more original discussion follows here " * 6
)


def _reference(rows, k, threshold):
    shs = {
        did: {t[i : i + k] for i in range(len(t) - k + 1)} for did, t in rows
    }
    out = {}
    for a, sa in shs.items():
        for b, sb in shs.items():
            if a < b and sa and sb:
                cont = len(sa & sb) / min(len(sa), len(sb))
                if cont > threshold:
                    out[(a, b)] = (round(cont, 9), a if len(sa) <= len(sb) else b)
    return out


def test_catches_contained_quote_that_jaccard_misses(spark):
    rows = [(1, LONG), (2, QUOTE), (3, "completely unrelated text about pottery kilns")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.contained_doc
        for r in D.containment_pairs(df, "doc_id", "text", threshold=0.9).collect()
    }
    assert got == {(1, 2): 2}  # the quote doc is contained in the article
    # jaccard at any sane threshold does NOT pair them
    jac = D.jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert not any({r.doc_a, r.doc_b} == {1, 2} for r in jac)


def test_matches_reference_values(spark):
    rows = [
        (1, "abcabcabcxyz"),
        (2, "abcabc"),
        (3, "xyzxyzxyz"),
        (4, "qqqqqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (round(r.containment, 9), r.contained_doc)
        for r in D.containment_pairs(df, "doc_id", "text", threshold=0.3, k=3).collect()
    }
    assert got == _reference(rows, 3, 0.3)
    assert got, "reference corpus must produce containment pairs"


def test_guard_is_inert_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    guarded = {
        (r.doc_a, r.doc_b): round(r.containment, 9)
        for r in D.containment_pairs(docs, "doc_id", "text").collect()
    }
    unguarded = {
        (r.doc_a, r.doc_b): round(r.containment, 9)
        for r in D.containment_pairs(
            docs, "doc_id", "text", max_doc_freq=None
        ).collect()
    }
    assert guarded == unguarded
    assert len(guarded) > 0, "near-dup families contain each other"
