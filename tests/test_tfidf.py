"""tfidf_top_terms vs the pure-Python reference, pruning semantics,
and plan shape."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators.tfidf import (
    tfidf_reference,
    tfidf_top_terms,
)

ROWS = [
    (1, "apple banana apple cherry kiwi"),
    (2, "banana cherry cherry durian durian durian"),
    (3, "apple kiwi kiwi kiwi unique"),
    (4, "banana banana apple cherry"),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return {
        did: sorted(
            ((r.term, r.tf, r.df, round(r.tfidf, 9), r.rank) for r in rs),
            key=lambda x: x[4],
        )
        for did, rs in (
            (d, [r for r in df.collect() if r.doc_id == d]) for d in {1, 2, 3, 4}
        )
    }


def test_matches_reference(spark):
    got = _collect(tfidf_top_terms(_df(spark), k=3))
    want = tfidf_reference(ROWS, k=3)
    for did in want:
        g = [(t, tf, d, rk) for t, tf, d, _, rk in got.get(did, [])]
        w = [(t, tf, d, rk) for t, tf, d, _, rk in want[did]]
        assert g == w, (did, g, w)
        for (_, _, _, gs, _), (_, _, _, ws, _) in zip(got[did], want[did]):
            assert abs(gs - ws) < 1e-9


def test_rare_terms_outrank_common_ones(spark):
    out = tfidf_top_terms(_df(spark), k=1)
    top = {r.doc_id: r.term for r in out.collect()}
    # "unique" appears once in one doc; despite tf=1 it wins doc 3
    # over kiwi(tf=3, df=2)? — check against the reference instead of
    # intuition, but the df=1 term must at least be present in top-3
    top3 = {r.term for r in tfidf_top_terms(_df(spark), k=3).filter("doc_id=3").collect()}
    assert "unique" in top3
    # durian dominates doc 2 (tf=3, df=1)
    assert top[2] == "durian"


def test_df_pruning_and_k_bound(spark):
    # min_df=2 drops durian/unique entirely
    out = tfidf_top_terms(_df(spark), k=5, min_df=2)
    terms = {r.term for r in out.collect()}
    assert "durian" not in terms and "unique" not in terms
    # max_df_frac prunes corpus-wide terms: banana/apple/cherry have
    # df=3 of 4 docs → gone at 0.5
    out2 = tfidf_top_terms(_df(spark), k=5, max_df_frac=0.5)
    assert {r.term for r in out2.collect()} & {"banana", "cherry"} == set()
    # never more than k rows per doc, ranks contiguous from 1
    for did, rs in _collect(tfidf_top_terms(_df(spark), k=2)).items():
        assert len(rs) <= 2
        assert [r[4] for r in rs] == list(range(1, len(rs) + 1))


def test_real_corpus_and_plan_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tfidf_top_terms(docs, k=5, min_df=2, max_df_frac=0.8)
    assert out.groupBy("doc_id").count().agg(F.max("count")).first()[0] <= 5
    assert out.count() > 100
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    # bounded per-group fold, not a corpus-wide rank window; no cartesian
    assert "Window" not in p
    assert "CartesianProduct" not in p
