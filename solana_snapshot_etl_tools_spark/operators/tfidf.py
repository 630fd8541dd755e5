"""TF-IDF salient terms per document — the classic keyword /
topic-signal extractor over the corpus, completing the text-analysis
family (lang-id, quality, rarity, tf/df vocab stats in
``plans/llm_ops.py:token_doc_freq`` — this operator turns those raw
counts into ranked per-doc term salience).

Scale shape: tf is one (doc, term) groupBy; df one (term) groupBy of
the tf frame (both partial-aggregated); the tf-df join is a plain
equi-join on term (AQE handles vocab skew — stopword terms are the
hot keys, and they carry the LOWEST idf, so ``min_df``/``max_df_frac``
pruning also removes the skew before the join). Top-k per doc is a
bounded per-group fold — ``collect_list`` + ``array_sort`` + ``slice``
inside one aggregate, never a corpus-wide rank window (each group
holds only that doc's distinct FILTERED terms).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions.text import tokens


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the sklearn spelling). Terms
    with ``df < min_df`` or ``df > max_df_frac * N`` are dropped
    (stopword/noise pruning — also the join's skew relief). Ties
    break by term ascending; output rows are
    (id, term, tf, df, tfidf, rank) with rank 1-based and ≤ k rows
    per document."""
    n_docs = docs.count()
    tf = (
        docs.select(
            F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    df_ = df_.filter(
        (F.col("df") >= min_df) & (F.col("df") <= int(max_df_frac * n_docs))
    )
    scored = tf.join(df_, "term").withColumn(
        "tfidf",
        F.col("tf")
        * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)),
    )
    top = (
        scored.groupBy("_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("tfidf")).alias("neg"), "term", "tf", "df"))
                ),
                1,
                k,
            ).alias("tt")
        )
        .select("_id", F.posexplode("tt").alias("pos", "t"))
    )
    return top.select(
        F.col("_id").alias(id_col),
        F.col("t.term").alias("term"),
        F.col("t.tf").alias("tf"),
        F.col("t.df").alias("df"),
        (-F.col("t.neg")).alias("tfidf"),
        (F.col("pos") + 1).alias("rank"),
    )


def tfidf_reference(rows, k=10, min_df=1, max_df_frac=1.0):
    """Pure-Python restatement for tests: same tokenization, same
    smoothing, same tiebreak."""
    n = len(rows)
    tf: dict[tuple, int] = {}
    df: dict[str, set] = {}
    for did, text in rows:
        for t in text.strip().lower().split():
            if t:
                tf[(did, t)] = tf.get((did, t), 0) + 1
                df.setdefault(t, set()).add(did)
    out = {}
    for did, _ in rows:
        terms = [
            (t, c, len(df[t]), c * (math.log((n + 1) / (len(df[t]) + 1)) + 1))
            for (d, t), c in tf.items()
            if d == did and min_df <= len(df[t]) <= max_df_frac * n
        ]
        terms.sort(key=lambda x: (-x[3], x[0]))
        out[did] = [
            (t, c, d_, s, i + 1) for i, (t, c, d_, s) in enumerate(terms[:k])
        ]
    return out
