"""Benchmark decontamination: flag training documents that share
verbatim token n-grams with an evaluation/benchmark set.

Standard pretraining-hygiene step (the 8-gram/13-gram overlap rule
popularized by the GPT-3/PaLM data cards): any training document that
contains a token n-gram also present in a benchmark document is
"contaminated" and is either dropped or has the overlapping spans
excised before training. This module implements the detection side as
a first-class distributed operator; the decision (drop vs excise) is a
downstream filter on the emitted ratio.

Scale posture (the only shape that survives 100 TB):
- the TRAIN side is never collected or broadcast — it streams through
  one explode → distinct → join → groupBy pipeline;
- the BENCH side (eval suites are MBs, not TBs) reduces to a DISTINCT
  n-gram set and is broadcast, so the probe join is map-side and the
  only shuffles are the per-doc DISTINCT and the final per-doc count —
  both partial-aggregated;
- n-grams join as exact strings. At 100 TB the join key would be
  ``xxhash64(gram)`` (8-byte shuffle rows, collisions only ever ADD a
  false contamination hit — conservative in the safe direction); the
  declared query keeps the string key so the DuckDB oracle is
  value-exact. The operator takes ``hash_key=True`` for the scale
  spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions import text as TXT


# Per-row gram arrays are materialized in full before explode, so an
# unbounded transform(sequence(...)) over a huge document would build
# tokens × ~(k · token_len) bytes in one task allocation — the same
# executor-OOM vector the simhash sketch kernel sub-chunks against.
# Documents are therefore first split into segments of at most this
# many tokens (overlapping by k-1 so no window is lost), bounding the
# per-row allocation to ~SEGMENT_TOKENS · k · token_len bytes
# regardless of document size.
SEGMENT_TOKENS = 8192


def token_ngrams(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Per-document DISTINCT whitespace-token ``k``-grams, one row per
    (id, gram). Narrow until the DISTINCT: tokenize → segment (bounded
    per-row memory, k-1 token overlap preserves every window) → slice
    windows → join with single spaces."""
    toks = TXT.tokens(F.col(text_col))
    step = SEGMENT_TOKENS - (k - 1)
    segments = F.transform(
        # segment start offsets: 0, step, 2·step, ...
        F.sequence(
            F.lit(0),
            F.greatest(
                ((F.size(toks) - k) / step).cast("long") * step, F.lit(0)
            ),
            F.lit(step),
        ),
        lambda s: F.slice(toks, s + 1, SEGMENT_TOKENS),
    )
    seg = (
        docs.filter(F.size(toks) >= k)
        .select(id_col, F.explode(segments).alias("seg"))
        .filter(F.size("seg") >= k)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("seg") - k),
        lambda i: F.array_join(F.slice(F.col("seg"), i + 1, k), " "),
    )
    return seg.select(id_col, F.explode(grams).alias("gram")).distinct()


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_key: bool = False,
) -> DataFrame:
    """Emit one row per CONTAMINATED training document:
    (id, n_hit, n_grams, contamination) where ``n_hit`` counts the
    doc's distinct k-grams that appear anywhere in ``bench``,
    ``n_grams`` its total distinct k-grams, and ``contamination`` the
    ratio (one IEEE division — oracle-exact).

    ``hash_key=True`` swaps the join/shuffle key from the gram string
    to ``xxhash64(gram)`` — the 100 TB spelling (8-byte keys; a
    collision can only over-flag, never under-flag). Default keeps
    strings so results are engine-independent.
    """
    tg = token_ngrams(train, id_col, text_col, k)
    bg = token_ngrams(bench, id_col, text_col, k).select("gram").distinct()
    if hash_key:
        tg = tg.withColumn("gram", F.xxhash64("gram"))
        bg = bg.select(F.xxhash64("gram").alias("gram"))
    totals = tg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        tg.join(F.broadcast(bg), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return hits.join(totals, id_col).select(
        id_col,
        "n_hit",
        "n_grams",
        (F.col("n_hit") / F.col("n_grams")).alias("contamination"),
    )
