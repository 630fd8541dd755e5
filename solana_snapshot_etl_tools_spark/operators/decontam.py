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


def _gram_rows(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Non-distinct (id, gram) rows — the narrow explode shared by
    :func:`token_ngrams` and the single-pass :func:`decontaminate`
    pipeline: tokenize → segment (bounded per-row memory, k-1 token
    overlap preserves every window) → slice windows → join with single
    spaces."""
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
    # (r16: a pre-explode small-input spread was A/B'd here and
    # REJECTED — 1.28 s vs 1.18 s interleaved medians at sf0.1: the
    # two gram consumers already run as concurrent stages, and the
    # extra round-robin shuffle stages cost more than the parallelism
    # they add)
    seg = (
        docs.filter(F.size(toks) >= k)
        .select(id_col, F.explode(segments).alias("seg"))
        .filter(F.size("seg") >= k)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("seg") - k),
        lambda i: F.array_join(F.slice(F.col("seg"), i + 1, k), " "),
    )
    return seg.select(id_col, F.explode(grams).alias("gram"))


def token_ngrams(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Per-document DISTINCT whitespace-token ``k``-grams, one row per
    (id, gram)."""
    return _gram_rows(docs, id_col, text_col, k).distinct()


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

    Internals (optimization r16, guide §2.3): with ``hash_key=True``
    both sides key on ``xxhash64(gram)`` — gram STRINGS never enter a
    shuffle or the broadcast (8-byte keys; within-doc collisions could
    merge two grams and a train↔bench collision could over-flag, both
    at ~2⁻⁶⁴ per pair — the same accepted trade as
    ``dedup.dup_span_stats``' hashed windows; the planted-count and
    string-vs-hash parity pytests pin agreement on the real corpora).
    ``hash_key=False`` (default) joins on the exact gram strings — the
    engine-independent spelling the DuckDB oracle reproduces
    value-for-value with no collision caveat. r16 briefly hard-wired
    the hashed path for both flag values; r17 restores the honest API
    (the r16 verdict's gated bench could not reproduce the isolated
    hashed-key win — see OPTIMIZATION_r17.md for the interleaved A/B).
    A fully single-pass spelling (one broadcast LEFT probe → per-gram
    → per-doc aggregation) was measured SLOWER at sf0.1 than this
    two-consumer shape — the two distinct subtrees run as concurrent
    stages, so wall-clock tracks the longest chain, not the sum.
    """
    if hash_key:
        tg = (
            _gram_rows(train, id_col, text_col, k)
            .select(id_col, F.xxhash64("gram").alias("_gh"))
            .distinct()
        )
        bg = (
            _gram_rows(bench, id_col, text_col, k)
            .select(F.xxhash64("gram").alias("_gh"))
            .distinct()
        )
    else:
        tg = (
            _gram_rows(train, id_col, text_col, k)
            .select(id_col, F.col("gram").alias("_gh"))
            .distinct()
        )
        bg = (
            _gram_rows(bench, id_col, text_col, k)
            .select(F.col("gram").alias("_gh"))
            .distinct()
        )
    totals = tg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        tg.join(F.broadcast(bg), "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return hits.join(totals, id_col).select(
        id_col,
        "n_hit",
        "n_grams",
        (F.col("n_hit") / F.col("n_grams")).alias("contamination"),
    )


# --- embedding-space decontamination -------------------------------------------
#
# Verbatim n-gram overlap misses PARAPHRASED benchmark leakage
# (reworded eval questions survive an 8-gram rule untouched); the
# complementary detector matches in embedding space: a training
# document whose embedding sits within a cosine threshold of any
# benchmark item's embedding is flagged, with its best-matching bench
# item and the score, so the drop/audit decision happens downstream
# exactly like the n-gram detector above.

# ~150 MB of float64 at 768 dims — past this the broadcast path stops
# being the cheap exact plan and the LSH path is the answer
MAX_BROADCAST_BENCH = 25_000


def decontaminate_embedding(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float,
    dims: int,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_tables: int = 12,
    n_planes: int = 10,
) -> DataFrame:
    """One row per contaminated corpus document: ``(id, bench_id,
    cosine)`` where ``bench_id`` is the HIGHEST-cosine benchmark item
    at ``cosine >= threshold`` (ties broken by min bench id).

    ``method="broadcast"`` is the exact plan for benchmark suites of
    ordinary size: the bench matrix (capped loudly at
    ``MAX_BROADCAST_BENCH`` rows) ships in the closure and every
    corpus partition scans it with one numpy matmul per Arrow batch —
    no shuffle at all, corpus never moves.

    ``method="lsh"`` is the scale path when the bench side is itself
    large: both sides hash through the shared hyperplane tables
    (``similarity.lsh_signatures``), candidates come from the
    (table, bucket) equi-join, and ONLY candidates get the exact
    cosine — the standard recall/cost trade (raise ``n_tables`` for
    recall; parity with the broadcast plan on separated data is
    pinned by test)."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from solana_snapshot_etl_tools_spark.operators import similarity as SIM

    if method == "broadcast":
        return _decontaminate_embedding_broadcast(
            corpus_emb, bench_emb, threshold, dims,
            id_col, bench_id_col, vec_col,
        )
    if method != "lsh":
        raise ValueError(f"method must be 'broadcast' or 'lsh', got {method!r}")

    sig_c = SIM.lsh_signatures(
        corpus_emb, id_col, vec_col, dims, n_tables, n_planes,
        ident="_doc", with_vectors=False,
    )
    sig_b = SIM.lsh_signatures(
        bench_emb, bench_id_col, vec_col, dims, n_tables, n_planes,
        ident="_bench", with_vectors=False,
    )
    cand = (
        sig_c.join(sig_b, ["table", "bucket"])
        .select("_doc", "_bench")
        .distinct()
    )
    # vectors re-attach to the DEDUPLICATED candidate set only — the
    # bucket join itself shuffles (id, table, bucket) longs
    cv = corpus_emb.select(
        F.col(id_col).alias("_doc"),
        F.col(vec_col).cast("array<double>").alias("_vc"),
    )
    bv = bench_emb.select(
        F.col(bench_id_col).alias("_bench"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    scored = (
        cand.join(cv, "_doc")
        .join(bv, "_bench")
        .select(
            "_doc",
            "_bench",
            SIM.cosine(F.col("_vc"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return (
        scored.groupBy("_doc")
        .agg(
            F.max("cosine").alias("cosine"),
            F.min_by("_bench", F.struct(-F.col("cosine"), F.col("_bench")))
            .alias(bench_id_col),
        )
        .select(F.col("_doc").alias(id_col), bench_id_col, "cosine")
    )


def _decontaminate_embedding_broadcast(
    corpus_emb, bench_emb, threshold, dims, id_col, bench_id_col, vec_col
):
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    rows = (
        bench_emb.select(bench_id_col, vec_col)
        .limit(MAX_BROADCAST_BENCH + 1)
        .collect()
    )
    if len(rows) > MAX_BROADCAST_BENCH:
        raise ValueError(
            f"decontaminate_embedding(method='broadcast') caps the bench "
            f"side at {MAX_BROADCAST_BENCH} rows — use method='lsh' for "
            "a benchmark set this large"
        )
    # validate per-row BEFORE np.array: a null or ragged vector would
    # otherwise surface as an object-dtype IndexError/TypeError that
    # masks the actual data problem
    for r in rows:
        if r[1] is None:
            raise ValueError(
                f"decontaminate_embedding: NULL bench embedding "
                f"(bench_id={r[0]!r})"
            )
        if len(r[1]) != dims:
            raise ValueError(
                f"bench embedding length {len(r[1])} != dims {dims} "
                f"(bench_id={r[0]!r})"
            )
    bench_ids = [r[0] for r in rows]
    B = np.array([r[1] for r in rows], dtype=np.float64)
    # pre-normalize once; zero vectors get norm 1 so they score 0
    bn = np.linalg.norm(B, axis=1) if B.size else np.zeros(0)
    Bn = B / np.where(bn == 0, 1.0, bn)[:, None] if B.size else B

    id_type = corpus_emb.schema[id_col].dataType
    bench_id_type = bench_emb.schema[bench_id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField(bench_id_col, bench_id_type),
            StructField("cosine", DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf) or not len(Bn):
                continue
            if pdf["_v"].isna().any():
                bad_id = pdf["_id"][pdf["_v"].isna()].iloc[0]
                raise ValueError(
                    "decontaminate_embedding: NULL corpus embedding "
                    f"(id={bad_id!r})"
                )
            lens = pdf["_v"].map(len).to_numpy()
            if (lens != dims).any():
                bad = int(lens[lens != dims][0])
                raise ValueError(
                    f"corpus embedding length {bad} != dims {dims}"
                )
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            vn = np.linalg.norm(V, axis=1)
            Vn = V / np.where(vn == 0, 1.0, vn)[:, None]
            S = Vn @ Bn.T  # (batch, n_bench) cosine matrix
            # best bench item per doc, min-id tiebreak: argmax scans
            # in bench order, so the first max wins — bench_ids is
            # sorted below to make that the minimum id
            best = S.argmax(axis=1)
            score = S[np.arange(len(V)), best]
            keep = score >= threshold
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"].to_numpy()[keep],
                    bench_id_col: [bench_ids[i] for i in best[keep]],
                    "cosine": score[keep],
                }
            )

    # sort bench columns by id so numpy's first-argmax tiebreak IS the
    # min-id rule the LSH path's min_by applies
    if len(bench_ids):
        order = np.argsort(np.array(bench_ids), kind="stable")
        bench_ids = [bench_ids[i] for i in order]
        Bn = Bn[order]

    narrow = corpus_emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    from solana_snapshot_etl_tools_spark.operators.dedup import (
        spread_small_input,
    )

    return spread_small_input(narrow).mapInPandas(scan, out_schema)


def contamination_audit(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    hash_key: bool = False,
) -> DataFrame:
    """The eval-integrity view of :func:`decontaminate` — one row per
    BENCHMARK item instead of per training document: which eval
    items leaked into the training set, and how thoroughly. The
    GPT-3-appendix-style audit table every release's data card wants:

    - ``n_grams``: the item's distinct k-grams;
    - ``n_leaked_grams`` / ``leak_ratio``: how many of them appear
      anywhere in the training corpus;
    - ``n_train_docs_hit``: distinct training documents sharing at
      least one k-gram with the item (the blast radius);
    - ``clean``: no leaked grams at all. Items shorter than k tokens
      have no grams and report NULL ratios with ``clean=NULL`` —
      unmeasurable is not clean.

    ``hash_key`` has :func:`decontaminate`'s contract (8-byte shuffle
    keys; collisions only ever over-report — conservative for an
    audit). Scale shape: the BENCH gram set (eval suites are MBs) is
    broadcast into both probes; the train side streams through one
    explode → distinct → map-side join; the blast-radius count
    shuffles only (bench_id, train_id) id pairs."""
    bid = bench_id_col
    tg = token_ngrams(train, id_col, text_col, k)
    bg = token_ngrams(bench, bid, text_col, k)
    if hash_key:
        tg = tg.withColumn("gram", F.xxhash64("gram"))
        bg = bg.select(bid, F.xxhash64("gram").alias("gram"))
    totals = bench.select(bid).join(
        bg.groupBy(bid).agg(F.count(F.lit(1)).alias("n_grams")),
        bid,
        "left",
    )
    hit_pairs = tg.join(F.broadcast(bg), "gram").select(
        bid, F.col(id_col).alias("_train_doc"), "gram"
    )
    per_item = hit_pairs.groupBy(bid).agg(
        F.count_distinct("gram").alias("n_leaked_grams"),
        F.count_distinct("_train_doc").alias("n_train_docs_hit"),
    )
    out = totals.join(per_item, bid, "left")
    measurable = F.col("n_grams").isNotNull()
    leaked = F.coalesce(F.col("n_leaked_grams"), F.lit(0))
    return out.select(
        bid,
        "n_grams",
        F.when(measurable, leaked).alias("n_leaked_grams"),
        F.when(measurable, F.coalesce(F.col("n_train_docs_hit"), F.lit(0))).alias(
            "n_train_docs_hit"
        ),
        F.when(measurable, leaked / F.col("n_grams")).alias("leak_ratio"),
        F.when(measurable, leaked == 0).alias("clean"),
    )


def embedding_contamination_audit(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float,
    dims: int,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The per-benchmark-item view of :func:`decontaminate_embedding`
    — :func:`contamination_audit`'s embedding-space sibling: one row
    per BENCH item with its EXACT nearest corpus neighbor —
    ``(bench_id, max_cosine, nearest_doc, n_train_docs_hit,
    contaminated)``. ``max_cosine`` is reported even when below the
    threshold (an audit wants the margin, not just the verdict);
    ``n_train_docs_hit`` counts corpus docs at/above it;
    ``nearest_doc`` breaks exact-cosine ties toward the minimum doc
    id. An empty corpus yields NULL maxima with ``contaminated``
    NULL — unprobed is not clean.

    Exactness requires scoring EVERY (doc, bench) pair, so only the
    broadcast path exists (the LSH candidate generator cannot bound a
    maximum it never scored); the ``MAX_BROADCAST_BENCH`` cap
    applies. Scale shape: one Arrow pass over the corpus emitting
    |bench| partial rows per batch (batch max / batch min-id argmax /
    batch hit count), then one groupBy over those partials — the
    corpus never shuffles."""
    import numpy as np
    import pandas as pd

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    rows = (
        bench_emb.select(bench_id_col, vec_col)
        .limit(MAX_BROADCAST_BENCH + 1)
        .collect()
    )
    if len(rows) > MAX_BROADCAST_BENCH:
        raise ValueError(
            f"embedding_contamination_audit caps the bench side at "
            f"{MAX_BROADCAST_BENCH} rows (the exact audit must score "
            "every pair)"
        )
    for r in rows:
        if r[1] is None:
            raise ValueError(
                f"embedding_contamination_audit: NULL bench embedding "
                f"(bench_id={r[0]!r})"
            )
        if len(r[1]) != dims:
            raise ValueError(
                f"bench embedding length {len(r[1])} != dims {dims} "
                f"(bench_id={r[0]!r})"
            )
    bench_ids = [r[0] for r in rows]
    B = np.array([r[1] for r in rows], dtype=np.float64)
    bn = np.linalg.norm(B, axis=1) if B.size else np.zeros(0)
    Bn = B / np.where(bn == 0, 1.0, bn)[:, None] if B.size else B

    spark = corpus_emb.sparkSession
    eps = float(threshold)
    partial_schema = (
        "bench_pos int, max_cos double, arg_doc long, hits long"
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf) or not len(Bn):
                continue
            if pdf["_v"].isna().any():
                bad_id = pdf["_id"][pdf["_v"].isna()].iloc[0]
                raise ValueError(
                    "embedding_contamination_audit: NULL corpus "
                    f"embedding (id={bad_id!r})"
                )
            lens = pdf["_v"].map(len).to_numpy()
            if (lens != dims).any():
                bad = int(lens[lens != dims][0])
                raise ValueError(
                    f"corpus embedding length {bad} != dims {dims}"
                )
            # id-sort the batch so numpy's first-argmax over rows IS
            # the min-id tiebreak within the batch; the final max_by
            # keeps it globally
            pdf = pdf.sort_values("_id")
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            vn = np.linalg.norm(V, axis=1)
            Vn = V / np.where(vn == 0, 1.0, vn)[:, None]
            ids = pdf["_id"].to_numpy()
            S = Vn @ Bn.T  # (batch, n_bench)
            best_row = S.argmax(axis=0)
            yield pd.DataFrame(
                {
                    "bench_pos": np.arange(len(Bn), dtype=np.int32),
                    "max_cos": S[best_row, np.arange(len(Bn))],
                    "arg_doc": ids[best_row].astype(np.int64),
                    "hits": (S >= eps).sum(axis=0).astype(np.int64),
                }
            )

    narrow = corpus_emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    from solana_snapshot_etl_tools_spark.operators.dedup import (
        spread_small_input,
    )

    partials = spread_small_input(narrow).mapInPandas(scan, partial_schema)
    agg = partials.groupBy("bench_pos").agg(
        F.max("max_cos").alias("max_cosine"),
        F.max_by(
            "arg_doc", F.struct(F.col("max_cos"), (-F.col("arg_doc")))
        ).alias("nearest_doc"),
        F.sum("hits").alias("n_train_docs_hit"),
    )
    btab = spark.createDataFrame(
        [(int(i), bench_ids[i]) for i in range(len(bench_ids))],
        f"bench_pos int, {bench_id_col} {bench_emb.schema[bench_id_col].dataType.simpleString()}",
    )
    out = btab.join(F.broadcast(agg), "bench_pos", "left")
    return out.select(
        bench_id_col,
        "max_cosine",
        "nearest_doc",
        "n_train_docs_hit",
        F.when(
            F.col("max_cosine").isNotNull(), F.col("max_cosine") >= eps
        ).alias("contaminated"),
    )
