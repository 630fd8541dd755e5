"""Mergeable corpus profiles — DataSketches HLL partials that make
100 TB statistics INCREMENTAL.

``report.corpus_report`` answers "what does this corpus look like"
with one full scan; at web scale the question is asked after every
shard arrival, and rescanning petabytes for a dashboard number is the
anti-pattern. The sketch posture (the one every warehouse profiler
uses): each shard/batch/source computes a tiny PROFILE ROW — counts,
sums, min/max, and HLL sketches for the distinct-counts — and those
rows MERGE exactly (sums add, sketches union) without ever touching
the corpus again. Spark ships the DataSketches HLL agg family
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
Spark 3.5+) whose sketches are little-endian-stable binaries — safe
to persist in parquet beside the corpus and union years later.

What is (and is not) in the profile: everything in it is exactly
mergeable — counts, sums, extrema, HLL distincts. Quantiles are NOT
(``percentile_approx`` partials are not exposed), so length
percentiles stay in ``corpus_report``'s one-shot scan; the profile
carries the mean via (sum, count) instead.

Scale shape: one map-side-combinable aggregation per profile call
(the token-distinct sketch folds each document's tokens inside ONE
projection — no explode, no shuffle of token rows); a profile row is
a few KB regardless of input size; merging N profile rows is an
aggregation over N tiny rows. The streaming ingest loop can persist
one profile row per micro-batch (batch-partitioned, replay-idempotent
dynamic overwrite — the bloom sidecar's layout) and the corpus-level
numbers come from ``merge_profiles`` over that store: zero corpus
rescans.

Reference scope note: the reference ETL has no analog; this is part
of the training-data surface the Spark engine adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# lgConfigK=12 -> ~1.6% relative standard error, 4 KB sketches; the
# DataSketches default tradeoff most profilers ship
DEFAULT_LG_K = 12

_SKETCHES = ("texts_hll", "tokens_hll")
_SUMS = ("n_docs", "n_null_text", "n_empty_text", "n_tokens", "n_chars")

# log-spaced length-histogram base: bucket = floor(ln(len)/ln(1.1)),
# ~145 buckets across 1..10^6 chars, ±5% relative quantile error —
# and EXACTLY mergeable (bucket counts add), which percentile_approx
# partials are not. This is how the profile carries p50/p90/p99
# without the one-shot corpus_report scan.
_LEN_HIST_BASE = 1.1


def _token_hashes(c: Column) -> Column:
    """One xxhash64 per whitespace token, computed INSIDE a single
    array expression — the distinct-token sketch then aggregates
    array elements without an explode ever shuffling token rows."""
    toks = F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)
    return F.transform(toks, lambda t: F.xxhash64(t))


def corpus_profile(
    docs: DataFrame,
    by: str | list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One mergeable profile row per ``by`` group (or one global row
    with ``by=None``): ``n_docs / n_null_text / n_empty_text /
    n_tokens / n_chars / max_chars`` plus HLL sketch binaries
    ``texts_hll`` (distinct text content, via xxhash64) and
    ``tokens_hll`` (distinct whitespace tokens). Persist rows as
    parquet; combine with :func:`merge_profiles`; read numbers with
    :func:`profile_estimates`.

    All profiles that will ever be merged must share ``lg_k`` (the
    sketch union requires one register width; the column
    ``hll_lg_k`` records it and :func:`merge_profiles` enforces it).
    """
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    c = F.col(text_col)
    keys = [by] if isinstance(by, str) else list(by or [])
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(c.isNull(), 1)).alias("n_null_text"),
        F.count(F.when(F.length(c) == 0, 1)).alias("n_empty_text"),
        # same token rule as the sketch below (empty/whitespace-only
        # texts contribute 0 — unlike the data card's token_count,
        # whose split() artifact counts 1 for empty text)
        F.sum(
            F.coalesce(F.size(_token_hashes(c)), F.lit(0))
        ).alias("n_tokens"),
        F.sum(F.coalesce(F.length(c), F.lit(0)).cast("long")).alias("n_chars"),
        F.max(F.length(c)).alias("max_chars"),
        # xxhash64(NULL) hashes the seed, not NULL — gate first so a
        # null text never lands in the distinct-content sketch
        F.hll_sketch_agg(
            F.when(c.isNotNull(), F.xxhash64(c)), F.lit(lg_k)
        ).alias("texts_hll"),
    ]
    base = docs.groupBy(*keys).agg(*aggs) if keys else docs.agg(*aggs)
    # the token-distinct sketch needs one ROW per token for the agg
    # input, so the tokens ARE exploded — but generate + partial
    # hash-agg plan into the same stage, so only per-partition
    # sketches (not token rows) ever cross the shuffle
    exploded = docs.select(
        *keys, F.explode_outer(_token_hashes(c)).alias("_tok_h")
    )
    tok_agg = F.hll_sketch_agg("_tok_h", F.lit(lg_k)).alias("tokens_hll")
    tok_prof = (
        exploded.groupBy(*keys).agg(tok_agg) if keys else exploded.agg(tok_agg)
    )
    prof = base.join(tok_prof, keys) if keys else base.crossJoin(tok_prof)
    # mergeable length histogram (see _LEN_HIST_BASE): one extra
    # narrow agg on (keys, bucket) — ≤ ~150 buckets per group, so the
    # collect_list building the map is bounded by construction
    import math as _math

    lb = (
        F.when(F.length(c) == 0, F.lit(-1))
        .otherwise(
            F.floor(
                F.log(F.length(c).cast("double"))
                / _math.log(_LEN_HIST_BASE)
            )
        )
        .cast("int")
    )
    hist = (
        docs.select(*keys, F.when(c.isNotNull(), lb).alias("_lb"))
        .filter(F.col("_lb").isNotNull())
        .groupBy(*keys, "_lb")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_lb", "_n"))
            ).alias("len_hist")
        )
    )
    prof = (
        prof.join(hist, keys, "left") if keys else prof.crossJoin(hist)
    )
    return prof.withColumn("hll_lg_k", F.lit(lg_k))


def merge_profiles(
    profiles: DataFrame,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Re-aggregate profile rows (e.g. per-batch partials, or
    per-source rows rolled up to the corpus): sums add, extrema max,
    sketches union. ``by=None`` merges everything into one row;
    passing the original group columns keeps per-group rows (useful
    to merge per-(source, batch) partials down to per-source).
    Profiles with differing ``hll_lg_k`` raise — their sketches are
    not unionable at full precision."""
    keys = [by] if isinstance(by, str) else list(by or [])
    # Validate lg_k uniformity FIRST, on a cheap aggregate over the
    # one narrow column (column-pruned scan, no sketch bytes move):
    # hll_union_agg itself throws an opaque JVM error on differing
    # lgConfigK before any post-hoc check could fire, and checking on
    # the merged frame would materialize the union twice.
    chk_aggs = [
        F.min("hll_lg_k").alias("_lgk_min"),
        F.max("hll_lg_k").alias("_lgk_max"),
    ]
    chk = (
        profiles.groupBy(*keys).agg(*chk_aggs)
        if keys
        else profiles.agg(*chk_aggs)
    )
    bad = chk.filter(F.col("_lgk_min") != F.col("_lgk_max")).limit(1).collect()
    if bad:
        raise ValueError(
            "merge_profiles: mixed hll_lg_k values "
            f"({bad[0]['_lgk_min']} vs {bad[0]['_lgk_max']}) — profiles "
            "must share one sketch precision to union losslessly"
        )
    aggs = (
        [F.sum(k).alias(k) for k in _SUMS]
        + [
            F.max("max_chars").alias("max_chars"),
            F.hll_union_agg("texts_hll").alias("texts_hll"),
            F.hll_union_agg("tokens_hll").alias("tokens_hll"),
            F.min("hll_lg_k").alias("hll_lg_k"),
        ]
    )
    if "len_hist" in profiles.columns:
        # bucket counts ADD — fold the collected maps with a zip-sum.
        # collect_list skips NULL maps, so partials recorded before
        # the histogram existed (older stores) merely narrow the
        # quantile coverage instead of poisoning the merge.
        empty = F.expr("map()").cast("map<int,bigint>")
        aggs.append(
            F.aggregate(
                F.collect_list("len_hist"),
                empty,
                lambda acc, m: F.map_zip_with(
                    acc,
                    m,
                    lambda _, a, b: F.coalesce(a, F.lit(0))
                    + F.coalesce(b, F.lit(0)),
                ),
            ).alias("len_hist")
        )
    return profiles.groupBy(*keys).agg(*aggs) if keys else profiles.agg(*aggs)


def _hist_quantile(m: Column, q: float) -> Column:
    """Quantile estimate from a mergeable log-histogram map: walk the
    key-sorted buckets to the first whose cumulative count reaches
    ``q`` of the total, return the bucket's geometric midpoint
    (±~5% relative at base 1.1). Pure Catalyst fold — no Python."""
    import math as _math

    entries = F.array_sort(F.map_entries(m))
    total = F.aggregate(
        entries, F.lit(0).cast("bigint"), lambda a, e: a + e["value"]
    )
    target = total.cast("double") * q
    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(None).cast("int").alias("b"),
    )
    folded = F.aggregate(
        entries,
        acc0,
        lambda a, e: F.struct(
            (a["cum"] + e["value"]).alias("cum"),
            F.coalesce(
                a["b"],
                F.when(
                    (a["cum"] + e["value"]).cast("double") >= target,
                    e["key"].cast("int"),
                ),
            ).alias("b"),
        ),
    )
    b = folded["b"]
    return F.when(total > 0, F.when(b == -1, F.lit(0.0)).otherwise(
        F.pow(F.lit(_LEN_HIST_BASE), b.cast("double") + 0.5)
    ))


def profile_estimates(profiles: DataFrame) -> DataFrame:
    """The human-readable view: sketch binaries become estimates
    (``distinct_texts`` / ``distinct_tokens``) plus the derived
    numbers every data card quotes — ``exact_dup_rate`` (1 -
    distinct/n over non-null docs, the fraction exact dedup would
    remove, up to sketch error), ``tokens_per_doc``, and — when the
    profile carries the mergeable length histogram — ``len_p50 /
    len_p90 / len_p99`` (±~5% relative; the quantiles the module
    previously had to defer to ``corpus_report``'s one-shot scan)."""
    n_eff = F.col("n_docs") - F.col("n_null_text")
    quantiles = (
        [
            _hist_quantile(F.col("len_hist"), q).alias(f"len_p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
        if "len_hist" in profiles.columns
        else []
    )
    return profiles.select(
        *[
            c
            for c in profiles.columns
            if c not in _SKETCHES and c not in ("hll_lg_k", "len_hist")
        ],
        F.hll_sketch_estimate("texts_hll").alias("distinct_texts"),
        F.hll_sketch_estimate("tokens_hll").alias("distinct_tokens"),
        F.when(
            n_eff > 0,
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.hll_sketch_estimate("texts_hll") / n_eff.cast("double"),
            ),
        ).alias("exact_dup_rate"),
        F.when(
            F.col("n_docs") > 0,
            F.col("n_tokens") / F.col("n_docs").cast("double"),
        ).alias("tokens_per_doc"),
        *quantiles,
    )


def compact_profile_store(spark, store_dir: str) -> dict:
    """Compact a per-batch profile store in place. The streaming
    ingest loop appends one tiny partial (a few KB) under ``batch=N``
    per micro-batch; after thousands of batches every
    ``merge_profiles`` read pays file-listing + parquet-footer
    overhead per partial. Rewrites to ~one file per batch directory
    using :func:`incremental.compact_parquet_dir` — the same
    count-verified temp-dir write and atomic swap the dedup index
    uses, so a short write can never destroy profile rows, and the
    ``batch=`` layout survives (the incremental profiler's
    already-profiled check and the stream's dynamic-overwrite appends
    both key on it). Merged estimates are unchanged by construction
    (same rows, fewer files); pinned by pytest."""
    from solana_snapshot_etl_tools_spark.operators.incremental import (
        compact_parquet_dir,
    )

    import glob

    if not glob.glob(f"{store_dir}/batch=*"):
        raise ValueError(
            f"compact_profile_store: {store_dir} is not a per-batch "
            "store (no batch= partitions) — a batch-mode --profile "
            "store is one overwrite-written file and needs no "
            "compaction"
        )
    n, before, after = compact_parquet_dir(spark, store_dir, ["batch"])
    return {
        "profile_rows": n,
        "profile_files_before": before,
        "profile_files_after": after,
    }


def stale_profile_batches(
    store: DataFrame, corpus: DataFrame, batch_col: str = "batch"
) -> list:
    """Coverage guard for the incremental profile store (the
    profile-store twin of the dedup index's bloom batch-coverage
    check): batch keys present in the STORE but absent from the
    CORPUS. A non-empty result means the store carries partials for
    data the corpus no longer contains — a purged/renumbered arrivals
    directory, or a store inherited from a different corpus lineage —
    and merging the whole store would silently overcount. Consumers
    must exclude these rows from the merge (and surface the anomaly)
    rather than trust the store blindly; the complement direction
    (corpus batches missing from the store) is what the incremental
    profiler fills in, so it needs no guard. Both sides are
    distinct-listings of one small column (the corpus side prunes to
    partition directories under a ``batch=``-partitioned store)."""
    if batch_col not in store.columns:
        raise ValueError(
            f"stale_profile_batches: store has no '{batch_col}' column "
            "— only per-batch (stream-written) stores carry coverage"
        )
    have = {r[batch_col] for r in store.select(batch_col).distinct().collect()}
    want = {
        r[batch_col] for r in corpus.select(batch_col).distinct().collect()
    }
    return sorted(have - want)


def profile_overlap(
    profiles: DataFrame,
    key_col: str = "source",
) -> DataFrame:
    """Pairwise DISTINCT-TEXT overlap between profile rows, estimated
    purely from their persisted sketches — "which sources duplicate
    each other" without ever rescanning a corpus: for each key pair,
    ``overlap ≈ |A| + |B| - |A ∪ B|`` (inclusion-exclusion over HLL
    estimates; the union sketch is exact register math) and
    ``jaccard = overlap / union``.

    Columns: ``(a, b, distinct_a, distinct_b, distinct_union,
    overlap_est, jaccard_est, noise_floor)``. Inclusion-exclusion
    SUMS the sketch errors, so ``noise_floor`` (the ~1.04/√2^lg_k
    relative standard error times the three estimates' sum) is
    emitted beside every row: an ``overlap_est`` below it is
    indistinguishable from zero — small overlaps between huge sources
    need exact keys, not sketches. Callers compare, not truncate:
    the signed estimate is kept so systematic biases stay visible.

    Scale shape: a self-join of the PROFILE rows (len(profiles)²
    pairs of kilobyte sketches — dashboard-sized, never corpus-sized);
    every estimate is JVM sketch math."""
    import math

    a = profiles.select(
        F.col(key_col).alias("a"),
        F.col("texts_hll").alias("_ha"),
        F.col("n_docs").alias("_na"),
        F.col("hll_lg_k").alias("_ka"),
    )
    b = profiles.select(
        F.col(key_col).alias("b"),
        F.col("texts_hll").alias("_hb"),
        F.col("hll_lg_k").alias("_kb"),
    )
    pairs = a.join(b, F.col("a") < F.col("b"))
    ea = F.hll_sketch_estimate("_ha").cast("double")
    eb = F.hll_sketch_estimate("_hb").cast("double")
    eu = F.hll_sketch_estimate(F.hll_union("_ha", "_hb")).cast("double")
    overlap = ea + eb - eu
    # per-sketch RSE for DataSketches HLL_8 ≈ 1.04 / sqrt(2^lg_k);
    # inclusion-exclusion stacks three estimates
    rse = F.lit(1.04) / F.sqrt(F.pow(F.lit(2.0), F.col("_ka")))
    return pairs.select(
        "a",
        "b",
        ea.alias("distinct_a"),
        eb.alias("distinct_b"),
        eu.alias("distinct_union"),
        overlap.alias("overlap_est"),
        F.when(eu > 0, F.greatest(overlap, F.lit(0.0)) / eu).alias(
            "jaccard_est"
        ),
        (rse * (ea + eb + eu)).alias("noise_floor"),
    )


def frequent_tokens(
    docs: DataFrame,
    support: float = 0.001,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus heavy-hitter tokens: every whitespace token whose share
    of ALL token occurrences is >= ``support``, with exact counts —
    ``(token, n_occurrences, share)``, descending. The raw material
    for blocklist curation and boilerplate discovery ("why is
    'cookies' the 12th most common token in my crawl?").

    Two passes, both bounded: (1) Spark's single-pass
    Karp-Papadimitriou-Shenker sketch (``df.stat.freqItems``) yields
    a CANDIDATE set that provably contains every true heavy hitter
    (false positives possible, false negatives not) and is at most
    ~1/support items; (2) one exact count restricted to those
    candidates (an ``isin`` pushdown, then a groupBy bounded by the
    candidate count) prunes the false positives. No token ever
    reaches the driver except the <= 1/support candidates."""
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1), got {support}")
    if support < 1e-4:
        # Spark's df.stat.freqItems itself requires support >= 1e-4
        # (internal require()) — gate here so the caller gets this
        # error, not an opaque IllegalArgumentException from the JVM.
        raise ValueError(
            f"support {support} would admit up to {int(1 / support):,} "
            "candidate tokens into the driver-side set (and Spark's "
            "freqItems sketch requires support >= 1e-4) — use the "
            "TF-IDF/vocab operators for full-distribution work"
        )
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = docs.select(
        F.explode(
            F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)
        ).alias("_tok")
    )
    cands = toks.stat.freqItems(["_tok"], support).collect()[0][0]
    if not cands:
        return docs.sparkSession.createDataFrame(
            [], "token string, n_occurrences long, share double"
        )
    counted = (
        toks.filter(F.col("_tok").isin(list(cands)))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = toks.agg(F.count(F.lit(1))).collect()[0][0]
    return (
        counted.select(
            F.col("_tok").alias("token"),
            "n_occurrences",
            (F.col("n_occurrences") / F.lit(float(total))).alias("share"),
        )
        .filter(F.col("share") >= support)
        .orderBy(F.col("n_occurrences").desc(), "token")
    )
