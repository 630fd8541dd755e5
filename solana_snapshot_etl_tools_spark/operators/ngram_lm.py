"""Distributed n-gram language model with stupid backoff — the
CCNet-style perplexity quality filter (Wenzek et al. 2020 §4.3 score
documents with a corpus-trained LM; RedPajama/Gopher use the same
signal). The backoff scheme is Brants et al., "Large Language Models
in Machine Translation" (EMNLP 2007) §4 "Stupid Backoff" — chosen
over Kneser-Ney PRECISELY because it was designed for distributed
count-based training: no discount fitting, no continuation counts, so
both training and scoring stay pure Spark aggregations/joins and the
model itself is a DataFrame, never driver state.

    S(w | ctx) = count(ctx·w)/count(ctx)        if count(ctx·w) > 0
               = 0.4 · S(w | shorter ctx)       otherwise
    S(w) = count(w)/total                        (unigram base case)

Extends the engine's quality family: `q_doc_rarity` is the
transcendental-free unigram proxy; this is the real higher-order LM.

Scale shape (100 TB honest):
- TRAIN is one narrow explode (each position emits its 1..n-gram
  keys) + one groupBy — the classic MapReduce n-gram count. The model
  STAYS a distributed (key, cnt) table keyed by 8-byte hashes; only
  ``total`` (one long) lives on the driver.
- SCORE melts each position into (2n-1) hashed-key rows (n gram
  orders + n-1 context orders), joins the count table ONCE on the
  long key, and folds back per position — longs-only shuffles, join
  volume (2n-1)·tokens. Hot keys (common n-grams) are AQE's
  skew-join case; small pruned models broadcast automatically.
- N-grams are keyed by ``xxhash64(order-salted token join)`` — 8-byte
  keys end-to-end; a collision merges two counts (vanishingly rare,
  and a quality SCORE, not an exactness surface — documented).

``min_count`` prunes rare high-order n-grams at train time (the
standard size/quality trade; backoff covers the pruned mass).

BOS convention (single-BOS, the KenLM/CCNet one): although the token
array is padded with (n-1) BOS markers so every position has a full
n-token window, TRAINING only counts grams starting at position
>= n-1 — i.e. grams containing at most ONE BOS, exactly the o-grams
of the conceptual ``[<s>] + tokens + [</s>]`` sentence. So
count(<s>) = 1 per document and S(w|<s>) = count(<s>·w)/count(<s>)
matches the standard formulation (an (n-1)-fold pad would deflate
that denominator by (n-1)). Numerator/denominator consistency holds:
every counted o-gram's (o-1)-prefix context starts at the same
position and is therefore counted too. At SCORE time the first n-2
positions of a document reference multi-BOS grams that were never
counted — those orders simply back off (count 0), so the first token
is scored as BACKOFF^(n-2) · count(<s>·w)/count(<s>): the natural
stupid-backoff reading of "less context available at the boundary".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions.text import tokens

BACKOFF = 0.4  # Brants et al. 2007: "empirically determined"
BOS, EOS = "<s>", "</s>"
_SEP = "\x1f"


def _padded(text: Column, n: int) -> Column:
    """(n-1) BOS markers + whitespace tokens + EOS; null/blank text →
    null (skip-not-fail: unscorable, never a crash)."""
    toks = tokens(text)
    toks = F.filter(toks, lambda t: t != "")
    pad = F.array(*[F.lit(BOS)] * (n - 1))
    return F.when(
        text.isNotNull() & (F.size(toks) > 0),
        F.concat(pad, toks, F.array(F.lit(EOS))),
    )


def _gram_key(toks: Column, start: Column, order: int) -> Column:
    """8-byte key of the ``order``-gram starting at 1-based ``start``
    — order-salted so a unigram and a bigram can never collide."""
    return F.xxhash64(
        F.lit(order), F.array_join(F.slice(toks, start, order), _SEP)
    )


def ngram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 1,
) -> dict:
    """Count-based LM over the corpus: returns
    ``{"n": n, "counts": DataFrame(key long, cnt long), "total": int}``.
    ``counts`` is DISTRIBUTED (cache it across many score calls if
    desired); ``total`` is the corpus token count incl. EOS (the
    unigram denominator). ``min_count`` drops n-grams of order ≥ 2
    seen fewer times (unigrams always survive — they are the backoff
    floor)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = _padded(F.col(text_col), n)
    base = docs.select(toks.alias("_t")).filter(F.col("_t").isNotNull())
    # every order-o gram, o = 1..n, starting at position >= n-1: the
    # single-BOS convention (module docstring) — grams deeper in the
    # pad would hold >= 2 BOS and have no counterpart in the
    # conceptual [<s>]+tokens+[</s>] sentence. One explode per order,
    # unioned — each is narrow; the single groupBy is the only shuffle.
    def _keys_of_order(o: int):
        # NB: a `lambda s, o=o:` two-parameter lambda would be called
        # by Spark as (element, index) — transform dispatches on arity
        # — silently rebinding o to the array index; hence the factory
        return lambda s: _gram_key(F.col("_t"), s, o)

    lo = max(1, n - 1)
    per_order = []
    for o in range(1, n + 1):
        stop = F.size(F.col("_t")) - (o - 1)
        # sequence(lo, stop) with lo > stop DESCENDS — guard to empty
        # (a k-token doc has no o-grams for o > k+2, matching the
        # conceptual (k+2)-long single-BOS sentence)
        starts = F.when(
            stop >= F.lit(lo), F.sequence(F.lit(lo), stop)
        ).otherwise(F.array().cast("array<int>"))
        per_order.append(
            base.select(
                F.explode(
                    F.transform(starts, _keys_of_order(o))
                ).alias("key"),
                F.lit(o).alias("_o"),
            )
        )
    allgrams = per_order[0]
    for p in per_order[1:]:
        allgrams = allgrams.unionByName(p)
    counts = (
        allgrams.groupBy("key", "_o")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("_o") == 1) | (F.col("cnt") >= min_count))
        .select("key", "cnt")
    )
    # total = non-BOS token occurrences (each position scored once) —
    # BOS is context-only, so it is excluded from the unigram base
    total = (
        base.select(
            F.sum(F.size(F.col("_t")) - (n - 1)).alias("s")
        ).collect()[0]["s"]
        or 0
    )
    return {"n": n, "counts": counts, "total": int(total)}


def lm_save(model: dict, path: str) -> None:
    """Persist a trained LM to ``path`` — ``counts`` as parquet (the
    distributed table never funnels through the driver) plus a
    one-row JSON ``meta`` ({format, n, total}). The CCNet recipe
    trains ONCE on the high-quality reference and scores many crawls;
    this is the train-once artifact. Both writes go through the
    Hadoop FS layer, so ``path`` may be local, HDFS, or S3."""
    counts = model["counts"]
    counts.write.mode("overwrite").parquet(f"{path}/counts")
    spark = counts.sparkSession
    spark.createDataFrame(
        [(1, int(model["n"]), int(model["total"]))],
        "format int, n int, total long",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")


def lm_load(spark, path: str) -> dict:
    """Load a model persisted by :func:`lm_save`. The returned dict is
    interchangeable with a fresh :func:`ngram_lm_train` result (pinned
    by test: saved-model scores ≡ fresh-model scores)."""
    rows = spark.read.json(f"{path}/meta").collect()
    if len(rows) != 1:
        raise ValueError(
            f"corrupt LM meta at {path}/meta: expected 1 row, got {len(rows)}"
        )
    meta = rows[0].asDict()
    if meta.get("format") != 1 or "n" not in meta or "total" not in meta:
        raise ValueError(f"unrecognized LM meta at {path}/meta: {meta}")
    return {
        "n": int(meta["n"]),
        "total": int(meta["total"]),
        "counts": spark.read.parquet(f"{path}/counts"),
    }


def lm_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, avg_logprob, perplexity) per scorable document —
    mean natural-log stupid-backoff score per position (incl. EOS),
    ``perplexity = exp(-avg_logprob)``. Unscorable rows (null/blank
    text) are absent from the output; OOV tokens take the pseudo-count
    floor ``BACKOFF^(n-1)/total`` so scores stay finite."""
    n, total = model["n"], model["total"]
    if total <= 0:
        raise ValueError("model trained on an empty corpus")
    counts = model["counts"]
    toks = _padded(F.col(text_col), n)
    base = (
        docs.select(F.col(id_col).alias("_doc"), toks.alias("_t"))
        .filter(F.col("_t").isNotNull())
        .select(
            "_doc",
            F.explode(F.sequence(F.lit(n), F.size(F.col("_t")))).alias("_i"),
            F.col("_t"),
        )
    )
    # melt: position i scores token at i using up-to-(n-1) context —
    # roles g{o} (the o-gram ending at i) and c{o} (its context, the
    # (o-1)-gram before i), all keyed by the salted hash
    roles = []
    for o in range(1, n + 1):
        roles.append(
            F.struct(
                F.lit(f"g{o}").alias("role"),
                _gram_key(F.col("_t"), F.col("_i") - (o - 1), o).alias("key"),
            )
        )
        if o >= 2:
            roles.append(
                F.struct(
                    F.lit(f"c{o}").alias("role"),
                    _gram_key(
                        F.col("_t"), F.col("_i") - (o - 1), o - 1
                    ).alias("key"),
                )
            )
    melted = base.select(
        "_doc", "_i", F.explode(F.array(*roles)).alias("_r")
    ).select("_doc", "_i", F.col("_r.role").alias("role"), F.col("_r.key").alias("key"))
    joined = melted.join(counts, "key", "left").select(
        "_doc", "_i", "role", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    pivot = joined.groupBy("_doc", "_i").agg(
        *[
            F.max(F.when(F.col("role") == r, F.col("cnt"))).alias(r)
            for o in range(1, n + 1)
            for r in ([f"g{o}"] + ([f"c{o}"] if o >= 2 else []))
        ]
    )
    # stupid backoff, highest order with a nonzero gram count wins;
    # multi-BOS grams/contexts (the first n-2 positions' high orders)
    # were never counted under the single-BOS convention, so those
    # orders back off by construction; any other context unseen in
    # training has cnt 0 and backs off too (cnt(gram)>0 implies
    # cnt(context)>0 within one corpus — contexts are prefixes counted
    # from the same start positions — so that only triggers across
    # corpora, where backoff is the defined behavior)
    # build from the BASE up: OOV floor first, then each order (low to
    # high) overrides when its gram count is present — the final
    # expression picks the HIGHEST order with a nonzero count, exactly
    # the backoff recursion unrolled
    floor = F.log(F.lit(BACKOFF ** (n - 1) / total))
    expr = floor
    for o in range(1, n + 1):
        g = F.coalesce(F.col(f"g{o}"), F.lit(0))
        denom = (
            F.coalesce(F.col(f"c{o}"), F.lit(0)) if o >= 2 else F.lit(total)
        )
        cand = F.log(g.cast("double") / denom.cast("double")) + F.lit(
            n - o
        ) * F.log(F.lit(BACKOFF))
        expr = F.when((g > 0) & (denom > 0), cand).otherwise(expr)
    per_pos = pivot.select("_doc", expr.alias("_lp"))
    return (
        per_pos.groupBy("_doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("_lp").alias("avg_logprob"),
        )
        .select(
            F.col("_doc").alias(id_col),
            "n_tokens",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    model: dict,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents whose LM perplexity is ≤ ``max_perplexity`` — the
    CCNet keep rule (their "head"/"middle" buckets are two thresholds
    of this). Unscorable rows (null/blank text) are dropped: a
    perplexity gate that passes empty text would undo the quality
    filters upstream."""
    scored = lm_score(docs, model, id_col=id_col, text_col=text_col)
    keep = scored.filter(F.col("perplexity") <= max_perplexity).select(
        F.col(id_col).alias("_keep_id")
    )
    return docs.join(
        keep, docs[id_col] == F.col("_keep_id"), "inner"
    ).drop("_keep_id")


def perplexity_buckets(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col=None,
    cuts: tuple = (1 / 3, 2 / 3),
    labels: tuple = ("head", "middle", "tail"),
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail split: every input row plus
    ``perplexity`` and ``ppl_bucket``, where the bucket cutoffs are
    the ``cuts`` perplexity percentiles of THIS corpus — computed per
    ``stratum_col`` (a column name or a Column expression, e.g.
    ``lang_id(text)``) when given (the paper computes per-LANGUAGE
    cutoffs, so no language is judged by another's fluency scale).
    Upper bounds are inclusive; unscorable rows (null/blank text)
    keep NULL in both new columns — route or drop them explicitly.

    Scale shape: one ``lm_score`` pass (join + two partial aggs), one
    tiny ``percentile_approx`` aggregate (one row per stratum — the
    approximate sketch aggregates map-side; an exact percentile would
    buffer every value per group), broadcast back, and the bucket
    label is a pure fold over the cutoff array. ``accuracy`` is the
    percentile_approx knob (default 10k ≈ exact at test scales)."""
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(labels) == len(cuts) + 1, got {len(labels)} labels "
            f"for {len(cuts)} cuts"
        )
    if list(cuts) != sorted(cuts) or not all(0 < c < 1 for c in cuts):
        raise ValueError(f"cuts must be ascending in (0, 1), got {cuts}")
    scored = lm_score(docs, model, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.col("perplexity")
    )
    work = docs.join(scored, id_col, "left")
    if stratum_col is None:
        strat = F.lit("_all")
    elif isinstance(stratum_col, str):
        strat = F.col(stratum_col)
    else:
        strat = stratum_col
    cuts_df = (
        work.filter(F.col("perplexity").isNotNull())
        .groupBy(strat.alias("_strat"))
        .agg(
            F.percentile_approx(
                "perplexity",
                F.array(*[F.lit(float(c)) for c in cuts]),
                F.lit(accuracy),
            ).alias("_cuts")
        )
    )
    joined = work.join(
        F.broadcast(cuts_df), strat.eqNullSafe(F.col("_strat")), "left"
    )
    # 0-based bucket index = how many cutoffs are strictly below the
    # value (ties land in the LOWER bucket — inclusive upper bounds)
    idx = F.size(
        F.filter(F.col("_cuts"), lambda c: c < F.col("perplexity"))
    )
    label_arr = F.array(*[F.lit(str(lb)) for lb in labels])
    bucket = F.when(
        F.col("perplexity").isNotNull() & F.col("_cuts").isNotNull(),
        F.element_at(label_arr, idx + 1),
    )
    return joined.select(
        *docs.columns, "perplexity", bucket.alias("ppl_bucket")
    )
