"""LLM training-data pipeline corpus: dedup, similarity search, text
analysis over the ``documents`` and ``embeddings`` tables.

Oracle philosophy: wherever the computation is expressible in both
engines with identical IEEE evaluation order, we declare a value-level
DuckDB oracle (exact dedup, n-gram Jaccard, MinHash-LSH verified
output, cosine top-k — verified bit-exact cross-engine). Hash-sketch
internals that depend on Spark's xxhash64 (SimHash sketches, LSH-ANN)
are declared rows-only and covered by recall/consistency pytest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.functions import text as TXT
from solana_snapshot_etl_tools_spark.operators import dedup as DD
from solana_snapshot_etl_tools_spark.operators import similarity as SIM
from solana_snapshot_etl_tools_spark.plans.relational import _t

_SW = {k: ", ".join(f"'{w}'" for w in v) for k, v in TXT.STOPWORDS.items()}

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


def _duck_hits(lang: str) -> str:
    return (
        f"len(list_filter({_TOKS}, x -> list_contains([{_SW[lang]}], x)))"
    )


# --- exact dedup -----------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_dedup_groups(docs, "doc_id", "text")


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


# --- n-gram Jaccard (exact) + MinHash LSH (same verified output) -------------

def _jaccard_sql(k: int) -> str:
    return f"""
WITH docs AS (SELECT doc_id, lower(text) t FROM documents),
g AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT)+1, {k}) sh
      FROM docs, unnest(range(length(t)-{k - 1})) AS u(i)),
sz AS (SELECT doc_id, count(*) n FROM g GROUP BY 1),
pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
          FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(inter AS DOUBLE)/(x.n + y.n - inter) AS jaccard
FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE CAST(inter AS DOUBLE)/(x.n + y.n - inter) > 0.8
"""


_JACCARD_SQL = _jaccard_sql(3)


def q_dedup_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.8, k=3)


def q_dedup_minhash_lsh(spark, sf_dir):
    """Scale path: LSH candidates + exact verification, against the
    k=5 shingle space. k=5 (vs the exact query's k=3) is the deliberate
    scale choice: background trigram Jaccard on prose is ~0.4, which
    makes banding pass millions of false candidates, while 5-gram
    background similarity is near zero — candidate volume drops ~10^4×
    and the planted near-dup pair set is identical (verified: 25/256
    pairs at sf0.01/0.1 under both k). The oracle runs the same k=5
    definition, so the driver checks LSH recall exactly."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8, k=5)


def q_dedup_components(spark, sf_dir):
    """The dedup DECISION table: MinHash-LSH pairs → connected
    components → (doc_id, keep_id). Oracle = the same pair set closed
    transitively with a recursive CTE — checks the distributed label
    propagation reaches the exact same components."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8, k=5)
    return DD.connected_components(pairs, docs, "doc_id")


DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE
docs AS (SELECT doc_id, lower(text) t FROM documents),
g AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT)+1, 5) sh
      FROM docs, unnest(range(length(t)-4)) AS u(i)),
sz AS (SELECT doc_id, count(*) n FROM g GROUP BY 1),
jp AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
       FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM jp
  JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
  WHERE CAST(inter AS DOUBLE)/(x.n + y.n - inter) > 0.8),
edges AS (SELECT doc_a a, doc_b b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
walk(s, d) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT w.s, e.b FROM walk w JOIN edges e ON w.d = e.a),
comp AS (SELECT s AS doc_id, min(d) AS keep_id FROM walk GROUP BY 1)
SELECT d.doc_id, COALESCE(c.keep_id, d.doc_id) AS keep_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 5), on the DuckDB-reproducible
    ``poly257`` hash family (base-257 code-point polynomial +
    splitmix-style finalizer — see ``dedup.simhash64``), so the driver
    hash-checks the ENTIRE sketch + banded-Hamming pipeline against a
    value-level oracle (rows-only until round 5; recall additionally
    pytest-pinned against exact Jaccard pairs for both families).

    The oracle is the plain all-pairs Hamming ≤ 5 set over the same
    sketches: pigeonhole banding is exact, and the hot-bucket caps are
    provably inert on the test corpora (no (band, chunk) bucket
    approaches SIMHASH_MAX_BUCKET — pinned by
    ``test_simhash_cap_inert_on_test_corpus``), so the two definitions
    coincide."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(
        docs, "doc_id", "text", max_hamming=5, hash_family="poly257"
    )


# --- the simhash oracle: the same mod-2^64 arithmetic in DuckDB HUGEINT ------

_M64 = 1 << 64


def _sql_mulmod64(z: str, k: int) -> str:
    """``z·k mod 2^64`` without HUGEINT overflow (32/32 split)."""
    return (
        f"((({z}) % {1 << 32}) * {k} "
        f"+ ((({z}) // {1 << 32}) * {k} % {1 << 32}) * {1 << 32}) % {_M64}"
    )


def _sql_mix64(e: str) -> str:
    """splitmix64-style finalizer — same steps as the numpy kernel."""
    z1 = f"xor(({e}), ({e}) // {1 << 30})"
    z2 = f"({_sql_mulmod64(z1, 0xBF58476D1CE4E5B9)})"
    z3 = f"xor({z2}, {z2} // {1 << 27})"
    z4 = f"({_sql_mulmod64(z3, 0x94D049BB133111EB)})"
    return f"xor({z4}, {z4} // {1 << 31})"


_SQL_TOKEN_POLY = (
    "list_reduce(list_transform(range(1, length(t) + 1), "
    "j -> unicode(substr(t, CAST(j AS INT), 1))::HUGEINT), "
    f"(a, c) -> (a * 257 + c) % {_M64})"
)

SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts
  FROM documents WHERE len({_TOKS}) > 0),
hashed AS (
  SELECT doc_id, list_transform(ts, t -> {_sql_mix64(_SQL_TOKEN_POLY)}) AS hs
  FROM toks),
sk AS (
  SELECT doc_id,
    list_sum(list_transform(range(0, 64), bb ->
      CASE WHEN list_sum(list_transform(hs, h ->
        2 * CAST((h // (1::HUGEINT << CAST(bb AS INT))) % 2 AS BIGINT) - 1)) > 0
      THEN (1::HUGEINT << CAST(bb AS INT)) ELSE 0::HUGEINT END)) AS sh
  FROM hashed),
signed AS (
  SELECT doc_id,
         CAST(CASE WHEN sh >= {1 << 63} THEN sh - {_M64} ELSE sh END AS BIGINT) AS sh
  FROM sk)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM signed a JOIN signed b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 5
"""


# --- similarity search -------------------------------------------------------


def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return SIM.brute_force_topk(emb, queries, k=5)


ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) cv FROM embeddings),
s AS (SELECT qid AS query_id, nid AS neighbor_id,
             list_dot_product(qv, cv) /
             (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
      FROM q, c WHERE qid != nid),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, sim FROM r WHERE rnk <= 5
"""


def q_cosine_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs(emb, threshold=0.4)


COSINE_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
       (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS sim
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
       sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) > 0.4
"""


def q_ann_lsh(spark, sf_dir):
    """Approximate ANN via hyperplane LSH with query-side multi-probe
    (round 12: default n_probes=2 lifted measured recall@5 at sf0.1
    from 0.82 to 1.00 for ~8% wall) — rows-only (bucket hashes are
    engine-specific); recall vs exact top-k asserted in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return SIM.lsh_ann_topk(emb, queries, dims=64, k=5)


def q_ann_ivf(spark, sf_dir):
    """Approximate ANN via an IVF coarse quantizer — rows-only (list
    assignments are engine-specific); recall vs exact top-k asserted
    in pytest. n_probe is fit-time auto-tuned to the default 0.9
    candidate-recall target (round-11: the old pinned n_probe=4
    measured recall@5 of only 0.58 on the bench corpus)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return SIM.ivf_ann_topk(emb, queries, k=5, n_lists=16)


# Exhaustive-parameter parity queries: with n_probe = n_lists every
# inverted list is probed (IVF), and with k·refine ≥ corpus size the
# exact re-rank covers every ADC candidate (PQ) — the approximate
# machinery degenerates to exact top-k, so the SAME routing/encode/
# scan/refine code paths get a hash-checked row against ANN_TOPK_SQL.
# The production-parameter variants above stay rows-only by design.


def _bitexact_sim_edge(ann, emb, queries, k: int):
    """Output edge for the parity queries: the ANN path chose the
    candidate set, but its sims come from normalized-dot / numpy
    einsum, which can differ from the oracle's ``dot/(|a|·|b|)`` in
    the last ulp — enough to fail the local bit-exact differential
    gate (the driver's rounded hash would pass). Recompute sim with
    the oracle-exact JVM fold over the RAW vectors and re-rank on it.
    Parity-query-only construct at validation scale; the production
    ANN variants keep their fast sims. The broadcast query side is the
    caller's QUERY frame, not the corpus — only query vectors ship."""
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_q"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("_c"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        ann.select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            SIM.cosine(F.col("_q"), F.col("_c")).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def q_ann_ivf_exact(spark, sf_dir):
    """IVF with every list probed — exercises training, assignment,
    probe routing and candidate equi-join end-to-end; output must
    equal exact brute-force top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ann = SIM.ivf_ann_topk(emb, queries, k=5, n_lists=16, n_probe=16)
    return _bitexact_sim_edge(ann, emb, queries, k=5)


_REFINE_MEMO: dict = {}


def _exhaustive_refine(emb, k: int) -> int:
    # smallest refine with k·refine ≥ corpus size (+1 for self-match).
    # The corpus count is a Spark job at CONSTRUCTION time (refine is a
    # plan parameter), so it is memoized per corpus plan — building all
    # declared queries must not launch one scan per parity query.
    try:
        key = (emb.semanticHash(), k)
    except Exception:
        key = None
    if key is not None and key in _REFINE_MEMO:
        return _REFINE_MEMO[key]
    n = emb.count()
    refine = n // k + 2
    if key is not None:
        _REFINE_MEMO[key] = refine
    return refine


def q_ann_pq_exact(spark, sf_dir):
    """PQ ADC scan whose refine set covers the corpus — exercises
    codebook training, encoding, LUT ADC scan, partial top-k combiner
    and the exact-refine tail; output must equal exact top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ann = SIM.pq_ann_topk(emb, queries, k=5, refine=_exhaustive_refine(emb, 5))
    return _bitexact_sim_edge(ann, emb, queries, k=5)


def q_ann_ivf_pq_exact(spark, sf_dir):
    """IVF-PQ with all lists probed and corpus-covering refine —
    the full billion-scale layout run in its degenerate-exact mode."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ann = SIM.ivf_pq_ann_topk(
        emb, queries, k=5, n_lists=16, n_probe=16,
        refine=_exhaustive_refine(emb, 5),
    )
    return _bitexact_sim_edge(ann, emb, queries, k=5)


# --- text analysis -------------------------------------------------------------


def q_text_metrics(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TXT.token_count(t).alias("n_tokens"),
        TXT.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        TXT.punct_ratio(t).alias("punct_ratio"),
        TXT.stopword_ratio(t, "en").alias("stopword_ratio"),
        TXT.avg_token_len(t).alias("avg_token_len"),
        TXT.quality_score(t).alias("quality_score"),
    )


TEXT_METRICS_SQL = f"""
SELECT doc_id,
  CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) AS punct_ratio,
  {_duck_hits("en")} / greatest(len({_TOKS}), 1) AS stopword_ratio,
  list_aggregate(list_transform({_TOKS}, x -> CAST(length(x) AS BIGINT)), 'sum') / greatest(len({_TOKS}), 1) AS avg_token_len,
  (least(len({_TOKS}) / 100.0, 1.0) * 0.4
   + least({_duck_hits("en")} / greatest(len({_TOKS}), 1) * 4.0, 1.0) * 0.3)
   + greatest(1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) * 5.0, 0.0) * 0.3 AS quality_score
FROM documents
"""


def q_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.lang_id(F.col("text")).alias("lang_pred"))


LANG_ID_SQL = f"""
SELECT doc_id,
  CASE
    WHEN {_duck_hits("en")} + {_duck_hits("es")} + {_duck_hits("de")} + {_duck_hits("fr")} = 0 THEN 'und'
    WHEN {_duck_hits("en")} >= {_duck_hits("es")} AND {_duck_hits("en")} >= {_duck_hits("de")} AND {_duck_hits("en")} >= {_duck_hits("fr")} THEN 'en'
    WHEN {_duck_hits("es")} >= {_duck_hits("de")} AND {_duck_hits("es")} >= {_duck_hits("fr")} THEN 'es'
    WHEN {_duck_hits("de")} >= {_duck_hits("fr")} THEN 'de'
    ELSE 'fr'
  END AS lang_pred
FROM documents
"""


def q_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TXT.fingerprint_md5(F.col("text")).alias("fingerprint")
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_length_histogram(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy((F.floor(F.col("n_chars") / 100) * 100).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )


LENGTH_HIST_SQL = """
SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket, COUNT(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


# --- bigram repetition / rarity stats (Gopher-style quality filters) ---------
# All-integer arithmetic until the final divisions, so the oracle is
# bit-exact cross-engine (no transcendental functions — ln() ULPs
# differ between the JVM and libm).


def q_bigram_stats(spark, sf_dir):
    """Per-doc token-bigram stats: total bigrams, distinct bigrams,
    duplicate-bigram ratio (the Gopher repetition filter signal), and
    the share of this doc's distinct bigrams that appear in no other
    document (rarity/novelty signal; needs the corpus-level document
    frequency — a groupBy + join, the scale-shaped part)."""
    docs = _t(spark, sf_dir, "documents")
    t = TXT.tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = docs.select("doc_id", bigrams.alias("bgs")).filter(F.size("bgs") > 0)
    per_doc = base.select(
        "doc_id",
        F.size("bgs").alias("n_bigrams"),
        F.size(F.array_distinct("bgs")).alias("n_distinct"),
    )
    pairs = base.select("doc_id", F.explode(F.array_distinct("bgs")).alias("bg"))
    dfreq = pairs.groupBy("bg").agg(F.count(F.lit(1)).alias("df"))
    uniq = (
        pairs.join(dfreq.filter(F.col("df") == 1), "bg")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        per_doc.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_bigrams",
            "n_distinct",
            ((F.col("n_bigrams") - F.col("n_distinct")) / F.col("n_bigrams")).alias(
                "dup_bigram_ratio"
            ),
            (F.coalesce(F.col("n_unique"), F.lit(0)) / F.col("n_distinct")).alias(
                "rare_bigram_ratio"
            ),
        )
    )


BIGRAM_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
bg AS (
  SELECT doc_id,
         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bgs
  FROM base WHERE len(t) >= 2
),
per_doc AS (
  SELECT doc_id, CAST(len(bgs) AS INT) AS n_bigrams,
         CAST(len(list_distinct(bgs)) AS INT) AS n_distinct
  FROM bg
),
pairs AS (
  SELECT doc_id, unnest(list_distinct(bgs)) AS g FROM bg
),
dfreq AS (SELECT g, count(*) AS df FROM pairs GROUP BY g),
uniq AS (
  SELECT doc_id, count(*) AS n_unique
  FROM pairs JOIN dfreq USING (g) WHERE df = 1 GROUP BY doc_id
)
SELECT p.doc_id, p.n_bigrams, p.n_distinct,
       (p.n_bigrams - p.n_distinct) / CAST(p.n_bigrams AS DOUBLE) AS dup_bigram_ratio,
       coalesce(u.n_unique, 0) / CAST(p.n_distinct AS DOUBLE) AS rare_bigram_ratio
FROM per_doc p LEFT JOIN uniq u ON p.doc_id = u.doc_id
"""


# --- deterministic balanced sampling (domain/language mixing) ----------------
# Reproducible sampling via a Knuth multiplicative hash on doc_id with
# an integer-only acceptance predicate: keep iff
# h(doc) * count(lang) < min_lang_count * 2^32 — no floats anywhere,
# so the sample is identical in any engine and across reruns/cluster
# sizes (unlike Bernoulli sample(), whose output depends on the
# engine's RNG stream and partitioning).

_KNUTH = 2654435761
_2_32 = 1 << 32


def _knuth_h(col):
    """``(id · 2654435761) mod 2^32`` without int64 overflow at ANY id:
    the naive ``id * K`` wraps (or errors under ANSI) once
    ``id ≥ 2^63/K ≈ 3.47e9`` — easily reached by real corpus ids — and
    engines disagree on what happens next. Reduce mod 2^32 first
    (mathematically a no-op for the product mod 2^32), then split the
    reduced value 16/16 so every intermediate stays ≤ ~1.7e14:
    ``a·K mod 2^32 = (lo·K + ((hi·K) mod 2^16)·2^16) mod 2^32``.
    Identical to the naive spelling wherever that spelling doesn't
    overflow; ids are assumed non-negative (table keys)."""
    a = F.pmod(col, F.lit(_2_32))
    lo = a.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftrightunsigned(a, 16)
    return F.pmod(
        lo * F.lit(_KNUTH)
        + F.pmod(hi * F.lit(_KNUTH), F.lit(1 << 16)) * F.lit(1 << 16),
        F.lit(_2_32),
    )


# the same spelling for DuckDB (// is integer division); doc ids are
# non-negative so % matches Spark's pmod
_H_SQL = (
    f"(((doc_id % {_2_32}) % 65536) * {_KNUTH}"
    f" + ((((doc_id % {_2_32}) // 65536) * {_KNUTH}) % 65536) * 65536)"
    f" % {_2_32}"
)


def q_sample_balanced_lang(spark, sf_dir):
    """Downsample each language stratum to the size of the smallest:
    the standard domain-mixing move when one source dominates.

    Stratum sizes come from a tiny groupBy aggregate broadcast back
    onto the corpus — NOT a window: a `min(...) over ()` global window
    would funnel every row through a single partition at scale, and a
    per-stratum window still sorts the full corpus. The per-row work
    stays a broadcast hash join plus an integer predicate."""
    docs = _t(spark, sf_dir, "documents")
    lang = TXT.lang_id(F.col("text"))
    base = docs.select(
        "doc_id", lang.alias("lang_pred"), _knuth_h(F.col("doc_id")).alias("h")
    )
    counts = base.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("min_cnt"))
    # the acceptance test compares in DOUBLE: h·cnt overflows int64 once
    # a stratum passes 2^31 rows (real at 100 TB); IEEE double multiply
    # rounds identically in every engine, so the oracle still matches
    return (
        base.join(F.broadcast(counts), "lang_pred")
        .crossJoin(F.broadcast(min_cnt))
        .filter(
            F.col("h").cast("double") * F.col("cnt")
            < F.col("min_cnt").cast("double") * F.lit(float(_2_32))
        )
        .select("doc_id", "lang_pred")
    )


SAMPLE_BALANCED_SQL = f"""
WITH langed AS (
  SELECT doc_id,
    CASE
      WHEN {_duck_hits("en")} + {_duck_hits("es")} + {_duck_hits("de")} + {_duck_hits("fr")} = 0 THEN 'und'
      WHEN {_duck_hits("en")} >= {_duck_hits("es")} AND {_duck_hits("en")} >= {_duck_hits("de")} AND {_duck_hits("en")} >= {_duck_hits("fr")} THEN 'en'
      WHEN {_duck_hits("es")} >= {_duck_hits("de")} AND {_duck_hits("es")} >= {_duck_hits("fr")} THEN 'es'
      WHEN {_duck_hits("de")} >= {_duck_hits("fr")} THEN 'de'
      ELSE 'fr'
    END AS lang_pred,
    {_H_SQL} AS h
  FROM documents
),
counted AS (
  SELECT *, count(*) OVER (PARTITION BY lang_pred) AS cnt FROM langed
),
final AS (
  SELECT *, min(cnt) OVER () AS min_cnt FROM counted
)
SELECT doc_id, lang_pred FROM final
WHERE CAST(h AS DOUBLE) * cnt < CAST(min_cnt AS DOUBLE) * {_2_32}
"""


def q_split_train_val_test(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5) by integer
    hash thresholds on the doc id — the reproducible-split primitive:
    the assignment is a pure function of the id, so it is identical
    across engines, reruns, cluster sizes, and survives corpus
    appends (existing docs never change split). Integer-only
    predicate, no RNG, no shuffle — a narrow map the optimizer folds
    into the scan."""
    docs = _t(spark, sf_dir, "documents")
    h = _knuth_h(F.col("doc_id"))
    split = (
        F.when(h * 100 < F.lit(90) * F.lit(_2_32), "train")
        .when(h * 100 < F.lit(95) * F.lit(_2_32), "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


SPLIT_SQL = f"""
SELECT doc_id,
  CASE WHEN ({_H_SQL}) * 100 < 90 * {_2_32} THEN 'train'
       WHEN ({_H_SQL}) * 100 < 95 * {_2_32} THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def q_salted_join_orders(spark, sf_dir):
    """Skew-mitigation demo on real tables: lineitem ⋈ orders via
    salted_join (operators/skew.py) — hot orderkeys spread over 8
    salts, orders replicated 8×. The oracle is the PLAIN join: salting
    must be result-invariant, so the driver hash-checks the technique
    end-to-end (previously pytest-only)."""
    from solana_snapshot_etl_tools_spark.operators.skew import salted_join

    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    return salted_join(l, o, "l_orderkey", salt=8, salt_source="l_linenumber")


SALTED_JOIN_SQL = """
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderstatus
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


# --- composite: the end-to-end training-data cleaning pipeline ---------------


def q_clean_corpus(spark, sf_dir):
    """Compose the pipeline a pretraining corpus build runs: exact
    dedup (keep min doc per content hash) → quality filter → English
    only → emit (doc_id, n_tokens, quality score)."""
    docs = _t(spark, sf_dir, "documents")
    kept = DD.exact_dedup(docs, "doc_id", "text")
    t = F.col("text")
    return (
        kept.select(
            "doc_id",
            TXT.token_count(t).alias("n_tokens"),
            TXT.quality_score(t).alias("quality"),
            TXT.lang_id(t).alias("lang_pred"),
        )
        .filter((F.col("quality") > 0.5) & (F.col("lang_pred") == "en"))
        .select("doc_id", "n_tokens", "quality")
    )


CLEAN_CORPUS_SQL = f"""
WITH kept AS (
  SELECT * FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
),
scored AS (
  SELECT doc_id,
    CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
    (least(len({_TOKS}) / 100.0, 1.0) * 0.4
     + least({_duck_hits("en")} / greatest(len({_TOKS}), 1) * 4.0, 1.0) * 0.3)
     + greatest(1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) * 5.0, 0.0) * 0.3 AS quality,
    CASE
      WHEN {_duck_hits("en")} + {_duck_hits("es")} + {_duck_hits("de")} + {_duck_hits("fr")} = 0 THEN 'und'
      WHEN {_duck_hits("en")} >= {_duck_hits("es")} AND {_duck_hits("en")} >= {_duck_hits("de")} AND {_duck_hits("en")} >= {_duck_hits("fr")} THEN 'en'
      WHEN {_duck_hits("es")} >= {_duck_hits("de")} AND {_duck_hits("es")} >= {_duck_hits("fr")} THEN 'es'
      WHEN {_duck_hits("de")} >= {_duck_hits("fr")} THEN 'de'
      ELSE 'fr'
    END AS lang_pred
  FROM kept)
SELECT doc_id, n_tokens, quality FROM scored
WHERE quality > 0.5 AND lang_pred = 'en'
"""


def q_ann_pq(spark, sf_dir):
    """PQ compressed-domain ANN (ADC scan + exact refine). Codebooks /
    codes are engine-specific (seeded k-means) → rows-only check;
    recall pinned by pytest against the exact brute force."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return SIM.pq_ann_topk(emb, queries, k=5)


def q_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ composed layout (faiss IVFPQ analog): list-pruned scan
    over PQ codes + exact refine. Rows-only (seeded k-means both
    levels); recall pinned by pytest AND tracked per-round in the
    bench diag (r11 graded 0.76@5 under m=8/nbits=4 a quality miss;
    the m=16/nbits=6 defaults restore the 0.90 candidate ceiling —
    sweep documented at ``similarity.ivf_pq_ann_topk``)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return SIM.ivf_pq_ann_topk(emb, queries, k=5)


def q_dup_span_stats(spark, sf_dir):
    """Exact duplicate-substring stats (k=50 spans shared across
    docs) — the substring-level dedup signal exact/minhash doc-level
    dedup can't see. Windows hash to longs before the wide stages."""
    docs = _t(spark, sf_dir, "documents")
    return DD.dup_span_stats(docs, "doc_id", "text", k=50)


DUP_SPAN_SQL = """
WITH d AS (SELECT doc_id, lower(text) t FROM documents
           WHERE length(lower(text)) >= 50),
w AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT)+1, 50) sub
      FROM d, unnest(range(length(t)-49)) AS u(i)),
sz AS (SELECT doc_id, count(*) n_windows FROM w GROUP BY 1),
freq AS (SELECT sub, count(*) nd FROM w GROUP BY 1),
sh AS (SELECT w.doc_id, count(*) n_shared
       FROM w JOIN freq USING (sub) WHERE nd >= 2 GROUP BY 1)
SELECT sz.doc_id, n_windows,
       COALESCE(n_shared, 0) AS n_shared_windows,
       CAST(COALESCE(n_shared, 0) AS DOUBLE) / n_windows AS dup_frac
FROM sz LEFT JOIN sh ON sz.doc_id = sh.doc_id
"""


def q_chunk_documents(spark, sf_dir, chunk_chars: int = 200, overlap: int = 40):
    """Fixed-size overlapping character chunks — the pre-tokenization
    sharding primitive for long-document training pipelines (feeds
    ``write_training_shards``). Chunk i starts at i·step (step =
    chunk_chars − overlap); a chunk is emitted iff it adds content
    past the previous chunk's end, so count = max(1,
    ⌈(len−overlap)/step⌉) — spelled with integer div so both engines
    agree exactly. Narrow explode, no shuffle, no UDF."""
    step = chunk_chars - overlap
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.expr(
        f"greatest((length(text) - {overlap} + {step - 1}) div {step}, 1)"
    ).cast("int")
    t = F.col("text")
    chunk = lambda i: t.substr(i * step + 1, F.lit(chunk_chars))  # noqa: E731
    return docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_id"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        chunk(F.col("chunk_id")).alias("chunk"),
        F.length(chunk(F.col("chunk_id"))).cast("long").alias("n_chunk_chars"),
    )


CHUNK_DOCUMENTS_SQL = """
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       substr(text, CAST(i AS INT)*160 + 1, 200) AS chunk,
       length(substr(text, CAST(i AS INT)*160 + 1, 200)) AS n_chunk_chars
FROM documents,
     unnest(range(greatest((length(text) - 40 + 159) // 160, 1))) AS u(i)
WHERE length(text) > 0
"""


def q_embedding_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding table — the standard
    4× memory/shuffle reduction step ahead of large-scale ANN. Narrow
    per-row map; oracle hash-checks every quantized component.

    The query's OUTPUT edge renders qvec as a comma-joined string
    (``"3,-17,0,..."``): the verification harness canonicalizes result
    frames with a pandas sort, which cannot hash/sort raw list cells
    (`array<int>` → ``TypeError: unhashable type: 'list'``). Integer
    formatting is engine-independent, so the string carries every cell
    bit-for-bit; ``quantize_int8`` itself still returns the real
    ``array<int>`` column for downstream use."""
    emb = _t(spark, sf_dir, "embeddings")
    q = SIM.quantize_int8(emb, "vec_id", "embedding")
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
    )


EMBEDDING_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
  FROM embeddings
)
SELECT vec_id, scale,
  array_to_string(list_transform(ve, x -> CASE WHEN scale = 0 THEN 0
    ELSE greatest(-127, least(127, CAST(floor(x / scale + 0.5) AS INT)))
    END), ',') AS qvec_csv
FROM s
"""


# --- content-defined chunking ------------------------------------------------

# Rolling-hash parameters: base 31 over code points, window 4, boundary
# when hash % CDC_MODULUS == 0 → expected chunk ≈ CDC_MODULUS chars.
# All-integer arithmetic (max intermediate ≈ 31³·0x10FFFF ≈ 3.3e10,
# far under int64), so the SAME formula is spellable in DuckDB for an
# oracle when the query is declared.
CDC_BASE = 31
CDC_WINDOW = 4
CDC_MODULUS = 64

# Retained for the JVM-expression boundary scans that still segment
# their dense per-row temporaries (see operators/excise.py /
# dup_span_stats, which cite this rationale): a single dense
# sequence(w, n) would materialize n longs in one task allocation —
# unbounded on huge documents.
CDC_SEGMENT_CHARS = 65536

# chunk_cdc's numpy boundary pass scans each document in segments of
# this many chars overlapping by CDC_WINDOW-1 (r17): peak transient
# numpy state ≈ 20 bytes × this, per document, regardless of document
# size — maxRecordsPerBatch bounds ROWS per batch but not the size of
# one row, and a multi-hundred-MB document through the r16
# whole-document pass was an executor-memoryOverhead OOM vector.
CDC_SCAN_SEGMENT_CHARS = 1 << 20


def chunk_cdc(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = CDC_MODULUS,
):
    """Content-defined chunking: cut after every position whose
    trailing ``CDC_WINDOW``-gram polynomial hash ≡ 0 (mod
    ``modulus``). Unlike fixed-size chunking (``q_chunk_documents``),
    boundaries depend only on LOCAL content, so inserting or deleting
    a prefix re-chunks only up to the next boundary — the property
    that makes chunk-level dedup robust to shifted/edited documents
    (pinned by pytest). Narrow per-row array expressions: positions →
    hash → filter → pairwise slice → explode. No shuffle, no UDF, no
    sequential state (no min/max chunk bound — a bound would make
    boundary acceptance depend on the previous boundary and the
    operator sequential; cap oversized chunks downstream with
    ``q_chunk_documents`` if needed).

    Emits (id, chunk_id, chunk, n_chunk_chars).

    Implementation (optimization r16, guide §4.2): the boundary scan
    is a vectorized numpy pass per Arrow batch. The previous all-JVM
    spelling (code-point array column + per-position higher-order
    ``filter`` over a segmented ``sequence``) was measured at 1.67 s
    at sf0.1 with ~1.3 s of it the INTERPRETED per-position lambda
    (HOFs are not codegen'd); the numpy rolling hash computes every
    window hash in four vector ops. Semantics are identical: Spark 4's
    ``split('')``/``ascii``/``substring``/``length`` are all
    code-point semantics (probed — an astral char is ONE element), and
    Python strings index by code point, so even astral text agrees;
    the int64 hash also matches the DuckDB oracle's 64-bit arithmetic
    where the old INT expression could overflow on astral code points
    (> 72k · 31³ > 2³¹ — unreachable on the BMP corpora). Boundary
    set, spans and chunks are pinned unchanged by the oracle-parity,
    shift-robustness and stream/batch-parity pytests. ``mapInPandas``
    runs unchanged under readStream (the stream-parity test drives it
    with a real availableNow query); the small-input spread is skipped
    on streaming frames (no RDD access) — a live stream's micro-batch
    parallelism comes from the source.

    r17: the boundary scan runs in (w-1)-overlapping segments so the
    per-document transient numpy state is bounded (~20 MB at 2^20
    chars/segment) no matter how long one document is — the r16
    full-document pass allocated ~20 bytes/char in one shot, an
    executor-memoryOverhead OOM vector for multi-hundred-MB documents
    at scale. Boundary set identical (the predicate is w-local; pinned
    by the long-doc case in the batching-invariance pytest)."""
    from pyspark.sql import types as T

    w, b = CDC_WINDOW, CDC_BASE
    b3, b2 = b**3, b**2
    mod = modulus
    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("chunk_id", T.IntegerType()),
            T.StructField("chunk", T.StringType()),
            T.StructField("n_chunk_chars", T.LongType()),
        ]
    )

    seg_chars = CDC_SCAN_SEGMENT_CHARS  # captured at closure-pickle time

    def gen(batches):
        import numpy as np
        import pandas as pd

        def boundary_ends(txt: str, n: int) -> list[int]:
            parts = []
            for s0 in range(0, n - (w - 1), seg_chars):
                seg = txt[s0 : s0 + seg_chars + (w - 1)]
                m = len(seg)
                cps = np.frombuffer(
                    seg.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                # hash of the window ENDING at 1-based position i ≥ w,
                # vectorized over this segment's window ends
                h = (
                    cps[: m - (w - 1)] * b3
                    + cps[1 : m - (w - 2)] * b2
                    + cps[2 : m - 1] * b
                    + cps[3:]
                )
                parts.append(np.nonzero(h % mod == 0)[0] + (w + s0))
            return np.concatenate(parts).tolist() if parts else []

        for pdf in batches:
            ids, cids, chunks, lens = [], [], [], []
            for did, txt in zip(pdf["_id"], pdf["_t"]):
                if txt is None:
                    continue
                n = len(txt)
                if n < w:
                    continue
                ends = boundary_ends(txt, n)
                if not ends or ends[-1] != n:
                    ends.append(n)  # always cut at the end of the text
                s = 0
                for ci, e in enumerate(ends):
                    ids.append(did)
                    cids.append(ci)
                    chunks.append(txt[s:e])
                    lens.append(e - s)
                    s = e
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_id": np.array(cids, dtype=np.int32),
                    "chunk": chunks,
                    "n_chunk_chars": np.array(lens, dtype=np.int64),
                }
            )

    narrow = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    )
    if not narrow.isStreaming:
        from solana_snapshot_etl_tools_spark.operators.dedup import (
            spread_small_input,
        )

        narrow = spread_small_input(narrow)
    return narrow.mapInPandas(gen, out_schema)


# --- PII detect / redact -----------------------------------------------------
# The real documents corpus contains no PII, so the query derives a
# PLANTED corpus from it deterministically (append synthetic
# email/phone/IP to id-selected docs) — the same derivation spelled in
# both engines, like the Solana decode queries derive from a shared
# fixture. The detection/redaction patterns live in functions/text.py
# and are restricted to Java-regex ∩ RE2 common syntax so the engine
# and the oracle run the SAME pattern.


def _planted_pii_text():
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 11 == 0,
        F.concat(F.lit(" call +41 793 "), (d % 9000 + 1000).cast("string")),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 13 == 0,
        F.concat(
            F.lit(" from 10."),
            (d % 256).cast("string"),
            F.lit(".0."),
            (d % 250).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


def q_pii_scrub(spark, sf_dir):
    """PII scrub over the planted corpus: per-doc match counts per
    type plus the fully redacted text (hash-checked character for
    character). One codegen'd projection — counts and chained
    regexp_replace, no UDF, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select("doc_id", _planted_pii_text().alias("text"))
    t = F.col("text")
    return planted.select(
        "doc_id",
        TXT.pii_count(t, "email").alias("n_emails"),
        TXT.pii_count(t, "phone").alias("n_phones"),
        TXT.pii_count(t, "ipv4").alias("n_ips"),
        TXT.redact_pii(t).alias("clean"),
    )


def _planted_sql(src: str) -> str:
    """The planted-PII derivation as a SQL CTE body over ``src`` — the
    single oracle-side counterpart of ``_planted_pii_text`` (keep the
    two in lockstep; there is deliberately no third copy)."""
    return f"""planted AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' call +41 793 ' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.0.' || CAST(doc_id % 250 AS VARCHAR)
            ELSE '' END AS text
  FROM {src})"""


# the SAME pattern strings drive the Spark expressions and the DuckDB
# oracle — never restate them here (drift channel)
_PII_EMAIL = TXT.PII_PATTERNS["email"]
_PII_PHONE = TXT.PII_PATTERNS["phone"]
_PII_IP = TXT.PII_PATTERNS["ipv4"]

PII_SCRUB_SQL = f"""
WITH {_planted_sql("documents")}
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{_PII_EMAIL}', '<EMAIL>', 'g'),
      '{_PII_PHONE}', '<PHONE>', 'g'),
      '{_PII_IP}', '<IPV4>', 'g') AS clean
FROM planted
"""


# --- Gopher-style repetition filters -----------------------------------------


def q_quality_repetition(spark, sf_dir):
    """Top-n-gram coverage — the Gopher repetition filter signal that
    ``bigram_stats``' distinct-ratio can't see (a doc repeating ONE
    bigram half the time has the same distinct ratio as one repeating
    many different bigrams): fraction of tokens covered by the single
    most frequent unigram, and of bigram slots by the most frequent
    bigram. explode → two-level groupBy, partial-agg both levels; the
    per-(doc, gram) cardinality is bounded by corpus token count, and
    no global shuffle key is hotter than one document's grams."""
    # Single-pass shape (optimization r16, guide §2.4): the old plan
    # ran two independent explode → groupBy → groupBy chains (unigrams,
    # bigrams) and re-joined them per doc — two scans, five exchanges.
    # Unigrams and bigrams now explode ONCE as (kind, gram) rows and
    # one two-level aggregation computes both maxima with conditional
    # aggregates; the old left-join semantics (a ≥1-token doc with no
    # bigrams reports 0.0) falls out of the max(when(kind=1)) being
    # NULL. Same gram strings, same counts — oracle-identical.
    docs = _t(spark, sf_dir, "documents")
    t = TXT.tokens(F.col("text"))
    # spread before tokenizing (r16): one-row-group corpus files scan
    # as a single partition, so the tokenize+explode would run on one
    # core; only (doc_id, text) rides the round-robin shuffle.
    # Planning no-op at scale.
    base = (
        DD.spread_small_input(docs.select("doc_id", "text"))
        .select("doc_id", t.alias("t"))
        .filter(F.size("t") > 0)
    )
    tc = F.col("t")
    bigrams = F.zip_with(
        F.slice(tc, 1, F.greatest(F.size(tc) - 1, F.lit(0))),
        F.slice(tc, 2, F.greatest(F.size(tc) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    both = F.concat(
        F.transform(tc, lambda g: F.struct(F.lit(0).alias("kind"), g.alias("g"))),
        F.transform(
            bigrams, lambda g: F.struct(F.lit(1).alias("kind"), g.alias("g"))
        ),
    )
    exploded = base.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.greatest(F.size("t") - 1, F.lit(0)).cast("long").alias("n_bigrams"),
        F.explode(both).alias("e"),
    ).select("doc_id", "n_tokens", "n_bigrams", "e.kind", "e.g")
    return (
        exploded.groupBy("doc_id", "n_tokens", "n_bigrams", "kind", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_tokens", "n_bigrams")
        .agg(
            F.max(F.when(F.col("kind") == 0, F.col("c"))).alias("topc"),
            F.max(F.when(F.col("kind") == 1, F.col("c"))).alias("topcb"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("topc") / F.col("n_tokens")).alias("top_unigram_frac"),
            F.coalesce(
                F.col("topcb") / F.col("n_bigrams"), F.lit(0.0)
            ).alias("top_bigram_frac"),
        )
    )


QUALITY_REPETITION_SQL = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
uni AS (SELECT doc_id, CAST(len(t) AS BIGINT) n_tokens, unnest(t) g
        FROM base WHERE len(t) > 0),
uc AS (SELECT doc_id, n_tokens, g, count(*) c FROM uni GROUP BY 1, 2, 3),
topu AS (SELECT doc_id, n_tokens, max(c) topc FROM uc GROUP BY 1, 2),
bg AS (SELECT doc_id, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) bgs
       FROM base WHERE len(t) >= 2),
bgu AS (SELECT doc_id, CAST(len(bgs) AS BIGINT) n_bigrams, unnest(bgs) g FROM bg),
bc AS (SELECT doc_id, n_bigrams, g, count(*) c FROM bgu GROUP BY 1, 2, 3),
topb AS (SELECT doc_id, n_bigrams, max(c) topcb FROM bc GROUP BY 1, 2)
SELECT u.doc_id, u.n_tokens,
       u.topc / CAST(u.n_tokens AS DOUBLE) AS top_unigram_frac,
       coalesce(b.topcb / CAST(b.n_bigrams AS DOUBLE), 0.0) AS top_bigram_frac
FROM topu u LEFT JOIN topb b ON u.doc_id = b.doc_id
"""


# --- vocabulary statistics (inverted-index scale primitive) ------------------


def q_token_doc_freq(spark, sf_dir):
    """Corpus vocabulary table: per token, total occurrences (tf) and
    document frequency (df) — the posting-list statistics behind BM25 /
    idf weighting and stopword discovery. One explode + one groupBy;
    count(distinct doc_id) expands to a two-phase partial aggregate,
    both map-side combined. Emits integers only — downstream idf
    weighting picks its own log base."""
    docs = _t(spark, sf_dir, "documents")
    # (r16: a pre-explode small-input spread was A/B'd here and
    # REJECTED — the extra round-robin stage costs more than the
    # ~0.2 s single-core tokenize it parallelizes on this light query;
    # 0.30 s → 0.45-0.59 s measured)
    occ = docs.select(
        "doc_id", F.explode(TXT.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    return occ.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )


TOKEN_DOC_FREQ_SQL = f"""
SELECT g AS token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest({_TOKS}) AS g FROM documents)
WHERE g <> '' GROUP BY 1
"""


def q_doc_rarity(spark, sf_dir):
    """Unigram-LM quality proxy in the frequency domain: per doc, the
    occurrence-weighted mean and the minimum of its tokens' CORPUS
    frequency. Rank-equivalent to unigram log-likelihood scoring but
    transcendental-free — integer sums with one final double division,
    so the oracle matches bit for bit (ln() ULPs differ between JVM
    and libm; a log-domain score could only be rows-checked).

    Shape: corpus tf is a groupBy over occurrences; the doc score
    joins per-doc DISTINCT tokens (not occurrences) against it — join
    volume is Σ distinct-tokens-per-doc, and in-doc counts reweight to
    occurrence level. AQE handles the hot common-token keys."""
    docs = _t(spark, sf_dir, "documents")
    # (r16: a pre-explode small-input spread was A/B'd here and
    # REJECTED — same verdict as token_doc_freq: extra stage > saved
    # single-core work on this light query)
    occ = docs.select(
        "doc_id", F.explode(TXT.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    per_doc = occ.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    tf = occ.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.join(tf, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            (F.sum(F.col("c") * F.col("tf")) / F.sum("c")).alias("mean_tf"),
            F.min("tf").alias("min_tf"),
        )
    )


DOC_RARITY_SQL = f"""
WITH occ AS (
  SELECT doc_id, g AS token
  FROM (SELECT doc_id, unnest({_TOKS}) AS g FROM documents)
  WHERE g <> ''),
per_doc AS (SELECT doc_id, token, count(*) c FROM occ GROUP BY 1, 2),
tf AS (SELECT token, count(*) tf FROM occ GROUP BY 1)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * tf) AS BIGINT) / CAST(sum(c) AS BIGINT) AS mean_tf,
       CAST(min(tf) AS BIGINT) AS min_tf
FROM per_doc JOIN tf USING (token)
GROUP BY 1
"""


# --- embedding-cosine near-dup (semantic dedup) ------------------------------


def q_dedup_semantic(spark, sf_dir):
    """Embedding-cosine near-dup DECISION table: exact cosine pairs
    over threshold → connected components → (vec_id, keep_id). The
    oracle recomputes the pairs and closes them with a recursive CTE,
    so the driver hash-checks the full semantic-dedup decision. At
    scale the pair source swaps to a banded/IVF candidate generator
    via ``semantic_dedup(candidate_pairs=...)``; the component logic
    is shared."""
    emb = _t(spark, sf_dir, "embeddings")
    return DD.semantic_dedup(emb, "vec_id", "embedding", threshold=0.4)


_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /"
    " (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)

DEDUP_SEMANTIC_SQL = f"""
WITH RECURSIVE
p AS (
  SELECT a.vec_id id_a, b.vec_id id_b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id AND {_COS} > 0.4),
edges AS (SELECT id_a a, id_b b FROM p UNION SELECT id_b, id_a FROM p),
walk(s, d) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT w.s, e.b FROM walk w JOIN edges e ON w.d = e.a),
comp AS (SELECT s AS vec_id, min(d) AS keep_id FROM walk GROUP BY 1)
SELECT e.vec_id, COALESCE(c.keep_id, e.vec_id) AS keep_id
FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.vec_id
"""


# --- composite: full pretraining-corpus build --------------------------------


def q_pretrain_pipeline(spark, sf_dir):
    """The end-to-end pretraining-data build, chaining this engine's
    stages in production order: exact dedup (keep min doc per content
    hash) → PII redaction (on the deterministically planted corpus, so
    the scrub stage has real work) → quality + language filter on the
    CLEANED text → deterministic train/val/test split. Emits
    (doc_id, split, n_tokens, clean) — the driver hash-checks the
    redacted text and the split assignment through the whole chain.
    Every stage is a narrow map or one hash-groupBy; nothing quadratic."""
    docs = _t(spark, sf_dir, "documents")
    kept = DD.exact_dedup(docs, "doc_id", "text")
    planted = kept.select("doc_id", _planted_pii_text().alias("text"))
    clean = planted.select(
        "doc_id", TXT.redact_pii(F.col("text")).alias("clean")
    )
    c = F.col("clean")
    h = _knuth_h(F.col("doc_id"))
    split = (
        F.when(h * 100 < F.lit(90) * F.lit(_2_32), "train")
        .when(h * 100 < F.lit(95) * F.lit(_2_32), "val")
        .otherwise("test")
    )
    return (
        clean.select(
            "doc_id",
            "clean",
            split.alias("split"),
            TXT.token_count(c).alias("n_tokens"),
            TXT.quality_score(c).alias("quality"),
            TXT.lang_id(c).alias("lang_pred"),
        )
        .filter((F.col("quality") > 0.5) & (F.col("lang_pred") == "en"))
        .select("doc_id", "split", "n_tokens", "clean")
    )


# the cleaned CTE re-aliases the redacted text AS text, so the shared
# _TOKS/_duck_hits fragments (which name the column `text`) apply to
# the cleaned corpus verbatim
PRETRAIN_PIPELINE_SQL = f"""
WITH kept AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))),
{_planted_sql("kept")},
cleaned AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(text,
        '{_PII_EMAIL}', '<EMAIL>', 'g'),
        '{_PII_PHONE}', '<PHONE>', 'g'),
        '{_PII_IP}', '<IPV4>', 'g') AS text
  FROM planted),
scored AS (
  SELECT doc_id, text AS clean,
    CASE WHEN ({{H}}) * 100 < 90 * {_2_32} THEN 'train'
         WHEN ({{H}}) * 100 < 95 * {_2_32} THEN 'val'
         ELSE 'test' END AS split,
    CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
    (least(len({_TOKS}) / 100.0, 1.0) * 0.4
     + least({_duck_hits("en")} / greatest(len({_TOKS}), 1) * 4.0, 1.0) * 0.3)
     + greatest(1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1) * 5.0, 0.0) * 0.3 AS quality,
    CASE
      WHEN {_duck_hits("en")} + {_duck_hits("es")} + {_duck_hits("de")} + {_duck_hits("fr")} = 0 THEN 'und'
      WHEN {_duck_hits("en")} >= {_duck_hits("es")} AND {_duck_hits("en")} >= {_duck_hits("de")} AND {_duck_hits("en")} >= {_duck_hits("fr")} THEN 'en'
      WHEN {_duck_hits("es")} >= {_duck_hits("de")} AND {_duck_hits("es")} >= {_duck_hits("fr")} THEN 'es'
      WHEN {_duck_hits("de")} >= {_duck_hits("fr")} THEN 'de'
      ELSE 'fr'
    END AS lang_pred
  FROM cleaned)
SELECT doc_id, split, n_tokens, clean FROM scored
WHERE quality > 0.5 AND lang_pred = 'en'
""".replace("{H}", _H_SQL)


QUERIES = {
    "pipeline_clean_corpus": q_clean_corpus,
    "pipeline_pretrain_corpus": q_pretrain_pipeline,
    "embedding_quantize_int8": q_embedding_quantize,
    "dup_span_stats": q_dup_span_stats,
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard_ngram": q_dedup_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_components": q_dedup_components,
    "chunk_documents": q_chunk_documents,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_topk,
    "ann_cosine_lsh": q_ann_lsh,
    "ann_cosine_ivf": q_ann_ivf,
    "ann_cosine_pq": q_ann_pq,
    "ann_cosine_ivf_pq": q_ann_ivf_pq,
    "ann_cosine_ivf_exact": q_ann_ivf_exact,
    "ann_cosine_pq_exact": q_ann_pq_exact,
    "ann_cosine_ivf_pq_exact": q_ann_ivf_pq_exact,
    "embedding_cosine_pairs": q_cosine_pairs,
    "text_metrics": q_text_metrics,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_fingerprint,
    "doc_length_histogram": q_length_histogram,
    "bigram_stats": q_bigram_stats,
    "sample_balanced_lang": q_sample_balanced_lang,
    "split_train_val_test": q_split_train_val_test,
    "salted_join_orders": q_salted_join_orders,
    "pii_scrub": q_pii_scrub,
    "quality_repetition": q_quality_repetition,
    "token_doc_freq": q_token_doc_freq,
    "doc_rarity_score": q_doc_rarity,
    "dedup_semantic": q_dedup_semantic,
}

ORACLES = {
    "pipeline_clean_corpus": CLEAN_CORPUS_SQL,
    "pipeline_pretrain_corpus": PRETRAIN_PIPELINE_SQL,
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_SQL,
    "dup_span_stats": DUP_SPAN_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_jaccard_ngram": _JACCARD_SQL,
    "dedup_minhash_lsh": _jaccard_sql(5),
    "dedup_components": DEDUP_COMPONENTS_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    # hash-green since round 5 via the poly257 family; caps provably
    # inert on the test corpora so the plain all-pairs oracle is exact
    "dedup_simhash": SIMHASH_SQL,
    # ann_cosine_lsh / ann_cosine_ivf (+pq variants): rows-only
    # (engine-specific hashes / cluster assignments)
    "ann_cosine_topk": ANN_TOPK_SQL,
    # exhaustive-parameter parity: the approximate paths degenerate to
    # exact top-k, so they share the brute-force oracle
    "ann_cosine_ivf_exact": ANN_TOPK_SQL,
    "ann_cosine_pq_exact": ANN_TOPK_SQL,
    "ann_cosine_ivf_pq_exact": ANN_TOPK_SQL,
    "embedding_cosine_pairs": COSINE_PAIRS_SQL,
    "text_metrics": TEXT_METRICS_SQL,
    "lang_id": LANG_ID_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "doc_length_histogram": LENGTH_HIST_SQL,
    "bigram_stats": BIGRAM_STATS_SQL,
    "sample_balanced_lang": SAMPLE_BALANCED_SQL,
    "split_train_val_test": SPLIT_SQL,
    "salted_join_orders": SALTED_JOIN_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "quality_repetition": QUALITY_REPETITION_SQL,
    "token_doc_freq": TOKEN_DOC_FREQ_SQL,
    "doc_rarity_score": DOC_RARITY_SQL,
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
}
