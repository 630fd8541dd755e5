"""Document deduplication operators: exact, n-gram Jaccard, MinHash
LSH, SimHash.

Scale posture (100 TB):
- exact dedup is one hash-groupBy (map-side combined);
- exact pairwise Jaccard is quadratic in documents sharing a shingle —
  correct at validation scale, and the *verification* step of LSH;
- MinHash LSH is the scale path: signatures are one groupBy over
  exploded shingles, banding turns near-dup search into an equi-join
  on (band, signature) — no cross join anywhere;
- SimHash is one groupBy producing a 64-bit sketch per doc, with
  banded Hamming join for candidates.

All hash functions are Spark's xxhash64 with fixed integer salts —
deterministic across runs/partitions, no Python RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions.text import char_shingles, tokens


# --- exact dedup --------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with
    the kept representative (min id) and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated table itself: keep min-id row per content hash."""
    h = F.md5(F.col(text_col).cast("binary"))
    keep = (
        df.select(F.col(id_col).alias("_id"), h.alias("_h"))
        .groupBy("_h")
        .agg(F.min("_id").alias(id_col))
        .drop("_h")
    )
    return df.join(keep, id_col, "left_semi")


# --- exact n-gram Jaccard pairs -----------------------------------------------


def shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(char_shingles(F.col(text_col), k)).alias("sh"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b,
    jaccard > threshold).

    ``max_doc_freq`` optionally drops shingles present in more than
    that many documents before pairing — the standard guard against
    the quadratic blow-up on ubiquitous shingles at scale (changes
    candidate generation only; verification below stays exact because
    dropped shingles are still counted in the set sizes).
    """
    sh = shingle_sets(df, id_col, text_col, k)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    pair_src = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.countDistinct("doc").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("sh")
        )
        pair_src = sh.join(rare, "sh")
    a = pair_src.select(F.col("doc").alias("doc_a"), "sh")
    b = pair_src.select(F.col("doc").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") > threshold)
    )


# --- MinHash + LSH --------------------------------------------------------------

N_HASHES = 64
LSH_BANDS = 16  # r = N_HASHES / LSH_BANDS = 4 rows per band


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, n_hashes: int = N_HASHES
) -> DataFrame:
    """One row per doc with an array of n_hashes minhash values.
    Each family member is xxhash64 salted with its index; one shuffle
    (groupBy doc), partial-aggregated map-side. (A double-hashing
    h1^rot(h2,i) variant was benchmarked and lost: the 64 min-agg
    buffers dominate the stage, and the weaker family inflated LSH
    candidates ~10%.)"""
    sh = shingle_sets(df, id_col, text_col, k)
    return _signatures_from_shingles(sh, n_hashes)


def _signatures_from_shingles(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc").agg(*mins)
    return sig.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    sig: DataFrame, bands: int = LSH_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """Band the signature and equi-join on (band, band_hash): docs
    agreeing on all rows of any band become candidate pairs."""
    r = n_hashes // bands
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias(
                            "bh"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("doc", "e.band", "e.bh")
    a = banded.select(F.col("doc").alias("doc_a"), "band", "bh")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification.

    Three-stage scale design (no quadratic stage anywhere):
    1. banded signature equi-join → candidate pairs
       (recall ≥ 1-(1-t^r)^b ≈ 99.98% at t=0.8 with r=4, b=16);
    2. cheap estimate filter: fraction of agreeing minhashes ≥
       threshold-0.1 — O(n_hashes) per candidate, no shingle access.
       On corpora with high background similarity (this synthetic set
       averages 0.44 jaccard between random docs) banding alone
       passes a large share of all pairs; the estimate filter cuts
       them before the expensive stage;
    3. exact Jaccard verification via shingle join, restricted to the
       est-filter survivors → output precision 1.0.
    The shingle explode (the most expensive narrow stage) is computed
    once and cached — it feeds both the signature aggregation and the
    verification sets; signatures are cached for stages 1+2.
    """
    sh_cached = shingle_sets(df, id_col, text_col, k).cache()
    sig = _signatures_from_shingles(sh_cached).cache()
    cands = minhash_lsh_candidates(sig)
    sa = sig.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (agree / F.size("sig_a")).alias("est"))
        .filter(F.col("est") >= threshold - 0.1)
        .select("doc_a", "doc_b")
    )
    # exact verification by array intersection: per surviving pair,
    # O(|set_a|+|set_b|) JVM work — far cheaper than re-exploding
    # shingles into a pair-wise join when the estimate filter still
    # passes tens of thousands of borderline background pairs
    sh_sets = (
        sh_cached.groupBy("doc")
        .agg(F.collect_set("sh").alias("shs"), F.count(F.lit(1)).alias("n"))
    )
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        est.join(
            sh_sets.select(
                F.col("doc").alias("doc_a"),
                F.col("shs").alias("shs_a"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            sh_sets.select(
                F.col("doc").alias("doc_b"),
                F.col("shs").alias("shs_b"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") > threshold)
    )


# --- SimHash ---------------------------------------------------------------------


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum +1/-1 votes
    of each token's xxhash64 bit; sign → bit. One explode + one
    groupBy; the sketch is 8 bytes per doc regardless of doc size."""
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    h = F.xxhash64("t")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for i in range(63)
    ]
    # bit 63 would overflow a positive long literal; use the sign bit
    sign = F.when(
        F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    sketch = sign
    for t in bit_terms:
        sketch = sketch.bitwiseOR(t)
    return agg.select("doc", sketch.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 5
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming,
    using 8×8-bit band blocking (pigeonhole: a pair within distance 7
    must agree exactly on at least one 8-bit band) — equi-join
    candidates, exact Hamming verification, no cross join."""
    sk = simhash64(df, id_col, text_col)
    banded = sk.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * 8)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("bh"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("e"),
    ).select("doc", "simhash", "e.band", "e.bh")
    a = banded.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("ha"), "band", "bh")
    b = banded.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("hb"), "band", "bh")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
