"""Scale-curve rehearsal: wall-clock vs corpus size for the WIDE
operators (the ones whose 100 TB posture rests on plan-shape
arguments — this measures the shape empirically).

Builds a 10x documents/embeddings pair from sf0.1 with the duplicate
RATE held constant (the property that makes the scale-up fair):

- documents: each replica k applies a per-replica alphabet ROTATION to
  the text (``translate``), so near-dup structure is preserved WITHIN
  a replica (the same substitution applies to both members of every
  pair) while shingles are DISJOINT across replicas — duplicate-pair
  count scales exactly 10x with the corpus, not 100x as naive
  replication would (10 exact copies of each doc would square the
  per-group pair count and measure the DATA, not the engine).
- embeddings: each replica k flips a per-replica sign pattern onto the
  components (a diagonal orthogonal transform) — within-replica cosine
  is preserved EXACTLY, cross-replica pairs decorrelate to the random
  baseline.

Then times, engine side only (correctness is the driver's + the sf0.1
oracle sweep's job; this answers "does the wall grow ~linearly?"):
dedup_minhash_lsh, dedup_simhash, dedup_components, dup_span_stats,
pack_sequences (declared queries, (spark, sf_dir)), and the semdedup
scale path (operators/semdedup.py) with k scaled linearly so expected
cluster size stays constant — the module's documented scale recipe.

Usage:
  python tools/scale_curve.py [--runs 3] [--dir /tmp/spark_graft_scale10x]
Prints a per-query table of 1x vs 10x medians and ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1X = "/root/testdata/sf0.1"
REPLICAS = 10
ID_STRIDE = 100_000_000

QUERY_NAMES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "dup_span_stats",
    "pack_sequences",
    "decontaminate_ngram",
    "excise_dup_spans",
    "chunk_cdc",
    "dedup_exact",
]

# embeddings at sf0.1 are 2,000 x 64-dim; semdedup k=32 is the bench
# diag's validated 1x fit — scale k linearly so E[cluster size] holds
SEMDEDUP_K_1X = 32


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def build_10x(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF1X}/documents.parquet")
    emb = spark.read.parquet(f"{SF1X}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])

    lo, up, dg = string.ascii_lowercase, string.ascii_uppercase, string.digits
    doc_parts = []
    emb_parts = []
    for k in range(REPLICAS):
        src = lo + up + dg
        dst = _rot(lo, k) + _rot(up, k) + _rot(dg, k)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # deterministic per-(replica, component) sign pattern
        signs = F.array(
            *[
                F.lit(1.0 if ((k * 37 + i * 13) % 5) % 2 == 0 else -1.0)
                for i in range(dim)
            ]
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + k * ID_STRIDE).alias("vec_id"),
                F.zip_with(
                    "embedding", signs, lambda x, s: (x * s).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    d10 = doc_parts[0]
    e10 = emb_parts[0]
    for p in doc_parts[1:]:
        d10 = d10.unionByName(p)
    for p in emb_parts[1:]:
        e10 = e10.unionByName(p)
    d10.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    e10.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def _time_median(fn, runs: int) -> float:
    from solana_snapshot_etl_tools_spark.operators.dedup import (
        release_session_caches,
    )

    walls = []
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        walls.append(time.time() - t0)
        assert n >= 0
        release_session_caches()
    return round(statistics.median(walls), 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/spark_graft_scale10x")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from solana_snapshot_etl_tools_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="scale_curve")
    if args.rebuild or not os.path.isdir(f"{args.dir}/documents.parquet"):
        print("building 10x corpus ...", file=sys.stderr, flush=True)
        build_10x(spark, args.dir)
    n1 = spark.read.parquet(f"{SF1X}/documents.parquet").count()
    n10 = spark.read.parquet(f"{args.dir}/documents.parquet").count()
    assert n10 == REPLICAS * n1, (n1, n10)

    queries = entry_mod.queries()
    # JVM/footer/Python-worker warm (not counted)
    queries["dup_span_stats"](spark, SF1X).count()

    def _semdedup(sf_dir: str, k: int):
        from solana_snapshot_etl_tools_spark.operators.semdedup import semdedup

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return lambda: semdedup(e, k=k, threshold=0.9).count()

    rows = []
    load0 = os.getloadavg()
    for name in QUERY_NAMES:
        fn = queries[name]
        w1 = _time_median(lambda: fn(spark, SF1X).count(), args.runs)
        w10 = _time_median(lambda: fn(spark, args.dir).count(), args.runs)
        rows.append((name, w1, w10))
    w1 = _time_median(_semdedup(SF1X, SEMDEDUP_K_1X), args.runs)
    w10 = _time_median(
        _semdedup(args.dir, SEMDEDUP_K_1X * REPLICAS), args.runs
    )
    rows.append(("semdedup_scalepath", w1, w10))
    load1 = os.getloadavg()

    print(f"{'operator':24} {'1x_sec':>8} {'10x_sec':>8} {'ratio':>7}")
    out = {}
    for name, a, b in rows:
        print(f"{name:24} {a:8.2f} {b:8.2f} {b / a:7.2f}")
        out[name] = {"x1": a, "x10": b, "ratio": round(b / a, 2)}
    print(
        json.dumps(
            {
                "metric": "scale_curve_10x",
                "runs": args.runs,
                "docs_1x": n1,
                "docs_10x": n10,
                "loadavg_bracket": [load0, load1],
                "operators": out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
