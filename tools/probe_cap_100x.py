"""Hot-bucket cap machinery probe (r16 verdict Next-round #9): the
broadcast-anti shape shipped in ``_cap_hot_buckets`` vs the
repartition-once exchange-reuse variant that lost at sf0.1
(2.93-6.7 s vs 2.21 s — serializing the concurrent stages cost more
than the extra exchange). The verdict asked for a re-measure at the
100x probe scale, where stage depth matters, before any adoption.

Both arms compute the SAME candidate multiset (banded self-join with
hot buckets starred out); the variant repartitions the banded frame by
(band, bh) ONCE so the sizes groupBy and the self-join reuse a single
exchange instead of planning three.

Usage: python tools/probe_cap_100x.py <corpus_dir> [n_per_arm]
(corpus_dir from tools/scale_curve.py --scale N; use sf0.1 for 1x)
Appends a JSON line to plans/r17/probe_cap.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import dedup as DD
from solana_snapshot_etl_tools_spark.session import get_spark

CAP = DD.MINHASH_MAX_BUCKET


def candidates_current(sig):
    """The shipped shape, verbatim call."""
    return DD.minhash_lsh_candidates(sig)


def candidates_repartition_once(sig):
    """Exchange-reuse variant: band, repartition by (band, bh) once,
    derive sizes/cool/star from the SAME partitioned frame."""
    banded = DD.banded_signature_rows(sig).repartition("band", "bh")
    keys = ["band", "bh"]
    sizes = banded.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_bsz"), F.min("doc").alias("_rep")
    )
    hot = sizes.filter(F.col("_bsz") > CAP)
    cool = banded.join(F.broadcast(hot.select(*keys)), keys, "left_anti")
    a = cool.select(F.col("doc").alias("doc_a"), *keys)
    b = cool.select(F.col("doc").alias("doc_b"), *keys)
    pairs = (
        a.join(b, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    star = (
        banded.join(F.broadcast(hot), keys)
        .filter(F.col("doc") != F.col("_rep"))
        .select(F.col("_rep").alias("doc_a"), F.col("doc").alias("doc_b"))
    )
    return pairs.unionByName(star)


def main() -> None:
    corpus = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="probe_cap")
    docs = spark.read.parquet(f"{corpus}/documents.parquet").select(
        "doc_id", "text"
    )
    sig = DD.minhash_signatures(docs, "doc_id", "text", k=3).persist()
    sig.count()  # sketches out of the timed region: this probes the
    # CAP + JOIN machinery only, both arms read the same cached sig

    # same multiset both arms (candidate rows before the caller's dedup)
    n_cur = candidates_current(sig).count()
    n_rep = candidates_repartition_once(sig).count()
    assert n_cur == n_rep, (n_cur, n_rep)
    print(f"identity OK: {n_cur} candidate rows both arms", file=sys.stderr)

    load0 = os.getloadavg()
    cur_s: list[float] = []
    rep_s: list[float] = []
    for _ in range(n):
        t0 = time.time()
        candidates_current(sig).count()
        cur_s.append(time.time() - t0)
        t0 = time.time()
        candidates_repartition_once(sig).count()
        rep_s.append(time.time() - t0)
    load1 = os.getloadavg()
    out = {
        "corpus": corpus,
        "n_docs": docs.count(),
        "n_per_arm": n,
        "candidate_rows": n_cur,
        "current_runs_sec": [round(x, 3) for x in cur_s],
        "repartition_once_runs_sec": [round(x, 3) for x in rep_s],
        "current_median_sec": round(statistics.median(cur_s), 3),
        "repartition_once_median_sec": round(statistics.median(rep_s), 3),
        "loadavg_start": [round(x, 2) for x in load0],
        "loadavg_end": [round(x, 2) for x in load1],
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(__file__), "..", "plans", "r17",
                     "probe_cap.jsonl"),
        "a",
    ) as f:
        f.write(json.dumps(out) + "\n")
    sig.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
