"""Interleaved A/B: the r17 batch-flattened minhash signature kernel
(dedup.minhash_signatures at HEAD) vs the r16 per-doc kernel (inlined
below, verbatim from commit c101172) — verdict r16 Next-round #3 asked
for an isolated median -20% or a recorded negative result.

Both arms run the same spread_small_input + mapInPandas plan over the
sf0.1 documents table; the only difference is the Python kernel. Arms
are interleaved (A,B,A,B,...) so ambient load hits both equally.
Signatures are verified IDENTICAL (sorted row compare) before timing.

Usage: python tools/ab_minhash_kernel.py [n_per_arm] [sf_dir]
Writes plans/r17/ab_minhash_kernel.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from solana_snapshot_etl_tools_spark.operators import dedup as DD
from solana_snapshot_etl_tools_spark.operators.dedup import (
    N_HASHES,
    spread_small_input,
)
from solana_snapshot_etl_tools_spark.session import get_spark


def minhash_signatures_r16(df, id_col, text_col, k=3, n_hashes=N_HASHES):
    """The round-16 per-doc kernel, verbatim from c101172 (doc
    comments stripped): sliding_window_view + np.unique + full
    (n_hashes x n_shingles) mix PER DOCUMENT."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("doc", id_type),
            StructField("sig", ArrayType(LongType())),
        ]
    )

    def gen(batches):
        import numpy as np

        gold = np.uint64(0x9E3779B97F4A7C15)
        k1 = np.uint64(0xBF58476D1CE4E5B9)
        k2 = np.uint64(0x94D049BB133111EB)
        salts = (np.arange(n_hashes, dtype=np.uint64) + np.uint64(1)) * gold
        pw = np.uint64(256) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        for pdf in batches:
            ids, sigs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                b = np.frombuffer(txt.lower().encode("utf-8"), dtype=np.uint8)
                if b.size < k:
                    continue
                w = np.lib.stride_tricks.sliding_window_view(b, k)
                keys = np.unique((w.astype(np.uint64) * pw).sum(axis=1))
                z = keys[None, :] ^ salts[:, None]
                z = (z ^ (z >> np.uint64(30))) * k1
                z = (z ^ (z >> np.uint64(27))) * k2
                z = z ^ (z >> np.uint64(31))
                ids.append(did)
                sigs.append(z.min(axis=1).astype(np.int64))
            yield pd.DataFrame({"doc": ids, "sig": sigs})

    return spread_small_input(df.select(id_col, text_col)).mapInPandas(
        gen, out_schema
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab_minhash_kernel")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    new_df = lambda: DD.minhash_signatures(docs, "doc_id", "text", k=3)
    old_df = lambda: minhash_signatures_r16(docs, "doc_id", "text", k=3)

    # identity gate first: same rows, same signatures, bit for bit
    a = sorted(
        (r.doc, tuple(r.sig)) for r in new_df().collect()
    )
    b = sorted(
        (r.doc, tuple(r.sig)) for r in old_df().collect()
    )
    assert a == b, "kernel outputs differ — A/B aborted"
    print(f"identity OK: {len(a)} signatures bit-identical", file=sys.stderr)

    # warm both arms once (JIT + worker pool), then interleave
    new_df().count()
    old_df().count()
    load0 = os.getloadavg()
    new_s: list[float] = []
    old_s: list[float] = []
    for _ in range(n):
        t0 = time.time()
        new_df().count()
        new_s.append(time.time() - t0)
        t0 = time.time()
        old_df().count()
        old_s.append(time.time() - t0)
    load1 = os.getloadavg()
    out = {
        "n_per_arm": n,
        "sf_dir": sf_dir,
        "new_runs_sec": [round(x, 3) for x in new_s],
        "old_runs_sec": [round(x, 3) for x in old_s],
        "new_median_sec": round(statistics.median(new_s), 3),
        "old_median_sec": round(statistics.median(old_s), 3),
        "loadavg_start": [round(x, 2) for x in load0],
        "loadavg_end": [round(x, 2) for x in load1],
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(__file__), "..", "plans", "r17",
                     "ab_minhash_kernel.json"),
        "w",
    ) as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
