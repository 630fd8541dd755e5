"""Persistable Bloom-filter sidecar for index probes.

The incremental-dedup probe's first step is an equi-join of the
shard's exact keys against the persisted index's key column — a
shuffle whose index side is corpus-sized. At typical duplicate rates
almost every shard key MISSES: a Bloom filter over the index keys,
persisted beside the index and orders of magnitude smaller, answers
"definitely absent" map-side, so only the (few) possible hits ever
reach the join. False positives only ADD join work, never change the
answer; false negatives cannot occur by construction.

Spark-first shape:

- the key is hashed JVM-side (``xxhash64`` twice, independent salts)
  BEFORE any Python stage — the Arrow batches carry two int64
  columns, never strings/text, and bit positions come from standard
  double hashing (Kirsch-Mitzenmacher: ``h1 + i*h2 mod m``);
- the filter is built distributed: each input partition emits sparse
  (chunk, bits) updates for the 1 MiB chunks it touched, one shuffle
  groups by chunk, and a tiny ``applyInPandas`` ORs each chunk's
  updates — no driver-side pass over the data, no unbounded collect;
- the result is an ordinary DataFrame of (chunk, bits) rows plus
  embedded (m_bits, n_hashes) parameters — persist/load it like any
  parquet table;
- membership is one ``mapInPandas`` with the ASSEMBLED filter in the
  closure (loud size cap — a filter too big to ship to executors
  should be partitioned by key range instead), testing k bit probes
  per row vectorized in numpy.

Sizing follows the standard formulas: ``m = -n ln p / (ln 2)^2``,
``k = (m/n) ln 2``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

CHUNK_BITS = 8 * 1024 * 1024  # 1 MiB chunks
# filters ship inside task closures — past this the right design is
# range-partitioned sub-filters, not a bigger broadcast
MAX_BLOOM_BYTES = 512 * 1024 * 1024
_SALT2 = "bloom-h2"


def _params(expected_items: int, fpp: float) -> tuple[int, int]:
    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    # whole chunks: the chunk count is part of the position arithmetic
    m = max(CHUNK_BITS, ((m + CHUNK_BITS - 1) // CHUNK_BITS) * CHUNK_BITS)
    k = max(1, round(m / n * math.log(2)))
    if m // 8 > MAX_BLOOM_BYTES:
        raise ValueError(
            f"bloom filter of {m // 8} bytes exceeds MAX_BLOOM_BYTES "
            f"({MAX_BLOOM_BYTES}) — partition the key space into "
            "range-keyed sub-filters instead of one giant closure"
        )
    return m, k


def _hashed(df: DataFrame, cols) -> DataFrame:
    cs = [F.col(c) for c in cols]
    return df.select(
        F.xxhash64(*cs).alias("_h1"),
        F.xxhash64(*cs, F.lit(_SALT2)).alias("_h2"),
    )


def _positions(h1, h2, k: int, m: int):
    """(rows, k) bit positions via double hashing — numpy uint64
    arithmetic, wraparound is part of the scheme."""
    import numpy as np

    a = h1.to_numpy().astype(np.uint64)
    b = h2.to_numpy().astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (a[:, None] + i * b[:, None]) % np.uint64(m)


def bloom_build(
    df: DataFrame,
    cols,
    expected_items: int | None = None,
    fpp: float = 0.01,
    m_bits: int | None = None,
    n_hashes: int | None = None,
) -> DataFrame:
    """Build the filter over ``xxhash64(cols)`` of every row. Returns
    a (chunk int, bits binary, m_bits long, n_hashes int) DataFrame —
    only chunks with at least one set bit are materialized, so a
    filter sized for a billion keys but built over a million is still
    small on disk. Persist with plain parquet.

    ``expected_items`` sizes the filter (default: ``df.count()`` —
    one cheap aggregate). Size for the INDEX the filter will grow
    into, not today's row count, when the sidecar is appended to.
    APPEND contract: chunk-row frames from several builds UNION into
    one valid filter (``_assemble`` ORs same-chunk rows) iff every
    build used the same ``(m_bits, n_hashes)`` — pass them explicitly
    (e.g. read from the existing sidecar) when growing a filter
    incrementally, as the streaming ingest loop does."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if (m_bits is None) != (n_hashes is None):
        raise ValueError("m_bits and n_hashes go together")
    if isinstance(cols, str):
        cols = [cols]
    if m_bits is not None:
        if m_bits % CHUNK_BITS or m_bits // 8 > MAX_BLOOM_BYTES:
            raise ValueError(
                f"m_bits must be a CHUNK_BITS multiple within "
                f"MAX_BLOOM_BYTES, got {m_bits}"
            )
        m, k = m_bits, max(1, int(n_hashes))
    else:
        if expected_items is None:
            expected_items = df.count()
        m, k = _params(expected_items, fpp)

    def sparse_updates(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            pos = _positions(pdf["_h1"], pdf["_h2"], k, m).ravel()
            chunks = (pos // CHUNK_BITS).astype(np.int64)
            out_c, out_b = [], []
            for c in np.unique(chunks):
                local = pos[chunks == c] - c * CHUNK_BITS
                bits = np.zeros(CHUNK_BITS // 8, dtype=np.uint8)
                # little-endian within a byte: bit j of byte j//8
                np.bitwise_or.at(
                    bits, local // 8, (1 << (local % 8)).astype(np.uint8)
                )
                out_c.append(int(c))
                out_b.append(bits.tobytes())
            yield pd.DataFrame({"chunk": out_c, "bits": out_b})

    def or_group(key, pdf):
        import numpy as np
        import pandas as pd

        acc = np.zeros(CHUNK_BITS // 8, dtype=np.uint8)
        for blob in pdf["bits"]:
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame({"chunk": [key[0]], "bits": [acc.tobytes()]})

    partials = _hashed(df, cols).mapInPandas(
        sparse_updates, "chunk int, bits binary"
    )
    merged = partials.groupBy("chunk").applyInPandas(
        or_group, "chunk int, bits binary"
    )
    return merged.select(
        "chunk", "bits", F.lit(m).alias("m_bits"), F.lit(k).alias("n_hashes")
    )


def _assemble(bloom: DataFrame):
    """Collect the chunk rows into one numpy bit array (loud size
    cap) plus (m, k). Absent chunks are all-zero; SAME-chunk rows OR
    together — an appended sidecar (several builds with shared params
    unioned/partition-appended) assembles to the filter over the
    union of their key sets. Mixed parameters are a corrupt store and
    raise."""
    import numpy as np

    rows = bloom.select("chunk", "bits", "m_bits", "n_hashes").collect()
    if not rows:
        return None
    m, k = int(rows[0].m_bits), int(rows[0].n_hashes)
    for r in rows:
        if int(r.m_bits) != m or int(r.n_hashes) != k:
            raise ValueError(
                "bloom chunk rows disagree on (m_bits, n_hashes) — "
                "appended builds must share parameters"
            )
    if m // 8 > MAX_BLOOM_BYTES:
        raise ValueError(
            f"bloom filter of {m // 8} bytes exceeds MAX_BLOOM_BYTES"
        )
    arr = np.zeros(m // 8, dtype=np.uint8)
    step = CHUNK_BITS // 8
    for r in rows:
        c = int(r.chunk)
        arr[c * step:(c + 1) * step] |= np.frombuffer(r.bits, dtype=np.uint8)
    return arr, m, k


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    cols,
    flag_col: str = "might_contain",
) -> DataFrame:
    """All input columns plus a boolean ``flag_col``: False means the
    key is DEFINITELY not in the set the filter was built over; True
    means "possibly present" at the filter's fpp. The assembled filter
    rides the task closure; the test is k vectorized bit probes per
    row — map-side, zero shuffle."""
    if isinstance(cols, str):
        cols = [cols]
    packed = _assemble(bloom)
    if packed is None:
        return df.withColumn(flag_col, F.lit(False))
    arr, m, k = packed
    from pyspark.sql.types import BooleanType, StructField, StructType

    # NEVER df.schema.add(...): StructType.add mutates in place, and
    # df.schema is a cached object — the phantom column would pollute
    # the INPUT frame's schema for every later caller
    out_schema = StructType(
        list(df.schema.fields) + [StructField(flag_col, BooleanType())]
    )
    cs = [F.col(c) for c in cols]
    work = df.withColumn("_h1", F.xxhash64(*cs)).withColumn(
        "_h2", F.xxhash64(*cs, F.lit(_SALT2))
    )

    def test(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            pos = _positions(pdf["_h1"], pdf["_h2"], k, m)
            hit = (arr[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            flags = hit.all(axis=1)
            out = pdf.drop(columns=["_h1", "_h2"])
            out[flag_col] = flags
            yield out

    return work.mapInPandas(test, out_schema)


# ship the pandas kernels inside the task — workers do not share the
# driver's sys.path (see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)


# --- sharded filters (past the closure cap) --------------------------------------
#
# One filter bigger than MAX_BLOOM_BYTES cannot ride a task closure.
# The scale design the module docstring promises: split the KEY SPACE
# into shards (a hash of the key, NOT of the bit positions), give
# every shard its own right-sized filter, persist them as one parquet
# table partitioned by shard, and probe by repartitioning the probe
# frame on the shard key — each task then loads ONLY its shards'
# chunk rows from storage (partition-pruned parquet read, executor-
# side) and holds one shard's bit array at a time. Memory per task =
# one shard, not the filter.

_SHARD_SALT = "bloom-shard"


def bloom_build_sharded(
    df: DataFrame,
    cols,
    n_shards: int,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """(shard, chunk, bits, m_bits, n_hashes, n_shards) rows — write
    with ``.partitionBy("shard")`` so probes prune to their shards.
    Sizing is per shard (``expected_items / n_shards``); keys route to
    shards by an INDEPENDENT hash salt, so shard skew is the binomial
    spread, not data skew."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if isinstance(cols, str):
        cols = [cols]
    if expected_items is None:
        expected_items = df.count()
    per_shard = max(1, -(-expected_items // n_shards))
    m, k = _params(per_shard, fpp)
    cs = [F.col(c) for c in cols]
    shard = F.pmod(F.xxhash64(*cs, F.lit(_SHARD_SALT)), F.lit(n_shards))
    keyed = df.select(
        shard.alias("_shard"),
        F.xxhash64(*cs).alias("_h1"),
        F.xxhash64(*cs, F.lit(_SALT2)).alias("_h2"),
    )

    def sparse_updates(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_s, out_c, out_b = [], [], []
            for s in pdf["_shard"].unique():
                sub = pdf[pdf["_shard"] == s]
                pos = _positions(sub["_h1"], sub["_h2"], k, m).ravel()
                chunks = (pos // CHUNK_BITS).astype(np.int64)
                for c in np.unique(chunks):
                    local = pos[chunks == c] - c * CHUNK_BITS
                    bits = np.zeros(CHUNK_BITS // 8, dtype=np.uint8)
                    np.bitwise_or.at(
                        bits, local // 8, (1 << (local % 8)).astype(np.uint8)
                    )
                    out_s.append(int(s))
                    out_c.append(int(c))
                    out_b.append(bits.tobytes())
            yield pd.DataFrame(
                {"shard": out_s, "chunk": out_c, "bits": out_b}
            )

    def or_group(key, pdf):
        import numpy as np
        import pandas as pd

        acc = np.zeros(CHUNK_BITS // 8, dtype=np.uint8)
        for blob in pdf["bits"]:
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame(
            {"shard": [key[0]], "chunk": [key[1]], "bits": [acc.tobytes()]}
        )

    partials = keyed.mapInPandas(
        sparse_updates, "shard int, chunk int, bits binary"
    )
    merged = partials.groupBy("shard", "chunk").applyInPandas(
        or_group, "shard int, chunk int, bits binary"
    )
    return merged.select(
        "shard", "chunk", "bits",
        F.lit(m).alias("m_bits"), F.lit(k).alias("n_hashes"),
        F.lit(n_shards).alias("n_shards"),
    )


def bloom_might_contain_sharded(
    df: DataFrame,
    bloom_path: str,
    cols,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Probe a sharded filter persisted at ``bloom_path`` (written by
    ``bloom_build_sharded(...).write.partitionBy("shard")``): the
    probe frame repartitions on the shard key, and each task loads
    ONLY its shards' chunk rows via a partition-pruned parquet read —
    executor-side, one shard's bit array in memory at a time. Same
    contract as :func:`bloom_might_contain`: False = definitely
    absent, no false negatives."""
    import os

    if isinstance(cols, str):
        cols = [cols]
    spark = df.sparkSession
    meta = spark.read.parquet(bloom_path).select(
        "m_bits", "n_hashes", "n_shards"
    ).first()
    if meta is None:
        return df.withColumn(flag_col, F.lit(False))
    m, k, n_shards = int(meta.m_bits), int(meta.n_hashes), int(meta.n_shards)
    # the path must be worker-resolvable; make local paths absolute
    path = bloom_path if "://" in bloom_path else os.path.abspath(bloom_path)

    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(flag_col, BooleanType())]
    )
    cs = [F.col(c) for c in cols]
    work = (
        df.withColumn(
            "_shard",
            F.pmod(F.xxhash64(*cs, F.lit(_SHARD_SALT)), F.lit(n_shards)),
        )
        .withColumn("_h1", F.xxhash64(*cs))
        .withColumn("_h2", F.xxhash64(*cs, F.lit(_SALT2)))
        .repartition(n_shards, F.col("_shard"))
    )

    def test(batches):
        import numpy as np
        import pyarrow.dataset as ds

        step = CHUNK_BITS // 8
        cache: dict[int, np.ndarray] = {}

        def load(s: int) -> np.ndarray:
            if s not in cache:
                # a task sees the few shards hashing to its partition;
                # keep them all (bounded by shards-per-partition)
                tbl = ds.dataset(path, format="parquet",
                                 partitioning="hive").to_table(
                    columns=["chunk", "bits"],
                    filter=ds.field("shard") == s,
                )
                arr = np.zeros(m // 8, dtype=np.uint8)
                for c, blob in zip(
                    tbl.column("chunk").to_pylist(),
                    tbl.column("bits").to_pylist(),
                ):
                    arr[c * step:(c + 1) * step] |= np.frombuffer(
                        blob, dtype=np.uint8
                    )
                cache[s] = arr
            return cache[s]

        for pdf in batches:
            if not len(pdf):
                continue
            flags = np.zeros(len(pdf), dtype=bool)
            for s in pdf["_shard"].unique():
                mask = (pdf["_shard"] == s).to_numpy()
                sub = pdf[mask]
                arr = load(int(s))
                pos = _positions(sub["_h1"], sub["_h2"], k, m)
                hit = (arr[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
                flags[mask] = hit.all(axis=1)
            out = pdf.drop(columns=["_shard", "_h1", "_h2"])
            out[flag_col] = flags
            yield out

    return work.mapInPandas(test, out_schema)
