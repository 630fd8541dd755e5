"""Skew-handling join utility (100 TB posture).

AQE's skew-join split handles most cases at runtime; explicit salting
remains the tool when one join key is so hot that even split shuffle
partitions overwhelm a task (the classic case here: joining account
updates against a dim table when one program owns half the chain).

``salted_join``: append a random-ish salt (deterministic hash of a
row-unique column) to the big side's key and replicate the small side
across all salt values — the hot key's rows spread over ``salt``
partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    ``salt_source``: a column whose per-row variation spreads the hot
    key. The default hashes ALL of the big side's columns — row-unique
    in practice, so a hot key's rows spread evenly regardless of how
    they were partitioned on input. (``spark_partition_id()`` was the
    old default and is a trap: every row of one input partition lands
    in ONE salt bucket, so a hot key concentrated in few partitions
    stays concentrated.) Result is identical to the plain join
    (verified in tests); only the physical distribution changes.
    """
    src = (
        [F.col(salt_source)]
        if salt_source
        else [F.col(c) for c in big.columns] + [F.monotonically_increasing_id()]
    )
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*src), F.lit(salt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = b.join(s, [key, "_salt"], how)
    return joined.drop("_salt")
