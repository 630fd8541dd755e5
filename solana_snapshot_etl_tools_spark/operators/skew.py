"""Skew handling: diagnosis and the salted-join remedy (100 TB posture).

AQE's skew-join split handles most cases at runtime; explicit salting
remains the tool when one join key is so hot that even split shuffle
partitions overwhelm a task (the classic case here: joining account
updates against a dim table when one program owns half the chain).

``key_skew_report`` diagnoses BEFORE the expensive run: which keys are
hot, how many average-partition's-worth of rows each one carries, and
the salt factor that would flatten it. ``partition_histogram`` shows
whether the skew already exists in the INPUT layout (upstream writer
bug) rather than in the key distribution. ``salted_join`` is the
remedy: append a deterministic per-row salt to the big side's key and
replicate the small side across all salt values — the hot key's rows
spread over ``salt`` partitions instead of one.
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


def key_skew_report(
    df: DataFrame,
    key: str | list[str],
    *,
    top: int = 20,
    target_partitions: int | None = None,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> DataFrame:
    """Heavy-hitter report for a prospective shuffle key.

    Returns the ``top`` keys by row count with, per key:

    - ``key_count``  — rows carrying the key (scaled up if sampled),
    - ``share``      — fraction of all rows,
    - ``skew_ratio`` — how many *average shuffle partitions'* worth of
      rows this single key holds (``key_count / (total/partitions)``).
      1.0 is perfectly benign; 40.0 means one task gets 40 partitions
      of work and the stage's wall-clock is that straggler.
    - ``suggested_salt`` — ``ceil(skew_ratio)``: the replication
      factor ``salted_join`` needs to flatten the key back to ~1
      average partition per task. 1 means "don't salt".

    Cost model: one count-only shuffle on ``key`` (longs, never
    payload columns) plus a tiny global sum — the standard price of a
    skew diagnosis. At 100 TB pass ``sample_fraction`` (e.g. 0.01) to
    estimate from a Bernoulli sample instead; counts are rescaled so
    the report's columns keep their meaning (heavy hitters are exactly
    the keys a 1% sample still sees thousands of times, so top-N
    membership is stable under sampling).

    ``target_partitions`` defaults to the session's
    ``spark.sql.shuffle.partitions`` — on a real cluster set it to the
    stage's actual task count.
    """
    keys = [key] if isinstance(key, str) else list(key)
    for k in keys:
        if k not in df.columns:
            raise ValueError(f"key column {k!r} not in {df.columns}")
    if target_partitions is None:
        target_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    scale = 1.0
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        df = df.sample(fraction=sample_fraction, seed=seed)
        scale = 1.0 / sample_fraction

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    # Global total via a second pass over the (already aggregated)
    # counts — never a driver-side collect of the raw frame.
    totals = counts.agg(F.sum("_n").alias("_total"))
    avg_per_part = F.col("_total") / F.lit(float(target_partitions))
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("key_count", (F.col("_n") * F.lit(scale)).cast("long"))
        .withColumn("share", F.col("_n") / F.col("_total"))
        .withColumn("skew_ratio", F.col("_n") / avg_per_part)
        .withColumn(
            "suggested_salt",
            F.greatest(F.lit(1), F.ceil("skew_ratio")).cast("int"),
        )
        .orderBy(F.desc("_n"), *keys)
        .limit(top)
        .select(*keys, "key_count", "share", "skew_ratio", "suggested_salt")
    )


def partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per *input* partition: (partition_id, n_rows).

    Distinguishes layout skew (some input files/partitions are huge —
    fix the upstream writer or maxPartitionBytes) from key skew (fix
    with salting/AQE). Narrow: no shuffle of payload, one count per
    partition.
    """
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("partition_id")
    )
