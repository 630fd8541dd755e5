"""Z-order (Morton) clustering: multi-column file pruning at scale.

Sorting a 100 TB table on one column makes parquet min/max row-group
pruning perfect for THAT column and useless for every other. When
readers filter on two or three columns (time AND key; lat AND lon),
interleaving the columns' bits into one Morton key and
range-partitioning on it gives every file a small bounding box in ALL
dimensions — each filter column prunes most files, at the cost of
none being perfectly sorted.

Everything here is pure JVM column expressions (shift/mask/sum inside
whole-stage codegen) plus one tiny min/max aggregation per write — no
UDFs, no driver-side data.

Mechanics: each column is affinely scaled to an unsigned ``bits``-wide
integer grid using its own min/max (one agg row), then bits are
interleaved round-robin (column i owns bit positions ``i, i+n,
i+2n...``). ``write_zordered`` range-partitions on the key so files
are Morton-contiguous, and drops the key before writing (it is a
layout artifact, not data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton key column for ``cols`` (2–4 numeric columns).

    ``ranges`` pins each column's (min, max) scaling window; omitted
    columns are measured with one aggregation over ``df``. Pass
    explicit ranges when writing many increments of one table — a
    per-increment min/max would give each increment a different grid,
    which stays CORRECT (the key never leaves the writer) but makes
    file bounding boxes less comparable across increments.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"z-order wants 2-4 columns, got {len(cols)}")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    n = len(cols)
    if bits is None:
        bits = 63 // n  # keep the interleaved key inside a signed long
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")

    need = [c for c in cols if not (ranges and c in ranges)]
    measured: dict[str, tuple[float, float]] = dict(ranges or {})
    if need:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in need],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in need],
        ).collect()[0]
        for c in need:
            measured[c] = (row[f"mn_{c}"], row[f"mx_{c}"])

    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = measured[c]
        if mn is None or mx is None:
            raise ValueError(f"column {c!r} is all-NULL; cannot scale")
        span = (mx - mn) or 1.0
        # affine map to [0, 2^bits); NULL sorts to cell 0
        cell = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.coalesce(F.col(c).cast("double"), F.lit(mn)) - F.lit(mn))
                    / F.lit(span)
                    * F.lit(float(top) + 1.0)
                ),
            ),
        ).cast("long")
        # spread bit b of the cell to interleaved position b*n + i
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    *,
    num_files: int,
    bits: int | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as ``num_files`` Morton-contiguous parquet files.

    Each output file covers a compact hyper-box in all ``cols``, so a
    reader filtering on ANY of them skips most files via parquet
    min/max statistics — the multi-dimensional analog of a sorted
    write. One range shuffle, same cost as any global sort-write.
    """
    key = zorder_key(df, cols, bits=bits, ranges=ranges)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out_dir)
    )


def file_pruning_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max spans for ``cols`` — the pruning a layout buys.

    Returns one row per parquet file with ``<col>_lo / <col>_hi`` and
    ``<col>_span_frac`` (file span / global span). Mean span_frac is
    roughly the fraction of files a uniform point filter on that
    column must read: 1.0 = no pruning, 1/n_files = perfect."""
    df = spark.read.parquet(path)
    per_file = df.groupBy(F.input_file_name().alias("file")).agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}_lo") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"{c}_hi") for c in cols],
    )
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"g_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"g_hi_{c}") for c in cols],
    )
    out = per_file.crossJoin(F.broadcast(bounds))
    for c in cols:
        span = F.col(f"g_hi_{c}") - F.col(f"g_lo_{c}")
        out = out.withColumn(
            f"{c}_span_frac",
            F.when(span == 0, F.lit(1.0)).otherwise(
                (F.col(f"{c}_hi") - F.col(f"{c}_lo")) / span
            ),
        )
    return out.select(
        "file",
        *[x for c in cols for x in (f"{c}_lo", f"{c}_hi", f"{c}_span_frac")],
    )
