"""Bucketed-table layout: pre-shuffle once, join/aggregate shuffle-free.

At 100 TB the single most expensive physical operation is the shuffle
a big-big join or a high-cardinality groupBy induces. Spark's bucketed
tables amortize that cost: `bucketBy(n, key)` hashes each row into one
of `n` buckets AT WRITE TIME, so every later sort-merge join between
two tables bucketed on the same key with the same bucket count — and
every aggregation grouped on the bucket key — runs with NO Exchange in
the plan. One write-time shuffle, unlimited shuffle-free reads.

This matters for exactly the access pattern a training-data pipeline
has: `documents` is joined on `doc_id` again and again (quality flags,
dedup verdicts, decontamination verdicts, pack assignments...). Bucket
it once on `doc_id` and every one of those joins stops moving the text
column across the wire.

The reference (VadimGrozinok/solana-snapshot-etl-tools) sidesteps the
problem by writing into SQLite and delegating joins to the database
(`src/sqlite.rs` CREATE TABLE / INSERT paths); bucketing is the
Spark-native equivalent of "give the storage layer a join-friendly
layout up front".

Cluster notes (documented behavior, asserted in tests where local mode
allows):

- Bucket metadata lives in the session catalog. On a real cluster a
  persistent metastore makes it durable; in local tests the in-memory
  catalog scopes it to the session, which is why ``write_bucketed``
  registers an EXTERNAL table (explicit ``path``) — the parquet data
  outlives the session even when the catalog entry does not, and
  ``register_bucketed`` re-attaches it.
- Shuffle-free reads need ``spark.sql.sources.bucketing.enabled=true``
  (the default) and, for the sorted-scan path, one file per bucket —
  ``write_bucketed`` enforces that with a pre-write repartition on the
  bucket key so each task writes exactly its own buckets.
- Bucket counts should be sized so one bucket of the BIG table fits an
  executor's shuffle memory: at 100 TB and 4 GiB target per bucket
  that is ~25 600 buckets; both join sides must agree, so pick the
  count from the biggest table and reuse it corpus-wide.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

SPEC_SIDECAR = "_bucket_spec.json"


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def _norm_ddl(ddl: str) -> str:
    """Formatting-insensitive DDL comparison key: backticks, case and
    whitespace runs don't change what a column list means."""
    import re

    return re.sub(r"\s+", " ", ddl.replace("`", "").lower()).strip()


def _sidecar_fs_path(spark: SparkSession, path: str):
    """(hadoop FileSystem, hadoop Path) for the sidecar — the Hadoop
    FS API so the sidecar lands beside the data on ANY scheme the
    table itself can live on (local, HDFS, object store), not just
    the local filesystem."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path, SPEC_SIDECAR)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def write_bucket_spec(spark: SparkSession, path: str, spec: dict) -> None:
    """Persist the bucket layout beside the data so a later session
    (or another engine) re-attaches with the TRUE spec instead of a
    caller's guess — a wrong declared spec silently produces wrong
    shuffle-free joins."""
    fs, p = _sidecar_fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(spec, indent=1).encode("utf-8")))
    finally:
        out.close()


def read_bucket_spec(spark: SparkSession, path: str) -> dict | None:
    """The sidecar written by ``write_bucketed``, or None if absent."""
    fs, p = _sidecar_fs_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        txt = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(txt)


def enable_sorted_bucket_scan(spark: SparkSession) -> None:
    """Let the scan report its bucket-sort order so the sort-merge
    join drops its Sort nodes too (not just the Exchange).

    Spark 3+ turned ``spark.sql.legacy.bucketedTableScan.
    outputOrdering`` off by default because the sorted-scan guarantee
    only holds with ONE file per bucket and checking that is a
    planning-time file listing. ``write_bucketed`` enforces exactly
    that layout (pre-write repartition), so for tables written here
    the conf is safe and buys a bare SortMergeJoin: no Exchange, no
    Sort, plan-asserted in tests. Do NOT set it for bucketed tables
    from other writers unless their file-per-bucket layout is known.
    """
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    *,
    bucket_col: str,
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed on ``bucket_col``.

    The pre-write ``repartition(num_buckets, bucket_col)`` makes each
    write task own whole buckets, yielding ONE file per bucket — the
    layout Spark's sorted bucket scan needs to skip both the Exchange
    and the Sort of a downstream sort-merge join. Without it, every
    task writes a sliver of every bucket and the file count explodes to
    tasks × buckets (the classic bucketed-write small-files trap).
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if bucket_col not in df.columns:
        raise ValueError(f"bucket column {bucket_col!r} not in {df.columns}")
    writer = (
        df.repartition(num_buckets, bucket_col)
        .write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    # spec sidecar: written AFTER the data so a crashed write never
    # leaves a sidecar pointing at garbage; register_bucketed reads
    # and verifies it instead of trusting the caller's memory
    write_bucket_spec(
        df.sparkSession,
        path,
        {
            "bucket_col": bucket_col,
            "num_buckets": num_buckets,
            "sort_cols": list(sort_cols or []),
            "schema_ddl": _schema_ddl(df),
        },
    )


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    *,
    schema_ddl: str | None = None,
    bucket_col: str | None = None,
    num_buckets: int | None = None,
    sort_cols: list[str] | None = None,
    trust_caller_spec: bool = False,
) -> DataFrame:
    """Re-attach an existing bucketed parquet directory as a table.

    Needed when the writing session is gone and the catalog was
    in-memory (local mode, or a fresh cluster pointing at data written
    elsewhere). Spark trusts the declared bucket spec outright, so a
    wrong spec silently produces wrong shuffle-free joins — the worst
    failure mode a layout can have. The spec therefore comes from the
    ``_bucket_spec.json`` sidecar ``write_bucketed`` leaves beside the
    data, and any caller-passed value that CONTRADICTS the sidecar is
    refused loudly. With no sidecar (data from another writer) the
    caller must pass the full spec AND ``trust_caller_spec=True`` to
    acknowledge the risk.
    """
    recorded = read_bucket_spec(spark, path)
    if recorded is None:
        if not trust_caller_spec:
            raise ValueError(
                f"no {SPEC_SIDECAR} sidecar at {path!r}; a guessed bucket "
                "spec silently mis-joins. Pass the full spec plus "
                "trust_caller_spec=True only if you are certain of the "
                "layout this data was written with"
            )
        if schema_ddl is None or bucket_col is None or num_buckets is None:
            raise ValueError(
                "trust_caller_spec=True needs the full spec: "
                "schema_ddl, bucket_col and num_buckets"
            )
    else:
        mismatches = [
            f"{k}: caller={v!r} sidecar={recorded[k]!r}"
            for k, v in (
                ("bucket_col", bucket_col),
                ("num_buckets", num_buckets),
                ("sort_cols", list(sort_cols) if sort_cols is not None else None),
            )
            if v is not None and v != recorded[k]
        ]
        # the schema gets the same contradiction check, modulo
        # formatting (backticks/case/whitespace): a stale caller DDL
        # naming a renamed column would CREATE a table whose parquet
        # name resolution silently yields all-NULL columns
        if schema_ddl is not None and _norm_ddl(schema_ddl) != _norm_ddl(
            recorded["schema_ddl"]
        ):
            mismatches.append(
                f"schema_ddl: caller={schema_ddl!r} "
                f"sidecar={recorded['schema_ddl']!r}"
            )
        if mismatches:
            raise ValueError(
                f"caller spec contradicts {SPEC_SIDECAR} at {path!r}: "
                + "; ".join(mismatches)
            )
        bucket_col = recorded["bucket_col"]
        num_buckets = recorded["num_buckets"]
        sort_cols = recorded["sort_cols"]
        schema_ddl = recorded["schema_ddl"]
    sorted_clause = ""
    if sort_cols:
        sorted_clause = f" SORTED BY ({', '.join(sort_cols)})"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({bucket_col}){sorted_clause} "
        f"INTO {num_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(name)


def bucket_spec(spark: SparkSession, name: str) -> dict | None:
    """Return {'bucket_cols': [...], 'num_buckets': n, 'sort_cols': [...]}
    for a catalog table, or None if the table is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return None

    def _cols(v: str | None) -> list[str]:
        if not v:
            return []
        return [c.strip().strip("`") for c in v.strip("[]").split(",") if c.strip()]

    return {
        "num_buckets": int(info["Num Buckets"]),
        "bucket_cols": _cols(info.get("Bucket Columns")),
        "sort_cols": _cols(info.get("Sort Columns")),
    }


def co_located_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables, refusing layouts that would shuffle.

    Raises ValueError unless both tables are bucketed on the join
    key(s) with the SAME bucket count — the precondition for Spark to
    plan the sort-merge join without an Exchange on either side. This
    is a guard for pipelines that BUDGETED for shuffle-free execution:
    a silent fallback to a 100 TB shuffle is an outage, not a fallback.
    """
    keys = [on] if isinstance(on, str) else list(on)
    specs = {}
    for name in (left_name, right_name):
        spec = bucket_spec(spark, name)
        if spec is None:
            raise ValueError(f"table {name!r} is not bucketed")
        if spec["bucket_cols"] != keys:
            raise ValueError(
                f"table {name!r} is bucketed on {spec['bucket_cols']}, "
                f"join needs {keys}"
            )
        specs[name] = spec
    if specs[left_name]["num_buckets"] != specs[right_name]["num_buckets"]:
        raise ValueError(
            "bucket counts differ: "
            f"{left_name}={specs[left_name]['num_buckets']} vs "
            f"{right_name}={specs[right_name]['num_buckets']} — "
            "rewrite one side; mismatched counts shuffle"
        )
    return spark.table(left_name).join(spark.table(right_name), on=keys, how=how)
