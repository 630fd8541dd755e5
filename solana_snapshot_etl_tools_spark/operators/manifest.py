"""Corpus integrity manifest: record once, verify any copy.

``corpus_diff`` (operators/diff.py) answers "what changed between two
LIVE corpora" — it needs both sides readable in one session. This
module answers the migration/archival question: record a corpus's
content identity ONCE as a kilobyte manifest, then verify any later
copy (another cluster, another filesystem, after a recompaction)
against it without the original.

Scale shape: one scan, one groupBy on the file name (hundreds of
thousands of groups at most — one per parquet file). Each row
contributes ``xxhash64`` over the selected columns; the per-file
aggregate is the exact DECIMAL sum of those hashes — ORDER-INDEPENDENT
(row order inside a file is layout, not content) and exact (a long
sum would overflow and ANSI-throw). The corpus-level sum is the same
quantity over all files, so a recompaction that moves rows between
files fails the per-file check but passes the corpus-level one — the
verifier reports that case as its own status instead of a false alarm.

Integrity, not security: xxhash64 is not cryptographic — this detects
accidental corruption, lost files, and silent pipeline drift, not an
adversary crafting collisions.
"""

from __future__ import annotations

import json
import re as _re

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_VERSION = 1


def _norm_path(p: str) -> str:
    """Scheme-insensitive path normalization (``file:///x`` and
    ``file:/x`` and ``/x`` and ``/x/`` all verify as the same corpus).

    Trailing slashes are stripped (bare ``/`` kept): the relative-key
    strip below is length-based, so ``/corpus/`` vs ``/corpus`` must
    normalize identically or every per-file key loses its first
    character — and distinct files can COLLIDE (``a.parquet`` /
    ``b.parquet`` both → ``.parquet``), silently merging their sums."""
    out = "/" + _re.sub(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+", "", p).lstrip("/")
    return out if out == "/" else out.rstrip("/")


def _rel_file(root: str):
    if "://" not in root and not root.startswith("/"):
        # the strip below is length-based against input_file_name's
        # ABSOLUTE form — resolve relative local roots first
        import os.path as _osp

        root = _osp.abspath(root)
    norm = F.regexp_replace(
        F.input_file_name(), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+", "/"
    )
    # input_file_name() returns the URI-ENCODED path (space → %20;
    # a literal '+' stays '+' — probed empirically on Spark 4.1), while
    # the root arrives as a raw filesystem string. Percent-decode the
    # scan side before the length-based strip, or a corpus dir
    # containing spaces misaligns every relative key. url_decode alone
    # would also map '+' → ' ' (form-encoding semantics); protect
    # literal '+' first. A literal '%' in a filename arrives as '%25',
    # so decoding its own output is always safe.
    decoded = F.url_decode(F.regexp_replace(norm, r"\+", "%2B"))
    # strip leading root + '/'; what remains is the file's path
    # relative to the corpus dir — stable across copies/renames of
    # everything ABOVE the corpus dir
    nroot = _norm_path(root)
    start = 2 if nroot == "/" else len(nroot) + 2
    return F.substring(decoded, start, 1 << 20).alias("file")


def file_manifest(
    spark: SparkSession, path: str, cols: list[str] | None = None
) -> DataFrame:
    """(file, n_rows, content_sum) per parquet file under ``path``.

    ``cols`` picks the columns whose values DEFINE content identity
    (default: all, in a sorted canonical order so two manifests of the
    same data agree regardless of physical column order).
    ``content_sum`` is the exact decimal sum of per-row xxhash64 —
    order-independent within the file."""
    df = spark.read.parquet(path)
    use = sorted(cols or df.columns)
    missing = [c for c in use if c not in df.columns]
    if missing:
        raise ValueError(f"manifest columns not in corpus: {missing}")
    h = F.xxhash64(*[F.col(c) for c in use]).cast("decimal(38,0)")
    return (
        df.select(_rel_file(path), h.alias("_h"))
        .groupBy("file")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_h").alias("content_sum"),
        )
    )


def write_manifest(
    spark: SparkSession,
    path: str,
    out_file: str,
    cols: list[str] | None = None,
) -> dict:
    """Record ``path``'s manifest to ``out_file`` (one small JSON).
    Returns the manifest dict (also the on-disk shape)."""
    df = spark.read.parquet(path)
    use = sorted(cols or df.columns)
    rows = file_manifest(spark, path, use).collect()
    man = {
        "version": MANIFEST_VERSION,
        "columns": use,
        "n_files": len(rows),
        "n_rows": int(sum(r.n_rows for r in rows)),
        "content_sum": str(sum(int(r.content_sum) for r in rows)),
        "files": {
            r.file: {"n_rows": r.n_rows, "content_sum": str(r.content_sum)}
            for r in rows
        },
    }
    with open(out_file, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    return man


def read_manifest(path: str) -> dict:
    with open(path) as f:
        man = json.load(f)
    if man.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"unsupported manifest version {man.get('version')!r}"
        )
    return man


def verify_corpus(
    spark: SparkSession, path: str, manifest: dict | str, sample_cap: int = 10
) -> dict:
    """Verify ``path`` against a recorded manifest. Returns a report:

    - ``status='identical'`` — every file matches (rows + content sum);
    - ``status='relaid_out_content_identical'`` — files differ
      (recompaction, re-sharding) but the corpus-level row count AND
      content sum match exactly: same rows, different layout;
    - ``status='content_changed'`` — rows were added/removed/modified.

    ``missing/extra/changed_files`` carry up to ``sample_cap``
    examples each (full counts always exact)."""
    man = read_manifest(manifest) if isinstance(manifest, str) else manifest
    rows = file_manifest(spark, path, man["columns"]).collect()
    got = {
        r.file: (r.n_rows, str(r.content_sum)) for r in rows
    }
    want = {
        f: (v["n_rows"], v["content_sum"]) for f, v in man["files"].items()
    }
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    changed = sorted(
        f for f in set(want) & set(got) if want[f] != got[f]
    )
    n_rows = int(sum(r.n_rows for r in rows))
    content_sum = str(sum(int(r.content_sum) for r in rows))
    totals_match = (
        n_rows == man["n_rows"] and content_sum == man["content_sum"]
    )
    if not (missing or extra or changed):
        status = "identical"
    elif totals_match:
        status = "relaid_out_content_identical"
    else:
        status = "content_changed"
    return {
        "status": status,
        "files_expected": man["n_files"],
        "files_found": len(got),
        "rows_expected": man["n_rows"],
        "rows_found": n_rows,
        "content_sum_match": totals_match,
        "missing_files": missing[:sample_cap],
        "extra_files": extra[:sample_cap],
        "changed_files": changed[:sample_cap],
        "n_missing": len(missing),
        "n_extra": len(extra),
        "n_changed": len(changed),
    }
