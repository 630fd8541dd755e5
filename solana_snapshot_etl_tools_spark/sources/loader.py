"""Source resolution (S3 + SupportedLoader dispatch, reference
main.rs:183-213): one entry point accepting an HTTP(S) URL, an
archive file, or an unpacked snapshot directory.

HTTP sources stream to local disk on the driver once (the reference
pipes reqwest into the tar reader the same way, main.rs:188-200);
everything after that is the distributed scan. For S3/GCS in a real
deployment the archive URL is fetched with the same streaming shape.
"""

from __future__ import annotations

import os
import shutil
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from solana_snapshot_etl_tools_spark.sources.snapshot import (
    parse_accounts_db_fields,
    scan_archive,
    scan_unpacked,
)


def load_snapshot(
    spark: SparkSession, source: str, work_dir: str, **kw
) -> DataFrame:
    """Dispatch on the source string exactly like the reference's
    ``SupportedLoader::new``: http(s) → streaming download + archive;
    directory → unpacked; file → archive."""
    if source.startswith("http://") or source.startswith("https://"):
        os.makedirs(work_dir, exist_ok=True)
        local = os.path.join(work_dir, "snapshot_download.tar")
        with urllib.request.urlopen(source) as resp, open(local, "wb") as out:
            shutil.copyfileobj(resp, out, length=1 << 20)
        return scan_archive(spark, local, work_dir, **kw)
    if os.path.isdir(source):
        snapshots = os.path.join(source, "snapshots")
        manifest = None
        if os.path.isdir(snapshots):
            for slot in os.listdir(snapshots):
                cand = os.path.join(snapshots, slot, slot)
                if os.path.isfile(cand):
                    with open(cand, "rb") as f:
                        manifest = parse_accounts_db_fields(f.read())
                    break
        return scan_unpacked(
            spark, os.path.join(source, "accounts"), manifest, **kw
        )
    return scan_archive(spark, source, work_dir, **kw)
