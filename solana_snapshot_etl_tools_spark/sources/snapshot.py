"""Snapshot sources S1-S4: unpacked-dir scan, archive extract,
manifest decode, F13/F14 validation — Spark-first.

Scan architecture (100 TB posture): the driver only LISTS file paths
(cheap); decoding is a ``mapInPandas`` over a paths DataFrame, so each
executor opens and walks its own AppendVec files from shared storage.
No file content ever rides through the driver or a DataFrame row —
unlike ``binaryFile``, which materializes whole files as rows.

Manifest (S4): bincode-fixint ``AccountsDbFields`` — a map
slot → [(id, accounts_current_len)] (reference solana.rs:100-111).
Production manifests prepend ``DeserializableVersionedBank``
(~30 nested structs, decoded-and-dropped by the reference,
solana.rs:63-97); skipping it needs the full bank schema walk — wired
via the ``bank_skip`` hook, TODO round 2. The manifest is kilobytes:
driver-parsed, then broadcast as a plain dict (SURVEY.md §2.1 S4).
"""

from __future__ import annotations

import os
import re
import struct
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from solana_snapshot_etl_tools_spark.schemas import RAW_ACCOUNTS_SCHEMA
from solana_snapshot_etl_tools_spark.sources.appendvec import iter_append_vec

# F13: appendvec filename must parse as <slot>.<id> (lib.rs:48-57)
APPENDVEC_NAME_RE = re.compile(r"^(\d+)\.(\d+)$")


def parse_append_vec_name(name: str) -> tuple[int, int] | None:
    m = APPENDVEC_NAME_RE.match(os.path.basename(name))
    return (int(m.group(1)), int(m.group(2))) if m else None


# --- S4: manifest codec ------------------------------------------------------


def write_accounts_db_fields(entries: dict[tuple[int, int], int]) -> bytes:
    """Serialize {(slot, id): current_len} as bincode-fixint
    AccountsDbFields (map, write_version, slot, BankHashInfo zeroed,
    trailing vecs empty)."""
    by_slot: dict[int, list[tuple[int, int]]] = {}
    for (slot, vid), ln in sorted(entries.items()):
        by_slot.setdefault(slot, []).append((vid, ln))
    out = struct.pack("<Q", len(by_slot))
    for slot, vecs in by_slot.items():
        out += struct.pack("<Q", slot) + struct.pack("<Q", len(vecs))
        for vid, ln in vecs:
            out += struct.pack("<QQ", vid, ln)
    out += struct.pack("<Q", 0)  # write_version
    out += struct.pack("<Q", max((s for s, _ in entries), default=0))  # slot
    out += b"\x00" * 96  # BankHashInfo (3 × Hash-sized zeroed stats)
    out += struct.pack("<Q", 0) * 2  # trailing vecs (default_on_eof)
    return out


def parse_accounts_db_fields(buf: bytes) -> dict[tuple[int, int], int]:
    """Decode the AccountsDbFields map: slot → [(id, current_len)]
    (solana.rs:100-111, fixint encoding solana.rs:42-52)."""
    off = 0

    def u64():
        nonlocal off
        (v,) = struct.unpack_from("<Q", buf, off)
        off += 8
        return v

    entries: dict[tuple[int, int], int] = {}
    for _ in range(u64()):
        slot = u64()
        for _ in range(u64()):
            vid, ln = u64(), u64()
            entries[(slot, vid)] = ln
    return entries


# --- S2: unpacked snapshot scan ---------------------------------------------


def list_append_vecs(accounts_dir: str) -> list[tuple[str, int, int]]:
    """Driver-side listing: (path, slot, id), F13-filtered."""
    out = []
    for name in sorted(os.listdir(accounts_dir)):
        parsed = parse_append_vec_name(name)
        if parsed:
            out.append((os.path.join(accounts_dir, name), *parsed))
    return out


def scan_unpacked(
    spark: SparkSession,
    accounts_dir: str,
    manifest: dict[tuple[int, int], int] | None = None,
    strict: bool = True,
    tasks: int | None = None,
) -> DataFrame:
    """S2+S5 (+F14): AppendVec files → raw_accounts DataFrame.

    ``manifest`` bounds each vec's readable length; with strict=True a
    vec absent from the manifest raises (reference errors,
    archived.rs:123-125), else it is skipped. The manifest dict rides
    into tasks via closure broadcast (it is kilobytes)."""
    vecs = list_append_vecs(accounts_dir)
    if manifest is not None:
        known = []
        for path, slot, vid in vecs:
            if (slot, vid) in manifest:
                known.append((path, slot, vid, manifest[(slot, vid)]))
            elif strict:
                raise ValueError(f"AppendVec {slot}.{vid} missing from manifest")
        rows = known
    else:
        rows = [(p, s, v, None) for p, s, v in vecs]

    paths_df = spark.createDataFrame(
        rows, "path string, slot long, append_vec_id long, current_len long"
    )
    if tasks:
        paths_df = paths_df.repartition(tasks)

    cols = [f.name for f in RAW_ACCOUNTS_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, slot, vid, cur in pdf.itertuples(index=False):
                with open(path, "rb") as f:
                    buf = f.read()
                recs = []
                for r in iter_append_vec(
                    buf, int(cur) if cur is not None and not pd.isna(cur) else None
                ):
                    r["slot"] = int(slot)
                    r["append_vec_id"] = int(vid)
                    recs.append([r[c] for c in cols])
                if recs:
                    yield pd.DataFrame(recs, columns=cols)

    return paths_df.mapInPandas(decode, RAW_ACCOUNTS_SCHEMA)


# --- S1/S3: archive extract ---------------------------------------------------


def extract_archive(archive_path: str, dest_dir: str) -> tuple[str, bytes]:
    """Stream a snapshot tar to disk: locates ``snapshots/<slot>/<slot>``
    (manifest — must precede the appendvecs, reference
    archived.rs:53-56) and materializes ``accounts/*`` entries.
    Plain ``.tar`` is handled natively; ``.tar.zst`` needs the
    ``zstandard`` package (absent in this environment → gated).
    Returns (accounts_dir, manifest_bytes)."""
    if archive_path.endswith(".zst"):
        try:
            import zstandard  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "zstd-compressed snapshots need the 'zstandard' package "
                "(not bundled here); decompress externally or use a .tar"
            ) from e
        import zstandard

        stream = zstandard.ZstdDecompressor().stream_reader(
            open(archive_path, "rb")
        )
        tf = tarfile.open(fileobj=stream, mode="r|")
    else:
        tf = tarfile.open(archive_path, mode="r|*")

    manifest: bytes | None = None
    accounts_dir = os.path.join(dest_dir, "accounts")
    os.makedirs(accounts_dir, exist_ok=True)
    with tf:
        for entry in tf:
            parts = entry.name.strip("/").split("/")
            if len(parts) == 3 and parts[0] == "snapshots" and parts[1] == parts[2]:
                manifest = tf.extractfile(entry).read()
            elif len(parts) == 2 and parts[0] == "accounts" and entry.isfile():
                if manifest is None:
                    raise ValueError(
                        "UnexpectedAppendVec: appendvec before manifest"
                    )  # lib.rs:36-37 semantics
                if parse_append_vec_name(parts[1]):
                    with open(os.path.join(accounts_dir, parts[1]), "wb") as out:
                        out.write(tf.extractfile(entry).read())
    if manifest is None:
        raise ValueError("no manifest found in archive")
    return accounts_dir, manifest


def scan_archive(
    spark: SparkSession, archive_path: str, work_dir: str, **kw
) -> DataFrame:
    """S1 end-to-end: extract (driver streams the tar once) → manifest
    parse → distributed scan."""
    accounts_dir, manifest_blob = extract_archive(archive_path, work_dir)
    manifest = parse_accounts_db_fields(manifest_blob)
    return scan_unpacked(spark, accounts_dir, manifest, **kw)
