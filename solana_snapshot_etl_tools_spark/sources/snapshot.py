"""Snapshot sources S1-S4: unpacked-dir scan, archive extract,
manifest decode, F13/F14 validation — Spark-first.

Scan architecture (100 TB posture): the driver only LISTS file paths
(cheap); decoding is a ``mapInPandas`` over a paths DataFrame, so each
executor opens and walks its own AppendVec files from shared storage.
No file content ever rides through the driver or a DataFrame row —
unlike ``binaryFile``, which materializes whole files as rows.

Manifest (S4): bincode-fixint ``AccountsDbFields`` — a map
slot → [(id, accounts_current_len)] (reference solana.rs:100-111).
Production manifests prepend ``DeserializableVersionedBank`` (~30
nested structs, decoded-and-dropped by the reference, solana.rs:63-97)
— handled by the skip-walk in ``sources/bank.py`` via
``parse_manifest`` (auto-detects both layouts). The manifest is
kilobytes-to-megabytes: driver-parsed, then broadcast as a plain dict
(SURVEY.md §2.1 S4).
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
    # BankHashInfo: hash + snapshot_hash + BankHashStats (5 × u64) = 104 B
    out += b"\x00" * 104
    out += struct.pack("<Q", 0) * 2  # trailing vecs (default_on_eof)
    return out


def parse_accounts_db_fields(
    buf: bytes, off: int = 0
) -> dict[tuple[int, int], int]:
    """Decode the AccountsDbFields map: slot → [(id, current_len)]
    (solana.rs:100-111, fixint encoding solana.rs:42-52)."""

    def u64():
        nonlocal off
        if off + 8 > len(buf):
            raise ValueError(f"manifest truncated at offset {off}")
        (v,) = struct.unpack_from("<Q", buf, off)
        off += 8
        return v

    entries: dict[tuple[int, int], int] = {}
    n_slots = u64()
    if n_slots > 1 << 30:
        raise ValueError(f"implausible slot-map length {n_slots}")
    for _ in range(n_slots):
        slot = u64()
        n_vecs = u64()
        if n_vecs > 1 << 20:
            raise ValueError(f"implausible appendvec count {n_vecs}")
        for _ in range(n_vecs):
            vid, ln = u64(), u64()
            entries[(slot, vid)] = ln
    return entries


def parse_manifest(
    buf: bytes, bank_prefixed: bool | None = None
) -> dict[tuple[int, int], int]:
    """S4 full manifest decode. Production snapshot manifests prepend
    a ``DeserializableVersionedBank`` (decoded-and-dropped by the
    reference, solana.rs:63-97) before AccountsDbFields; test fixtures
    may carry AccountsDbFields alone. ``bank_prefixed``:

    - True: skip the bank section, then parse AccountsDbFields;
    - False: parse AccountsDbFields at offset 0;
    - None (default): auto-detect — try plain first (a bank prefix
      makes the first u64 an implausible map length or the walk run
      out of bounds, so misdetection fails loudly rather than
      returning garbage), then the bank-skip path.
    """
    from solana_snapshot_etl_tools_spark.sources.bank import skip_versioned_bank

    if bank_prefixed is True:
        return parse_accounts_db_fields(buf, skip_versioned_bank(buf))
    if bank_prefixed is False:
        return parse_accounts_db_fields(buf)
    try:
        return parse_accounts_db_fields(buf)
    except ValueError as plain_err:
        try:
            return parse_accounts_db_fields(buf, skip_versioned_bank(buf))
        except ValueError as bank_err:
            raise ValueError(
                "manifest matches neither AccountsDbFields-first "
                f"({plain_err}) nor bank-prefixed ({bank_err}) layout"
            ) from bank_err


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


def _zstd_stream(path: str):
    """Streaming zstd reader: prefer the dedicated ``zstandard``
    package (handles multi-frame/long-window archives), fall back to
    pyarrow's zstd codec, which ships with Spark's Python deps."""
    try:
        import zstandard

        return zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
    except ImportError:
        import pyarrow as pa

        return pa.input_stream(path, compression="zstd")


def extract_archive(archive_path: str, dest_dir: str) -> tuple[str, bytes]:
    """Stream a snapshot tar to disk: locates ``snapshots/<slot>/<slot>``
    (manifest — must precede the appendvecs, reference
    archived.rs:53-56) and materializes ``accounts/*`` entries.
    Plain ``.tar`` is handled natively; ``.tar.zst`` streams through
    the ``zstandard`` package when present, else pyarrow's bundled
    zstd codec (always available alongside Spark) — matching the
    reference's streamed zstd decode (archived.rs:37-57).
    Returns (accounts_dir, manifest_bytes)."""
    if archive_path.endswith(".zst"):
        tf = tarfile.open(fileobj=_zstd_stream(archive_path), mode="r|")
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
    manifest = parse_manifest(manifest_blob)
    return scan_unpacked(spark, accounts_dir, manifest, **kw)
