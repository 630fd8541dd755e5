"""WARC / WET web-archive source (Common Crawl-style ingestion).

The first stage of a real 100 TB pretraining pipeline is not parquet —
it is tens of thousands of ~1 GiB ``.warc.gz`` / ``.wet.gz`` archives.
This module reads them distributedly:

- **Parallelism unit = file** (sequential path). A gzipped WARC is a
  chain of gzip members (one per record) and is NOT byte-splittable
  without a sidecar index, so the industry-standard plan (and ours)
  is one task per archive file: Common Crawl ships ~64 000 files per
  crawl, which out-fans any cluster. The file list is a tiny
  driver-side frame; record payloads are born on executors inside
  ``mapInPandas`` and never pass through the driver.
- **Parallelism unit = record** (indexed path). With a CDX index
  (``read_cdxj`` + ``read_warc_records_at``) every entry names a
  self-contained gzip member by (offset, length), so ONE archive fans
  out across the cluster and predicate pushdown happens on the
  kilobyte-rows index instead of the terabyte archives.
- **Streaming parse.** Each task reads its archive as a stream and
  yields Arrow batches of records bounded by rows AND payload bytes,
  so a file full of 100 MiB PDFs cannot balloon one batch past
  executor memory.
- **Skip-not-fail.** Truncated records, bad headers, and payloads
  longer than ``max_payload_bytes`` are skipped (counted per-file in
  the ``n_skipped`` column of ``warc_file_stats``), never a stage
  failure — one rotten archive must not kill a 64 000-file job.

Format: WARC/1.0–1.1 (ISO 28500): ``WARC/1.x CRLF`` + CRLF-terminated
headers + empty line + exactly ``Content-Length`` payload bytes + two
CRLFs. ``response`` records carry an HTTP/1.x message as payload; WET
``conversion`` records carry extracted UTF-8 text.

The reference has no web-archive surface (its sources are Solana
snapshot archives, `src/archived.rs`); this is part of the
training-data-pipeline extension mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import re as _re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

RECORD_SCHEMA = (
    "warc_file string, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, http_status int, http_content_type string, "
    "payload binary"
)

_BATCH_ROWS = 256
_BATCH_BYTES = 64 << 20


def _resolve_paths(paths: str | list[str]) -> list[str]:
    """A list is taken verbatim (cluster manifests: Common Crawl's
    ``warc.paths`` files name objects a local glob cannot see); a
    string is globbed locally."""
    if isinstance(paths, str):
        out = sorted(_glob.glob(paths))
        if not out:
            raise FileNotFoundError(f"no files match {paths!r}")
        return out
    if not paths:
        raise ValueError("empty path list")
    return list(paths)


def _read_headers(stream) -> dict[str, str] | None:
    """Read CRLF-terminated headers up to the blank line. Returns None
    at clean EOF; raises ValueError on a malformed block."""
    line = stream.readline()
    while line in (b"\r\n", b"\n"):  # tolerate stray separators
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers: dict[str, str] = {}
    headers["__version__"] = line.strip().decode("ascii", "replace")
    # duplicate field names: LAST wins (dict semantics, documented —
    # email.parser's get() would return the first; the fields this
    # reader consumes are single-valued by the WARC spec)
    last_key: str | None = None
    while True:
        line = stream.readline()
        if not line:
            raise ValueError("EOF inside WARC header block")
        if line in (b"\r\n", b"\n"):
            return headers
        if line[:1] in (b" ", b"\t"):
            # RFC 2616-style folded continuation — legal in WARC/1.0
            # (deprecated in 1.1, still in the wild): extends the
            # PREVIOUS field's value, joined with one space
            if last_key is None:
                raise ValueError(
                    f"folded line before any header: {line[:40]!r}"
                )
            cont = line.strip().decode("utf-8", "replace")
            headers[last_key] = (headers[last_key] + " " + cont).strip()
            continue
        if b":" not in line:
            raise ValueError(f"malformed WARC header line: {line[:40]!r}")
        k, v = line.split(b":", 1)
        last_key = k.strip().decode("ascii", "replace").lower()
        headers[last_key] = v.strip().decode("utf-8", "replace")


def _parse_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP/1.x response message into (status, content-type,
    body). Non-HTTP payloads — and messages with no header/body
    boundary — come back as (None, None, payload).

    Line-ending handling matches stdlib ``http.client.parse_headers``
    (exact-agreement property sweep in tests/test_fuzz_parsers.py):
    the head ends at the EARLIEST blank line whatever each line's
    CRLF/LF flavor (the old ``partition(CRLFCRLF)``-first spelling let
    a CRLFCRLF inside the BODY of an LF-terminated message beat the
    real earlier LFLF boundary, mis-splitting head/body), lines split
    on either ending (mixed-flavor heads no longer hide the
    content-type), folded continuations extend the previous field, and
    the FIRST content-type wins like ``Message.get``."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    m = _re.search(rb"(\r\n|\n)(\r\n|\n)", payload)
    if not m:
        return None, None, payload
    head, body = payload[: m.start()], payload[m.end():]
    lines = _re.split(rb"\r\n|\n", head)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    unfolded: list[bytes] = []
    for line in lines[1:]:
        if line[:1] in (b" ", b"\t") and unfolded:
            unfolded[-1] += b" " + line.strip()
        else:
            unfolded.append(line)
    ctype = None
    for line in unfolded:
        if line.lower().startswith(b"content-type:"):
            ctype = line.split(b":", 1)[1].strip().decode("ascii", "replace")
            break
    return status, ctype, body


def _iter_records(
    path: str,
    record_types: set[str] | None,
    max_payload_bytes: int,
) -> Iterator[tuple]:
    """Yield record tuples from one archive; final yield is a sentinel
    ``("__stats__", n_records, n_skipped)``."""
    raw = open(path, "rb")
    # gzip.GzipFile reads across the member chain transparently.
    stream = gzip.GzipFile(fileobj=raw) if path.endswith(".gz") else raw
    stream = io.BufferedReader(stream, 1 << 20)
    n, skipped = 0, 0
    try:
        while True:
            try:
                headers = _read_headers(stream)
            except ValueError:
                skipped += 1
                break  # framing lost — cannot resync without an index
            except (OSError, EOFError, zlib.error):
                skipped += 1
                break  # corrupt gzip member / deflate data / truncation
            if headers is None:
                break
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                skipped += 1
                break
            if length < 0:
                skipped += 1
                break  # a negative length would mis-frame everything after
            wtype = headers.get("warc-type", "")
            keep = record_types is None or wtype in record_types
            if not keep or length > max_payload_bytes:
                # skip WITHOUT materializing: a 10 GiB record must not
                # pass through memory just to be dropped
                if keep:
                    skipped += 1  # over the payload cap (drops are free)
                remaining, ok = length, True
                try:
                    while remaining > 0:
                        chunk = stream.read(min(remaining, 1 << 20))
                        if not chunk:
                            ok = False
                            break
                        remaining -= len(chunk)
                except (OSError, EOFError, zlib.error):
                    ok = False
                if not ok:
                    skipped += 1
                    break  # truncated archive
                continue
            try:
                payload = stream.read(length)
            except (OSError, EOFError, zlib.error):
                skipped += 1
                break
            if len(payload) != length:
                skipped += 1
                break  # truncated archive
            status, http_ctype, body = (
                _parse_http_payload(payload)
                if wtype in ("response", "request")
                else (None, None, payload)
            )
            n += 1
            yield (
                path,
                wtype,
                headers.get("warc-record-id"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                length,
                status,
                http_ctype,
                body,
            )
    finally:
        stream.close()
        if stream is not raw:
            raw.close()
    yield ("__stats__", n, skipped)


def _per_file_frame(spark: SparkSession, files: list[str]) -> DataFrame:
    """EXACTLY one archive per task. Hash-repartitioning on the path
    would leave ~1/e of tasks empty and hand stragglers 2-3 archives
    (birthday collisions); range-partitioning a sequential index over
    as many partitions as files puts one file in each."""
    plist = spark.createDataFrame(
        [(i, p) for i, p in enumerate(files)], "i long, path string"
    )
    return plist.repartitionByRange(len(files), "i").drop("i")


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    *,
    record_types: list[str] | None = ("response",),
    max_payload_bytes: int = 16 << 20,
) -> DataFrame:
    """Distributed WARC/WET record scan → one row per record.

    Columns: ``RECORD_SCHEMA``. ``record_types=None`` keeps every type
    (warcinfo, request, metadata, ...); the default keeps only
    ``response`` — at crawl scale the request/metadata records are
    ~half the record count for none of the training value, and
    dropping them executor-side is the earliest possible filter.
    """
    files = _resolve_paths(paths)
    types = set(record_types) if record_types is not None else None
    cap = max_payload_bytes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in RECORD_SCHEMA.split(", ")]
        for pdf in batches:
            for path in pdf["path"]:
                rows: list[tuple] = []
                size = 0
                for rec in _iter_records(path, types, cap):
                    if rec[0] == "__stats__":
                        continue
                    rows.append(rec)
                    size += rec[6]
                    if len(rows) >= _BATCH_ROWS or size >= _BATCH_BYTES:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, size = [], 0
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _per_file_frame(spark, files).mapInPandas(gen, RECORD_SCHEMA)


def warc_file_stats(
    spark: SparkSession,
    paths: str | list[str],
    *,
    record_types: list[str] | None = None,
    max_payload_bytes: int = 16 << 20,
) -> DataFrame:
    """Per-archive health scan: (warc_file, n_records, n_skipped).

    Runs the same parser but keeps only the per-file sentinel — the
    cheap pre-flight that finds truncated/rotten archives before a
    full ingest, and the skip-not-fail audit trail afterwards."""
    files = _resolve_paths(paths)
    types = set(record_types) if record_types is not None else None
    cap = max_payload_bytes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                n, skipped = 0, 0
                for rec in _iter_records(path, types, cap):
                    if rec[0] == "__stats__":
                        n, skipped = rec[1], rec[2]
                yield pd.DataFrame(
                    {"warc_file": [path], "n_records": [n], "n_skipped": [skipped]}
                )

    return _per_file_frame(spark, files).mapInPandas(
        gen, "warc_file string, n_records long, n_skipped long"
    )


def warc_html_documents(
    spark: SparkSession,
    paths: str | list[str],
    *,
    max_payload_bytes: int = 16 << 20,
) -> DataFrame:
    """200-OK HTML responses → (doc_id, url, text) document rows.

    ``text`` is the decoded HTML (UTF-8, lossy) — compose with
    ``functions.html.html_to_text`` / the CLI's ``--html-extract`` for
    extraction, exactly like any other documents input. ``doc_id`` is
    the content hash of (url, payload): stable across re-reads and
    crawls. Consequence: byte-identical re-fetches of one page are
    byte-identical OUTPUT ROWS sharing one id — where downstream
    requires unique ids (the corpus CLI does),
    ``dropDuplicates(["doc_id"])`` collapses them losslessly.
    """
    recs = read_warc(
        spark, paths, record_types=["response"], max_payload_bytes=max_payload_bytes
    )
    return html_response_documents(recs)


def html_response_documents(recs: DataFrame) -> DataFrame:
    """RECORD_SCHEMA response rows → (doc_id, url, text) documents,
    keeping only 200-OK HTML. Shared by the sequential scan
    (``warc_html_documents``) and the CDX-indexed path
    (``read_warc_records_at`` output feeds straight in)."""
    html = recs.filter(
        (F.col("http_status") == 200)
        & F.lower(F.coalesce("http_content_type", F.lit(""))).contains("html")
    )
    return html.select(
        F.lower(
            F.hex(F.xxhash64(F.col("target_uri"), F.col("payload")))
        ).alias("doc_id"),
        F.col("target_uri").alias("url"),
        # make_valid_utf8, not decode: decode THROWS on malformed bytes
        # (ANSI), and crawl payloads lie about their charset routinely —
        # lossy replacement is the skip-not-fail policy at column level.
        F.make_valid_utf8(F.col("payload").cast("string")).alias("text"),
    )


def wet_documents(
    spark: SparkSession,
    paths: str | list[str],
    *,
    max_payload_bytes: int = 16 << 20,
) -> DataFrame:
    """WET ``conversion`` records → (doc_id, url, text) document rows.

    WET archives already hold extracted plain text, so no HTML stage
    is needed downstream."""
    recs = read_warc(
        spark, paths, record_types=["conversion"], max_payload_bytes=max_payload_bytes
    )
    return recs.select(
        F.lower(
            F.hex(F.xxhash64(F.col("target_uri"), F.col("payload")))
        ).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.make_valid_utf8(F.col("payload").cast("string")).alias("text"),
    )


def warc_media(
    spark: SparkSession,
    paths: str | list[str],
    *,
    kinds: tuple[str, ...] = ("image", "audio", "video"),
    max_payload_bytes: int = 64 << 20,
) -> DataFrame:
    """200-OK media responses → (media_id, kind, blob, url, content_type).

    The bridge from crawl archives into the multimodal pipeline:
    ``kind`` is the content-type's top level (image/audio/video), and
    the output schema is a superset of the (media_id, kind, blob)
    contract that ``operators.multimodal.decode_media_meta`` /
    ``operators.media_dedup.perceptual_hash`` consume, so
    crawl → decode → pHash-dedup composes directly. Blobs stay binary
    and are born executor-side; they never shuffle (the downstream ops
    are narrow maps) and never pass the driver.

    ``media_id`` is the LONG content hash of (url, payload) — the
    media pipeline's id type — so identical re-fetches are identical
    rows; collapse with ``dropDuplicates(["media_id"])`` where unique
    ids are required.
    """
    bad = [k for k in kinds if k not in ("image", "audio", "video")]
    if bad:
        raise ValueError(f"unknown media kinds {bad}")
    recs = read_warc(
        spark, paths, record_types=["response"], max_payload_bytes=max_payload_bytes
    )
    ctype = F.lower(F.coalesce("http_content_type", F.lit("")))
    kind = F.split(ctype, "/").getItem(0)
    return (
        recs.filter((F.col("http_status") == 200) & kind.isin(*kinds))
        .select(
            F.xxhash64(F.col("target_uri"), F.col("payload")).alias("media_id"),
            kind.alias("kind"),
            F.col("payload").alias("blob"),
            F.col("target_uri").alias("url"),
            F.col("http_content_type").alias("content_type"),
        )
    )


# ship the parser by value for the mapInPandas workers (see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)


CDXJ_SCHEMA = (
    "urlkey string, ts string, url string, mime string, status int, "
    "digest string, length long, offset long, filename string"
)


def read_cdxj(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse CDXJ index lines ("urlkey ts {json}") → one row per
    captured record, with the (filename, offset, length) needed for
    random access into the archives.

    The index is line-oriented text, so ``spark.read.text`` splits it
    for free — and it is ~1000× smaller than the archives, which is
    the whole point: predicate pushdown happens HERE (filter on
    status/mime/url against kilobyte rows), and only the matching
    byte ranges of the warc.gz files are ever fetched."""
    lines = spark.read.text(paths)
    parts = F.split(F.col("value"), " ", 3)
    # F.get, not getItem: a truncated/malformed index line splits into
    # fewer than 3 fields, and under ANSI getItem would throw
    # INVALID_ARRAY_INDEX and abort the ingest; get() yields NULL and
    # the row is dropped below (skip-not-fail, same policy as the
    # archive parser)
    j = F.from_json(
        F.get(parts, 2),
        "url string, mime string, status string, digest string, "
        "length string, offset string, filename string",
    )
    return (
        lines.filter(F.length(F.trim("value")) > 0)
        .select(
            F.get(parts, 0).alias("urlkey"),
            F.get(parts, 1).alias("ts"),
            j.alias("_j"),
        )
        .select(
            "urlkey",
            "ts",
            F.col("_j.url").alias("url"),
            F.col("_j.mime").alias("mime"),
            F.col("_j.status").try_cast("int").alias("status"),
            F.col("_j.digest").alias("digest"),
            F.col("_j.length").try_cast("long").alias("length"),
            F.col("_j.offset").try_cast("long").alias("offset"),
            F.col("_j.filename").alias("filename"),
        )
        # rows the random-access fetch cannot act on are dropped here,
        # not exploded into task errors later
        .filter(
            F.col("offset").isNotNull()
            & F.col("length").isNotNull()
            & F.col("filename").isNotNull()
        )
    )


def _surt_key(url: str | None) -> str | None:
    """Minimal SURT-style urlkey: host labels reversed, comma-joined,
    then ')' and the lowercased path+query. Enough to sort/join an
    index built here with itself; NOT byte-compatible with every
    Common Crawl SURT nuance (param re-ordering, session-id strip).

    Whitespace is percent-encoded: the CDXJ line format is
    space-delimited ("urlkey ts {json}"), so a raw space in the key —
    crawls DO contain unencoded-space URLs — would shift the fields on
    re-read and silently drop the record from the round-trip."""
    if not url:
        return None
    m = _re.match(
        r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^@/?#]*@)?([^/?#:]*)(?::\d+)?"
        r"([^?#]*)(\?[^#]*)?",
        url,
    )
    if not m:
        key = url.lower()
    else:
        host, path, query = m.group(1), m.group(2) or "/", m.group(3) or ""
        key = ",".join(reversed(host.lower().split("."))) + ")" + (
            path + query
        ).lower()
    return _re.sub(r"\s", lambda w: "%%%02X" % ord(w.group()), key)


def _cdx_entry_from_head(head: bytes) -> tuple | None:
    """(wtype, url, ts, status, mime) parsed from the first bytes of a
    decompressed record, or None when the head is not a WARC record."""
    stream = io.BufferedReader(io.BytesIO(head))
    try:
        headers = _read_headers(stream)
    except (ValueError, OSError, EOFError):
        return None
    if headers is None:
        return None
    wtype = headers.get("warc-type", "")
    url = headers.get("warc-target-uri")
    ts = _re.sub(r"[^0-9]", "", headers.get("warc-date", ""))[:14] or None
    payload_head = stream.read()
    if wtype in ("response", "request"):
        status, mime, _ = _parse_http_payload(payload_head)
    else:
        status, mime = None, headers.get("content-type")
    return wtype, url, ts, status, mime


def _iter_cdx_entries(
    path: str,
    record_types: set[str] | None,
    head_cap: int = 1 << 16,
    on_corrupt: str = "fail",
    fname: str | None = None,
) -> Iterator[tuple]:
    """One (urlkey, ts, url, mime, status, digest, length, offset,
    filename) per gzip member (per record for plain archives) —
    exactly the (offset, length) frame ``read_warc_records_at``
    fetches by. Final yield is ``("__stats__", n, skipped)``.

    Memory-bounded: each member streams through a zlib decompressor;
    only the first ``head_cap`` decompressed bytes (headers + HTTP
    head) are kept, the rest only feeds the digest. The digest is
    sha1 over the record's headers + payload EXACTLY (Content-Length
    bytes — trailing CRLF/LF separators excluded) in BOTH the gzip
    and plain paths, so the same record archived as .warc and as
    record-gzipped .warc.gz carries the SAME digest — a stable
    capture identity for dedup/diff, deliberately not claiming
    Common Crawl's payload-only SHA1-B32 compatibility."""
    import hashlib
    import os.path as _osp

    if fname is None:
        fname = _osp.basename(path)
    n, skipped = 0, 0
    chunk = 1 << 20

    def bad(offset: int, why: str):
        """A rotten/mis-framed archive makes the index SILENTLY
        incomplete — the one failure an index must not have — so the
        default is loud; on_corrupt='skip' restores the sequential
        scanner's tolerate-and-stop behavior (partial index, counted
        in the stats sentinel)."""
        if on_corrupt == "fail":
            raise ValueError(
                f"cannot index {path!r} at offset {offset}: {why}. The "
                "index would silently miss every later record — repair "
                "or exclude the archive (warc_file_stats finds rotten "
                "ones), or pass on_corrupt='skip' for a partial index."
            )

    def record_extent(head: bytes) -> int | None:
        """headers + payload length parsed from a record head, or
        None when the head is not a parseable record."""
        s = io.BufferedReader(io.BytesIO(head))
        try:
            hdrs = _read_headers(s)
            if hdrs is None:
                return None
            return s.tell() + int(hdrs["content-length"])
        except (ValueError, KeyError, OSError, EOFError):
            return None

    def emit(start: int, length: int, head: bytes, digest: str):
        nonlocal n, skipped
        parsed = _cdx_entry_from_head(head)
        if parsed is None:
            # a member that decompresses cleanly but is not a
            # parseable WARC record (valid-gzip junk, or a header
            # block past head_cap) is still an index omission — as
            # loud as a corrupt member under the default
            bad(
                start,
                "member is not a parseable WARC record (non-WARC "
                f"content, or header block exceeding {head_cap} bytes)",
            )
            skipped += 1
            return None
        wtype, url, ts, status, mime = parsed
        if record_types is not None and wtype not in record_types:
            return None
        n += 1
        return (
            _surt_key(url), ts, url, mime, status, digest, length, start, fname
        )

    with open(path, "rb") as f:
        if path.endswith(".gz"):
            raw_pos, pending = 0, b""
            while True:
                if not pending:
                    pending = f.read(chunk)
                    raw_pos += len(pending)
                    if not pending:
                        break
                start = raw_pos - len(pending)
                d = zlib.decompressobj(wbits=31)
                h = hashlib.sha1()
                head = bytearray()
                dlen = 0
                # the digest must cover headers + payload EXACTLY like
                # the plain-.warc path (record-at-time members carry
                # trailing CRLF CRLF separators INSIDE the member —
                # hashing them would make the same record's digest
                # differ between .warc and .warc.gz). The extent is
                # parseable once the header block has streamed into
                # `head` (first chunk in practice); until then every
                # byte seen is below it.
                extent = None
                try:
                    while True:
                        out = d.decompress(pending)
                        if out:
                            seen = dlen
                            dlen += len(out)
                            if len(head) < head_cap:
                                head += out[: head_cap - len(head)]
                                if extent is None:
                                    extent = record_extent(bytes(head))
                            cap = dlen if extent is None else extent
                            if seen < cap:
                                h.update(out[: cap - seen])
                        if d.eof:
                            pending = d.unused_data
                            break
                        pending = f.read(chunk)
                        raw_pos += len(pending)
                        if not pending:
                            raise EOFError("truncated gzip member")
                except (zlib.error, EOFError, OSError) as e:
                    bad(start, f"corrupt/truncated gzip member ({e})")
                    skipped += 1
                    break
                # random access serves ONE record per index entry, so a
                # member holding several (whole-file `gzip x.warc`, not
                # record-at-time compression) can never round-trip.
                # Loud under the default; under skip the member's
                # boundary IS known, so the walk skips it and continues
                extent = record_extent(bytes(head))
                if extent is not None and dlen > extent + 8:
                    if on_corrupt == "fail":
                        raise ValueError(
                            f"{path!r}: gzip member at offset {start} "
                            f"decompresses to {dlen} bytes but its "
                            f"first record ends at {extent} — the "
                            "archive is whole-file-gzipped, not "
                            "record-at-time, so byte-range random "
                            "access cannot work. Index the "
                            "decompressed .warc instead."
                        )
                    skipped += 1
                    continue
                length = (raw_pos - len(pending)) - start
                row = emit(start, length, bytes(head), h.hexdigest())
                if row is not None:
                    yield row
        else:
            stream = io.BufferedReader(f, chunk)
            while True:
                # tolerate (and exclude from the entry) separator runs
                # before a record, CRLF or bare LF — same tolerance as
                # _read_headers, but offsets must point AT "WARC/"
                while True:
                    peeked = stream.peek(2)[:2]
                    if peeked[:2] == b"\r\n":
                        stream.read(2)
                    elif peeked[:1] == b"\n":
                        stream.read(1)
                    else:
                        break
                start = stream.tell()
                try:
                    headers = _read_headers(stream)
                except (ValueError, OSError, EOFError) as e:
                    bad(start, f"malformed record header ({e})")
                    skipped += 1
                    break
                if headers is None:
                    break
                try:
                    plen = int(headers["content-length"])
                    if plen < 0:
                        raise ValueError("negative Content-Length")
                except (KeyError, ValueError) as e:
                    bad(start, f"unusable Content-Length ({e})")
                    skipped += 1
                    break
                h = hashlib.sha1()
                head = bytearray()
                # _read_headers left the cursor at the payload start;
                # the entry covers headers + payload EXACTLY (trailing
                # separators excluded — the fetch side never needs
                # them, and their flavor varies CRLF/LF). Re-read from
                # the start so the digest covers the on-disk bytes.
                body_start = stream.tell()
                to_hash = (body_start - start) + plen
                stream.seek(start)
                left = to_hash
                truncated = False
                while left > 0:
                    b = stream.read(min(left, chunk))
                    if not b:
                        truncated = True
                        break
                    h.update(b)
                    if len(head) < head_cap:
                        head += b[: head_cap - len(head)]
                    left -= len(b)
                if truncated:
                    bad(start, "record truncated mid-payload")
                    skipped += 1
                    break
                row = emit(start, to_hash, bytes(head), h.hexdigest())
                if row is not None:
                    yield row
    yield ("__stats__", n, skipped)


def build_cdxj_entries(
    spark: SparkSession,
    paths: str | list[str],
    *,
    record_types: list[str] | None = ("response",),
    on_corrupt: str = "fail",
    filename_base: str | None = None,
) -> DataFrame:
    """Build a CDX index FROM archives: one ``CDXJ_SCHEMA`` row per
    record, with the member (offset, length) that random access
    needs. One task per archive (same fan-out as ``read_warc``).

    ``filename_base``: the index ``filename`` column is the archive
    path RELATIVE to this directory (Common Crawl's convention —
    filenames carry their subpath), so archives spread over
    subdirectories stay resolvable from one ``base_dir`` at fetch
    time. Default: bare basename, which assumes a flat directory.

    Closes the loop ``read_cdxj`` left open: Common Crawl ships
    indexes, but local or partner archives do not — after one
    indexing pass, EVERY later read is CDX-pushdown random access
    (``read_warc_records_at``) instead of a sequential scan.

    Unlike the sequential scanner, corruption here is LOUD by default
    (``on_corrupt="fail"``): a scanner that skips a rotten record
    loses that record once, but an index built past one would
    silently lose every record after it on EVERY future read. Use
    ``on_corrupt="skip"`` plus ``build_cdxj_stats`` when a partial
    index of a known-rotten archive is genuinely wanted."""
    if on_corrupt not in ("fail", "skip"):
        raise ValueError(f"on_corrupt must be 'fail' or 'skip', got {on_corrupt!r}")
    files = _resolve_paths(paths)
    types = set(record_types) if record_types is not None else None
    cols = [c.split()[0] for c in CDXJ_SCHEMA.split(", ")]
    base = filename_base

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os.path as _osp

        # yield in bounded chunks, not one list per archive: index rows
        # are kilobytes, but a billion-record archive set should stream
        # like the record scanner above, not accumulate per-file
        chunk_rows = 10_000
        for pdf in batches:
            for path in pdf["path"]:
                fname = _osp.relpath(path, base) if base else None
                rows: list[tuple] = []
                for r in _iter_cdx_entries(
                    path, types, on_corrupt=on_corrupt, fname=fname
                ):
                    if r[0] == "__stats__":
                        continue
                    rows.append(r)
                    if len(rows) >= chunk_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _per_file_frame(spark, files).mapInPandas(gen, CDXJ_SCHEMA)


def build_cdxj_stats(
    spark: SparkSession,
    paths: str | list[str],
    *,
    record_types: list[str] | None = ("response",),
) -> DataFrame:
    """(warc_file, n_entries, n_skipped) per archive under the
    builder's skip mode — the audit companion that tells you HOW
    partial an ``on_corrupt="skip"`` index is."""
    files = _resolve_paths(paths)
    types = set(record_types) if record_types is not None else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                n, skipped = 0, 0
                for r in _iter_cdx_entries(path, types, on_corrupt="skip"):
                    if r[0] == "__stats__":
                        n, skipped = r[1], r[2]
                yield pd.DataFrame(
                    {"warc_file": [path], "n_entries": [n],
                     "n_skipped": [skipped]}
                )

    return _per_file_frame(spark, files).mapInPandas(
        gen, "warc_file string, n_entries long, n_skipped long"
    )


def cdxj_lines(entries: DataFrame) -> DataFrame:
    """CDXJ text lines ("urlkey ts {json}") from a ``CDXJ_SCHEMA``
    frame — ``cdxj_lines(e).write.text(dir)`` is the cluster-scale
    index write; the result round-trips through ``read_cdxj``."""
    j = F.to_json(
        F.struct(
            F.col("url"),
            F.col("mime"),
            F.col("status").cast("string").alias("status"),
            F.col("digest"),
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.col("filename"),
        )
    )
    # defense at the serialization boundary: the line format is
    # space-delimited, so whitespace inside a key from ANY source
    # (an index built by another tool, a hand-edited frame) would
    # shift the fields on re-read — encode it. _surt_key already
    # emits clean keys; this catches foreign ones. The url itself
    # rides the JSON, where to_json escapes properly.
    key = F.regexp_replace(
        F.coalesce(F.col("urlkey"), F.lit("-")), r"\s", "%20"
    )
    # ts from the builder is digits-only; a foreign frame's ts gets
    # the same whitespace defense as the key
    ts = F.regexp_replace(
        F.coalesce(F.col("ts"), F.lit("-")), r"\s", "%20"
    )
    return entries.select(
        F.concat_ws(
            " ",
            key,
            ts,
            j,
        ).alias("value")
    )


def write_cdxj_file(entries: DataFrame, out_path: str) -> int:
    """One sorted local ``.cdxj`` file (urlkey, ts order — the CDX
    convention) for interchange with other tools; returns the line
    count. Driver-side but streaming (``toLocalIterator``) — for a
    cluster-scale index use ``cdxj_lines(...).write.text`` instead."""
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for row in (
            cdxj_lines(entries.orderBy("urlkey", "ts")).toLocalIterator()
        ):
            f.write(row["value"] + "\n")
            n += 1
    return n


def read_warc_records_at(
    spark: SparkSession,
    entries: DataFrame,
    *,
    base_dir: str | None = None,
    num_partitions: int | None = None,
    max_payload_bytes: int = 16 << 20,
) -> DataFrame:
    """Random-access WARC record fetch: one row per (filename, offset,
    length) index entry — the CDX-driven read path.

    This removes the sequential-scan limitation of ``read_warc``: a
    gzipped archive is not byte-splittable on its own, but every CDX
    entry names a self-contained gzip member, so ONE FILE can fan out
    across the whole cluster. Entries are range-partitioned and sorted
    by (filename, offset): each task reads one ascending sweep of
    byte ranges per file — object-store range requests in offset
    order, one open per file per task.

    Records that fail to decompress or parse yield a row with null
    fields except ``warc_file``/``record_offset`` (skip-not-fail with
    an audit trail, same policy as the streaming scan).

    With ``base_dir``, filenames must resolve INSIDE it: an index is
    often third-party input, and a row naming ``../../etc/anything``
    (or an absolute path — ``os.path.join`` silently DISCARDS the
    base for those) would otherwise read arbitrary executor-visible
    files into the corpus. Escaping entries become audit rows, same
    as unopenable archives."""
    import os.path as _osp

    for c in ("filename", "offset", "length"):
        if c not in entries.columns:
            raise ValueError(f"entries needs column {c!r} (have {entries.columns})")
    n = num_partitions or spark.sparkContext.defaultParallelism
    cap = max_payload_bytes
    base = base_dir

    out_schema = "record_offset long, " + RECORD_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_offset"] + [c.split()[0] for c in RECORD_SCHEMA.split(", ")]
        nulls = (None,) * 9
        root = _osp.realpath(base) if base else None
        for pdf in batches:
            rows: list[tuple] = []
            size = 0
            handle, handle_path = None, None
            try:
                for fname, off, length in pdf[
                    ["filename", "offset", "length"]
                ].itertuples(index=False):
                    path = _osp.join(base, fname) if base else fname
                    if base:
                        # containment: a third-party index row must
                        # not name a file outside base_dir (traversal
                        # or absolute path) — audit row, not a fetch.
                        # realpath, not normpath: a symlink planted
                        # INSIDE base_dir must not alias files outside
                        # it. A root of '/' contains every absolute
                        # path (root+sep would be '//' and reject all).
                        resolved = _osp.realpath(path)
                        if root != _osp.sep and not resolved.startswith(
                            root + _osp.sep
                        ):
                            rows.append((int(off), path) + nulls)
                            continue
                    if path != handle_path:
                        if handle is not None:
                            handle.close()
                        # an unopenable archive must not kill the task:
                        # every entry naming it becomes an audit row
                        # (handle stays None until the path changes)
                        try:
                            handle = open(path, "rb")
                        except OSError:
                            handle = None
                        handle_path = path
                    if handle is None:
                        rows.append((int(off), path) + nulls)
                        continue
                    try:
                        handle.seek(off)
                        member = handle.read(length)
                        blob = (
                            gzip.decompress(member)
                            if member[:2] == b"\x1f\x8b"
                            else member
                        )
                        stream = io.BufferedReader(io.BytesIO(blob))
                        headers = _read_headers(stream)
                        if headers is None:
                            raise ValueError("empty record")
                        plen = int(headers["content-length"])
                        if plen < 0 or plen > cap:
                            raise ValueError("payload out of bounds")
                        payload = stream.read(plen)
                        if len(payload) != plen:
                            raise ValueError("truncated record")
                        wtype = headers.get("warc-type", "")
                        status, http_ctype, body = (
                            _parse_http_payload(payload)
                            if wtype in ("response", "request")
                            else (None, None, payload)
                        )
                        rows.append(
                            (
                                int(off),
                                path,
                                wtype,
                                headers.get("warc-record-id"),
                                headers.get("warc-target-uri"),
                                headers.get("warc-date"),
                                headers.get("content-type"),
                                plen,
                                status,
                                http_ctype,
                                body,
                            )
                        )
                        size += plen
                    except (ValueError, KeyError, OSError, EOFError, zlib.error):
                        rows.append((int(off), path) + nulls)
                    if len(rows) >= _BATCH_ROWS or size >= _BATCH_BYTES:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, size = [], 0
            finally:
                if handle is not None:
                    handle.close()
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    planned = (
        entries.select("filename", "offset", "length")
        .repartitionByRange(n, "filename", "offset")
        .sortWithinPartitions("filename", "offset")
    )
    return planned.mapInPandas(gen, out_schema)
