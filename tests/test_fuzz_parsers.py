"""Property-based fuzz over the binary parsers (hypothesis).

The L1 contract is skip-not-fail: arbitrary or corrupted bytes must
either parse, stop cleanly, or raise ValueError — never any other
exception, never a hang, never a record that lies about its bounds.
These parsers run executor-side over untrusted snapshot bytes at
100 TB, so "crashes only on ValueError" is a real operational
property, not test decoration.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from solana_snapshot_etl_tools_spark.sources import appendvec as AV  # noqa: E402
from solana_snapshot_etl_tools_spark.sources import bank as B  # noqa: E402
from solana_snapshot_etl_tools_spark.sources import snapshot as SNAP  # noqa: E402
from solana_snapshot_etl_tools_spark.operators import decoders as D  # noqa: E402
from solana_snapshot_etl_tools_spark.streaming import fbs  # noqa: E402


def _valid_append_vec() -> bytes:
    rows = [
        dict(
            pubkey=bytes([i] * 32),
            write_version=i,
            owner=bytes([i + 1] * 32),
            lamports=1000 + i,
            executable=bool(i % 2),
            rent_epoch=i,
            hash=bytes([i + 2] * 32),
            data=bytes(range(i * 3 % 250)),
        )
        for i in range(5)
    ]
    return AV.write_append_vec(rows)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_append_vec_walk_never_crashes_on_garbage(blob):
    for rec in AV.iter_append_vec(blob):
        # any yielded record must honor its own bounds
        assert len(rec["data"]) == rec["data_len"] <= len(blob)
        assert len(rec["pubkey"]) == 32 and len(rec["owner"]) == 32


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=800),
    st.binary(min_size=1, max_size=16),
)
def test_append_vec_walk_survives_point_corruption(pos, junk):
    base = bytearray(_valid_append_vec())
    pos = pos % len(base)
    base[pos : pos + len(junk)] = junk
    seen = 0
    for rec in AV.iter_append_vec(bytes(base)):
        assert len(rec["data"]) == rec["data_len"]
        seen += 1
        assert seen <= 64  # corrupted lengths must not loop unboundedly


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_bank_skip_walk_garbage_is_valueerror_only(blob):
    try:
        off = B.skip_versioned_bank(blob)
        assert 0 <= off <= len(blob)
    except ValueError:
        pass  # the ONLY permitted failure mode


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 255))
def test_bank_skip_walk_survives_point_corruption(pos, byte):
    base = bytearray(B.write_versioned_bank())
    base[pos % len(base)] = byte
    try:
        off = B.skip_versioned_bank(bytes(base))
        assert 0 <= off <= len(base)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_manifest_parse_garbage_is_valueerror_only(blob):
    try:
        SNAP.parse_manifest(blob)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_metadata_udf_parser_never_crashes(blob):
    out = D._parse_metadata(blob)
    assert out is None or len(out) == 10


def _account_fixture():
    return {
        "key": bytes(range(32)),
        "lamports": 5,
        "owner": bytes(range(32, 64)),
        "executable": False,
        "rent_epoch": 0,
        "data": b"\x01\x02",
        "write_version": 1,
        "slot": 2,
        "is_startup": False,
    }


import struct as _struct


@settings(max_examples=200, deadline=500)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 255))
def test_fbs_reader_survives_point_corruption(pos, byte):
    """Corrupted FlatBuffers must fail with a bounded, typed error (a
    consumer drops the message) — no hangs (hypothesis deadline), no
    giant allocations (vector lengths are sanity-bounded against the
    buffer size), no exception types a dispatcher wouldn't catch."""
    buf = bytearray(fbs.serialize_account(_account_fixture()))
    buf[pos % len(buf)] = byte
    try:
        out = fbs.deserialize_account(bytes(buf))
        assert isinstance(out, dict)
    except (ValueError, IndexError, UnicodeDecodeError, _struct.error):
        pass


# --- WARC stream parser (sources/warc.py) --------------------------------

from solana_snapshot_etl_tools_spark.sources import warc as W  # noqa: E402

_CRLF = b"\r\n"
_WTYPES = ["warcinfo", "request", "response", "metadata", "conversion"]


def _warc_record(wtype: str, payload: bytes, uri: str | None) -> bytes:
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: <urn:uuid:x>",
    ]
    if uri is not None:
        h.append(b"WARC-Target-URI: " + uri.encode())
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(h) + _CRLF + _CRLF + payload + _CRLF + _CRLF


_recs = st.lists(
    st.tuples(
        st.sampled_from(_WTYPES),
        # payloads may contain CRLFs, header-like lines, and even
        # "WARC/1.0" itself — Content-Length framing must not care
        st.binary(max_size=300),
        st.one_of(st.none(), st.text(alphabet="abc/:.0", max_size=20)),
    ),
    max_size=8,
)


@settings(max_examples=150, deadline=None)
@given(recs=_recs, gz=st.booleans())
def test_warc_roundtrip_arbitrary_payloads(tmp_path_factory, recs, gz):
    import gzip as _gzip
    import os
    import tempfile

    blob = b"".join(
        (_gzip.compress(r) if gz else r)
        for r in (_warc_record(t, p, u) for t, p, u in recs)
    )
    fd, path = tempfile.mkstemp(suffix=".warc.gz" if gz else ".warc")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        got = [
            r for r in W._iter_records(path, None, 1 << 30)
            if r[0] != "__stats__"
        ]
        assert len(got) == len(recs)
        for (wtype, payload, uri), row in zip(recs, got):
            assert row[1] == wtype
            assert row[3] == uri
            assert row[6] == len(payload)
            # for http-ish records the payload may legitimately split
            # into (status, body); reassembly not required — but
            # non-http payloads must come back byte-identical
            if not payload.startswith(b"HTTP/"):
                assert row[9] == payload
    finally:
        os.unlink(path)


@settings(max_examples=150, deadline=None)
@given(blob=st.binary(max_size=600), gz=st.booleans())
def test_warc_garbage_never_crashes(blob, gz):
    import gzip as _gzip
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".warc.gz" if gz else ".warc")
    try:
        with os.fdopen(fd, "wb") as f:
            # half the gz cases get VALID gzip of garbage, half raw
            # garbage mislabeled .gz (corrupt member headers)
            f.write(_gzip.compress(blob) if gz and len(blob) % 2 else blob)
        rows = list(W._iter_records(path, None, 1 << 30))
        # sentinel always arrives; any yielded record honors its bounds
        assert rows[-1][0] == "__stats__"
        for r in rows[:-1]:
            assert len(r[9]) <= r[6]
    finally:
        os.unlink(path)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=-(2**40), max_value=-1))
def test_warc_negative_content_length_stops_cleanly(tmp_path_factory, neg):
    import os
    import tempfile

    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + b"Content-Length: " + str(neg).encode() + b"\r\n\r\n"
        + b"junk that must never be slurped as a negative read\r\n\r\n"
    )
    fd, path = tempfile.mkstemp(suffix=".warc")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(rec)
        rows = list(W._iter_records(path, None, 1 << 30))
        assert rows == [("__stats__", 0, 1)]
    finally:
        os.unlink(path)


@settings(max_examples=100, deadline=None)
@given(recs=_recs, gz=st.booleans())
def test_cdx_builder_offsets_are_exact(tmp_path_factory, recs, gz):
    """Property: every (offset, length) the index builder emits cuts
    the archive EXACTLY at the record's member bounds — the contract
    random access depends on."""
    import gzip as _gzip
    import os
    import tempfile

    raw = [_warc_record(t, p, u) for t, p, u in recs]
    members = [(_gzip.compress(r) if gz else r) for r in raw]
    blob = b"".join(members)
    fd, path = tempfile.mkstemp(suffix=".warc.gz" if gz else ".warc")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        rows = list(W._iter_cdx_entries(path, None))
        assert rows[-1][0] == "__stats__"
        entries = rows[:-1]
        assert len(entries) == len(recs)
        for rec, member, row in zip(raw, members, entries):
            off, length = row[7], row[6]
            cut = blob[off:off + length]
            if gz:
                # gz entries cover the whole member
                assert cut == member
                assert _gzip.decompress(cut) == rec
            else:
                # plain entries cover headers+payload exactly; the
                # trailing CRLF/CRLF framing is excluded (the fetch
                # side never needs it)
                assert cut == rec[:-4]
        # entries start exactly at each member/record boundary
        assert [r[7] for r in entries] == [
            sum(len(m) for m in members[:i]) for i in range(len(members))
        ]
    finally:
        os.unlink(path)


@settings(max_examples=100, deadline=None)
@given(blob=st.binary(max_size=600), gz=st.booleans())
def test_cdx_builder_garbage_never_crashes(blob, gz):
    import gzip as _gzip
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".warc.gz" if gz else ".warc")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(_gzip.compress(blob) if gz and len(blob) % 2 else blob)
        # skip mode: garbage never crashes (default "fail" mode makes
        # corruption a loud ValueError instead — tested separately)
        rows = list(W._iter_cdx_entries(path, None, on_corrupt="skip"))
        assert rows[-1][0] == "__stats__"
        for r in rows[:-1]:
            assert r[6] > 0 and r[7] >= 0
    finally:
        os.unlink(path)


# ---------------------------------------------------------------------------
# Exact-agreement sweeps: _parse_http_payload / _read_headers vs the
# stdlib's own HTTP header machinery (http.client.parse_headers — the
# email feedparser). The robots sweeps (round 13) found two real
# fail-opens unit tests had missed; these parsers guard ingestion AND
# the CDX index, so they get the same treatment.
# ---------------------------------------------------------------------------

def _ref_http(payload: bytes):
    """Independent reference for _parse_http_payload built on
    http.client.parse_headers (different machinery: line-by-line
    feedparser with universal newlines, folding, first-wins get()).
    Returns None when the message has no header/body boundary — the
    contract branch where ours must pass the payload through."""
    import http.client as _hc
    import io as _io
    import re as _rx

    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    if not _rx.search(rb"(\r\n|\n)(\r\n|\n)", payload):
        return "NO_BOUNDARY"
    m = _rx.match(rb"[^\r\n]*(\r\n|\n)", payload)
    status_line = payload[: m.start(1)]
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    f = _io.BytesIO(payload[m.end():])
    msg = _hc.parse_headers(f)
    body = f.read()
    ctype = msg.get("Content-Type")
    return status, ctype, body


def _norm_ws(s):
    # folded values keep the embedded break in email's compat32 and a
    # single joining space in ours — compare whitespace-normalized
    import re as _rx

    return _rx.sub(r"\s+", " ", s).strip() if s is not None else None


_HDR_NAME = st.sampled_from(
    ["Content-Type", "content-type", "cOnTeNt-TyPe", "Server",
     "X-Other", "Content-Length"]
)
_HDR_VAL = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\r\n\x00", categories=("L", "N", "P", "Zs")
    ),
    min_size=0, max_size=30,
)
_EOL = st.sampled_from([b"\r\n", b"\n"])


@st.composite
def _http_message(draw):
    eol0 = draw(_EOL)
    status = draw(st.integers(min_value=100, max_value=599))
    out = b"HTTP/1.1 %d OK%s" % (status, eol0)
    for _ in range(draw(st.integers(min_value=0, max_value=6))):
        name = draw(_HDR_NAME)
        val = draw(_HDR_VAL)
        out += name.encode() + b": " + val.encode() + draw(_EOL)
        if draw(st.booleans()):
            # folded continuation line
            out += b" " + draw(_HDR_VAL).encode() + draw(_EOL)
    if draw(st.booleans()):
        out += draw(_EOL)  # blank line -> body present
        out += draw(st.binary(max_size=60))  # body may contain CRLFCRLF
    return out


@settings(max_examples=400, deadline=None)
@given(_http_message())
def test_http_payload_agrees_with_stdlib(payload):
    got = W._parse_http_payload(payload)
    ref = _ref_http(payload)
    if ref == "NO_BOUNDARY":
        assert got == (None, None, payload)
        return
    assert got[0] == ref[0]
    assert _norm_ws(got[1]) == _norm_ws(ref[1])
    assert got[2] == ref[2]


@settings(max_examples=400, deadline=None)
@given(
    st.lists(st.tuples(_HDR_NAME, _HDR_VAL, st.booleans()), max_size=6),
    _EOL,
)
def test_warc_headers_agree_with_stdlib(fields, eol):
    """_read_headers vs parse_headers on the same block: same key set
    (lowercased), same values after whitespace-normalization — except
    duplicate names, where ours is documented last-wins vs email's
    first-wins get(), so compare against get_all()[-1]."""
    import http.client as _hc
    import io as _io

    block = b"WARC/1.0" + eol
    for name, val, fold in fields:
        block += name.encode() + b":" + val.encode() + eol
        if fold:
            block += b"\tfolded tail" + eol
    block += eol + b"PAYLOAD"
    s = _io.BufferedReader(_io.BytesIO(block))
    got = W._read_headers(s)
    rest = s.read()
    assert rest == b"PAYLOAD"  # cursor lands exactly at the payload

    ref_src = block.split(eol, 1)[1]
    msg = _hc.parse_headers(_io.BytesIO(ref_src))
    assert got.pop("__version__") == "WARC/1.0"
    ref_keys = {k.lower() for k in msg.keys()}
    assert set(got) == ref_keys
    for k in ref_keys:
        assert _norm_ws(got[k]) == _norm_ws(msg.get_all(k)[-1])


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=50), _EOL)
def test_warc_headers_junk_line_is_valueerror_only(junk, eol):
    """A colon-less, non-continuation line inside the block is the
    documented ValueError branch (framing lost) — never any other
    exception. (email.parser would tolerate it; our reader guards
    Content-Length-framed walks, where tolerance means mis-framing.)"""
    import io as _io

    if b":" in junk or b"\r" in junk or b"\n" in junk or not junk:
        return
    if junk[:1] in (b" ", b"\t"):
        return  # that's a fold, handled above
    block = b"WARC/1.0" + eol + b"A: 1" + eol + junk + eol + eol
    try:
        W._read_headers(_io.BufferedReader(_io.BytesIO(block)))
    except ValueError:
        pass


# CDXJ serialization round-trip: arbitrary field CONTENT must survive
# cdxj_lines -> read_cdxj exactly — the JSON escapes data fields, the
# whitespace defense keeps the space-delimited framing intact for
# urlkey/ts from any source.
_FIELD = st.text(
    alphabet=st.characters(
        exclude_characters="\x00", exclude_categories=("Cs",)
    ),
    min_size=0, max_size=24,
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(_FIELD, _FIELD, _FIELD, st.integers(0, 2**40),
                  st.integers(1, 2**40)),
        min_size=1, max_size=6,
    )
)
def test_cdxj_lines_roundtrip_arbitrary_fields(spark, rows):
    import json as _json

    entries = spark.createDataFrame(
        [
            (f"k{i}", "20260816000000", url, mime, 200, dig, ln, off,
             f"f{i}.warc.gz")
            for i, (url, mime, dig, off, ln) in enumerate(rows)
        ],
        W.CDXJ_SCHEMA,
    )
    lines = [r.value for r in W.cdxj_lines(entries).collect()]
    # every line keeps exactly the 3-field framing
    for ln_ in lines:
        k, t, j = ln_.split(" ", 2)
        assert " " not in k and " " not in t
        _json.loads(j)
    # re-read through the real parser (write to a temp file)
    import os
    import tempfile
    fd, path = tempfile.mkstemp(suffix=".cdxj")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        got = {
            r.urlkey: (r.url, r.mime, r.digest, r.offset, r.length)
            for r in W.read_cdxj(spark, path).collect()
        }
        want = {
            f"k{i}": (url, mime, dig, off, ln)
            for i, (url, mime, dig, off, ln) in enumerate(rows)
        }
        # read_cdxj drops rows with null offset/length/filename only;
        # all ours are set, so everything must round-trip exactly.
        # Empty-string data fields come back as '' (JSON), not null.
        assert got == want
    finally:
        os.unlink(path)
