"""WARC/WET source: parse, filter, skip-not-fail, document conversion.

Fixtures are REAL WARC/1.0 byte streams written from scratch here
(CRLF headers, Content-Length framing, two-CRLF record separator,
one gzip member per record in the .gz variants) — the same wire
format Common Crawl ships.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.sources import warc as W

CRLF = b"\r\n"


def _record(wtype: str, payload: bytes, uri: str | None = None,
            ctype: str | None = None, rid: str = "<urn:uuid:1>") -> bytes:
    headers = [
        b"WARC/1.0",
        f"WARC-Type: {wtype}".encode(),
        f"WARC-Record-ID: {rid}".encode(),
        b"WARC-Date: 2026-08-16T00:00:00Z",
    ]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}".encode())
    if ctype:
        headers.append(f"Content-Type: {ctype}".encode())
    headers.append(f"Content-Length: {len(payload)}".encode())
    return CRLF.join(headers) + CRLF + CRLF + payload + CRLF + CRLF


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    head = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


def _write(path, records: list[bytes], gz: bool) -> str:
    data = (
        b"".join(gzip.compress(r) for r in records) if gz else b"".join(records)
    )
    path.write_bytes(data)
    return str(path)


@pytest.fixture(scope="module")
def archive_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs1 = [
        _record("warcinfo", b"software: test\r\n", ctype="application/warc-fields"),
        _record("request", _http(b"", 200), uri="http://a.example/p1"),
        _record(
            "response",
            _http(b"<html><title>P1</title><p>hello world this is a "
                  b"perfectly ordinary page with enough plain english "
                  b"text that the default language and quality filters "
                  b"keep it</p></html>"),
            uri="http://a.example/p1",
            ctype="application/http; msgtype=response",
        ),
        _record(
            "response",
            _http(b"not found", status=404),
            uri="http://a.example/missing",
            ctype="application/http; msgtype=response",
        ),
        _record(
            "response",
            _http(b"\x89PNG...", ctype="image/png"),
            uri="http://a.example/logo.png",
            ctype="application/http; msgtype=response",
        ),
    ]
    recs2 = [
        _record(
            "response",
            # malformed UTF-8 in a 200 HTML body: must not kill the read
            _http(b"<html><p>caf\xe9 \xff latin-1-ish second page with "
                  b"plenty of ordinary english words so the default "
                  b"filters keep this document too</p></html>"),
            uri="http://b.example/p2",
            ctype="application/http; msgtype=response",
        ),
        _record("metadata", b"fetchTimeMs: 12\r\n", uri="http://b.example/p2"),
    ]
    _write(d / "part1.warc.gz", recs1, gz=True)
    _write(d / "part2.warc", recs2, gz=False)  # plain variant
    return d


def test_read_warc_default_keeps_responses_only(spark, archive_dir):
    rows = W.read_warc(spark, f"{archive_dir}/*.warc*").collect()
    assert {r.warc_type for r in rows} == {"response"}
    assert len(rows) == 4
    p1 = next(r for r in rows if r.target_uri == "http://a.example/p1")
    assert p1.http_status == 200
    assert p1.http_content_type == "text/html"
    assert bytes(p1.payload).startswith(b"<html><title>P1</title><p>hello world")
    assert p1.record_id == "<urn:uuid:1>"
    assert p1.warc_date == "2026-08-16T00:00:00Z"
    assert p1.warc_file.endswith("part1.warc.gz")


def test_read_warc_all_types(spark, archive_dir):
    rows = W.read_warc(
        spark, f"{archive_dir}/*.warc*", record_types=None
    ).collect()
    by_type = {r.warc_type for r in rows}
    assert by_type == {"warcinfo", "request", "response", "metadata"}
    info = next(r for r in rows if r.warc_type == "warcinfo")
    assert info.http_status is None
    assert bytes(info.payload) == b"software: test\r\n"


def test_html_documents_filter_and_lossy_decode(spark, archive_dir):
    docs = W.warc_html_documents(spark, f"{archive_dir}/*.warc*")
    rows = {r.url: r for r in docs.collect()}
    # 404 and image/png responses are gone; both 200 HTML pages stay.
    assert set(rows) == {"http://a.example/p1", "http://b.example/p2"}
    assert "hello world" in rows["http://a.example/p1"].text
    # lossy decode: replacement char, not a thrown MALFORMED_CHARACTER_CODING
    assert "�" in rows["http://b.example/p2"].text
    # stable content-addressed ids
    again = {r.url: r.doc_id for r in
             W.warc_html_documents(spark, f"{archive_dir}/*.warc*").collect()}
    assert {u: r.doc_id for u, r in rows.items()} == again
    # composes with the existing HTML extraction
    from solana_snapshot_etl_tools_spark.functions.html import html_to_text

    text = (
        docs.filter(F.col("url") == "http://a.example/p1")
        .select(html_to_text(F.col("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert "hello world" in text and "<p>" not in text


def test_wet_documents(spark, tmp_path):
    recs = [
        _record("warcinfo", b"format: WET\r\n"),
        _record("conversion", b"Just the extracted text.",
                uri="http://c.example/p3", ctype="text/plain"),
    ]
    p = _write(tmp_path / "x.warc.wet.gz", recs, gz=True)
    rows = W.wet_documents(spark, [p]).collect()
    assert len(rows) == 1
    assert rows[0].text == "Just the extracted text."
    assert rows[0].url == "http://c.example/p3"


def test_truncated_archive_skips_not_fails(spark, tmp_path):
    good = _record("response", _http(b"<html>ok</html>"),
                   uri="http://t.example/a")
    bad = _record("response", _http(b"<html>lost</html>"),
                  uri="http://t.example/b")[:-20]  # cut inside payload
    p = _write(tmp_path / "trunc.warc", [good, bad], gz=False)
    rows = W.read_warc(spark, [p]).collect()
    assert [r.target_uri for r in rows] == ["http://t.example/a"]
    stats = W.warc_file_stats(spark, [p]).collect()[0]
    assert stats.n_records == 1
    assert stats.n_skipped >= 1


def test_sequential_corrupt_deflate_skips_not_fails(spark, tmp_path):
    """Corrupt DEFLATE data inside a gzip member raises zlib.error
    (not OSError/EOFError) — the sequential scan must absorb it as a
    skip, mirroring the indexed path's audit-row behavior."""
    # records must out-size the scanner's 1 MiB read-ahead buffer or
    # the buffer fill for their OWN bytes already touches the corrupt
    # member; the record ADJACENT to the corruption (b) is lost to
    # that same read-ahead — inherent to a chained-gzip sequential
    # scan, where everything after the corruption is unrecoverable
    # anyway — but earlier records (a) must survive
    good_a = _record("response", _http(b"<html>" + b"x" * (5 << 19) + b"</html>"),
                     uri="http://zc.example/a")
    good_b = _record("response", _http(b"<html>" + b"w" * (5 << 19) + b"</html>"),
                     uri="http://zc.example/b")
    bad = _record("response", _http(b"<html>" + b"y" * 400 + b"</html>"),
                  uri="http://zc.example/c")
    member_bad = bytearray(gzip.compress(bad))
    # flip bytes well past the 10-byte gzip header: corrupts the
    # deflate stream itself, which zlib reports as zlib.error
    mid = len(member_bad) // 2
    for i in range(mid, mid + 30):
        member_bad[i] ^= 0xFF
    p = tmp_path / "deflate.warc.gz"
    p.write_bytes(gzip.compress(good_a) + gzip.compress(good_b) + bytes(member_bad))
    rows = W.read_warc(spark, [str(p)]).collect()  # must not raise
    assert [r.target_uri for r in rows] == ["http://zc.example/a"]
    stats = W.warc_file_stats(spark, [str(p)]).collect()[0]
    assert stats.n_records == 1
    assert stats.n_skipped >= 1


def test_payload_cap_skips_and_counts(spark, tmp_path):
    small = _record("response", _http(b"<html>s</html>"), uri="http://z/s")
    big = _record("response", _http(b"x" * 5000), uri="http://z/big")
    p = _write(tmp_path / "cap.warc.gz", [small, big], gz=True)
    rows = W.read_warc(spark, [p], max_payload_bytes=1000).collect()
    assert [r.target_uri for r in rows] == ["http://z/s"]
    stats = W.warc_file_stats(spark, [p], record_types=["response"],
                              max_payload_bytes=1000).collect()[0]
    assert (stats.n_records, stats.n_skipped) == (1, 1)


def test_batch_boundary_many_records(spark, tmp_path):
    n = 300  # crosses the 256-row Arrow batch bound inside one file
    recs = [
        _record("response", _http(f"<html>{i}</html>".encode()),
                uri=f"http://m.example/{i}", rid=f"<urn:uuid:{i}>")
        for i in range(n)
    ]
    p = _write(tmp_path / "many.warc.gz", recs, gz=True)
    df = W.read_warc(spark, [p])
    assert df.count() == n
    assert df.select("target_uri").distinct().count() == n


def test_resolve_paths_errors(spark):
    with pytest.raises(FileNotFoundError):
        W.read_warc(spark, "/nonexistent/*.warc.gz")
    with pytest.raises(ValueError, match="empty"):
        W.read_warc(spark, [])


def test_cli_warc_input_end_to_end(spark, archive_dir, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("corpus_warc"))
    assert corpus_cli.main([
        f"{archive_dir}/*.warc*", out,
        "--input-format", "warc", "--html-extract", "--no-pii",
        "--quality", "0", "--records-per-shard", "100",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rep = json.loads(lines[-1])
    assert rep["n_input"] == 2  # the two 200-OK HTML pages
    assert rep["n_after_filters"] >= 1
    got = spark.read.parquet(f"{out}/train").unionByName(
        spark.read.parquet(f"{out}/val"), allowMissingColumns=True
    ).unionByName(spark.read.parquet(f"{out}/test"), allowMissingColumns=True)
    texts = [r.text for r in got.collect()]
    assert any("hello world" in t for t in texts)
    assert all("<html>" not in t for t in texts)  # extraction ran


def test_cli_jsonl_input(spark, tmp_path, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    src = tmp_path / "docs.jsonl"
    with open(src, "w") as f:
        for i in range(30):
            f.write(json.dumps({
                "doc_id": f"d{i}",
                "text": f"document number {i} with some words in it",
            }) + "\n")
    out = str(tmp_path_factory.mktemp("corpus_jsonl"))
    assert corpus_cli.main([
        str(src), out, "--input-format", "jsonl", "--no-pii",
        "--quality", "0", "--records-per-shard", "100",
    ]) == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["n_input"] == 30

    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"text": "no id"}\n')
    with pytest.raises(SystemExit, match="doc_id"):
        corpus_cli.main([str(bad), out, "--input-format", "jsonl"])


def test_cli_stream_mode_rejects_warc_input(tmp_path):
    from solana_snapshot_etl_tools_spark import corpus_cli

    with pytest.raises(SystemExit):
        corpus_cli.main([
            str(tmp_path), str(tmp_path / "out"),
            "--input-format", "warc",
            "--ingest-stream", "--index-out", str(tmp_path / "idx"),
        ])


@pytest.mark.slow
def test_cli_crawl_capstone_composes_round12_stages(
    spark, tmp_path, tmp_path_factory, capsys
):
    """WARC in → extract → url-dedup → near-dedup → skew report →
    byte-sized shards + persisted report: the round-12 pieces working
    as ONE pipeline, not as isolated features."""
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    body = (b"<html><p>a perfectly ordinary english paragraph that the "
            b"default quality and language filters will keep around %d"
            b"</p></html>")
    recs = []
    for i in range(12):
        recs.append(_record(
            "response", _http(body % i),
            uri=f"http://site.example/page{i}",
            ctype="application/http; msgtype=response",
            rid=f"<urn:uuid:{i}>",
        ))
    # a byte-identical re-crawl of page0: same url, same content →
    # same content-addressed doc_id → collapses AT INGEST
    recs.append(_record(
        "response", _http(body % 0),
        uri="http://site.example/page0",
        ctype="application/http; msgtype=response",
        rid="<urn:uuid:recrawl>",
    ))
    # a tracking-param variant of page1 with drifted content: distinct
    # doc_id, same NORMALIZED url → collapses at --url-dedup
    recs.append(_record(
        "response", _http(body % 1 + b"<!-- ad slot 7 -->"),
        uri="http://site.example/page1?utm_source=feed",
        ctype="application/http; msgtype=response",
        rid="<urn:uuid:variant>",
    ))
    p = _write(tmp_path / "crawl.warc.gz", recs, gz=True)

    out = str(tmp_path_factory.mktemp("capstone"))
    assert corpus_cli.main([
        p, out,
        "--input-format", "warc", "--html-extract", "--no-pii",
        "--url-dedup", "--near-dedup",
        "--skew-report", "url",
        "--shard-target-mb", "1",
    ]) == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    # 14 responses; the byte-identical re-crawl collapsed at ingest
    # (content-addressed id), leaving 13 unique docs...
    assert rep["n_input"] == 13
    # ...and the utm variant collapsed on its NORMALIZED url
    assert rep["n_after_url_dedup"] == 12
    assert rep["n_after_filters"] >= 1
    assert rep["records_per_shard"] >= 1
    assert rep["skew_key"] == ["url"]
    # report persisted beside the data it describes
    with open(f"{out}/report.json") as f:
        assert json.load(f) == rep


def _wav_bytes(n_samples=64):
    import struct

    data = bytes((i * 7) % 256 for i in range(n_samples * 2))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _bmp_bytes(width=5, height=3, tweak=0):
    import struct

    row = ((width * 3) + 3) // 4 * 4
    pixels = bytes((i * 11 + tweak) % 256 for i in range(row * height))
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(pixels), 2835, 2835, 0, 0)
    return header + pixels


def test_warc_media_bridges_into_multimodal(spark, tmp_path):
    """Crawl archive → warc_media → decode_media_meta / phash dedup:
    the multimodal pipeline runs on crawl payloads unchanged."""
    from solana_snapshot_etl_tools_spark.operators.media_dedup import (
        phash_dedup,
    )
    from solana_snapshot_etl_tools_spark.operators.multimodal import (
        decode_media_meta,
    )

    bmp = _bmp_bytes()
    recs = [
        _record("response", _http(bmp, ctype="image/bmp"),
                uri="http://img.example/a.bmp",
                ctype="application/http; msgtype=response"),
        # the SAME image served from a mirror url: phash-dedup fodder
        _record("response", _http(bmp, ctype="image/bmp"),
                uri="http://mirror.example/a.bmp",
                ctype="application/http; msgtype=response"),
        _record("response", _http(_wav_bytes(), ctype="audio/wav"),
                uri="http://img.example/s.wav",
                ctype="application/http; msgtype=response"),
        # non-media responses must not leak in
        _record("response", _http(b"<html>x</html>"),
                uri="http://img.example/page",
                ctype="application/http; msgtype=response"),
    ]
    p = _write(tmp_path / "media.warc.gz", recs, gz=True)
    media = W.warc_media(spark, [p])
    rows = {r.url: r for r in media.collect()}
    assert {r.kind for r in rows.values()} == {"image", "audio"}
    assert len(rows) == 3
    # std codec REALLY decodes the crawl payloads
    meta = {
        r.media_id: r
        for r in decode_media_meta(media, codec="std").collect()
    }
    bmp_meta = meta[rows["http://img.example/a.bmp"].media_id]
    assert (bmp_meta.format, bmp_meta.width, bmp_meta.height) == ("bmp", 5, 3)
    wav_meta = meta[rows["http://img.example/s.wav"].media_id]
    assert (wav_meta.format, wav_meta.sample_rate) == ("wav", 8000)
    # the mirrored copy collapses under perceptual-hash dedup:
    # the decision table maps both bmp copies to ONE canonical
    decisions = phash_dedup(media, codec="std")
    kept = media.join(
        decisions.filter(F.col("media_id") == F.col("keep_id"))
        .select("media_id"),
        "media_id",
        "left_semi",
    )
    assert kept.count() == 2
    urls = {r.url for r in kept.collect()}
    assert "http://img.example/s.wav" in urls
    assert len(urls & {"http://img.example/a.bmp",
                       "http://mirror.example/a.bmp"}) == 1


def test_warc_media_validates_kinds(spark, tmp_path):
    p = _write(tmp_path / "e.warc", [_record("warcinfo", b"x")], gz=False)
    with pytest.raises(ValueError, match="unknown media kinds"):
        W.warc_media(spark, [p], kinds=("image", "text"))


class TestCdxRandomAccess:
    def _archive_with_index(self, tmp_path, n=30):
        """warc.gz + CDXJ lines, offsets/lengths tracked per member."""
        import json as _json

        members, entries = [], []
        off = 0
        for i in range(n):
            status = 200 if i % 3 else 404
            rec = _record(
                "response",
                _http(f"<html>page {i} body</html>".encode(), status=status),
                uri=f"http://x.example/{i}",
                ctype="application/http; msgtype=response",
                rid=f"<urn:uuid:{i}>",
            )
            member = gzip.compress(rec)
            members.append(member)
            entries.append(
                f"example,x)/{i} 2026081600000{i % 10} "
                + _json.dumps({
                    "url": f"http://x.example/{i}",
                    "mime": "text/html",
                    "status": str(status),
                    "digest": f"D{i}",
                    "length": str(len(member)),
                    "offset": str(off),
                    "filename": "archive.warc.gz",
                })
            )
            off += len(member)
        (tmp_path / "archive.warc.gz").write_bytes(b"".join(members))
        (tmp_path / "index.cdxj").write_text("\n".join(entries) + "\n")
        return tmp_path

    def test_cdxj_parses(self, spark, tmp_path):
        d = self._archive_with_index(tmp_path)
        idx = W.read_cdxj(spark, str(d / "index.cdxj"))
        rows = idx.orderBy("offset").collect()
        assert len(rows) == 30
        assert rows[0].urlkey == "example,x)/0"
        assert rows[0].offset == 0
        assert rows[0].filename == "archive.warc.gz"
        assert rows[1].offset > 0
        assert {r.status for r in rows} == {200, 404}

    def test_index_pushdown_fetches_only_selected_ranges(self, spark, tmp_path):
        d = self._archive_with_index(tmp_path)
        idx = W.read_cdxj(spark, str(d / "index.cdxj"))
        sel = idx.filter(F.col("status") == 200)  # pushdown on the INDEX
        recs = W.read_warc_records_at(spark, sel, base_dir=str(d))
        rows = {r.target_uri: r for r in recs.collect()}
        assert len(rows) == 20  # 404s never fetched
        for uri, r in rows.items():
            i = int(uri.rsplit("/", 1)[1])
            assert i % 3 != 0
            assert r.http_status == 200
            assert bytes(r.payload) == f"<html>page {i} body</html>".encode()
            assert r.record_id == f"<urn:uuid:{i}>"

    def test_one_file_fans_out_across_partitions(self, spark, tmp_path):
        d = self._archive_with_index(tmp_path)
        idx = W.read_cdxj(spark, str(d / "index.cdxj"))
        recs = W.read_warc_records_at(
            spark, idx, base_dir=str(d), num_partitions=6
        )
        per_part = (
            recs.select(F.spark_partition_id().alias("p"))
            .groupBy("p").count().collect()
        )
        # ONE archive file, many tasks actually doing work
        assert len([r for r in per_part if r["count"] > 0]) >= 3
        assert sum(r["count"] for r in per_part) == 30

    def test_corrupt_member_yields_audit_row(self, spark, tmp_path):
        d = self._archive_with_index(tmp_path)
        blob = bytearray((d / "archive.warc.gz").read_bytes())
        # corrupt the middle of the file (hits some member's deflate data)
        mid = len(blob) // 2
        for i in range(mid, mid + 40):
            blob[i] ^= 0xFF
        (d / "archive.warc.gz").write_bytes(bytes(blob))
        idx = W.read_cdxj(spark, str(d / "index.cdxj"))
        recs = W.read_warc_records_at(spark, idx, base_dir=str(d)).collect()
        assert len(recs) == 30  # every entry accounted for
        bad = [r for r in recs if r.warc_type is None]
        good = [r for r in recs if r.warc_type is not None]
        assert bad, "corruption must surface as audit rows"
        assert good, "undamaged members must still parse"
        for r in bad:
            assert r.warc_file.endswith("archive.warc.gz")
            assert r.record_offset is not None

    def test_validation(self, spark):
        df = spark.createDataFrame([(1,)], "x int")
        with pytest.raises(ValueError, match="entries needs column"):
            W.read_warc_records_at(spark, df)

    def test_unopenable_archive_yields_audit_rows(self, spark, tmp_path):
        """An index entry naming a missing archive must not kill the
        task: it (and every sibling entry for that file) becomes a
        null audit row while entries for readable files still parse."""
        recs = [
            _record("response", _http(f"<html>{i}</html>".encode()),
                    uri=f"http://q.example/{i}", rid=f"<urn:uuid:{i}>")
            for i in range(3)
        ]
        members, entries, off = [], [], 0
        for r in recs:
            m = gzip.compress(r)
            members.append(m)
            entries.append(("good.warc.gz", off, len(m)))
            off += len(m)
        (tmp_path / "good.warc.gz").write_bytes(b"".join(members))
        entries += [("missing.warc.gz", 0, 123), ("missing.warc.gz", 200, 55)]
        idx = spark.createDataFrame(
            entries, "filename string, offset long, length long"
        )
        # ONE partition: the unopenable file shares a task with the
        # good one — proving the failure is per-entry, not per-task
        rows = W.read_warc_records_at(
            spark, idx, base_dir=str(tmp_path), num_partitions=1
        ).collect()
        assert len(rows) == 5
        good = [r for r in rows if r.warc_type is not None]
        bad = [r for r in rows if r.warc_type is None]
        assert len(good) == 3 and len(bad) == 2
        assert {r.target_uri for r in good} == {
            f"http://q.example/{i}" for i in range(3)
        }
        for r in bad:
            assert r.warc_file.endswith("missing.warc.gz")
            assert r.record_offset in (0, 200)


class TestCdxBuilder:
    """build_cdxj_entries: index a local archive, then random-access it
    — closes the loop where read_cdxj could only consume an index some
    OTHER tool produced."""

    def _archive(self, tmp_path, gz: bool, n=12):
        recs = []
        for i in range(n):
            status = 200 if i % 3 else 404
            recs.append(_record(
                "response",
                _http(f"<html>built {i}</html>".encode(), status=status),
                uri=f"http://b.example/p/{i}?x=1",
                ctype="application/http; msgtype=response",
                rid=f"<urn:uuid:{i}>",
            ))
        name = "built.warc.gz" if gz else "built.warc"
        return _write(tmp_path / name, recs, gz=gz), n

    @pytest.mark.parametrize("gz", [True, False])
    def test_roundtrip_byte_identical(self, spark, tmp_path, gz):
        p, n = self._archive(tmp_path, gz)
        idx = W.build_cdxj_entries(spark, [p], record_types=None)
        rows = idx.orderBy("offset").collect()
        assert len(rows) == n
        assert rows[0].offset == 0
        assert all(r.status in (200, 404) for r in rows)
        assert rows[0].urlkey == "example,b)/p/0?x=1"
        assert all(len(r.digest) == 40 for r in rows)
        # the built (offset, length) frame fetches every record back
        # byte-identically vs the sequential scan
        seq = {
            r.record_id: bytes(r.payload)
            for r in W.read_warc(spark, [p], record_types=None).collect()
        }
        got = {
            r.record_id: bytes(r.payload)
            for r in W.read_warc_records_at(
                spark, idx, base_dir=str(tmp_path)
            ).collect()
        }
        assert got == seq and len(got) == n

    def test_written_cdxj_file_round_trips(self, spark, tmp_path):
        p, n = self._archive(tmp_path, gz=True)
        idx = W.build_cdxj_entries(spark, [p], record_types=None)
        out = str(tmp_path / "built.cdxj")
        n_lines = W.write_cdxj_file(idx, out)
        assert n_lines == n
        # sorted by urlkey (CDX convention)
        keys = [l.split(" ", 1)[0] for l in open(out).read().splitlines()]
        assert keys == sorted(keys)
        reread = W.read_cdxj(spark, out)
        assert reread.count() == n
        recs = W.read_warc_records_at(
            spark, reread.filter(F.col("status") == 200),
            base_dir=str(tmp_path),
        ).collect()
        assert len(recs) == sum(1 for i in range(n) if i % 3)
        assert all(r.http_status == 200 for r in recs)

    def test_default_keeps_responses_only(self, spark, tmp_path):
        recs = [
            _record("warcinfo", b"software: t\r\n"),
            _record("request", _http(b""), uri="http://b.example/r"),
            _record("response", _http(b"<html>x</html>"),
                    uri="http://b.example/r"),
        ]
        p = _write(tmp_path / "mixed.warc.gz", recs, gz=True)
        idx = W.build_cdxj_entries(spark, [p]).collect()
        assert len(idx) == 1
        assert idx[0].url == "http://b.example/r"
        assert idx[0].mime == "text/html"

    def _corrupt_archive(self, tmp_path):
        good = gzip.compress(_record(
            "response", _http(b"<html>ok</html>"), uri="http://c.example/a"
        ))
        bad = bytearray(gzip.compress(_record(
            "response", _http(b"<html>bad</html>"), uri="http://c.example/b"
        )))
        for i in range(len(bad) // 2, len(bad) // 2 + 20):
            bad[i] ^= 0xFF
        p = tmp_path / "corrupt.warc.gz"
        p.write_bytes(good + bytes(bad))
        return str(p)

    def test_corrupt_member_fails_loudly_by_default(self, spark, tmp_path):
        """A scanner that skips a rotten record loses it once; an
        index built past one silently loses every later record on
        every future read — so the builder's default is LOUD."""
        p = self._corrupt_archive(tmp_path)
        with pytest.raises(Exception, match="cannot index"):
            W.build_cdxj_entries(spark, [p]).collect()

    def test_corrupt_member_skip_mode_partial_plus_stats(self, spark, tmp_path):
        p = self._corrupt_archive(tmp_path)
        rows = W.build_cdxj_entries(spark, [p], on_corrupt="skip").collect()
        assert [r.url for r in rows] == ["http://c.example/a"]
        st = W.build_cdxj_stats(spark, [p]).collect()[0]
        assert st.n_entries == 1
        assert st.n_skipped >= 1
        with pytest.raises(ValueError, match="on_corrupt"):
            W.build_cdxj_entries(spark, [p], on_corrupt="nope")

    def test_digest_agrees_across_warc_and_warc_gz(self, spark, tmp_path):
        """The digest is a capture identity for dedup/diff, so the SAME
        record archived plain vs record-gzipped must hash identically —
        the gzip member's trailing CRLF CRLF separators are framing,
        not record bytes."""
        p_gz, n = self._archive(tmp_path, gz=True)
        p_plain, _ = self._archive(tmp_path, gz=False, n=n)
        dig = {
            True: {r.url: r.digest for r in
                   W.build_cdxj_entries(spark, [p_gz]).collect()},
            False: {r.url: r.digest for r in
                    W.build_cdxj_entries(spark, [p_plain]).collect()},
        }
        assert dig[True] and dig[True] == dig[False]

    def test_nonwarc_gzip_member_loud_by_default(self, spark, tmp_path):
        """A member that gunzips cleanly but is NOT a parseable WARC
        record (valid-gzip junk) is an index omission too: loud under
        the default, counted under skip."""
        good = gzip.compress(_record(
            "response", _http(b"<html>ok</html>"), uri="http://j.example/a"
        ))
        junk = gzip.compress(b"this is not a WARC record at all\r\n\r\n")
        p = tmp_path / "junk_member.warc.gz"
        p.write_bytes(good + junk + good)
        with pytest.raises(Exception, match="not a parseable WARC record"):
            W.build_cdxj_entries(spark, [str(p)]).collect()
        rows = W.build_cdxj_entries(
            spark, [str(p)], on_corrupt="skip"
        ).collect()
        assert len(rows) == 2  # the junk member's boundary is known
        st = W.build_cdxj_stats(spark, [str(p)]).collect()[0]
        assert st.n_entries == 2 and st.n_skipped == 1

    def test_space_in_url_survives_cdxj_round_trip(self, spark, tmp_path):
        """Crawls contain unencoded-space URLs; the CDXJ line format is
        space-delimited, so an unencoded key would shift the fields on
        re-read and SILENTLY drop the record — the worst index failure."""
        recs = [
            _record("response", _http(b"<html>spaced</html>"),
                    uri="http://sp.example/a b/c d.html?q=x y",
                    ctype="application/http; msgtype=response"),
            _record("response", _http(b"<html>plain</html>"),
                    uri="http://sp.example/plain",
                    ctype="application/http; msgtype=response"),
        ]
        p = _write(tmp_path / "spaced.warc.gz", recs, gz=True)
        idx = W.build_cdxj_entries(spark, [p])
        out = str(tmp_path / "spaced.cdxj")
        assert W.write_cdxj_file(idx, out) == 2
        reread = W.read_cdxj(spark, out)
        rows = {r.url: r for r in reread.collect()}
        assert set(rows) == {
            "http://sp.example/a b/c d.html?q=x y",
            "http://sp.example/plain",
        }
        assert all(" " not in r.urlkey for r in rows.values())
        assert all(
            r.offset is not None and r.length is not None
            for r in rows.values()
        )
        # and the spaced record still fetches byte-identically
        got = W.read_warc_records_at(
            spark, reread, base_dir=str(tmp_path)
        ).collect()
        assert {r.target_uri for r in got} == set(rows)

    def test_traversal_filenames_become_audit_rows(self, spark, tmp_path):
        """A third-party index row naming ../../x or an absolute path
        must NOT read outside base_dir (os.path.join silently discards
        the base for absolute filenames) — audit row, never a fetch."""
        p, n = self._archive(tmp_path, gz=True)
        import os.path as osp

        # a real file OUTSIDE base_dir that a traversal would reach
        outside = tmp_path.parent / "secret.warc.gz"
        import shutil

        shutil.copy(p, outside)
        real = (
            W.build_cdxj_entries(spark, [p], record_types=None)
            .orderBy("offset")
            .first()
        )
        entries = spark.createDataFrame(
            [
                ("built.warc.gz", real.offset, real.length),   # legit
                ("../" + outside.name, 0, 400),                # traversal
                (str(outside), 0, 400),                        # absolute
                ("sub/../../" + outside.name, 0, 400),         # sneaky
            ],
            "filename string, offset long, length long",
        )
        rows = W.read_warc_records_at(
            spark, entries, base_dir=str(tmp_path), num_partitions=1
        ).collect()
        fetched = [r for r in rows if r.warc_type is not None]
        audits = [r for r in rows if r.warc_type is None]
        assert len(fetched) == 1 and len(audits) == 3
        assert fetched[0].warc_file.endswith("built.warc.gz")
        assert all(osp.basename(outside) in r.warc_file for r in audits)

    def test_symlink_inside_base_dir_cannot_escape(self, spark, tmp_path):
        """normpath-only containment is symlink-blind: a link planted
        INSIDE base_dir aliasing a file outside it passes a lexical
        check but must still be rejected (realpath containment)."""
        import os
        import shutil

        p, _ = self._archive(tmp_path, gz=True)
        outside = tmp_path.parent / "secret2.warc.gz"
        shutil.copy(p, outside)
        os.symlink(str(outside), str(tmp_path / "alias.warc.gz"))
        real = (
            W.build_cdxj_entries(spark, [p], record_types=None)
            .orderBy("offset")
            .first()
        )
        entries = spark.createDataFrame(
            [
                ("built.warc.gz", real.offset, real.length),     # legit
                ("alias.warc.gz", real.offset, real.length),     # symlink escape
            ],
            "filename string, offset long, length long",
        )
        rows = W.read_warc_records_at(
            spark, entries, base_dir=str(tmp_path), num_partitions=1
        ).collect()
        fetched = [r for r in rows if r.warc_type is not None]
        audits = [r for r in rows if r.warc_type is None]
        assert len(fetched) == 1 and len(audits) == 1
        assert fetched[0].warc_file.endswith("built.warc.gz")
        assert audits[0].warc_file.endswith("alias.warc.gz")

    def test_base_dir_root_slash_is_not_self_rejecting(self, spark, tmp_path):
        """base_dir='/' must contain every absolute path (the old
        root+sep check produced '//' and rejected ALL entries)."""
        p, n = self._archive(tmp_path, gz=True)
        real = (
            W.build_cdxj_entries(spark, [p], record_types=None)
            .orderBy("offset")
            .first()
        )
        entries = spark.createDataFrame(
            [(str(p).lstrip("/"), real.offset, real.length)],
            "filename string, offset long, length long",
        )
        rows = W.read_warc_records_at(
            spark, entries, base_dir="/", num_partitions=1
        ).collect()
        assert len(rows) == 1 and rows[0].warc_type is not None

    def test_filename_base_resolves_subdirectory_archives(self, spark, tmp_path):
        """filename_base records subpaths (the Common Crawl filename
        convention) so a multi-directory archive set stays resolvable
        from ONE base_dir at fetch time."""
        for sub, uri in (("a", "http://s.example/x"), ("b/c", "http://s.example/y")):
            d = tmp_path / sub
            d.mkdir(parents=True)
            _write(d / "part.warc.gz",
                   [_record("response", _http(b"<html>s</html>"), uri=uri)],
                   gz=True)
        idx = W.build_cdxj_entries(
            spark,
            [str(tmp_path / "a" / "part.warc.gz"),
             str(tmp_path / "b" / "c" / "part.warc.gz")],
            filename_base=str(tmp_path),
        )
        names = {r.filename for r in idx.collect()}
        assert names == {"a/part.warc.gz", "b/c/part.warc.gz"}
        got = {
            r.target_uri
            for r in W.read_warc_records_at(
                spark, idx, base_dir=str(tmp_path)
            ).collect()
        }
        assert got == {"http://s.example/x", "http://s.example/y"}

    def test_whole_file_gzip_is_structurally_rejected(self, spark, tmp_path):
        """`gzip x.warc` (one member, many records) can never serve
        byte-range random access — the builder must refuse, not emit
        a 1-entry index that silently covers nothing."""
        recs = b"".join(
            _record("response", _http(f"<html>{i}</html>".encode()),
                    uri=f"http://w.example/{i}")
            for i in range(5)
        )
        p = tmp_path / "whole.warc.gz"
        p.write_bytes(gzip.compress(recs))
        with pytest.raises(Exception, match="whole-file-gzipped"):
            W.build_cdxj_entries(spark, [str(p)]).collect()
        # ...while the sequential scanner reads the same file fine
        assert W.read_warc(spark, [str(p)]).count() == 5


def test_cli_warc_index_pushdown_ingest(spark, tmp_path, tmp_path_factory, capsys):
    """--warc-index: the CLI ingests via the CDX index — only 200-OK
    html ranges are fetched, and the pipeline runs end-to-end."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    body = (b"<html><p>a perfectly ordinary english sentence long "
            b"enough for the default filters to keep document %d"
            b"</p></html>")
    members, entries, off = [], [], 0
    for i in range(10):
        status = 200 if i % 2 else 404
        mime = "text/html" if i != 3 else "image/png"
        rec = _record(
            "response",
            _http(body % i, status=status,
                  ctype="text/html" if mime == "text/html" else mime),
            uri=f"http://idx.example/{i}",
            ctype="application/http; msgtype=response",
            rid=f"<urn:uuid:{i}>",
        )
        member = gzip.compress(rec)
        members.append(member)
        entries.append(
            f"example,idx)/{i} 20260816000000 "
            + _json.dumps({
                "url": f"http://idx.example/{i}",
                "mime": mime,
                "status": str(status),
                "digest": f"D{i}",
                "length": str(len(member)),
                "offset": str(off),
                "filename": "crawl.warc.gz",
            })
        )
        off += len(member)
    (tmp_path / "crawl.warc.gz").write_bytes(b"".join(members))
    idx_path = tmp_path / "index.cdxj"
    idx_path.write_text("\n".join(entries) + "\n")

    out = str(tmp_path_factory.mktemp("cdx_ingest"))
    assert corpus_cli.main([
        "ignored-when-indexed", out,
        "--input-format", "warc",
        "--warc-index", str(idx_path),
        "--html-extract", "--no-pii",
    ]) == 0
    rep = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    # 10 captures: 5 are 200-OK, one of those is image/png → 4 docs
    assert rep["n_input"] == 4

    with pytest.raises(SystemExit):
        corpus_cli.main(["x", out, "--warc-index", str(idx_path)])
    with pytest.raises(SystemExit):
        corpus_cli.main(["x", out, "--warc-base", "/tmp"])


def test_cli_accepts_engine_built_index(spark, tmp_path, tmp_path_factory, capsys):
    """The full loop: build_cdxj_entries over a local archive →
    write_cdxj_file → the CLI's --warc-index ingests through it."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    body = (b"<html><p>a perfectly ordinary english sentence long "
            b"enough for the default filters to keep document %d"
            b"</p></html>")
    recs = [
        _record(
            "response",
            _http(body % i, status=200 if i % 2 else 404),
            uri=f"http://own.example/{i}",
            ctype="application/http; msgtype=response",
            rid=f"<urn:uuid:{i}>",
        )
        for i in range(8)
    ]
    p = _write(tmp_path / "own.warc.gz", recs, gz=True)
    idx = W.build_cdxj_entries(spark, [p])
    idx_path = tmp_path / "own.cdxj"
    assert W.write_cdxj_file(idx, str(idx_path)) == 8

    out = str(tmp_path_factory.mktemp("own_cdx_ingest"))
    assert corpus_cli.main([
        "ignored-when-indexed", out,
        "--input-format", "warc",
        "--warc-index", str(idx_path),
        "--html-extract", "--no-pii",
    ]) == 0
    rep = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["n_input"] == 4  # the 200-OK half


def test_cli_build_warc_index_then_reuse(spark, tmp_path, tmp_path_factory, capsys):
    """--build-warc-index: run 1 ingests sequentially AND emits the
    index; run 2 ingests the SAME archives through --warc-index and
    lands the identical document set."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    body = (b"<html><p>a perfectly ordinary english sentence long "
            b"enough for the default filters to keep document %d"
            b"</p></html>")
    recs = [
        _record(
            "response",
            _http(body % i),
            uri=f"http://bld.example/{i}",
            ctype="application/http; msgtype=response",
            rid=f"<urn:uuid:{i}>",
        )
        for i in range(6)
    ]
    _write(tmp_path / "crawl.warc.gz", recs, gz=True)
    idx_path = str(tmp_path / "crawl.cdxj")

    out1 = str(tmp_path_factory.mktemp("bld_seq"))
    assert corpus_cli.main([
        str(tmp_path / "crawl.warc.gz"), out1,
        "--input-format", "warc", "--build-warc-index", idx_path,
        "--html-extract", "--no-pii",
    ]) == 0
    rep1 = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep1["warc_index_entries"] == 6
    assert rep1["warc_index_out"] == idx_path

    out2 = str(tmp_path_factory.mktemp("bld_idx"))
    assert corpus_cli.main([
        "ignored-when-indexed", out2,
        "--input-format", "warc", "--warc-index", idx_path,
        "--html-extract", "--no-pii",
    ]) == 0
    rep2 = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep2["n_input"] == rep1["n_input"] == 6
    def _ids(out, rep):
        return {
            r.doc_id
            for k in ("train", "val", "test")
            if rep["splits"][k]["rows"]
            for r in spark.read.parquet(f"{out}/{k}").select("doc_id").collect()
        }

    assert _ids(out1, rep1) == _ids(out2, rep2)

    # validation: indexed runs never re-walk archives; wrong format
    import pytest as _pt
    with _pt.raises(SystemExit):
        corpus_cli.main(["x", out1, "--input-format", "warc",
                         "--warc-index", idx_path,
                         "--build-warc-index", idx_path])
    with _pt.raises(SystemExit):
        corpus_cli.main(["x", out1, "--build-warc-index", idx_path])
    # a WET index would never be consumable by --warc-index — refused
    with _pt.raises(SystemExit):
        corpus_cli.main(["x", out1, "--input-format", "wet",
                         "--build-warc-index", idx_path])
    # wrong --warc-base: loud BEFORE the fetch, not an empty corpus
    with _pt.raises(SystemExit, match="not found under"):
        corpus_cli.main([
            "ignored-when-indexed", out1,
            "--input-format", "warc", "--warc-index", idx_path,
            "--warc-base", str(tmp_path / "nowhere"),
            "--html-extract", "--no-pii",
        ])


def test_cli_archive_stats_triage_mode(spark, tmp_path, tmp_path_factory, capsys):
    """--archive-stats: per-archive health report, no pipeline run —
    the triage pass before --build-warc-index or a long ingest."""
    import json as _json

    import pytest as _pt

    from solana_snapshot_etl_tools_spark import corpus_cli

    good = [_record("response", _http(b"<html>g</html>"),
                    uri=f"http://st.example/{i}") for i in range(3)]
    _write(tmp_path / "good.warc.gz", good, gz=True)
    rotten = _record("response", _http(b"<html>r</html>"),
                     uri="http://st.example/r")[:-15]  # truncated
    _write(tmp_path / "rotten.warc", [rotten], gz=False)

    out = str(tmp_path_factory.mktemp("astats"))
    assert corpus_cli.main([
        str(tmp_path / "*.warc*"), out,
        "--input-format", "warc", "--archive-stats",
    ]) == 0
    rep = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["n_archives"] == 2
    assert rep["n_rotten"] == 1
    assert rep["n_records_total"] == 3
    by_name = {a[0].rsplit("/", 1)[-1]: a[1:] for a in rep["archives"]}
    assert by_name["good.warc.gz"] == [3, 0]
    assert by_name["rotten.warc"][1] >= 1
    # no corpus splits were written
    import os as _os
    assert not any(
        _os.path.isdir(f"{out}/{k}") for k in ("train", "val", "test")
    )
    with _pt.raises(SystemExit):
        corpus_cli.main(["x.parquet", out, "--archive-stats"])


def test_cdxj_malformed_lines_skipped_not_fatal(spark, tmp_path):
    import json as _json

    good = "example,g)/p 20260816 " + _json.dumps({
        "url": "http://g.example/p", "mime": "text/html", "status": "200",
        "digest": "D", "length": "10", "offset": "0",
        "filename": "a.warc.gz",
    })
    bad = [
        "malformedline",                       # <3 fields
        "urlkey 20260816",                     # json chopped off
        "k 1 {not json at all",                # unparseable json
        'k 1 {"url":"x","offset":"NaNope","length":"5","filename":"f"}',
    ]
    p = tmp_path / "mixed.cdxj"
    p.write_text("\n".join([good] + bad) + "\n")
    rows = W.read_cdxj(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0].filename == "a.warc.gz" and rows[0].offset == 0


def test_one_task_per_archive_exactly(spark, tmp_path):
    files = []
    for i in range(6):
        files.append(_write(
            tmp_path / f"f{i}.warc",
            [_record("response", _http(f"<html>{i}</html>".encode()),
                     uri=f"http://p.example/{i}")],
            gz=False,
        ))
    df = W.read_warc(spark, files)
    per_part = (
        df.select(F.spark_partition_id().alias("p"), "warc_file")
        .groupBy("p")
        .agg(F.count_distinct("warc_file").alias("nf"))
        .collect()
    )
    # no partition owns two archives (the old hash layout gave ~1/e
    # empty tasks and 2-3-archive stragglers)
    assert all(r.nf == 1 for r in per_part)
    assert len(per_part) == 6
