"""Sitemap ingestion + crawl-coverage (operators/sitemaps.py).

Fixtures are real WARC/1.0 captures of sitemaps.org-protocol XML:
a urlset, a sitemapindex pointing at child sitemaps (one captured,
one not), a gzipped .xml.gz sitemap payload, malformed XML, and a
robots.txt advertising a never-fetched sitemap.
"""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import sitemaps as SM
from solana_snapshot_etl_tools_spark.sources import warc as W

from tests.test_warc import _http, _record, _write

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://s.example/page/1</loc><lastmod>2026-01-02</lastmod></url>
<url><loc> http://s.example/page/2 </loc>
<lastmod>2026-02-03T04:05:06+00:00</lastmod></url>
<url><loc>http://s.example/page/3</loc></url>
</urlset>"""

CHILD = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://s.example/child/a</loc></url>
</urlset>"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>http://s.example/child.xml</loc>
<lastmod>2026-03-04</lastmod></sitemap>
<sitemap><loc>http://s.example/never_fetched.xml</loc></sitemap>
</sitemapindex>"""

MALFORMED = b"<urlset><url><loc>http://s.example/broken"

ROBOTS = (b"User-agent: *\r\nDisallow: /private\r\n"
          b"Sitemap: http://s.example/sitemap.xml\r\n"
          b"Sitemap: http://s.example/fantom.xml\r\n")


def _crawl(tmp_path):
    """One archive holding the whole advertisement graph. The gzipped
    WARC-member case rides for free (gz=True); the .xml.gz capture
    exercises the gzip PAYLOAD branch."""
    xml = "application/xml"
    recs = [
        _record("response", _http(ROBOTS, ctype="text/plain"),
                uri="http://s.example/robots.txt",
                ctype="application/http; msgtype=response"),
        _record("response", _http(URLSET, ctype=xml),
                uri="http://s.example/sitemap.xml",
                ctype="application/http; msgtype=response"),
        _record("response", _http(INDEX, ctype=xml),
                uri="http://s.example/index.xml",
                ctype="application/http; msgtype=response"),
        _record("response", _http(CHILD, ctype=xml),
                uri="http://s.example/child.xml",
                ctype="application/http; msgtype=response"),
        _record("response",
                _http(gzip.compress(CHILD), ctype="application/x-gzip"),
                uri="http://s.example/gzipped.xml.gz",
                ctype="application/http; msgtype=response"),
        _record("response", _http(MALFORMED, ctype=xml),
                uri="http://s.example/broken.xml",
                ctype="application/http; msgtype=response"),
        _record("response", _http(b"<html>just a page</html>"),
                uri="http://s.example/page/1",
                ctype="application/http; msgtype=response"),
        # 404 sitemap: must contribute nothing
        _record("response", _http(URLSET, status=404, ctype=xml),
                uri="http://s.example/gone.xml",
                ctype="application/http; msgtype=response"),
    ]
    return _write(tmp_path / "crawl.warc.gz", recs, gz=True)


def test_urlset_and_index_entries(spark, tmp_path):
    recs = W.read_warc(spark, _crawl(tmp_path))
    ent = SM.sitemap_entries(recs)
    rows = {(r.kind, r.loc): r for r in ent.collect()}
    # urlset pages (locs trimmed), index children, gz payload child
    assert ("url", "http://s.example/page/1") in rows
    assert ("url", "http://s.example/page/2") in rows
    assert ("url", "http://s.example/page/3") in rows
    assert ("sitemap", "http://s.example/child.xml") in rows
    assert ("sitemap", "http://s.example/never_fetched.xml") in rows
    assert ("url", "http://s.example/child/a") in rows
    # the gzipped payload parsed too: child/a appears via BOTH the
    # plain child.xml and gzipped.xml.gz captures
    srcs = {
        r.sitemap_url
        for r in ent.filter(F.col("loc") == "http://s.example/child/a")
        .collect()
    }
    assert srcs == {
        "http://s.example/child.xml",
        "http://s.example/gzipped.xml.gz",
    }
    # malformed XML and the 404 capture contributed zero rows
    assert not [
        k for k in rows
        if "broken" in k[1] or rows[k].sitemap_url.endswith("gone.xml")
    ]
    # hosts lowercased from the capture URI
    assert {r.host for r in rows.values()} == {"s.example"}


def test_lastmod_verbatim_and_typed(spark, tmp_path):
    recs = W.read_warc(spark, _crawl(tmp_path))
    by_loc = {
        r.loc: r for r in SM.sitemap_entries(recs).collect()
        if r.kind == "url" and r.sitemap_url.endswith("/sitemap.xml")
    }
    assert by_loc["http://s.example/page/1"].lastmod == "2026-01-02"
    assert str(by_loc["http://s.example/page/1"].lastmod_ts).startswith(
        "2026-01-02"
    )
    assert by_loc["http://s.example/page/2"].lastmod_ts is not None
    assert by_loc["http://s.example/page/3"].lastmod is None
    assert by_loc["http://s.example/page/3"].lastmod_ts is None


def test_corrupt_gzip_payload_skips_not_fails(spark, tmp_path):
    blob = bytearray(gzip.compress(CHILD))
    blob[12] ^= 0xFF
    recs = [
        _record("response", _http(bytes(blob), ctype="application/x-gzip"),
                uri="http://s.example/rotten.xml.gz",
                ctype="application/http; msgtype=response"),
        _record("response", _http(URLSET, ctype="application/xml"),
                uri="http://s.example/sitemap.xml",
                ctype="application/http; msgtype=response"),
    ]
    p = _write(tmp_path / "rot.warc.gz", recs, gz=True)
    ent = SM.sitemap_entries(W.read_warc(spark, p))
    # the rotten payload is skipped; the good capture still parses
    assert ent.filter(F.col("sitemap_url").contains("rotten")).count() == 0
    assert ent.filter(F.col("kind") == "url").count() == 3


def test_coverage_reports_advertised_not_captured(spark, tmp_path):
    recs = W.read_warc(spark, _crawl(tmp_path))
    cov = SM.sitemap_coverage(recs)
    missing = {(r.kind, r.url): r.advertised_in for r in cov.collect()}
    # page/1 WAS captured -> absent; pages 2, 3, child/a were not
    assert ("url", "http://s.example/page/1") not in missing
    assert missing[("url", "http://s.example/page/2")] == (
        "http://s.example/sitemap.xml"
    )
    assert ("url", "http://s.example/page/3") in missing
    assert ("url", "http://s.example/child/a") in missing
    # the index advertised a child sitemap never fetched
    assert missing[("sitemap", "http://s.example/never_fetched.xml")] == (
        "http://s.example/index.xml"
    )
    # child.xml WAS fetched
    assert ("sitemap", "http://s.example/child.xml") not in missing
    # robots advertised fantom.xml (never fetched); sitemap.xml was
    assert missing[("robots_sitemap", "http://s.example/fantom.xml")] == (
        "robots.txt"
    )
    assert ("robots_sitemap", "http://s.example/sitemap.xml") not in missing


def test_coverage_host_keys_off_advertised_url(spark, tmp_path):
    """A cross-host Sitemap: line (CDN setups advertise on another
    host routinely) must group under the host that must be CRAWLED,
    not the advertiser — that is the host whose politeness budget
    applies in recrawl_plan."""
    from tests.test_warc import _http, _record, _write

    robots = (b"User-agent: *\r\nDisallow:\r\n"
              b"Sitemap: http://cdn.example/films/sitemap.xml\r\n")
    recs = W.read_warc(spark, _write(
        tmp_path / "xhost.warc.gz",
        [_record("response", _http(robots, ctype="text/plain"),
                 uri="http://www.example/robots.txt",
                 ctype="application/http; msgtype=response")],
        gz=True,
    ))
    rows = {(r.kind, r.url): r.host
            for r in SM.sitemap_coverage(recs).collect()}
    assert rows[("robots_sitemap", "http://cdn.example/films/sitemap.xml")] \
        == "cdn.example"


def test_cli_sitemap_coverage_stage(spark, tmp_path, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    # the coverage crawl plus one real HTML page so the pipeline has a
    # corpus to build
    _crawl(tmp_path)
    page = _record(
        "response",
        _http(b"<html><p>an ordinary page with plenty of plain english "
              b"words so the default quality filters keep it around for "
              b"the corpus build stage</p></html>"),
        uri="http://s.example/page/1",
        ctype="application/http; msgtype=response",
    )
    _write(tmp_path / "page.warc.gz", [page], gz=True)
    out = str(tmp_path_factory.mktemp("corpus_sitemap"))
    assert corpus_cli.main([
        f"{tmp_path}/*.warc.gz", out,
        "--input-format", "warc", "--html-extract", "--no-pii",
        "--quality", "0", "--sitemap-coverage",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rep = json.loads(lines[-1])
    by_kind = rep["sitemap_missing_by_kind"]
    # pages 2, 3 and child/a are advertised but uncaptured (page/1 IS
    # captured); child/a is advertised by TWO captures (child.xml and
    # gzipped.xml.gz) so it reports once per advertiser; plus
    # never_fetched.xml from the index and fantom.xml from robots
    assert by_kind["url"] == 4
    assert by_kind["sitemap"] == 1
    assert by_kind["robots_sitemap"] == 1
    assert rep["n_sitemap_missing"] == 6
    cov = spark.read.parquet(f"{out}/sitemap_coverage")
    assert {r.url for r in cov.filter("kind = 'robots_sitemap'").collect()} \
        == {"http://s.example/fantom.xml"}
    # the stale worklist persisted too (this crawl has no stale rows:
    # every lastmod predates the 2026-08-16 capture date)
    assert rep["n_sitemap_stale"] == 0
    stale = spark.read.parquet(f"{out}/sitemap_stale")
    assert stale.count() == 0
    assert set(stale.columns) == {
        "host", "url", "advertised_in", "captured_at", "lastmod_ts",
    }

    # validation: needs warc input; conflicts with --warc-index
    import pytest
    with pytest.raises(SystemExit):
        corpus_cli.main([f"{tmp_path}/*.warc.gz", out, "--sitemap-coverage"])
    with pytest.raises(SystemExit):
        corpus_cli.main([
            f"{tmp_path}/*.warc.gz", out, "--input-format", "warc",
            "--sitemap-coverage", "--warc-index", "x.cdxj",
        ])
    capsys.readouterr()


def test_stale_captures_recrawl_worklist(spark, tmp_path):
    """lastmod newer than the capture's WARC-Date => recrawl row; the
    max over several advertisers decides; un-captured pages (coverage's
    domain) and fresh captures stay out."""
    sm = (b'<?xml version="1.0"?>'
          b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          b"<url><loc>http://t.example/stale</loc>"
          b"<lastmod>2026-09-01T00:00:00Z</lastmod></url>"
          b"<url><loc>http://t.example/fresh</loc>"
          b"<lastmod>2026-01-01T00:00:00Z</lastmod></url>"
          b"<url><loc>http://t.example/nevermind</loc>"
          b"<lastmod>2026-09-01T00:00:00Z</lastmod></url>"
          b"<url><loc>http://t.example/nodate</loc></url>"
          b"</urlset>")
    xml = "application/xml"
    recs = [
        _record("response", _http(sm, ctype=xml),
                uri="http://t.example/sitemap.xml",
                ctype="application/http; msgtype=response"),
        # captured 2026-08-16 (the _record default WARC-Date)
        _record("response", _http(b"<html>old copy</html>"),
                uri="http://t.example/stale",
                ctype="application/http; msgtype=response"),
        _record("response", _http(b"<html>new enough</html>"),
                uri="http://t.example/fresh",
                ctype="application/http; msgtype=response"),
        _record("response", _http(b"<html>undated</html>"),
                uri="http://t.example/nodate",
                ctype="application/http; msgtype=response"),
        # /nevermind is advertised but never captured: coverage's row,
        # not a stale row
    ]
    p = _write(tmp_path / "stale.warc.gz", recs, gz=True)
    rows = SM.stale_captures(W.read_warc(spark, p)).collect()
    assert {r.url for r in rows} == {"http://t.example/stale"}
    r = rows[0]
    assert r.host == "t.example"
    assert r.advertised_in == "http://t.example/sitemap.xml"
    assert str(r.captured_at).startswith("2026-08-16")
    assert str(r.lastmod_ts).startswith("2026-09-01")


def test_recrawl_plan_joins_worklists_with_politeness(spark, tmp_path):
    """recrawl_plan = coverage misses + stale captures × the host's
    declared Crawl-delay (1 s/req default when none declared)."""
    sm = (b'<?xml version="1.0"?>'
          b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          b"<url><loc>http://p.example/stale</loc>"
          b"<lastmod>2026-09-01T00:00:00Z</lastmod></url>"
          b"<url><loc>http://p.example/never</loc></url>"
          b"<url><loc>http://p.example/never2</loc></url>"
          b"</urlset>")
    robots = (b"User-agent: *\r\nCrawl-delay: 2.5\r\n"
              b"Disallow: /x\r\n")
    xml = "application/xml"
    recs = [
        _record("response", _http(robots, ctype="text/plain"),
                uri="http://p.example/robots.txt",
                ctype="application/http; msgtype=response"),
        _record("response", _http(sm, ctype=xml),
                uri="http://p.example/sitemap.xml",
                ctype="application/http; msgtype=response"),
        _record("response", _http(b"<html>old</html>"),
                uri="http://p.example/stale",
                ctype="application/http; msgtype=response"),
    ]
    p = _write(tmp_path / "plan.warc.gz", recs, gz=True)
    crawl = W.read_warc(spark, p)
    rows = {r.host: r for r in SM.recrawl_plan(crawl).collect()}
    r = rows["p.example"]
    assert r.n_missing == 2 and r.n_stale == 1 and r.n_urls == 3
    assert r.crawl_delay_sec == 2.5
    assert r.est_seconds == 7.5
    # a host with work but NO declared delay estimates at 1 req/s:
    # strip the robots capture and re-plan
    p2 = _write(tmp_path / "plan2.warc.gz", recs[1:], gz=True)
    r2 = {x.host: x for x in SM.recrawl_plan(
        W.read_warc(spark, p2)).collect()}["p.example"]
    assert r2.crawl_delay_sec is None
    assert r2.est_seconds == float(r2.n_urls)


def test_cli_crawl_capstone_composes_round14_stages(
    spark, tmp_path, tmp_path_factory, capsys
):
    """WARC in → robots enforcement → sitemap coverage + staleness →
    corpus build → integrity manifests → verify-manifests gate: the
    round-14 governance pieces working as ONE pipeline."""
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    body = (b"<html><p>a perfectly ordinary english paragraph that the "
            b"default quality and language filters keep around %d"
            b"</p></html>")
    robots = (b"User-agent: *\r\nDisallow: /private/\r\n"
              b"Crawl-delay: 2\r\n"
              b"Sitemap: http://cap.example/sitemap.xml\r\n")
    sm = (b'<?xml version="1.0"?>'
          b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          b"<url><loc>http://cap.example/page0</loc>"
          b"<lastmod>2026-09-01T00:00:00Z</lastmod></url>"  # stale
          b"<url><loc>http://cap.example/page1</loc></url>"
          b"<url><loc>http://cap.example/uncaptured</loc></url>"
          b"</urlset>")
    recs = [
        _record("response", _http(robots, ctype="text/plain"),
                uri="http://cap.example/robots.txt",
                ctype="application/http; msgtype=response"),
        _record("response", _http(sm, ctype="application/xml"),
                uri="http://cap.example/sitemap.xml",
                ctype="application/http; msgtype=response"),
    ]
    for i in range(6):
        recs.append(_record(
            "response", _http(body % i),
            uri=f"http://cap.example/page{i}",
            ctype="application/http; msgtype=response",
            rid=f"<urn:uuid:{i}>",
        ))
    recs.append(_record(  # robots-blocked page
        "response", _http(body % 99),
        uri="http://cap.example/private/x",
        ctype="application/http; msgtype=response",
        rid="<urn:uuid:priv>",
    ))
    p = _write(tmp_path / "cap.warc.gz", recs, gz=True)

    out = str(tmp_path_factory.mktemp("capstone14"))
    assert corpus_cli.main([
        p, out,
        "--input-format", "warc", "--html-extract", "--no-pii",
        "--respect-robots", "--sitemap-coverage", "--manifest-out",
    ]) == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["n_robots_blocked"] == 1
    assert rep["sitemap_missing_by_kind"] == {"url": 1}  # /uncaptured
    assert rep["n_sitemap_stale"] == 1  # page0's lastmod post-dates
    stale = spark.read.parquet(f"{out}/sitemap_stale")
    assert [r.url for r in stale.collect()] == ["http://cap.example/page0"]
    # the per-host fetch plan: 1 miss + 1 stale at Crawl-delay 2 s
    plan = spark.read.parquet(f"{out}/recrawl_plan").collect()
    assert rep["n_recrawl_hosts"] == 1
    assert plan[0].host == "cap.example" and plan[0].n_urls == 2
    assert plan[0].est_seconds == 4.0
    assert set(rep["manifests"]) == {"train", "val", "test"}
    # the written corpus passes its own integrity gate
    scratch = str(tmp_path_factory.mktemp("capstone14_rep"))
    assert corpus_cli.main([out, scratch, "--verify-manifests"]) == 0
    capsys.readouterr()


def test_jvm_side_parse_no_python_for_plain_xml(spark, tmp_path):
    """The plain-payload branch must carry no Python evaluation: one
    ArrowEvalPython is expected in the UNION plan (the gz branch), and
    exactly zero BatchEvalPython (row-at-a-time) anywhere."""
    recs = W.read_warc(spark, _crawl(tmp_path))
    plan = SM.sitemap_entries(recs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # exactly the gz branch's gunzip UDF — the single-explode shape
    # must not duplicate the parse (and the UDF) across union legs
    assert plan.count("ArrowEvalPython") == 1
