"""Sitemap ingestion + crawl-coverage over WARC captures.

The discovery half of the crawl-governance stack: ``robots_sitemaps``
(operators/robots.py) surfaces the sitemap URLs a host ADVERTISES;
this module parses the sitemap / sitemapindex XML captures themselves
(sitemaps.org protocol — the reference repo has no analog; this is
engine-completeness for crawl curation) into (host, url, lastmod)
rows and reports what the crawl advertised but never fetched.

Scale shape: XML parsing stays JVM-side — one ``from_xml`` per
capture with a schema that covers BOTH document shapes (``<urlset>``
rows fill ``url``, ``<sitemapindex>`` rows fill ``sitemap``;
malformed XML parses to NULL in both → skip-not-fail, no Python in
the path). The one Python step is gunzipping ``.xml.gz`` payloads,
gated by magic bytes onto exactly the gzipped rows (an Arrow-batched
pandas UDF on a SEPARATE filtered branch — a ``when(...)`` would be
pulled out and evaluated on every row). Coverage is an anti-join that
shuffles URLs only; payloads and text never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from solana_snapshot_etl_tools_spark.functions.url import url_host

# one schema parses both document kinds: <urlset> captures fill `url`,
# <sitemapindex> captures fill `sitemap`, anything else (or malformed
# XML) parses to NULL in both
SITEMAP_XML_SCHEMA = (
    "url ARRAY<STRUCT<loc:string, lastmod:string>>, "
    "sitemap ARRAY<STRUCT<loc:string, lastmod:string>>"
)

# decompressed-size cap per gzipped sitemap payload: the protocol caps
# uncompressed sitemaps at 50 MiB; a member claiming more is a zip
# bomb or not a sitemap — either way, skip it loudly in the row
_MAX_SITEMAP_BYTES = 64 << 20

# lazy like functions/normalize.py: pandas_udf resolves its return
# type against the ACTIVE session
_GUNZIP_UDF = None


def _gunzip_series(s):
    import gzip as _gz
    import io as _io
    import zlib as _zl

    def one(b):
        if b is None:
            return None
        try:
            with _gz.GzipFile(fileobj=_io.BytesIO(bytes(b))) as g:
                out = g.read(_MAX_SITEMAP_BYTES + 1)
            if len(out) > _MAX_SITEMAP_BYTES:
                return None  # over-cap: not a sitemap we will trust
            return out.decode("utf-8", errors="replace")
        except (OSError, EOFError, ValueError, _zl.error):
            return None  # corrupt gzip payload: skip, not fail

    return s.map(one)


def gunzip_text(col: Column) -> Column:
    """Gzipped binary payload → text (None on corrupt/over-cap).
    Arrow-batched pandas UDF — Spark SQL has no gunzip built-in.
    Apply ONLY to rows pre-filtered by the gzip magic: inside a
    ``when(...)`` the UDF would be pulled out and run on every row."""
    global _GUNZIP_UDF
    if _GUNZIP_UDF is None:
        from pyspark.sql.functions import pandas_udf

        _GUNZIP_UDF = pandas_udf(_gunzip_series, "string")
    return _GUNZIP_UDF(col)


def _parsed_captures(recs: DataFrame) -> DataFrame:
    """200-OK captures parsed to (host, sitemap_url, _p): gzipped
    payloads (magic ``1f 8b``) go through the Python gunzip branch,
    everything else is a zero-copy JVM cast — then the branches union.

    The plain branch pre-sniffs for ``<urlset``/``<sitemapindex``
    before the real parse (``from_xml`` on every HTML page would be
    wasted work). The gz branch does NOT sniff: a filter referencing
    the UDF column would make Spark evaluate the gunzip TWICE (one
    ArrowEvalPython for the filter, one for the projection — plan-
    pinned in tests); gz captures are rare and ``from_xml`` nulls
    non-sitemap text anyway.

    Known limit: the literal pre-sniff misses a namespace-PREFIXED
    root (``<sm:urlset xmlns:sm=...>`` — spec-legal but essentially
    unseen in the wild). Nothing is lost by sniffing: ``from_xml``
    with this unprefixed schema nulls such documents anyway, so
    supporting them would need a prefix-aware schema, not a looser
    sniff."""
    ok = recs.filter(
        (F.col("http_status") == 200) & F.col("payload").isNotNull()
    )
    is_gz = F.substring(F.col("payload"), 1, 2) == F.lit(
        bytes([0x1F, 0x8B])
    )
    host = F.lower(url_host(F.col("target_uri"))).alias("host")
    uri = F.col("target_uri").alias("sitemap_url")
    gz = ok.filter(is_gz).select(
        host,
        uri,
        F.from_xml(gunzip_text(F.col("payload")), SITEMAP_XML_SCHEMA).alias(
            "_p"
        ),
    )
    txt = F.make_valid_utf8(F.col("payload").cast("string"))
    plain = (
        ok.filter(~is_gz)
        .filter(txt.contains("<urlset") | txt.contains("<sitemapindex"))
        .select(host, uri, F.from_xml(txt, SITEMAP_XML_SCHEMA).alias("_p"))
    )
    return gz.unionByName(plain)


def sitemap_entries(recs: DataFrame) -> DataFrame:
    """WARC response rows (``sources.warc.RECORD_SCHEMA``) →
    (host, sitemap_url, kind, loc, lastmod, lastmod_ts) rows from
    every 200-OK capture whose payload parses as sitemap XML.

    ``kind``: ``'url'`` for page entries from a ``<urlset>`` capture,
    ``'sitemap'`` for child-sitemap entries from a ``<sitemapindex>``
    (the nested-index case: each child is its own capture and parses
    independently — no recursion needed, the tree is flat in the
    crawl). ``lastmod`` is kept verbatim (W3C datetime allows
    date-only and zoned forms); ``lastmod_ts`` is the lenient typed
    parse, NULL when the string has no usable timestamp. Captures that
    are not sitemaps — or whose XML is malformed — contribute zero
    rows (skip-not-fail).

    NB: ``read_warc`` SKIPS records over its ``max_payload_bytes``
    (default 16 MiB, counted in its per-file stats) — a giant sitemap
    capture never reaches this parser at the default; raise the cap
    at the scan if such sitemaps matter (protocol max is 50 MiB
    uncompressed)."""
    parsed = _parsed_captures(recs)

    def _tagged(field: str, kind: str):
        # (kind, loc, lastmod) structs from one of the two shapes;
        # empty when the capture is the other shape (or malformed)
        return F.coalesce(
            F.transform(
                F.col(f"_p.{field}"),
                lambda e: F.struct(
                    F.lit(kind).alias("kind"),
                    e["loc"].alias("loc"),
                    e["lastmod"].alias("lastmod"),
                ),
            ),
            F.array().cast(
                "array<struct<kind:string,loc:string,lastmod:string>>"
            ),
        )

    # ONE explode over the concatenated shapes: a union of two
    # filter+explode legs would re-evaluate the whole upstream parse
    # (and the gunzip UDF) once per leg
    both = parsed.select(
        "host",
        "sitemap_url",
        F.explode(
            F.concat(_tagged("url", "url"), _tagged("sitemap", "sitemap"))
        ).alias("_e"),
    )
    lastmod = F.trim(F.col("_e.lastmod"))
    return (
        both.select(
            "host",
            "sitemap_url",
            F.col("_e.kind").alias("kind"),
            F.trim(F.col("_e.loc")).alias("loc"),
            lastmod.alias("lastmod"),
            F.coalesce(
                F.try_to_timestamp(lastmod),
                # date-only W3C form ("2026-01-02")
                F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
                # zoned form ("2026-02-03T04:05:06+00:00" / "...Z")
                F.try_to_timestamp(
                    lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")
                ),
            ).alias("lastmod_ts"),
        )
        .filter(F.col("loc").isNotNull() & (F.length("loc") > 0))
    )


def sitemap_coverage(recs: DataFrame) -> DataFrame:
    """Advertised-but-never-captured report over one crawl's records:
    every URL some capture ADVERTISES that no capture FETCHED.

    Rows: (kind, host, advertised_in, url) where kind is
    ``'url'`` (page advertised by a urlset), ``'sitemap'`` (child
    sitemap advertised by a sitemapindex) or ``'robots_sitemap'``
    (sitemap advertised by a robots.txt ``Sitemap:`` line). An empty
    result means the crawl is closed over its own advertisements.

    ``host`` is keyed off the ADVERTISED url, not the advertising
    capture: a robots.txt or sitemap may legally advertise URLs on
    another host (cross-host ``Sitemap:`` lines are common for CDN
    setups), and the crawler that must close the gap — and whose
    politeness budget applies in ``recrawl_plan`` — is the target's.
    An advertised value with no parseable host (relative or garbled)
    falls back to the advertiser's host so the row is never dropped.

    Scale shape: the captured-URL set is one distinct over
    ``target_uri`` (urls only, no payloads), the advertised set is the
    kilobyte-per-host sitemap/robots rows; the report is one anti-join
    on the url — document text never enters the plan."""
    from solana_snapshot_etl_tools_spark.operators.robots import (
        robots_sitemaps,
    )

    entries = sitemap_entries(recs)
    advertised = entries.select(
        "kind", F.col("host").alias("_adv_host"),
        F.col("sitemap_url").alias("advertised_in"),
        F.col("loc").alias("url"),
    ).unionByName(
        robots_sitemaps(recs).select(
            F.lit("robots_sitemap").alias("kind"),
            F.col("host").alias("_adv_host"),
            F.lit("robots.txt").alias("advertised_in"),
            F.col("sitemap_url").alias("url"),
        )
    )
    target_host = F.lower(url_host(F.col("url")))
    advertised = advertised.select(
        "kind",
        F.coalesce(
            F.when(F.length(target_host) > 0, target_host),
            F.col("_adv_host"),
        ).alias("host"),
        "advertised_in",
        "url",
    )
    captured = recs.select(F.col("target_uri").alias("url")).distinct()
    return advertised.join(captured, "url", "left_anti").select(
        "kind", "host", "advertised_in", "url"
    )


def stale_captures(recs: DataFrame) -> DataFrame:
    """Captured pages whose sitemap ``lastmod`` post-dates the capture
    — the recrawl work-list that pairs with ``sitemap_coverage``'s
    never-fetched list.

    Rows: (host, url, advertised_in, captured_at, lastmod_ts) for
    every page the crawl DID fetch whose advertising sitemap claims a
    newer modification. A page advertised by several sitemaps is stale
    if ANY advertiser claims a newer lastmod (max over advertisers —
    one row per url). Entries without a parseable lastmod can't vote;
    captures without a parseable WARC-Date can't be judged. The join
    carries (url, two timestamps) only — narrow both sides."""
    entries = sitemap_entries(recs).filter(
        (F.col("kind") == "url") & F.col("lastmod_ts").isNotNull()
    )
    # deterministic advertiser on lastmod ties: the max_by key breaks
    # equal timestamps on the sitemap URL (an equal-key max_by picks
    # arbitrarily)
    newest = entries.groupBy(F.col("loc").alias("url")).agg(
        F.max("lastmod_ts").alias("lastmod_ts"),
        F.max_by(
            F.struct("sitemap_url", "host"),
            F.struct("lastmod_ts", "sitemap_url"),
        ).alias("_adv"),
    ).select(
        "url",
        "lastmod_ts",
        F.col("_adv.sitemap_url").alias("advertised_in"),
        F.col("_adv.host").alias("host"),
    )
    captured = (
        recs.filter(F.col("http_status") == 200)
        .select(
            F.col("target_uri").alias("url"),
            F.try_to_timestamp(F.col("warc_date")).alias("captured_at"),
        )
        .filter(F.col("captured_at").isNotNull())
        .groupBy("url")
        .agg(F.max("captured_at").alias("captured_at"))
    )
    return (
        newest.join(captured, "url")
        .filter(F.col("lastmod_ts") > F.col("captured_at"))
        .select("host", "url", "advertised_in", "captured_at", "lastmod_ts")
    )


def recrawl_plan(recs: DataFrame, agent: str = "*") -> DataFrame:
    """Per-host recrawl work plan — the capstone joining this module's
    two worklists with the robots politeness budget:

    (host, n_missing, n_stale, n_urls, crawl_delay_sec,
    est_seconds) — one row per host with work to do. ``n_missing``
    counts advertised-but-never-captured page/sitemap URLs
    (``sitemap_coverage``, distinct by url), ``n_stale`` the
    out-of-date captures (``stale_captures``), ``crawl_delay_sec``
    the host's declared ``Crawl-delay`` for ``agent`` (NULL → no
    declared budget, ``est_seconds`` then assumes 1 req/s, the usual
    polite default). ``est_seconds`` = n_urls × effective delay — the
    sequential per-host fetch time a scheduler needs for
    worker-assignment.

    Scale shape: both inputs are url-narrow frames; the politeness
    table is one row per host (broadcastable). Everything groups on
    host — one shuffle of kilobyte rows."""
    from solana_snapshot_etl_tools_spark.operators.robots import (
        robots_crawl_delays,
    )

    missing = (
        sitemap_coverage(recs)
        .select("host", "url")
        .distinct()
        .groupBy("host")
        .agg(F.count("*").alias("n_missing"))
    )
    stale = (
        stale_captures(recs)
        .groupBy("host")
        .agg(F.count("*").alias("n_stale"))
    )
    delays = robots_crawl_delays(recs, agent=agent)
    plan = (
        missing.join(stale, "host", "full_outer")
        .select(
            "host",
            F.coalesce("n_missing", F.lit(0)).alias("n_missing"),
            F.coalesce("n_stale", F.lit(0)).alias("n_stale"),
        )
        .join(F.broadcast(delays), "host", "left")
    )
    n_urls = (F.col("n_missing") + F.col("n_stale")).alias("n_urls")
    return plan.select(
        "host",
        "n_missing",
        "n_stale",
        n_urls,
        "crawl_delay_sec",
        (
            (F.col("n_missing") + F.col("n_stale"))
            * F.coalesce(F.col("crawl_delay_sec"), F.lit(1.0))
        ).alias("est_seconds"),
    )


# ship the pandas UDF inside the task — workers do not share the
# driver's sys.path (see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
