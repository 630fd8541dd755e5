"""URL canonicalization — pure column expressions for web-corpus
source curation.

Web-scale pipelines key their domain-level rules (the blocklist and
per-source cap in ``operators/domains.py``) on a NORMALIZED source
identity, because raw crawl URLs split one logical source across
scheme/case/tracking-parameter variants: ``http://WWW.Example.com/a``
and ``https://example.com/a?utm_source=x`` are the same page to a
dedup or curation rule. Everything here is JVM-side Catalyst —
``try_parse_url`` (NULL on junk; crawl data is full of it, and ANSI
``parse_url`` THROWS) plus array/string expressions, no UDF — so the
expressions fold into the scan's codegen stage and cost no Python
round-trip at 100 TB.

``url_registered_domain`` is a documented HEURISTIC, not the Public
Suffix List: the last two host labels, or the last three when the
last two form a well-known multi-part suffix (co.uk, com.au, ...).
Pipelines needing PSL-exact grouping should broadcast-join a real PSL
table instead; the heuristic is the standard shortcut when the list
is unavailable and is exact for the overwhelming share of crawl
traffic."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# second-level suffixes under which the registrable name is one MORE
# label deep — the high-traffic subset of the PSL's wildcard entries
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.my", "com.hk",
    "com.tw", "co.za", "co.nz", "co.id", "co.th", "com.vn",
    "com.ph", "com.pk", "com.eg", "com.sa", "com.ua", "com.pl",
)

# query parameters that identify a CLICK, not a page — the usual
# tracking families (Google Analytics, ad-click ids, mail-campaign
# ids). Matched as a whole parameter name, case-insensitive.
TRACKING_PARAM_RE = (
    r"(?i)^(utm_[a-z]+|gclid|gbraid|wbraid|fbclid|msclkid|dclid|"
    r"twclid|igshid|mc_cid|mc_eid|yclid|_hsenc|_hsmi|mkt_tok|"
    r"ref|ref_src|spm|cmpid|s_kwcid|sscid)="
)


def url_host(url: Column) -> Column:
    """Lowercased host with any ``www.`` prefix and trailing dot
    stripped; NULL for strings with no parseable host.

    Backslashes are treated as slashes FIRST (the WHATWG rule every
    browser applies to http/https URLs): without it,
    ``http://example.com\\evil/x`` parses as no-host → NULL → the URL
    silently evades every host-keyed rule (robots, domain blocklists,
    per-source caps) while a browser happily fetches it from
    example.com — an adversarial fail-open, not a malformed-data
    corner."""
    h = F.lower(
        F.try_parse_url(F.regexp_replace(url, r"\\", "/"), F.lit("HOST"))
    )
    h = F.regexp_replace(h, r"^www\.", "")
    h = F.regexp_replace(h, r"\.$", "")
    return F.when(F.length(h) > 0, h)


def url_host_raw(url: Column) -> Column:
    """Lowercased host with a trailing dot stripped but the leading
    ``www.`` label KEPT; NULL for strings with no parseable host.
    PSL-exact registrable-domain matching needs the unstripped host —
    the real list's ``!www.ck`` exception rule can only ever match a
    host that still has its ``www`` label. :func:`url_host` (stripped)
    remains the page-identity key everywhere else."""
    h = F.lower(F.try_parse_url(url, F.lit("HOST")))
    h = F.regexp_replace(h, r"\.$", "")
    return F.when(F.length(h) > 0, h)


def url_registered_domain(url: Column) -> Column:
    """The registrable domain of the host — ``news.bbc.co.uk`` →
    ``bbc.co.uk``, ``a.b.example.com`` → ``example.com``. The natural
    ``source`` key for :mod:`operators.domains`. NULL when there is no
    host; hosts with one label (``localhost``) and IPv4 literals pass
    through unchanged."""
    h = url_host(url)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    take3 = last2.isin(*MULTI_PART_SUFFIXES)
    return F.when(h.isNull(), F.lit(None).cast("string")).when(
        is_ip | (n <= 2), h
    ).when(
        take3, F.array_join(F.slice(labels, -3, 3), ".")
    ).otherwise(last2)


def _clean_query(url: Column) -> Column:
    """Query string with tracking parameters removed and the
    survivors SORTED (param order is not page identity); empty string
    when nothing survives."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(q.isNull(), F.lit("")).otherwise(F.array_join(kept, "&"))


def url_normalize(url: Column) -> Column:
    """Canonical page identity: lowercased scheme and host (www
    stripped; ports dropped — Java's HOST part excludes them, so
    host identity is port-blind), fragment dropped, tracking parameters
    dropped and the surviving query sorted, trailing slash trimmed
    from non-root paths. Two raw URLs normalize equal iff a curation
    rule should treat them as the same page. NULL for inputs with no
    parseable host."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    q = _clean_query(url)
    return F.when(
        host.isNull(),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            F.coalesce(scheme, F.lit("http")),
            F.lit("://"),
            host,
            path,
            F.when(F.length(q) > 0, F.concat(F.lit("?"), q)).otherwise(
                F.lit("")
            ),
        )
    )
