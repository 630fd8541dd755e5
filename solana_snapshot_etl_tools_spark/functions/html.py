"""HTML → text extraction as pure column expressions — the
CommonCrawl-WET-style cleaning step between a raw HTML crawl and the
text operators (quality, dedup, LM scoring) in this engine.

This is a documented HEURISTIC extractor (regex over markup), the
standard cheap path for bulk corpus work: it removes non-content
blocks (script/style/head...), turns block-level boundaries into
newlines so paragraph structure survives for `operators/paragraphs`,
strips remaining tags, decodes the common entities, and normalizes
whitespace. It does NOT parse HTML — pathological markup (tags inside
attribute strings, unclosed script blocks) degrades to extra or lost
fragments, never to an error. Pipelines needing DOM-accurate
extraction plug a real parser in as a pandas UDF; everything here
stays JVM-side (chained ``regexp_replace`` — whole-stage codegen, no
Python round-trip) because extraction runs over EVERY crawled byte —
the single hottest pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# non-content elements whose INNER TEXT must go with them
_DROP_BLOCKS = r"(?is)<(script|style|noscript|template|head|svg)\b[^>]*>.*?</\1\s*>"
# elements that imply a text boundary when they open OR close
_BLOCK_TAGS = (
    r"(?is)</?(p|div|br|hr|li|ul|ol|dl|dt|dd|tr|td|th|table|h[1-6]|"
    r"blockquote|pre|section|article|header|footer|nav|aside|figure|"
    r"figcaption|form|fieldset|option|title)\b[^>]*/?>"
)
_COMMENTS = r"(?s)<!--.*?-->"
_ANY_TAG = r"(?s)</?[a-zA-Z!][^>]*>"

# the high-frequency named entities. ORDER MATTERS: '&amp;' decodes
# LAST — decoding it first would turn '&amp;lt;' into '&lt;' and then
# a later pass into '<', double-decoding escaped markup (pages that
# DISCUSS html) into phantom tags
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&rsquo;", "’"),
    ("&lsquo;", "‘"),
    ("&rdquo;", "”"),
    ("&ldquo;", "“"),
    ("&copy;", "©"),
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document: non-content blocks dropped,
    block boundaries as newlines, inline tags removed, common
    entities decoded, horizontal whitespace collapsed, ≥3 consecutive
    newlines squeezed to a paragraph break. NULL stays NULL; plain
    text without markup passes through (modulo the same whitespace
    normalization)."""
    t = F.regexp_replace(html, _COMMENTS, " ")
    t = F.regexp_replace(t, _DROP_BLOCKS, " ")
    t = F.regexp_replace(t, _BLOCK_TAGS, "\n")
    # inline tags are ZERO-width (<b>bold</b> joins its neighbors the
    # way a renderer would; the block tags above already inserted the
    # real boundaries)
    t = F.regexp_replace(t, _ANY_TAG, "")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # horizontal whitespace runs -> one space; spaces hugging a
    # newline die; 3+ newlines -> exactly 2 (one blank line)
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def html_title(html: Column) -> Column:
    """The <title> element's decoded text; NULL when absent/empty."""
    raw = F.regexp_extract(html, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    t = raw
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.when(F.length(t) > 0, t)


def html_robots_directives(html: Column) -> Column:
    """The comma-joined, lowercased directive list of every
    ``<meta name="robots|googlebot" content="...">`` tag in the raw
    markup (``noindex,nofollow,noai`` style), or NULL when the page
    declares none. Attribute order is handled both ways
    (name-then-content and content-then-name); same heuristic-regex
    caveats as the extractor above. Runs on the RAW html — extraction
    strips meta tags, so compliance filters must look before
    :func:`html_to_text`."""
    nc = F.regexp_extract_all(
        html,
        F.lit(
            r'(?is)<meta\b[^>]*\bname\s*=\s*["\']?(?:robots|googlebot)'
            r'["\']?[^>]*\bcontent\s*=\s*["\']([^"\'>]+)'
        ),
        F.lit(1),
    )
    cn = F.regexp_extract_all(
        html,
        F.lit(
            r'(?is)<meta\b[^>]*\bcontent\s*=\s*["\']([^"\'>]+)["\']'
            r'[^>]*\bname\s*=\s*["\']?(?:robots|googlebot)'
        ),
        F.lit(1),
    )
    joined = F.array_join(F.concat(nc, cn), ",")
    return F.when(F.length(joined) > 0, F.lower(joined))


def html_noai(html: Column) -> Column:
    """True when the page's robots/googlebot meta directives include
    ``noai`` or ``noimageai`` (the crawl-consent convention adopted
    after 2023) — the opt-out signal a compliant training-data
    pipeline filters on BEFORE extraction. NULL-html rows are NULL
    (unjudgeable, the engine-wide posture); pages without directives
    are False."""
    d = html_robots_directives(html)
    has = F.coalesce(
        d.rlike(r"(^|[,\s])no(image)?ai([,\s]|$)"), F.lit(False)
    )
    return F.when(html.isNull(), F.lit(None).cast("boolean")).otherwise(has)
