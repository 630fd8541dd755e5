"""robots.txt governance over crawl corpora.

The consent side of web-scale ingestion: ``html_noai``
(functions/html.py) reads per-page meta opt-outs; this module reads
the per-HOST opt-outs — robots.txt files captured in the same crawl —
and filters the document set by them. A pipeline that honors
robots/noai end-to-end can demonstrate it: every rule and every drop
is a row.

Scale shape: the rules table is tiny relative to the corpus (one
robots.txt per host), so ``apply_robots`` broadcasts it and the
corpus-side check is a narrow per-row match (prefix test for plain
rules, precompiled-regex for wildcard rules) — no corpus shuffle.

Parsing follows RFC 9309: grouped ``User-agent`` lines each apply to
the following ``Disallow``/``Allow`` block; the most-octets pattern
wins, ``Allow`` beats ``Disallow`` at equal length; an empty
``Disallow`` means "everything allowed"; ``*`` user-agent is the
fallback group. Path wildcards are matched EXACTLY per the RFC:
``*`` matches any run of octets and a trailing ``$`` anchors the
pattern at the path's end — each wildcard rule is translated once
(rules side, tiny frame) into an anchored Java regex, while the
plain-prefix majority keeps the cheap ``startswith`` fast path.
Earlier rounds approximated wildcards with conservative prefix
truncation; a property sweep against a full-RFC reference matcher
found that truncating a Disallow SHRINKS its octet length for the
longest-match tie-break, letting a literal Allow out-rank a pattern
that should beat it (fail-open) — exact matching removes the whole
class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from solana_snapshot_etl_tools_spark.functions.url import url_host

RULES_SCHEMA = "host string, agent string, rule string, path string"


def parse_robots_records(recs: DataFrame) -> DataFrame:
    """WARC response rows (``sources.warc.RECORD_SCHEMA``) →
    (host, agent, rule, path) rows for every Allow/Disallow directive
    found in 200-OK ``/robots.txt`` captures.

    Pure column expressions: lines split and exploded JVM-side with
    the group's user-agents carried by a running scan — no Python in
    the path. Hosts are lowercased; agents lowercased; paths kept
    VERBATIM (wildcards included — ``apply_robots`` matches them
    exactly per RFC 9309).
    """
    robots = recs.filter(
        (F.col("http_status") == 200)
        & F.lower(F.col("target_uri")).rlike(r"^[a-z]+://[^/]+/robots\.txt$")
    )
    txt = F.make_valid_utf8(F.col("payload").cast("string"))
    lines = F.split(txt, "\r?\n")
    # fold the line list into (current_agents, emitted rules): a
    # user-agent line after rules starts a NEW group; consecutive
    # user-agent lines accumulate into one group (the REP grouping).
    acc0 = F.expr(
        "named_struct("
        "'agents', cast(array() as array<string>), "
        "'in_rules', false, "
        "'out', cast(array() as array<struct<agent:string,rule:string,path:string>>))"
    )
    folded = F.aggregate(
        lines,
        acc0,
        lambda acc, raw: _robots_step(acc, raw),
        lambda acc: acc["out"],
    )
    return (
        robots.select(
            F.lower(url_host(F.col("target_uri"))).alias("host"),
            F.explode(folded).alias("r"),
        )
        .select(
            "host",
            F.col("r.agent").alias("agent"),
            F.col("r.rule").alias("rule"),
            F.col("r.path").alias("path"),
        )
        .filter(F.col("path").isNotNull())
    )


def _robots_step(acc, raw):
    """One line of the REP group fold (see parse_robots_records)."""
    l = F.trim(F.regexp_replace(raw, "#.*$", ""))
    kv = F.split(l, ":", 2)
    key = F.lower(F.trim(kv.getItem(0)))
    # try_element_at, NOT element_at: a colon-less directive line
    # ("Disallow" alone — common real-world malformation) yields a
    # 1-element split, and under ANSI element_at(.., 2) would throw
    # and kill the job instead of skipping the line
    val = F.trim(F.try_element_at(kv, F.lit(2)))
    # an EMPTY user-agent value is a malformed line, not a group
    # start: treating it as one would open a group for agent '' that
    # silently steals the following rules from the real group — the
    # parser property sweep caught exactly that (rules attributed to
    # '' are invisible to every real agent → Disallows lost → open)
    is_agent = (
        (key == F.lit("user-agent")) & val.isNotNull() & (F.length(val) > 0)
    )
    is_rule = key.isin("disallow", "allow") & val.isNotNull()
    new_agents = (
        F.when(
            is_agent & acc["in_rules"],
            F.array(F.lower(val)),  # rules seen: a NEW group starts
        )
        .when(is_agent, F.array_union(acc["agents"], F.array(F.lower(val))))
        .otherwise(acc["agents"])
    )
    emitted = F.when(
        is_rule & (F.size(acc["agents"]) > 0) & (F.length(val) > 0),
        F.concat(
            acc["out"],
            F.flatten(
                F.transform(
                    acc["agents"],
                    lambda a: F.array(
                        F.struct(
                            a.alias("agent"),
                            key.alias("rule"),
                            val.alias("path"),
                        )
                    ),
                )
            ),
        ),
    ).otherwise(acc["out"])
    return F.struct(
        new_agents.alias("agents"),
        (is_rule | (acc["in_rules"] & ~is_agent)).alias("in_rules"),
        emitted.alias("out"),
    )


def apply_robots(
    docs: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose URL a robots Disallow covers for ``agent``.

    Matching per RFC 9309: among the agent's own group (falling back
    to ``*`` when the agent has no group on that host), the
    most-octets matching pattern wins; Allow beats Disallow at equal
    length; ``*`` in a pattern matches any run of octets and a
    trailing ``$`` anchors the end. Wildcard patterns are translated
    to anchored Java regexes ONCE on the tiny rules frame; plain
    prefixes (the overwhelming real-world majority) keep the
    ``startswith`` fast path, so the per-document cost only pays for
    regex where a wildcard actually exists. The rules frame is
    broadcast (one robots.txt per host is small by construction) and
    the corpus side is a narrow match after one host equi-join —
    document text never shuffles.
    """
    a = agent.lower()
    mine = rules.filter(F.col("agent").isin(a, "*") if a != "*" else (F.col("agent") == "*"))
    # fallback semantics: a host with ANY group for the specific agent
    # uses ONLY that group (RFC 9309 §2.2.1)
    if a != "*":
        has_own = (
            rules.filter(F.col("agent") == a)
            .select("host")
            .distinct()
            .withColumn("_own", F.lit(True))
        )
        mine = (
            mine.join(has_own, "host", "left")
            .filter((F.col("agent") == a) | F.col("_own").isNull())
            .drop("_own")
        )
    # rules-side (tiny frame) wildcard translation: '*' → '.*', a
    # TRAILING '$' → end anchor, everything else regex-escaped; '_rx'
    # stays NULL for plain prefixes so the corpus side keeps the
    # cheap startswith path. '_len' is the ORIGINAL pattern's octet
    # length — the RFC precedence key (a truncated/translated form
    # must not change which rule is "most specific").
    is_wild = F.col("path").contains("*") | F.col("path").endswith("$")
    esc = F.regexp_replace(
        F.col("path"), r"([.^$+?(){}\[\]|\\])", r"\\$1"
    )
    rx = F.regexp_replace(esc, r"\*", ".*")
    # the escape turned every '$' into '\$'; only a TRAILING one is
    # the RFC anchor — restore it (mid-pattern '$' stays literal).
    # The replacement's '$' is itself escaped: bare '$' is a group
    # reference in Java's replacement syntax
    rx = F.regexp_replace(rx, r"\\\$$", r"\$")
    mine = mine.withColumn(
        "_rx", F.when(is_wild, F.concat(F.lit("^"), rx))
    ).withColumn("_len", F.length("path"))
    grouped = mine.groupBy("host").agg(
        F.collect_list(F.struct("rule", "path", "_rx", "_len")).alias("_rules")
    )
    # case-insensitive scheme strip: URI schemes are case-insensitive
    # (RFC 3986) and uppercase schemes occur in the wild — a
    # case-sensitive pattern would leave the full URL as the "path",
    # match no Disallow prefix, and FAIL OPEN for exactly those rows.
    # Backslashes normalize to slashes FIRST (the WHATWG rule, same
    # as url_host): http://h\evil/x fetches /evil/x in a browser, and
    # without this the \evil segment hid inside the stripped
    # authority so a Disallow: /evil never matched — fail-open
    path = F.regexp_replace(
        F.regexp_replace(F.col(url_col), r"\\", "/"),
        r"(?i)^[a-z][a-z0-9+.-]*://[^/]*",
        "",
    )
    path = F.when(path == "", "/").otherwise(path)
    host = F.lower(url_host(F.col(url_col)))
    joined = docs.withColumn("_h", host).join(
        F.broadcast(grouped.withColumnRenamed("host", "_h")), "_h", "left"
    )
    matches = F.filter(
        F.col("_rules"),
        lambda r: F.when(
            r["_rx"].isNull(), path.startswith(r["path"])
        ).otherwise(F.regexp_like(path, r["_rx"])),
    )
    best = F.array_max(
        F.transform(
            matches,
            # order by (pattern octet length, rule) — allow packs as
            # 1 so ALLOW wins equal-length ties per the RFC
            lambda r: F.struct(
                r["_len"].alias("len"),
                F.when(r["rule"] == "allow", 1).otherwise(0).alias("is_allow"),
            ),
        )
    )
    blocked = F.col("_rules").isNotNull() & (F.size(matches) > 0) & (
        best["is_allow"] == 0
    )
    return joined.filter(~blocked).drop("_h", "_rules")


def robots_rules_from_warc(
    spark: SparkSession, paths: str | list[str]
) -> DataFrame:
    """Convenience: scan archives for robots.txt captures and parse
    them — ``read_warc`` keeps only response records, and robots
    files are tiny, so this is one cheap pass over the crawl."""
    from solana_snapshot_etl_tools_spark.sources.warc import read_warc

    return parse_robots_records(read_warc(spark, paths))


def robots_crawl_delays(recs: DataFrame, agent: str = "*") -> DataFrame:
    """(host, crawl_delay_sec) from the crawl's robots.txt captures —
    the politeness budget a re-crawl scheduler needs per host.

    ``Crawl-delay`` is non-RFC-9309 but ubiquitous; like the rules it
    is group-scoped, so the same REP fold assigns each delay to its
    user-agent group. Fallback matches ``apply_robots`` exactly
    (RFC 9309 §2.2.1): a host where the agent has its OWN group (any
    Allow/Disallow rule for it — the same presence test apply_robots
    uses) takes delays from that group ONLY, even when it declares
    none (no delay row, NOT the ``*`` group's delay); only hosts with
    no own group fall back to ``*``. Unparseable or negative values
    are dropped; several delay lines in one group keep the LAST (the
    file's final word). Output is one row per host that declares a
    delay — kilobytes, broadcastable to any scheduler."""
    robots = recs.filter(
        (F.col("http_status") == 200)
        & F.lower(F.col("target_uri")).rlike(r"^[a-z]+://[^/]+/robots\.txt$")
    )
    txt = F.make_valid_utf8(F.col("payload").cast("string"))
    lines = F.split(txt, "\r?\n")
    acc0 = F.expr(
        "named_struct("
        "'agents', cast(array() as array<string>), "
        "'in_rules', false, "
        "'out', cast(array() as "
        "array<struct<agent:string,rule:string,val:string>>))"
    )
    folded = F.aggregate(
        lines, acc0, lambda acc, raw: _delay_step(acc, raw),
        lambda acc: acc["out"],
    )
    a = agent.lower()
    per_agent = robots.select(
        F.lower(url_host(F.col("target_uri"))).alias("host"),
        F.col("warc_date").alias("_cap"),
        F.posexplode(folded).alias("_pos", "d"),
    ).select(
        "host",
        "_cap",
        "_pos",
        F.col("d.agent").alias("agent"),
        F.col("d.rule").alias("rule"),
        F.when(
            F.col("d.rule") == "crawl-delay",
            F.col("d.val").try_cast("double"),
        ).alias("delay"),
    )
    mine = per_agent.filter(
        F.col("agent").isin(a, "*") if a != "*" else (F.col("agent") == "*")
    )
    if a != "*":
        # the same has-own-group host filter apply_robots uses: own
        # group presence = any Allow/Disallow RULE for the agent (the
        # rows parse_robots_records would emit), and a present own
        # group silences '*' entirely — including its Crawl-delay
        has_own = (
            mine.filter(
                (F.col("agent") == a) & F.col("rule").isin("disallow", "allow")
            )
            .select("host")
            .distinct()
            .withColumn("_own", F.lit(True))
        )
        mine = (
            mine.join(F.broadcast(has_own), "host", "left")
            .filter((F.col("agent") == a) | F.col("_own").isNull())
            .drop("_own")
        )
    valid = mine.filter(F.col("delay").isNotNull() & (F.col("delay") >= 0))
    # latest capture, then LAST line in the file — a fully
    # deterministic max_by key (equal-key max_by would otherwise pick
    # arbitrarily when a group repeats the directive). No own-vs-star
    # rank needed: the host filter above already makes the candidate
    # set per host all-own or all-star.
    return valid.groupBy("host").agg(
        F.max_by("delay", F.struct("_cap", "_pos")).alias("crawl_delay_sec")
    )


def _delay_step(acc, raw):
    """One line of the Crawl-delay group fold. Grouping state is
    IDENTICAL to ``_robots_step``'s: only Allow/Disallow set
    ``in_rules`` (crawl-delay is an RFC 9309 "other record" — allowed
    inside a group without terminating it — exactly the semantics the
    parser property sweep's reference pins), so both folds assign the
    same group boundaries to the same file. Emits (agent, rule, val)
    for allow/disallow/crawl-delay lines: the rule rows carry no delay
    but mark own-group PRESENCE for the §2.2.1 fallback in
    ``robots_crawl_delays``."""
    l = F.trim(F.regexp_replace(raw, "#.*$", ""))
    kv = F.split(l, ":", 2)
    key = F.lower(F.trim(kv.getItem(0)))
    val = F.trim(F.try_element_at(kv, F.lit(2)))
    is_agent = (
        (key == F.lit("user-agent")) & val.isNotNull() & (F.length(val) > 0)
    )
    is_rule = key.isin("disallow", "allow") & val.isNotNull()
    is_emit = (
        key.isin("disallow", "allow", "crawl-delay") & val.isNotNull()
    )
    new_agents = (
        F.when(is_agent & acc["in_rules"], F.array(F.lower(val)))
        .when(is_agent, F.array_union(acc["agents"], F.array(F.lower(val))))
        .otherwise(acc["agents"])
    )
    emitted = F.when(
        is_emit & (F.size(acc["agents"]) > 0) & (F.length(val) > 0),
        F.concat(
            acc["out"],
            F.transform(
                acc["agents"],
                lambda a: F.struct(
                    a.alias("agent"), key.alias("rule"), val.alias("val")
                ),
            ),
        ),
    ).otherwise(acc["out"])
    return F.struct(
        new_agents.alias("agents"),
        (is_rule | (acc["in_rules"] & ~is_agent)).alias("in_rules"),
        emitted.alias("out"),
    )


def robots_sitemaps(recs: DataFrame) -> DataFrame:
    """(host, sitemap_url) rows from the crawl's robots.txt captures.

    ``Sitemap:`` lines are group-INDEPENDENT per the sitemaps
    protocol (they apply to the whole host, wherever they appear), so
    no group fold is needed — a line filter over the same 200-OK
    ``/robots.txt`` records ``parse_robots_records`` consumes. The
    output seeds URL discovery and crawl-coverage audits: join it
    against the corpus's url hosts to see which hosts advertise
    sitemaps the crawl never visited. Values kept verbatim (they are
    absolute URLs by spec); blank values dropped; duplicates within
    one capture collapse. Standard REP ``#``-comment stripping
    applies, so a sitemap URL that itself carries a ``#fragment``
    loses it — acceptable: fragments are senseless in sitemap URLs."""
    robots = recs.filter(
        (F.col("http_status") == 200)
        & F.lower(F.col("target_uri")).rlike(r"^[a-z]+://[^/]+/robots\.txt$")
    )
    txt = F.make_valid_utf8(F.col("payload").cast("string"))
    lines = F.split(txt, "\r?\n")
    sitemaps = F.array_distinct(
        F.filter(
            F.transform(
                lines,
                lambda l: F.when(
                    F.lower(
                        F.trim(F.get(F.split(l, ":", 2), 0))
                    ) == "sitemap",
                    F.trim(F.try_element_at(F.split(
                        F.regexp_replace(l, "#.*$", ""), ":", 2
                    ), F.lit(2))),
                ),
            ),
            lambda v: v.isNotNull() & (F.length(v) > 0),
        )
    )
    return robots.select(
        F.lower(url_host(F.col("target_uri"))).alias("host"),
        F.explode(sitemaps).alias("sitemap_url"),
    )
