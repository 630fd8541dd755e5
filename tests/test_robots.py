"""robots.txt parsing and enforcement over crawl documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import robots as R

ROBOTS_A = """\
# comments and blank lines are ignored

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok/

User-agent: trainbot
User-agent: otherbot
Disallow: /no-train/
Disallow: /wild/*/cards
"""

ROBOTS_B = """\
User-agent: *
Disallow:
"""


def _rec_rows(spark):
    # minimal RECORD_SCHEMA-shaped frame (only the consumed columns
    # need real values)
    rows = [
        ("http://a.example/robots.txt", 200, ROBOTS_A.encode()),
        ("http://b.example/robots.txt", 200, ROBOTS_B.encode()),
        ("http://c.example/robots.txt", 404, b"irrelevant"),
        ("http://a.example/page", 200, b"<html>not robots</html>"),
    ]
    return spark.createDataFrame(
        [(u, None, None, u, None, None, len(p), s, None, bytearray(p))
         for u, s, p in rows],
        "warc_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, http_content_type string, "
        "payload binary",
    )


@pytest.fixture(scope="module")
def rules(spark):
    return R.parse_robots_records(_rec_rows(spark)).cache()


def test_parse_groups_and_directives(spark, rules):
    rows = {(r.host, r.agent, r.rule, r.path) for r in rules.collect()}
    assert ("a.example", "*", "disallow", "/private/") in rows
    assert ("a.example", "*", "disallow", "/tmp") in rows
    assert ("a.example", "*", "allow", "/private/ok/") in rows
    # consecutive user-agent lines share one rule block
    assert ("a.example", "trainbot", "disallow", "/no-train/") in rows
    assert ("a.example", "otherbot", "disallow", "/no-train/") in rows
    # wildcard paths kept verbatim (apply matches them per RFC 9309)
    assert ("a.example", "trainbot", "disallow", "/wild/*/cards") in rows
    # empty Disallow emits nothing; 404 robots emits nothing
    assert not any(h == "b.example" for h, *_ in rows)
    assert not any(h == "c.example" for h, *_ in rows)


def test_apply_star_agent(spark, rules):
    docs = spark.createDataFrame(
        [
            ("d1", "http://a.example/private/secret.html"),
            ("d2", "http://a.example/private/ok/fine.html"),
            ("d3", "http://a.example/tmpfile"),       # /tmp is a PREFIX
            ("d4", "http://a.example/public/x"),
            ("d5", "http://b.example/anything"),       # empty disallow
            ("d6", "http://nohost.example/x"),         # no robots at all
        ],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, rules).collect()}
    assert kept == {"d2", "d4", "d5", "d6"}


def test_apply_specific_agent_uses_own_group_only(spark, rules):
    docs = spark.createDataFrame(
        [
            ("d1", "http://a.example/no-train/x"),   # trainbot group
            ("d2", "http://a.example/private/x"),    # * group — NOT for trainbot
            ("d3", "http://a.example/wild/a/cards"), # matches /wild/*/cards
            ("d4", "http://a.example/wild/a/maps"),  # wildcard does NOT match
        ],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, rules, agent="trainbot").collect()}
    # RFC 9309: a host with a group for the agent uses ONLY that group
    assert kept == {"d2", "d4"}
    # an agent with no group anywhere falls back to *
    kept_other = {
        r.doc_id for r in R.apply_robots(docs, rules, agent="unknownbot").collect()
    }
    assert kept_other == {"d1", "d3", "d4"}


ROBOTS_WILD = """\
User-agent: *
Disallow: /a
Allow: /a*x
Disallow: /exact$
Disallow: /pre*fix$
Allow: /a/safe/
Disallow: /safe
Allow: /safe$
"""


def test_wildcards_and_anchors_match_exactly_per_rfc(spark):
    """RFC 9309 wildcard semantics end-to-end: '*' matches any octet
    run, trailing '$' anchors, precedence is pattern octet length
    with Allow winning ties. (Earlier rounds truncated wildcards
    conservatively — the property sweep below found that truncation
    SHRINKS a Disallow's precedence length and fails open, so the
    engine now matches exactly.)"""
    recs = spark.createDataFrame(
        [("http://w.example/robots.txt", None, None,
          "http://w.example/robots.txt", None, None,
          len(ROBOTS_WILD), 200, None, bytearray(ROBOTS_WILD.encode()))],
        "warc_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, http_content_type string, "
        "payload binary",
    )
    rules = R.parse_robots_records(recs)
    rows = {(r.agent, r.rule, r.path) for r in rules.collect()}
    assert rows == {  # all rules verbatim — wildcards included
        ("*", "disallow", "/a"),
        ("*", "allow", "/a*x"),
        ("*", "disallow", "/exact$"),
        ("*", "disallow", "/pre*fix$"),
        ("*", "allow", "/a/safe/"),
        ("*", "disallow", "/safe"),
        ("*", "allow", "/safe$"),
    }
    docs = spark.createDataFrame(
        [
            ("d1", "http://w.example/abc"),       # /a blocks; /a*x no match
            ("d2", "http://w.example/abx"),       # Allow /a*x (4) beats /a (2)
            ("d3", "http://w.example/exact"),     # anchored Disallow, exact hit
            ("d4", "http://w.example/exactly"),   # anchor does NOT match
            ("d5", "http://w.example/pre-rendered"),  # *fix$ does not match
            ("d6", "http://w.example/prefix"),    # /pre*fix$ matches
            ("d7", "http://w.example/other"),
            ("d8", "http://w.example/a/safe/x"),  # longer Allow carve-out
            # literal '$' inside the PATH: the anchored Allow /safe$
            # matches only the exact path '/safe', not this
            ("d9", "http://w.example/safe$file"),
            ("d10", "http://w.example/safe"),     # Allow /safe$ (6) ties-beats
                                                  # Disallow /safe (5)
        ],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, rules).collect()}
    assert kept == {"d2", "d4", "d5", "d7", "d8", "d10"}


def test_longest_match_allow_tiebreak(spark):
    rules = spark.createDataFrame(
        [
            ("h.example", "*", "disallow", "/a/"),
            ("h.example", "*", "allow", "/a/b/"),
            ("h.example", "*", "disallow", "/a/b/c/"),
        ],
        R.RULES_SCHEMA,
    )
    docs = spark.createDataFrame(
        [
            ("d1", "http://h.example/a/x"),       # disallow /a/
            ("d2", "http://h.example/a/b/x"),     # allow /a/b/ (longer)
            ("d3", "http://h.example/a/b/c/x"),   # disallow /a/b/c/ (longest)
        ],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, rules).collect()}
    assert kept == {"d2"}


def test_warc_end_to_end(spark, tmp_path):
    import gzip as _gzip

    from tests.test_warc import _http, _record, _write

    recs = [
        _record("response", _http(ROBOTS_A.encode(), ctype="text/plain"),
                uri="http://a.example/robots.txt",
                ctype="application/http; msgtype=response"),
        _record("response", _http(b"<html>secret</html>"),
                uri="http://a.example/private/x.html",
                ctype="application/http; msgtype=response"),
        _record("response", _http(b"<html>open</html>"),
                uri="http://a.example/pub/y.html",
                ctype="application/http; msgtype=response"),
    ]
    p = _write(tmp_path / "crawl.warc.gz", recs, gz=True)
    rules = R.robots_rules_from_warc(spark, [p])
    from solana_snapshot_etl_tools_spark.sources.warc import warc_html_documents

    docs = warc_html_documents(spark, [p])
    kept = [r.url for r in R.apply_robots(docs, rules).collect()]
    assert kept == ["http://a.example/pub/y.html"]


def test_no_text_shuffle(spark, rules):
    docs = spark.createDataFrame(
        [("d1", "http://a.example/x", "body")],
        "doc_id string, url string, text string",
    )
    out = R.apply_robots(docs, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rules ride a broadcast hash join on the host key; the corpus
    # side never nested-loops and never hash-exchanges its text
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line


def test_cli_respect_robots(spark, tmp_path, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    from tests.test_warc import _http, _record, _write

    body = (b"<html><p>a perfectly ordinary english page with enough "
            b"words for the default filters to keep it around %d"
            b"</p></html>")
    recs = [
        _record("response", _http(ROBOTS_A.encode(), ctype="text/plain"),
                uri="http://a.example/robots.txt",
                ctype="application/http; msgtype=response"),
        _record("response", _http(body % 1),
                uri="http://a.example/private/p1",
                ctype="application/http; msgtype=response"),
        _record("response", _http(body % 2),
                uri="http://a.example/pub/p2",
                ctype="application/http; msgtype=response"),
        _record("response", _http(body % 3),
                uri="http://b.example/anything/p3",
                ctype="application/http; msgtype=response"),
    ]
    p = _write(tmp_path / "crawl.warc.gz", recs, gz=True)
    out = str(tmp_path_factory.mktemp("robots_cli"))
    assert corpus_cli.main([
        p, out, "--input-format", "warc", "--html-extract", "--no-pii",
        "--respect-robots",
    ]) == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["robots_agent"] == "*"
    assert rep["n_robots_blocked"] == 1  # only /private/p1
    assert rep["n_input"] == 2

    with pytest.raises(SystemExit):
        corpus_cli.main([p, out, "--respect-robots"])  # parquet input


def test_colonless_directive_line_is_skipped_not_fatal(spark):
    # "Disallow" with no colon — common malformation; under ANSI the
    # old element_at path threw and killed the job
    recs = spark.createDataFrame(
        [("http://m.example/robots.txt", None, None,
          "http://m.example/robots.txt", None, None, 0, 200, None,
          bytearray(b"User-agent: *\nDisallow\nDisallow: /keep-me/\n"))],
        "warc_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, http_content_type string, "
        "payload binary",
    )
    rows = {(r.rule, r.path) for r in R.parse_robots_records(recs).collect()}
    assert rows == {("disallow", "/keep-me/")}


def test_uppercase_scheme_fails_closed(spark, rules):
    docs = spark.createDataFrame(
        [("d1", "HTTP://a.example/private/x"),
         ("d2", "HTTP://a.example/pub/x")],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, rules).collect()}
    assert kept == {"d2"}


# --- fail-closed property vs a full-RFC reference matcher -----------------

def _rfc_allowed(rules, path):
    """Reference RFC 9309 matcher WITH full wildcard semantics:
    '*' matches any run, trailing '$' anchors the end. Longest-match
    wins; Allow beats Disallow at equal length. No match → allowed."""
    import re as _re2

    best = None  # ((len, is_allow), rule)
    for rule, pat in rules:
        rx = "".join(
            ".*" if ch == "*" else _re2.escape(ch) for ch in pat.rstrip("$")
        )
        if pat.endswith("$"):
            rx += "$"
        if _re2.match(rx, path):
            key = (len(pat), 1 if rule == "allow" else 0)
            if best is None or key > best[0]:
                best = (key, rule)
    return best is None or best[1] == "allow"


def test_engine_never_fails_open_vs_rfc(spark):
    """THE governance invariant, swept over 300 random rule-sets in
    ONE Spark job: whatever the engine's wildcard simplifications do,
    a document the full-RFC rules would BLOCK is never kept. (The
    engine may block more — conservative by policy — never less.)"""
    import random

    rng = random.Random(20260816)
    SEGS = ["a", "b", "ab", "x1", "safe", "$"]
    PATS = ["a", "b", "ab", "*", "x1", "safe"]
    cases = []
    for i in range(300):
        rules = [
            (
                rng.choice(["allow", "disallow"]),
                "/" + "/".join(
                    rng.choice(PATS) for _ in range(rng.randint(1, 3))
                ) + rng.choice(["", "$"]),
            )
            for _ in range(rng.randint(1, 5))
        ]
        path = "/" + "/".join(
            rng.choice(SEGS) for _ in range(rng.randint(0, 4))
        )
        cases.append((f"h{i}.example", rules, path))

    recs = spark.createDataFrame(
        [
            (f"http://{host}/robots.txt", None, None,
             f"http://{host}/robots.txt", None, None, 0, 200, None,
             bytearray((
                 "User-agent: *\n" + "\n".join(
                     f"{'Allow' if k == 'allow' else 'Disallow'}: {p}"
                     for k, p in rules
                 )
             ).encode()))
            for host, rules, _ in cases
        ],
        "warc_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, http_content_type string, "
        "payload binary",
    )
    parsed = R.parse_robots_records(recs)
    docs = spark.createDataFrame(
        [(f"d{i}", f"http://{host}{path}")
         for i, (host, _, path) in enumerate(cases)],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, parsed).collect()}
    # the engine implements full RFC wildcards now, so the bar is
    # EXACT agreement — fail-open and over-block both count as bugs
    mismatches = [
        (cases[i][1], cases[i][2],
         "kept" if f"d{i}" in kept else "blocked")
        for i in range(len(cases))
        if (f"d{i}" in kept) != _rfc_allowed(cases[i][1], cases[i][2])
    ]
    assert not mismatches, f"RFC disagreements: {mismatches[:5]}"
    # sanity: the sweep is not vacuous — some docs are genuinely kept
    # and some genuinely RFC-blocked
    assert kept
    assert any(
        not _rfc_allowed(r, p) for _, r, p in cases
    )


def _reference_parse(body):
    """Independent REP group parser written from RFC 9309 §2.2:
    a group is one-or-more user-agent lines followed by rules lines;
    consecutive user-agent lines accumulate into one group; a
    user-agent line AFTER rules starts a new group; rules outside any
    group are ignored; comments ('#' to EOL) stripped; keys
    case-insensitive; non-rule directives (sitemap, crawl-delay) do
    not terminate a group per the RFC ("other records" are allowed
    inside) — but the ENGINE treats any non-UA line after rules as
    staying in-rules, which agrees. Empty rule values emit nothing."""
    out = set()
    agents, in_rules = [], False
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent" and val:
            if in_rules:
                agents, in_rules = [], False
            if val.lower() not in agents:
                agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if agents and val:
                for a in agents:
                    out.add((a, key, val))
        # other directives (sitemap, crawl-delay, junk): no effect on
        # grouping state beyond what rules already set
    return out


def test_parser_group_semantics_property_vs_reference(spark):
    """300 random robots.txt bodies, ONE Spark job: the engine's
    column-expression group fold emits exactly the (agent, rule,
    path) set an independent RFC 9309 reference parser produces."""
    import random

    rng = random.Random(13)
    AGENTS = ["*", "trainbot", "OtherBot", "a"]
    PATHS = ["/", "/a", "/a/b", "/x*y", "/p$", "/q?r=1"]
    LINES = (
        [f"User-agent: {a}" for a in AGENTS]
        + [f"user-AGENT: {a}" for a in AGENTS[:2]]
        + [f"Disallow: {p}" for p in PATHS]
        + [f"Allow: {p}" for p in PATHS[:3]]
        + ["Disallow:", "Allow:", "Disallow", "# a comment", "",
           "Sitemap: http://x/s.xml", "Crawl-delay: 5",
           "Disallow: /c # trailing comment", "randomjunk",
           "User-agent:"]
    )
    cases = []
    for i in range(300):
        body = "\n".join(
            rng.choice(LINES) for _ in range(rng.randint(1, 12))
        )
        cases.append((f"g{i}.example", body))
    recs = spark.createDataFrame(
        [(f"http://{h}/robots.txt", None, None, f"http://{h}/robots.txt",
          None, None, len(b), 200, None, bytearray(b.encode()))
         for h, b in cases],
        "warc_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, http_content_type string, "
        "payload binary",
    )
    got = {}
    for r in R.parse_robots_records(recs).collect():
        got.setdefault(r.host, set()).add((r.agent, r.rule, r.path))
    mismatches = []
    non_empty = 0
    for host, body in cases:
        expect = _reference_parse(body)
        non_empty += bool(expect)
        if got.get(host, set()) != expect:
            mismatches.append((body, sorted(expect),
                               sorted(got.get(host, set()))))
    assert not mismatches, f"parser disagreements: {mismatches[:3]}"
    assert non_empty > 50  # the sweep is not vacuous


def test_robots_sitemaps_extraction(spark):
    body = """\
User-agent: *
Disallow: /private/
Sitemap: https://s.example/sitemap.xml
User-agent: bot
Sitemap: https://s.example/sitemap2.xml # trailing comment
sitemap: https://s.example/sitemap.xml
Sitemap:
# Sitemap: https://s.example/commented-out.xml
"""
    recs = spark.createDataFrame(
        [("http://s.example/robots.txt", None, None,
          "http://s.example/robots.txt", None, None,
          len(body), 200, None, bytearray(body.encode())),
         ("http://t.example/robots.txt", None, None,
          "http://t.example/robots.txt", None, None,
          3, 404, None, bytearray(b"x"))],
        "warc_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, http_content_type string, "
        "payload binary",
    )
    rows = {(r.host, r.sitemap_url)
            for r in R.robots_sitemaps(recs).collect()}
    # group-independent, case-insensitive key, dup collapsed, blank
    # and commented-out lines dropped, 404 host absent
    assert rows == {
        ("s.example", "https://s.example/sitemap.xml"),
        ("s.example", "https://s.example/sitemap2.xml"),
    }


class TestCrawlDelays:
    DELAYS = (b"User-agent: fastbot\r\nCrawl-delay: 0.5\r\n"
              b"Disallow: /x\r\n\r\n"
              b"User-agent: *\r\nCrawl-delay: 10\r\n"
              b"Crawl-delay: 7\r\n"     # same group repeats: LAST wins
              b"\r\n"
              b"User-agent: badbot\r\nCrawl-delay: nonsense\r\n")

    def _recs(self, spark, tmp_path, extra=()):
        from tests.test_warc import _http, _record, _write
        from solana_snapshot_etl_tools_spark.sources.warc import read_warc

        recs = [
            _record("response", _http(self.DELAYS, ctype="text/plain"),
                    uri="http://d.example/robots.txt",
                    ctype="application/http; msgtype=response"),
            _record("response",
                    _http(b"User-agent: *\r\nDisallow: /nope\r\n",
                          ctype="text/plain"),
                    uri="http://nodelay.example/robots.txt",
                    ctype="application/http; msgtype=response"),
            *extra,
        ]
        p = _write(tmp_path / "delays.warc.gz", recs, gz=True)
        return read_warc(spark, [p])

    def test_star_group_last_delay_wins(self, spark, tmp_path):
        out = {r.host: r.crawl_delay_sec
               for r in R.robots_crawl_delays(self._recs(spark, tmp_path))
               .collect()}
        # '*' group declared 10 then 7: the file's final word wins;
        # hosts without a delay (and unparseable values) are absent
        assert out == {"d.example": 7.0}

    def test_own_group_beats_star(self, spark, tmp_path):
        out = {r.host: r.crawl_delay_sec
               for r in R.robots_crawl_delays(
                   self._recs(spark, tmp_path), agent="FastBot"
               ).collect()}
        assert out == {"d.example": 0.5}

    def test_agent_without_own_delay_falls_back(self, spark, tmp_path):
        out = {r.host: r.crawl_delay_sec
               for r in R.robots_crawl_delays(
                   self._recs(spark, tmp_path), agent="otherbot"
               ).collect()}
        assert out == {"d.example": 7.0}

    def test_own_group_without_delay_silences_star(self, spark, tmp_path):
        """RFC 9309 §2.2.1, matching apply_robots: a host where the
        agent has its OWN group (rules present) must NOT inherit the
        '*' group's Crawl-delay — the own group's silence IS the
        answer. Before the fix, ownbot here inherited 9.0."""
        from tests.test_warc import _http, _record

        body = (b"User-agent: ownbot\r\nDisallow: /x\r\n\r\n"
                b"User-agent: *\r\nCrawl-delay: 9\r\nDisallow: /y\r\n")
        extra = [_record("response", _http(body, ctype="text/plain"),
                         uri="http://own.example/robots.txt",
                         ctype="application/http; msgtype=response")]
        out = {r.host: r.crawl_delay_sec
               for r in R.robots_crawl_delays(
                   self._recs(spark, tmp_path, extra=extra), agent="ownbot"
               ).collect()}
        # own.example: ownbot's own group declares rules but no delay
        # → absent; d.example: no ownbot group → star fallback 7
        assert out == {"d.example": 7.0}

    def test_delay_group_boundaries_match_rules_fold(self, spark, tmp_path):
        """crawl-delay is an RFC 'other record' — it must not close a
        group in the delay fold any more than in the rules fold: a
        User-agent line after ONLY a crawl-delay still accumulates
        into the same group (so the later delay covers both agents)."""
        from tests.test_warc import _http, _record

        body = (b"User-agent: abot\r\nCrawl-delay: 5\r\n"
                b"User-agent: bbot\r\nCrawl-delay: 3\r\n")
        extra = [_record("response", _http(body, ctype="text/plain"),
                         uri="http://acc.example/robots.txt",
                         ctype="application/http; msgtype=response")]
        recs = self._recs(spark, tmp_path, extra=extra)
        for agent, want in (("abot", 3.0), ("bbot", 3.0)):
            out = {r.host: r.crawl_delay_sec
                   for r in R.robots_crawl_delays(recs, agent=agent)
                   .collect()}
            assert out.get("acc.example") == want, (agent, out)


def test_backslash_url_cannot_evade_rules(spark, rules):
    """WHATWG: browsers treat \\ as / in http(s) URLs, so
    http://a.example\\private/x FETCHES /private/x from a.example —
    both the host key and the path must see through the trick."""
    docs = spark.createDataFrame(
        [
            ("d1", "http://a.example\\private/secret"),
            ("d2", "http://a.example/private/secret"),
            ("d3", "http:\\\\a.example\\tmp\\x"),
            ("d4", "http://a.example/open"),
        ],
        "doc_id string, url string",
    )
    kept = {r.doc_id for r in R.apply_robots(docs, rules).collect()}
    assert kept == {"d4"}
