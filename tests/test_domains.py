"""Source/domain-level curation (operators/domains.py): the bucketed
exact per-source cap vs the naive full-window spelling, partition
invariance, null/under-cap semantics, the order_by preference mode
(with a DuckDB parity check), blocklist filtering, and source stats.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from solana_snapshot_etl_tools_spark.operators import domains as DOM

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )


def _naive_cap_ids(df, cap, salt="source-cap"):
    """The reference semantics: full per-source window over the same
    rank key the operator uses."""
    w = Window.partitionBy("source").orderBy(
        F.xxhash64("doc_id", F.lit(salt)), "doc_id"
    )
    return {
        r.doc_id
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .select("doc_id")
        .collect()
    }


def test_source_cap_matches_naive_window(spark):
    docs = _docs(spark)
    per_source = {
        r.source: r.cnt
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(per_source) >= 2 and max(per_source.values()) > 3
    for cap in (1, 3, 17, 10**6):
        got = {
            r.doc_id for r in DOM.source_cap(docs, cap).select("doc_id").collect()
        }
        assert got == _naive_cap_ids(docs, cap), f"cap={cap}"
        # per-source counts are exactly min(cap, n)
        kept_per_source = {
            r.source: r.cnt
            for r in DOM.source_cap(docs, cap)
            .groupBy("source")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        assert kept_per_source == {
            s: min(cap, n) for s, n in per_source.items()
        }


def test_source_cap_small_buckets_and_salt(spark):
    """bucket_bits=2 forces many rows into each bucket, so the cap
    almost always lands mid-bucket — the boundary-ranking path is
    exercised hard. A different salt draws a DIFFERENT survivor set
    of the same per-source sizes."""
    docs = _docs(spark)
    for cap in (2, 9):
        got = {
            r.doc_id
            for r in DOM.source_cap(docs, cap, bucket_bits=2)
            .select("doc_id")
            .collect()
        }
        assert got == _naive_cap_ids(docs, cap)
    a = {r.doc_id for r in DOM.source_cap(docs, 5).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in DOM.source_cap(docs, 5, salt="epoch-2").select("doc_id").collect()
    }
    assert a == _naive_cap_ids(docs, 5)
    assert b == _naive_cap_ids(docs, 5, salt="epoch-2")
    assert a != b  # seeded uniform choice, not a fixed subset


def test_source_cap_partition_invariance(spark):
    docs = _docs(spark)
    a = {
        r.doc_id
        for r in DOM.source_cap(docs.repartition(1), 7).select("doc_id").collect()
    }
    b = {
        r.doc_id
        for r in DOM.source_cap(docs.repartition(13), 7).select("doc_id").collect()
    }
    assert a == b == _naive_cap_ids(docs, 7)


def test_source_cap_null_source_and_skew(spark):
    """A NULL source is capped like any other; one source holding
    ~90% of the corpus (the always-one-giant-domain shape) still
    matches the naive semantics."""
    rows = [(i, f"t{i}", None if i % 10 else "rare") for i in range(200)]
    skew = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = DOM.source_cap(skew, 25)
    by_src = {
        r.source: r.cnt
        for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_src == {None: 25, "rare": 20}  # rare has 20 docs, under cap
    assert {r.doc_id for r in kept.collect()} == _naive_cap_ids(skew, 25)


def test_source_cap_order_by_duckdb_parity(spark):
    """order_by=doc_id is engine-independent: DuckDB's row_number
    spelling of the same cap keeps the identical id set."""
    import duckdb

    docs = _docs(spark)
    cap = 11
    got = sorted(
        r.doc_id
        for r in DOM.source_cap(docs, cap, order_by=F.col("doc_id"))
        .select("doc_id")
        .collect()
    )
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY source ORDER BY doc_id
              ) AS rn
              FROM read_parquet('{SF_DIR}/documents.parquet')
            ) WHERE rn <= {cap} ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want


def test_source_cap_order_by_keeps_best_quality(spark):
    """The preference mode: rank by negated scaled quality keeps each
    source's best-scoring documents."""
    from solana_snapshot_etl_tools_spark.functions import text as TXT

    docs = _docs(spark).withColumn(
        "_q1000", (TXT.quality_score(F.col("text")) * 1000).cast("long")
    )
    cap = 5
    kept = DOM.source_cap(docs, cap, order_by=-F.col("_q1000"))
    w = Window.partitionBy("source").orderBy(F.col("_q1000").desc(), "doc_id")
    want = {
        r.doc_id
        for r in docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .collect()
    }
    # ties at the same quality are broken by id in BOTH spellings
    # only when the id tiebreak direction matches; the operator
    # tie-breaks ascending-id, the naive window here too
    assert {r.doc_id for r in kept.collect()} == want


def test_source_cap_rejects_bad_args(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="cap >= 1"):
        DOM.source_cap(docs, 0)
    with pytest.raises(ValueError, match="bucket_bits"):
        DOM.source_cap(docs, 5, bucket_bits=0)
    with pytest.raises(ValueError, match="integral expression"):
        DOM.source_cap(docs, 5, order_by=F.rand())


def test_source_blocklist_filter(spark):
    rows = [
        (1, "a", "spamfarm.example"),
        (2, "b", "good.example"),
        (3, "c", None),
        (4, "d", "spamfarm.example"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = DOM.source_blocklist_filter(df, ["spamfarm.example"])
    assert {r.doc_id for r in kept.collect()} == {2, 3}  # NULL survives
    # DataFrame blocklist (broadcast anti-join path), same result
    bl = spark.createDataFrame([("spamfarm.example",)], "domain string")
    kept2 = DOM.source_blocklist_filter(df, bl)
    assert {r.doc_id for r in kept2.collect()} == {2, 3}
    # empty list is the identity
    assert DOM.source_blocklist_filter(df, []).count() == 4


def test_source_stats(spark):
    docs = _docs(spark)
    pdf = docs.toPandas()
    stats = {r.source: r for r in DOM.source_stats(docs).collect()}
    for src, grp in pdf.groupby("source"):
        assert stats[src].n_docs == len(grp)
        assert stats[src].n_chars == int(grp["text"].str.len().sum())
        assert stats[src].doc_share == pytest.approx(len(grp) / len(pdf))
    top2 = DOM.source_stats(docs, top_k=2).collect()
    assert len(top2) == 2
    assert [r.n_docs for r in top2] == sorted(
        [r.n_docs for r in stats.values()], reverse=True
    )[:2]


# --- property check: random frames vs a pure-Python reference -----------------

try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    import pyspark.sql.functions as _F

    _SETTINGS = settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )

    # few sources, variable multiplicities, null sources included
    _frames = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.integers(min_value=0, max_value=2**20),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )

    @_SETTINGS
    @given(rows=_frames, cap=st.integers(min_value=1, max_value=9),
           bits=st.sampled_from([1, 3, 10]))
    def test_source_cap_property_matches_reference(spark, rows, cap, bits):
        """On ANY frame the kept set equals the pure-Python spelling
        of the semantics: per source, the cap lowest (xxhash64(id,
        salt), id) documents."""
        df = spark.createDataFrame(
            [(i, f"t{i}", s) for s, i in rows],
            "doc_id long, text string, source string",
        )
        hashes = {
            r.doc_id: r.h
            for r in df.select(
                "doc_id", _F.xxhash64("doc_id", _F.lit("source-cap")).alias("h")
            ).collect()
        }
        by_src: dict = {}
        for s, i in rows:
            by_src.setdefault(s, []).append(i)
        want = set()
        for ids in by_src.values():
            ids.sort(key=lambda i: (hashes[i], i))
            want.update(ids[:cap])
        got = {
            r.doc_id
            for r in DOM.source_cap(df, cap, bucket_bits=bits)
            .select("doc_id").collect()
        }
        assert got == want


def test_blocklist_none_entry_blocks_null_source(spark):
    """Review r8: a None entry fed raw into isin NULLs the whole
    predicate and silently wipes every non-null source; it now means
    'block the NULL source' explicitly."""
    rows = [(1, "a", "good.com"), (2, "b", "spam.com"), (3, "c", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {
        r.doc_id
        for r in DOM.source_blocklist_filter(df, ["spam.com", None]).collect()
    }
    assert kept == {1}
    # None alone: only the NULL source dies
    kept2 = {
        r.doc_id for r in DOM.source_blocklist_filter(df, [None]).collect()
    }
    assert kept2 == {1, 2}


# --- PSL-exact registrable domains ----------------------------------------------

# a planted mini-PSL exercising every rule kind: plain suffixes at two
# depths, a wildcard, its exception, a deep 3-label suffix, comments
MINI_PSL = [
    "// ===BEGIN ICANN DOMAINS===",
    "",
    "com",
    "uk",
    "co.uk",
    "jp",
    "*.nagoya.jp",
    "!city.nagoya.jp",
    "us",
    "k12.ma.us",
    "pvt.k12.ma.us",
    "// trailing comment",
]


def _psl_reg(spark, urls, psl=MINI_PSL, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = DOM.with_registered_domain(df, psl=psl, **kw)
    return [r.registered_domain for r in out.collect()]


def test_psl_exact_rules(spark):
    cases = {
        # plain suffix, one and two labels deep
        "http://a.b.example.com/x": "example.com",
        "https://news.bbc.co.uk": "bbc.co.uk",
        # the uk TLD itself is also a rule: example.uk registers there
        "http://example.uk": "example.uk",
        # wildcard *.nagoya.jp: one extra label is the public suffix
        "http://x.blah.nagoya.jp": "x.blah.nagoya.jp",
        # exception !city.nagoya.jp beats the wildcard
        "http://www.city.nagoya.jp": "city.nagoya.jp",
        "http://ward.city.nagoya.jp": "city.nagoya.jp",
        # longest match wins: pvt.k12.ma.us over k12.ma.us over us
        "http://school.pvt.k12.ma.us": "school.pvt.k12.ma.us",
        "http://x.k12.ma.us": "x.k12.ma.us",
        "http://plain.ma.us": "ma.us",
        # unlisted TLD: implicit * rule, suffix = last label
        "http://foo.bar.unlistedtld": "bar.unlistedtld",
        # IPv4 literal passes through
        "http://192.168.0.1/x": "192.168.0.1",
    }
    urls = list(cases)
    assert _psl_reg(spark, urls) == [cases[u] for u in urls]


def test_psl_host_is_public_suffix(spark):
    # blah.nagoya.jp IS a public suffix under *.nagoya.jp — no
    # registrable domain exists; default falls back to the host
    urls = ["http://blah.nagoya.jp", "http://co.uk", "not a url"]
    assert _psl_reg(spark, urls) == ["blah.nagoya.jp", "co.uk", None]
    assert _psl_reg(spark, urls, fallback_to_host=False) == [None, None, None]


def test_psl_accepts_dataframe_and_matches_iterable(spark):
    psl_df = spark.createDataFrame([(ln,) for ln in MINI_PSL], "line string")
    urls = ["http://a.example.co.uk", "http://www.city.nagoya.jp"]
    assert _psl_reg(spark, urls, psl=psl_df) == _psl_reg(spark, urls)


def test_psl_none_is_heuristic_unchanged(spark):
    from solana_snapshot_etl_tools_spark.functions.url import (
        url_registered_domain,
    )

    urls = [
        "http://a.b.example.com/x",
        "https://news.bbc.co.uk",
        "http://localhost",
        "junk",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.registered_domain
        for r in DOM.with_registered_domain(df).collect()
    ]
    want = [
        r.v
        for r in df.select(
            url_registered_domain(F.col("url")).alias("v")
        ).collect()
    ]
    assert got == want


def test_psl_feeds_source_cap_grouping(spark):
    # the stated purpose: exact registrable-domain grouping for the
    # per-source cap — all nagoya-wildcard subdomains stay SEPARATE
    # sources while co.uk subdomains of one registrant collapse
    rows = [
        (i, f"http://s{i}.big.co.uk/p{i}") for i in range(8)
    ] + [(100, "http://a.one.nagoya.jp/x"), (101, "http://b.two.nagoya.jp/y")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    dom = DOM.with_registered_domain(df, psl=MINI_PSL)
    capped = DOM.source_cap(dom, 3, source_col="registered_domain")
    by = {
        r.registered_domain: r.cnt
        for r in capped.groupBy("registered_domain")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert by == {"big.co.uk": 3, "a.one.nagoya.jp": 1, "b.two.nagoya.jp": 1}


def test_psl_rejects_oversized_and_bad_wildcards(spark):
    df = spark.createDataFrame([("http://x.com",)], "url string")
    with pytest.raises(ValueError, match="wildcard position"):
        DOM.with_registered_domain(df, psl=["foo.*.bar"])
    import solana_snapshot_etl_tools_spark.operators.domains as D

    old = D.MAX_PSL_RULES
    D.MAX_PSL_RULES = 3
    try:
        with pytest.raises(ValueError, match="exceeds 3"):
            DOM.with_registered_domain(df, psl=["a", "b", "c", "d"])
    finally:
        D.MAX_PSL_RULES = old


def test_dedup_by_url_prefer_col(spark):
    from solana_snapshot_etl_tools_spark.operators.domains import dedup_by_url

    rows = [
        # one page, three captures at different timestamps
        (1, "http://Example.com/p?utm_source=x", 100),
        (2, "https://example.com/q", 50),     # different page (scheme+path)
        (3, "http://example.com/p/", 300),    # same page as 1, fresher
        (4, "http://example.com/p", None),    # same page, no timestamp
        (5, "bad url", 999),                  # no identity: passes
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts long")
    # freshest capture wins: rank by NEGATED timestamp (min wins)
    kept = {
        r.doc_id
        for r in dedup_by_url(df, prefer_col=-F.col("ts")).collect()
    }
    assert kept == {2, 3, 5}
    # NULL rank ranks last: with ts nulled on 1 and 3, id tiebreak
    nulled = df.withColumn(
        "ts", F.when(F.col("doc_id") == 2, F.col("ts"))
    )
    kept2 = {
        r.doc_id
        for r in dedup_by_url(nulled, prefer_col=-F.col("ts")).collect()
    }
    assert kept2 == {1, 2, 5}
    # non-integral rank is rejected loudly
    with pytest.raises(ValueError, match="integral"):
        dedup_by_url(df, prefer_col=F.col("ts") / 2)
    # default path unchanged: min id
    assert {r.doc_id for r in dedup_by_url(df).collect()} == {1, 2, 5}


def test_psl_matches_unstripped_www_host(spark):
    """Advisor r9: PSL matching must see the host WITH its leading
    www label — the real list's !www.ck exception can only ever match
    there, and www.com is a genuine registrable domain."""
    psl = MINI_PSL + ["ck", "*.ck", "!www.ck"]
    cases = {
        # the exception rule: www.ck IS the registrable domain
        "http://www.ck/x": "www.ck",
        "http://sub.www.ck": "www.ck",
        # wildcard *.ck still governs other ck hosts
        "http://a.anything.ck": "a.anything.ck",
        # www.com registers under com: www is the registrant label
        "http://www.com": "www.com",
        # the common case is unchanged by keeping www
        "http://www.example.com/p": "example.com",
        "http://www.city.nagoya.jp": "city.nagoya.jp",
    }
    urls = list(cases)
    assert _psl_reg(spark, urls, psl=psl) == [cases[u] for u in urls]


def test_psl_empty_rule_set_is_implicit_star(spark):
    """Review r9: an all-comment/empty PSL crashed on greatest() with
    one arg — it now means only the implicit '*' rule (public suffix
    = last label)."""
    urls = ["http://a.b.example.zz", "http://lonely", "http://10.0.0.1"]
    got = _psl_reg(spark, urls, psl=["// only comments", ""])
    assert got == ["example.zz", "lonely", "10.0.0.1"]
    got2 = _psl_reg(
        spark, urls, psl=["// only comments"], fallback_to_host=False
    )
    assert got2 == ["example.zz", None, "10.0.0.1"]


def test_psl_randomized_vs_python_reference(spark):
    """500 seeded random hosts over a rule set that exercises every
    rule kind, compared against an independent pure-Python spelling of
    the PSL algorithm (longest match, wildcard = one extra label,
    exceptions prevail, implicit '*' fallback)."""
    import random

    rules = DOM._parse_psl(MINI_PSL)

    def ref(host, fallback=True):
        labels = host.split(".")
        n = len(labels)
        best, exc = 1, None
        for k in range(1, n + 1):
            sfx = ".".join(labels[-k:])
            if sfx in rules["exc"]:
                e = rules["exc"][sfx]
                exc = e if exc is None else max(exc, e)
            if sfx in rules["exact"]:
                best = max(best, k)
            if sfx in rules["wild"] and n > k:
                best = max(best, k + 1)
        ps = exc if exc is not None else best
        if n > ps:
            return ".".join(labels[-(ps + 1):])
        return host if fallback else None

    rng = random.Random(99)
    vocab = ["a", "b", "city", "nagoya", "jp", "co", "uk", "ck",
             "k12", "ma", "us", "com", "example", "x", "pvt", "www"]
    hosts = [
        ".".join(rng.choice(vocab) for _ in range(rng.randint(1, 5)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(h, f"http://{h}/p") for h in hosts], "host string, url string"
    )
    for fb in (True, False):
        got = [
            (r.host, r.registered_domain)
            for r in DOM.with_registered_domain(
                df, psl=MINI_PSL, fallback_to_host=fb
            ).collect()
        ]
        for h, g in got:
            # PSL matching runs on the UNSTRIPPED host (www kept):
            # exception rules like !www.ck can only match it there
            assert g == ref(h, fallback=fb), (h, g, fb)


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(max_size=30),
            st.sampled_from(
                ["com", "co.uk", "*.ck", "!www.ck", "// c", "", "  ",
                 "*.", "!", "a.b.c.d.e", "UPPER.Case", "rule trailing junk"]
            ),
        ),
        max_size=30,
    )
)
def test_parse_psl_fuzz_invariants(lines):
    """_parse_psl never crashes on junk (except the documented
    mid-string-wildcard rejection) and its outputs obey the format
    invariants: lowercase keys, no '!'/'*.' prefixes, label counts
    consistent."""
    try:
        rules = DOM._parse_psl(lines)
    except ValueError as e:
        assert "wildcard position" in str(e)
        return
    for kind, mapping in rules.items():
        for key, n in mapping.items():
            assert key == key.lower()
            assert not key.startswith("!") and not key.startswith("*.")
            labels = key.split(".")
            if kind == "exact":
                assert n == len(labels)
            elif kind == "wild":
                assert n == len(labels)
            else:  # exc: public suffix = rule minus leftmost label
                assert n == len(labels) - 1


# --- domain-level quality filtering (RefinedWeb whole-domain drop) ---------

_GOOD = ("this is a perfectly ordinary sentence with the usual words "
         "and plenty of the most common stopwords that the score "
         "rewards because they are of use to have with that and this")
_BAD = "!!! ??? ... ### $$$ %%% @@@ ^^^ &&& *** ((( ))) !!! ??? ..."


def _dq_docs(spark):
    rows = []
    # farm.example: 4 uniformly bad docs — the whole domain must go
    for i in range(4):
        rows.append((f"f{i}", f"http://farm.example/p{i}", _BAD))
    # good.example: 4 good docs
    for i in range(4):
        rows.append((f"g{i}", f"http://sub.good.example/p{i}", _GOOD))
    # lone.example: ONE bad doc — under min_docs, kept
    rows.append(("l0", "http://lone.example/only", _BAD))
    # mixed.example: mostly good, one bad — mean stays above the cut
    rows.append(("m0", "http://mixed.example/bad", _BAD))
    for i in range(1, 4):
        rows.append((f"m{i}", f"http://mixed.example/p{i}", _GOOD))
    return spark.createDataFrame(rows, "doc_id string, url string, text string")


def test_domain_quality_stats_aggregates_per_registered_domain(spark):
    stats = {
        r.domain: r
        for r in DOM.domain_quality_stats(_dq_docs(spark)).collect()
    }
    # subdomain collapses into the registered domain
    assert set(stats) == {
        "farm.example", "good.example", "lone.example", "mixed.example"
    }
    assert stats["farm.example"].n_docs == 4
    assert stats["good.example"].n_docs == 4
    assert stats["farm.example"].mean_quality < 0.3
    assert stats["good.example"].mean_quality > 0.5
    assert stats["good.example"].n_chars == 4 * len(_GOOD)


def test_filter_low_quality_domains_drops_whole_domain_only(spark):
    docs = _dq_docs(spark)
    kept = {
        r.doc_id
        for r in DOM.filter_low_quality_domains(
            docs, min_mean_quality=0.4, min_docs=3
        ).collect()
    }
    # the farm dies whole; the lone bad doc survives (insufficient
    # evidence); mixed.example's one bad doc survives via its domain
    assert kept == {"g0", "g1", "g2", "g3", "l0", "m0", "m1", "m2", "m3"}
    # min_docs=1: the lone domain now dies too
    kept1 = {
        r.doc_id
        for r in DOM.filter_low_quality_domains(
            docs, min_mean_quality=0.4, min_docs=1
        ).collect()
    }
    assert kept1 == kept - {"l0"}
    # columns pass through unchanged
    out = DOM.filter_low_quality_domains(docs, min_mean_quality=0.4)
    assert out.columns == docs.columns
    # scratch-column collision is loud
    with pytest.raises(ValueError, match="_dqs_dom"):
        DOM.filter_low_quality_domains(
            docs.withColumn("_dqs_dom", F.lit("x")), min_mean_quality=0.4
        )


def test_filter_low_quality_domains_custom_quality_column(spark):
    docs = _dq_docs(spark).withColumn(
        # learned-model stand-in: good.example scored terribly
        "model_q",
        F.when(F.col("url").contains("good.example"), 0.0).otherwise(1.0),
    )
    kept = {
        r.doc_id
        for r in DOM.filter_low_quality_domains(
            docs, min_mean_quality=0.5, quality=F.col("model_q")
        ).collect()
    }
    assert not any(d.startswith("g") for d in kept)
    assert {"f0", "m0", "l0"} <= kept


def test_domain_quality_no_text_in_shuffle(spark):
    """The stats aggregate must shuffle (domain, score, length)
    triples, never the text column."""
    plan = (
        DOM.domain_quality_stats(_dq_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)
