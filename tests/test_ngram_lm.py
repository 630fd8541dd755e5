"""Stupid-backoff n-gram LM: exact score parity with a pure-Python
reference (incl. OOV/backoff paths), fluency discrimination on held-out
text, pruning semantics, partition invariance, filter contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import ngram_lm as LM

TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox likes the lazy dog"),
    (3, "a lazy dog sleeps all day long"),
    (4, "the brown fox and the brown dog play"),
    (5, "quick quick quick brown brown fox"),
]
SCORE = [
    (10, "the quick brown fox"),            # in-distribution
    (11, "the lazy dog sleeps"),            # mixes contexts, backoff
    (12, "zebra quantum flux"),             # all OOV
    (13, "the"),                            # single token
    (14, ""),                               # unscorable
    (15, None),                             # unscorable
    (16, "dog the over jumps"),             # seen words, unseen order
]


def _ref_model(rows, n):
    # single-BOS convention (KenLM/CCNet): counts come from the
    # conceptual [<s>]+tokens+[</s>] sentence, so count(<s>) = 1 per
    # doc — NOT from the (n-1)-fold scoring pad
    from collections import Counter

    counts = Counter()
    total = 0
    for _i, t in rows:
        toks = [w for w in (t or "").lower().split() if w]
        if not toks:
            continue
        seq = ([LM.BOS] if n >= 2 else []) + toks + [LM.EOS]
        total += len(toks) + 1  # predicted positions: tokens + EOS
        for o in range(1, n + 1):
            for s in range(len(seq) - o + 1):
                counts[tuple(seq[s : s + o])] += 1
    return counts, total


def _ref_scores(rows, counts, total, n):
    out = {}
    for i, t in rows:
        toks = [w for w in (t or "").lower().split() if w]
        if not toks:
            continue
        seq = [LM.BOS] * (n - 1) + toks + [LM.EOS]
        lps = []
        for pos in range(n - 1, len(seq)):
            lp = math.log(LM.BACKOFF ** (n - 1) / total)
            for o in range(1, n + 1):
                g = counts.get(tuple(seq[pos - o + 1 : pos + 1]), 0)
                denom = (
                    counts.get(tuple(seq[pos - o + 1 : pos]), 0)
                    if o >= 2
                    else total
                )
                if g > 0 and denom > 0:
                    lp = math.log(g / denom) + (n - o) * math.log(LM.BACKOFF)
            lps.append(lp)
        avg = sum(lps) / len(lps)
        out[i] = (len(lps), avg, math.exp(-avg))
    return out


@pytest.mark.parametrize("n", [1, 2, 3])
def test_score_parity_with_python_reference(spark, n):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = LM.ngram_lm_train(train, n=n)
    counts, total = _ref_model(TRAIN, n)
    assert model["total"] == total
    got = {
        r.doc_id: (r.n_tokens, r.avg_logprob, r.perplexity)
        for r in LM.lm_score(score, model).collect()
    }
    want = _ref_scores(SCORE, counts, total, n)
    assert set(got) == set(want)  # 14/15 absent: unscorable
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12), d
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-12), d


def test_fluent_text_scores_lower_perplexity(spark):
    """Train on the real corpus; a held-out fluent sentence built from
    its vocabulary must beat (a) shuffled word salad of the SAME
    words and (b) OOV gibberish."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    model = LM.ngram_lm_train(docs, n=3)
    # a bigram-frequent phrase from the corpus domain vs its reversal
    probe = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "dog lazy the over jumps fox brown quick the"),
            (3, "xqzt vvkpq zzyxw aaabq mmnop qrstu"),
        ],
        "doc_id long, text string",
    )
    ppl = {r.doc_id: r.perplexity for r in LM.lm_score(probe, model).collect()}
    assert ppl[1] < ppl[2] < ppl[3]


def test_min_count_pruning_backs_off_not_crashes(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    full = LM.ngram_lm_train(train, n=3, min_count=1)
    pruned = LM.ngram_lm_train(train, n=3, min_count=2)
    assert pruned["counts"].count() < full["counts"].count()
    probe = spark.createDataFrame(
        [(1, "a lazy dog sleeps all day long")], "doc_id long, text string"
    )
    a = LM.lm_score(probe, full).collect()[0]
    b = LM.lm_score(probe, pruned).collect()[0]
    # the singleton trigrams of doc 3 are pruned → backoff engages →
    # score drops, but stays finite
    assert b.avg_logprob < a.avg_logprob
    assert math.isfinite(b.avg_logprob)
    # unigrams always survive pruning: even an aggressive cut scores
    deep = LM.ngram_lm_train(train, n=3, min_count=10_000)
    c = LM.lm_score(probe, deep).collect()[0]
    assert math.isfinite(c.avg_logprob)


def test_partition_invariance(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    m1 = LM.ngram_lm_train(train, n=3)
    m2 = LM.ngram_lm_train(train.repartition(7), n=3)
    a = sorted(
        (r.doc_id, r.n_tokens, r.avg_logprob)
        for r in LM.lm_score(score, m1).collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, r.avg_logprob)
        for r in LM.lm_score(score.repartition(5), m2).collect()
    )
    assert a == b


def test_perplexity_filter_contract(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    model = LM.ngram_lm_train(train, n=2)
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    ppl = {r.doc_id: r.perplexity for r in LM.lm_score(score, model).collect()}
    cut = sorted(ppl.values())[len(ppl) // 2]
    kept = LM.perplexity_filter(score, model, cut)
    assert set(r.doc_id for r in kept.collect()) == {
        d for d, p in ppl.items() if p <= cut
    }
    assert kept.columns == ["doc_id", "text"]
    # null/empty text never passes the gate
    assert kept.filter(F.col("doc_id").isin(14, 15)).count() == 0


def test_single_bos_convention(spark):
    """count(<s>) must be 1 per document (the KenLM/CCNet single-BOS
    convention) — an (n-1)-fold pad would deflate the S(w|<s>)
    denominator by (n-1). Checked via the hashed key directly."""
    import pyspark.sql.functions as FX

    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    for n in (2, 3, 5):
        model = LM.ngram_lm_train(train, n=n)
        key = spark.range(1).select(
            FX.xxhash64(FX.lit(1), FX.lit(LM.BOS)).alias("k")
        ).collect()[0].k
        bos = model["counts"].filter(FX.col("key") == key).collect()
        assert len(bos) == 1 and bos[0].cnt == len(TRAIN), (n, bos)


def test_save_load_roundtrip(spark, tmp_path_factory):
    """lm_save → lm_load: the loaded model scores IDENTICALLY to the
    fresh in-memory model (the train-once / score-many contract)."""
    d = str(tmp_path_factory.mktemp("lm_model"))
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    fresh = LM.ngram_lm_train(train, n=3, min_count=1)
    LM.lm_save(fresh, d)
    loaded = LM.lm_load(spark, d)
    assert loaded["n"] == fresh["n"]
    assert loaded["total"] == fresh["total"]
    a = sorted(
        (r.doc_id, r.n_tokens, r.avg_logprob)
        for r in LM.lm_score(score, fresh).collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, r.avg_logprob)
        for r in LM.lm_score(score, loaded).collect()
    )
    assert [(d, t) for d, t, _ in a] == [(d, t) for d, t, _ in b]
    for (_, _, x), (_, _, y) in zip(a, b):
        # the parquet roundtrip repartitions the counts table, so the
        # per-position double summation order may differ by an ULP
        assert x == pytest.approx(y, rel=1e-12)
    # overwrite semantics: re-saving a different model wins whole
    smaller = LM.ngram_lm_train(train, n=2, min_count=2)
    LM.lm_save(smaller, d)
    again = LM.lm_load(spark, d)
    assert again["n"] == 2
    assert again["counts"].count() == smaller["counts"].count()
    # corrupt/missing meta is loud
    import pytest as _pytest

    with _pytest.raises(Exception):
        LM.lm_load(spark, d + "/nope")


def test_bad_params(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string")
    with pytest.raises(ValueError):
        LM.ngram_lm_train(df, n=0)
    with pytest.raises(ValueError):
        LM.ngram_lm_train(df, min_count=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        LM.lm_score(df, LM.ngram_lm_train(empty))


def test_cli_lm_filter_stage(spark, tmp_path_factory, capsys):
    """--lm-reference/--lm-max-ppl: the CCNet stage composes in the
    batch pipeline (report key, monotone keep counts) and is rejected
    in stream mode (join+agg pipeline, not a stateless row filter)."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    src = "/root/testdata/sf0.001/documents.parquet"

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    base = tmp_path_factory.mktemp("lm_cli")
    loose = run(src, str(base / "o1"), "--no-pii",
                "--lm-reference", src, "--lm-max-ppl", "1e9")
    tight = run(src, str(base / "o2"), "--no-pii",
                "--lm-reference", src, "--lm-max-ppl", "26")
    assert loose["n_after_lm_filter"] == loose["n_after_filters"]
    assert tight["n_after_lm_filter"] < loose["n_after_lm_filter"]
    assert sum(v["rows"] for v in tight["splits"].values()) == tight[
        "n_after_lm_filter"
    ]

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # threshold without reference/model
        corpus_cli.main([src, str(base / "o4"), "--lm-max-ppl", "100"])
    with _pytest.raises(SystemExit):  # --lm-save needs --lm-reference
        corpus_cli.main([src, str(base / "o5"), "--lm-save",
                         str(base / "m"), "--lm-max-ppl", "100"])


def test_cli_lm_save_then_model_reuse(spark, tmp_path_factory, capsys):
    """--lm-save persists the reference-trained LM; a later run with
    --lm-model loads it instead of retraining and filters
    IDENTICALLY (same keep count, same split sizes) — the CCNet
    train-once / score-many posture as a CLI surface."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    src = "/root/testdata/sf0.001/documents.parquet"
    base = tmp_path_factory.mktemp("lm_model_cli")
    mdir = str(base / "model")

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    trained = run(src, str(base / "o1"), "--no-pii",
                  "--lm-reference", src, "--lm-max-ppl", "26",
                  "--lm-save", mdir)
    assert trained["lm_saved_to"] == mdir
    reused = run(src, str(base / "o2"), "--no-pii",
                 "--lm-model", mdir, "--lm-max-ppl", "26")
    assert reused["lm_model"] == mdir
    assert reused["n_after_lm_filter"] == trained["n_after_lm_filter"]
    assert reused["splits"] == trained["splits"]

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # exclusive flags
        corpus_cli.main([src, str(base / "o3"), "--lm-reference", src,
                         "--lm-model", mdir, "--lm-max-ppl", "26"])


def test_perplexity_buckets_ordering_and_shares(spark):
    """Bucket cutoffs from the corpus's own percentiles: every head
    perplexity <= every middle <= every tail (exact, regardless of the
    sketch's cut placement), shares roughly tercile-sized, unscorable
    rows NULL in both columns."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    model = LM.ngram_lm_train(train, n=2, min_count=1)
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox dog day {'zebra ' * (i % 7)}") for i in range(60)]
        + [(100, ""), (101, None)],
        "doc_id long, text string",
    )
    out = LM.perplexity_buckets(docs, model).collect()
    by = {}
    for r in out:
        by.setdefault(r.ppl_bucket, []).append(r)
    assert set(by) == {"head", "middle", "tail", None}
    assert {r.doc_id for r in by[None]} == {100, 101}
    assert all(r.perplexity is None for r in by[None])
    hi_head = max(r.perplexity for r in by["head"])
    mid = [r.perplexity for r in by["middle"]]
    lo_tail = min(r.perplexity for r in by["tail"])
    assert hi_head <= min(mid) and max(mid) <= lo_tail
    for name in ("head", "middle", "tail"):
        assert 10 <= len(by[name]) <= 30, (name, len(by[name]))
    # all input columns pass through
    assert {len(r.asDict()) for r in out} == {4}


def test_perplexity_buckets_per_stratum(spark):
    """Per-stratum cutoffs (CCNet's per-language rule): a stratum
    whose every doc is high-perplexity still splits INTERNALLY instead
    of landing wholly in the tail."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    model = LM.ngram_lm_train(train, n=2, min_count=1)
    fluent = [
        (i, "en", f"the quick brown fox dog {'lazy ' * (i % 5)}")
        for i in range(30)
    ]
    weird = [
        (100 + i, "zz", f"zebra quantum flux {'blorp ' * (i % 5)}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        fluent + weird, "doc_id long, lang string, text string"
    )
    out = LM.perplexity_buckets(docs, model, stratum_col="lang").collect()
    per = {}
    for r in out:
        per.setdefault((r.lang, r.ppl_bucket), 0)
        per[(r.lang, r.ppl_bucket)] += 1
    for lang in ("en", "zz"):
        for b in ("head", "middle", "tail"):
            assert per.get((lang, b), 0) >= 5, (lang, b, per)
    with pytest.raises(ValueError, match="labels"):
        LM.perplexity_buckets(docs, model, labels=("a", "b"))
    with pytest.raises(ValueError, match="ascending"):
        LM.perplexity_buckets(docs, model, cuts=(0.9, 0.1))


@pytest.mark.slow
def test_cli_lm_keep_buckets(spark, tmp_path_factory, capsys):
    """--lm-keep-buckets head,middle drops the worst tercile; the
    dropped docs are exactly the highest-perplexity ones."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    src = "/root/testdata/sf0.001/documents.parquet"

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    base = tmp_path_factory.mktemp("lm_buckets_cli")
    rep = run(src, str(base / "o1"), "--no-pii",
              "--lm-reference", src, "--lm-keep-buckets", "head,middle")
    all_b = run(src, str(base / "o2"), "--no-pii",
                "--lm-reference", src,
                "--lm-keep-buckets", "head,middle,tail")
    assert all_b["n_after_lm_filter"] == all_b["n_after_filters"]
    n = all_b["n_after_lm_filter"]
    # head+middle ≈ 2/3 (sketch cutoffs; generous slack)
    assert 0.55 * n <= rep["n_after_lm_filter"] <= 0.8 * n

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # both rules at once
        corpus_cli.main([src, str(base / "o3"), "--lm-reference", src,
                         "--lm-max-ppl", "100",
                         "--lm-keep-buckets", "head"])
    with _pytest.raises(SystemExit):  # unknown bucket
        corpus_cli.main([src, str(base / "o4"), "--lm-reference", src,
                         "--lm-keep-buckets", "torso"])


def test_cli_lm_keep_buckets_stream_post_drain(spark, tmp_path_factory, capsys):
    """--lm-keep-buckets runs post-drain under --ingest-stream (the
    --lm-max-ppl precedent): the append-only corpus keeps everything,
    the derived views see only the kept buckets."""
    import json as _json
    import os

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("lm_buckets_stream")
    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").orderBy("doc_id").limit(60)
    docs.coalesce(1).write.mode("append").parquet(arrivals)
    assert corpus_cli.main(
        [arrivals, str(base / "out"), "--ingest-stream",
         "--index-out", str(base / "idx"), "--no-pii",
         "--quality", "0", "--lang", "",
         "--lm-reference", "/root/testdata/sf0.001/documents.parquet",
         "--lm-keep-buckets", "head,middle", "--data-card"]
    ) == 0
    rep = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["n_corpus"] == 60  # append-only state unfiltered
    assert 0.5 * 60 <= rep["n_after_lm_filter"] <= 0.8 * 60
    assert rep["data_card"]["n_docs"] == rep["n_after_lm_filter"]


def test_cli_lm_bucket_by_script(spark, tmp_path_factory, capsys):
    """--lm-bucket-by script: per-writing-system cutoffs keep a head
    share of EVERY script; corpus-global cutoffs against a Latin
    reference drop the (uniformly high-perplexity) Cyrillic side
    wholesale."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli
    from solana_snapshot_etl_tools_spark.functions.text import (
        dominant_script,
    )

    base = tmp_path_factory.mktemp("lm_bucket_by")
    latin = "the quick brown fox reads many fine books about rivers "
    cyr = "быстрая коричневая лиса читает много хороших книг о реках "
    rows = [(i, latin + f"doc {i} " * (1 + i % 3)) for i in range(18)] + [
        (100 + i, cyr + f"док {i} " * (1 + i % 3)) for i in range(18)
    ]
    src = str(base / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    ref = str(base / "ref")
    spark.createDataFrame(
        [(i, latin * 2) for i in range(6)], "doc_id long, text string"
    ).write.parquet(ref)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    def kept_scripts(out_dir, rep):
        per = {}
        for name, sz in rep["splits"].items():
            if not sz["rows"]:
                continue
            df = spark.read.parquet(f"{out_dir}/{name}").withColumn(
                "_s", dominant_script(F.col("text"))
            )
            for r in df.groupBy("_s").count().collect():
                per[r._s] = per.get(r._s, 0) + r["count"]
        return per

    o1 = str(base / "global")
    rep1 = run(src, o1, "--no-pii", "--quality", "0", "--lang", "",
               "--lm-reference", ref, "--lm-keep-buckets", "head")
    g = kept_scripts(o1, rep1)
    # global terciles vs a Latin reference: the head is Latin-only
    assert g.get("cyrillic", 0) == 0 and g.get("latin", 0) > 0

    o2 = str(base / "by_script")
    rep2 = run(src, o2, "--no-pii", "--quality", "0", "--lang", "",
               "--lm-reference", ref, "--lm-keep-buckets", "head",
               "--lm-bucket-by", "script")
    s = kept_scripts(o2, rep2)
    # per-script cutoffs: each script keeps its own head share
    assert s.get("cyrillic", 0) >= 4 and s.get("latin", 0) >= 4

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # bucket-by without buckets
        corpus_cli.main([src, o1, "--lm-reference", ref,
                         "--lm-max-ppl", "100", "--lm-bucket-by", "lang"])
