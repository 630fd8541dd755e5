"""Mergeable sketch profiles (operators/profile.py): estimate
accuracy vs exact counts, exact merge-equals-whole, per-group rows,
parquet persistence of sketch binaries, DuckDB parity for the exact
scalars, and the guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import profile as P

SRC = "/root/testdata/sf0.001/documents.parquet"


def _est(df):
    return P.profile_estimates(df).collect()[0].asDict()


def test_profile_estimates_match_exact_counts(spark):
    docs = spark.read.parquet(SRC).select("doc_id", "text")
    prof = P.corpus_profile(docs)
    got = _est(prof)

    exact = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.filter(
            F.split(F.col("text"), r"\s+"), lambda t: F.length(t) > 0
        ))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
        F.count_distinct(F.xxhash64("text")).alias("d_texts"),
    ).collect()[0]
    d_tokens = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("t"))
        .filter(F.length("t") > 0)
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    # the summed scalars are EXACT
    assert got["n_docs"] == exact["n_docs"]
    assert got["n_tokens"] == exact["n_tokens"]
    assert got["n_chars"] == exact["n_chars"]
    # the sketched distincts land within the lg_k=12 error band
    assert got["distinct_texts"] == pytest.approx(exact["d_texts"], rel=0.05)
    assert got["distinct_tokens"] == pytest.approx(d_tokens, rel=0.05)
    assert got["exact_dup_rate"] == pytest.approx(
        1.0 - exact["d_texts"] / exact["n_docs"], abs=0.05
    )
    assert got["tokens_per_doc"] == pytest.approx(
        exact["n_tokens"] / exact["n_docs"]
    )

    # DuckDB parity for the exact scalars (same whitespace token rule)
    import duckdb

    con = duckdb.connect()
    nd, nt, nc = con.execute(
        "SELECT count(*),"
        " sum(len(regexp_split_to_array(trim(text), '\\s+')))"
        "  FILTER (WHERE trim(text) <> ''),"
        " sum(length(text)) "
        f"FROM read_parquet('{SRC}')"
    ).fetchone()
    assert got["n_docs"] == nd
    assert got["n_tokens"] == (nt or 0)
    assert got["n_chars"] == nc


def test_profile_merge_equals_whole_and_persists(spark, tmp_path_factory):
    docs = spark.read.parquet(SRC).select("doc_id", "text")
    whole = _est(P.corpus_profile(docs))
    parts = [
        P.corpus_profile(docs.filter(F.pmod("doc_id", F.lit(3)) == i))
        for i in range(3)
    ]
    store = str(tmp_path_factory.mktemp("profiles") / "p.parquet")
    parts[0].unionByName(parts[1]).unionByName(parts[2]).write.parquet(store)
    merged = _est(P.merge_profiles(spark.read.parquet(store)))
    # the summed scalars agree EXACTLY; the sketch estimates agree to
    # sketch precision only — DataSketches drops the HIP estimator on
    # union (composite estimator thereafter), so the merged estimate
    # is NOT bit-identical to the whole-corpus sketch's
    for k in ("n_docs", "n_null_text", "n_empty_text", "n_tokens",
              "n_chars", "max_chars", "tokens_per_doc"):
        assert merged[k] == whole[k], k
    for k in ("distinct_texts", "distinct_tokens"):
        assert merged[k] == pytest.approx(whole[k], rel=0.03), k
    assert merged["exact_dup_rate"] == pytest.approx(
        whole["exact_dup_rate"], abs=0.03
    )


def test_profile_by_group_and_rollup(spark):
    docs = spark.read.parquet(SRC).select(
        "doc_id", "text", "source",
        F.pmod("doc_id", F.lit(2)).alias("batch"),
    )
    fine = P.corpus_profile(docs, by=["source", "batch"])
    rolled = P.merge_profiles(fine, by="source")
    direct = P.corpus_profile(docs, by="source")
    got = {
        r["source"]: r
        for r in P.profile_estimates(rolled).collect()
    }
    want = {
        r["source"]: r
        for r in P.profile_estimates(direct).collect()
    }
    assert set(got) == set(want)
    for s in want:
        assert got[s].asDict() == want[s].asDict(), s
    # group keys survive on the estimates view
    assert "source" in P.profile_estimates(direct).columns


def test_profile_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "hello world")],
        "doc_id long, text string",
    )
    got = _est(P.corpus_profile(docs))
    assert got["n_docs"] == 4
    assert got["n_null_text"] == 1
    assert got["n_empty_text"] == 1
    assert got["n_tokens"] == 4
    assert got["distinct_tokens"] == 2
    # 3 non-null texts, 2 distinct ("hello world" x2 and "")
    assert got["distinct_texts"] == 2
    assert got["exact_dup_rate"] == pytest.approx(1 / 3, rel=1e-9)


def test_profile_guards(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="lg_k"):
        P.corpus_profile(docs, lg_k=2)
    mixed = P.corpus_profile(docs, lg_k=11).unionByName(
        P.corpus_profile(docs, lg_k=12)
    )
    # the module's OWN ValueError must fire at call time (the lg_k
    # uniformity pre-check), not Spark's opaque lgConfigK require()
    # from inside hll_union_agg
    with pytest.raises(ValueError, match="mixed hll_lg_k"):
        P.merge_profiles(mixed)


def test_profile_token_sketch_aggregates_map_side(spark):
    """The token explode must partial-aggregate in its own stage:
    the plan shows the HLL partial BELOW the exchange — token rows
    never cross the shuffle."""
    docs = spark.read.parquet(SRC).select("doc_id", "text")
    prof = P.corpus_profile(docs)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    import re

    first_agg = plan.find("hll_sketch_agg")
    assert first_agg != -1
    # a partial-mode aggregate of the token sketch appears in the plan
    assert re.search(r"partial_hll_sketch_agg", plan), plan[:2000]


@pytest.mark.slow
def test_cli_profile_batch_and_incremental_stream(
    spark, tmp_path_factory, capsys
):
    """--profile: batch mode persists one mergeable profile row and
    reports estimates; stream mode keeps a per-batch store that only
    ever profiles NEW batches (old partials untouched on disk) and
    reports the merged numbers."""
    import glob
    import json as _json
    import os
    import time

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("profile_cli")
    docs = spark.read.parquet(SRC).select("doc_id", "text").orderBy(
        "doc_id"
    ).limit(80)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    # batch mode
    src = str(base / "docs")
    docs.write.parquet(src)
    out1 = str(base / "out1")
    rep = run(src, out1, "--no-pii", "--quality", "0", "--lang", "",
              "--profile")
    assert rep["profile"]["n_docs"] == rep["n_after_filters"]
    assert rep["profile"]["distinct_texts"] > 0
    assert spark.read.parquet(f"{out1}/profile").count() == 1

    # stream mode, incremental store
    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode(
        "append"
    ).parquet(arrivals)
    sout, idx = str(base / "sout"), str(base / "idx")
    srep = run(arrivals, sout, "--ingest-stream", "--index-out", idx,
               "--no-pii", "--quality", "0", "--lang", "", "--profile")
    assert srep["profile"]["n_docs"] == srep["n_corpus"]
    store = f"{sout}/profile"
    assert sorted(glob.glob(f"{store}/batch=*")) == [f"{store}/batch=0"]
    b0_state = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{store}/batch=0/*.parquet")
    }

    time.sleep(1.1)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(arrivals)
    srep2 = run(arrivals, sout, "--ingest-stream", "--index-out", idx,
                "--no-pii", "--quality", "0", "--lang", "", "--profile")
    assert srep2["n_batches"] == 2
    assert srep2["profile"]["n_docs"] == srep2["n_corpus"] == 80
    assert sorted(os.path.basename(p) for p in glob.glob(
        f"{store}/batch=*")) == ["batch=0", "batch=1"]
    # batch 0's partial was NOT rewritten: incremental means the old
    # batch is neither rescanned nor re-profiled
    b0_after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{store}/batch=0/*.parquet")
    }
    assert b0_after == b0_state
    # merged store numbers equal a direct whole-corpus profile's sums
    from solana_snapshot_etl_tools_spark.operators import profile as PR

    whole = PR.profile_estimates(
        PR.corpus_profile(
            spark.read.parquet(f"{sout}/corpus").select("doc_id", "text")
        )
    ).collect()[0]
    assert srep2["profile"]["n_tokens"] == whole["n_tokens"]
    assert srep2["profile"]["n_chars"] == whole["n_chars"]

    # plant a FOREIGN batch partial (a store inherited from another
    # corpus lineage): the coverage guard must exclude it from the
    # merge and surface it — the numbers stay those of the real corpus
    import shutil

    shutil.copytree(f"{store}/batch=0", f"{store}/batch=9")
    srep3 = run(arrivals, sout, "--ingest-stream", "--index-out", idx,
                "--no-pii", "--quality", "0", "--lang", "", "--profile")
    assert srep3["profile_store_stale_batches"] == [9]
    assert srep3["profile"]["n_docs"] == srep2["profile"]["n_docs"]
    assert srep3["profile"]["n_tokens"] == whole["n_tokens"]


def test_compact_profile_store_identical_estimates(
    spark, tmp_path_factory
):
    """Compaction rewrites the per-batch store to ~one file per batch
    directory with IDENTICAL merged estimates (same rows, fewer
    files), preserves the batch= layout the incremental profiler and
    dynamic-overwrite appends key on, and the store still accepts a
    post-compaction incremental append."""
    import glob
    import os

    from solana_snapshot_etl_tools_spark.operators import profile as PR

    base = tmp_path_factory.mktemp("pcompact")
    docs = spark.read.parquet(SRC).select("doc_id", "text").limit(60)
    store = str(base / "profile")
    # 3 batches of a per-(batch, group) store (the --profile-by
    # shape: several profile rows per batch), each batch's partial
    # task-parallel-written as multiple files per batch directory
    for b in range(3):
        part = PR.corpus_profile(
            docs.filter(f"doc_id % 3 = {b}")
            .withColumn("batch", F.lit(b))
            .withColumn("grp", F.col("doc_id") % 4),
            by=["batch", "grp"],
        )
        (
            part.repartition(4)
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(store)
        )
    spark.catalog.refreshByPath(store)
    before = PR.profile_estimates(
        PR.merge_profiles(spark.read.parquet(store))
    ).collect()[0].asDict()
    n_files_before = sum(
        1 for _r, _d, fs in os.walk(store)
        for f in fs if f.endswith(".parquet")
    )
    stats = PR.compact_profile_store(spark, store)
    assert stats["profile_rows"] == 12  # 3 batches x 4 groups
    assert stats["profile_files_before"] == n_files_before
    assert stats["profile_files_after"] < n_files_before
    assert stats["profile_files_after"] == 3  # one per batch dir
    assert sorted(
        os.path.basename(p) for p in glob.glob(f"{store}/batch=*")
    ) == ["batch=0", "batch=1", "batch=2"]
    after = PR.profile_estimates(
        PR.merge_profiles(spark.read.parquet(store))
    ).collect()[0].asDict()
    assert after == before
    # the compacted store still accepts the loop's append style
    nxt = PR.corpus_profile(
        docs.limit(5)
        .withColumn("batch", F.lit(3))
        .withColumn("grp", F.col("doc_id") % 4),
        by=["batch", "grp"],
    )
    (
        nxt.repartition("batch")
        .write.partitionBy("batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(store)
    )
    spark.catalog.refreshByPath(store)
    merged = PR.merge_profiles(spark.read.parquet(store)).collect()[0]
    assert merged["n_docs"] == before["n_docs"] + 5
    # a non-batch (batch-mode overwrite) store is refused loudly
    import pytest

    flat = str(base / "flat")
    PR.corpus_profile(docs).write.parquet(flat)
    with pytest.raises(ValueError, match="per-batch"):
        PR.compact_profile_store(spark, flat)


def test_stale_profile_batches_guard(spark):
    """The coverage guard lists store batches absent from the corpus
    (the rows a blind merge would overcount with) and refuses stores
    that carry no batch column at all."""
    import pytest

    from solana_snapshot_etl_tools_spark.operators import profile as PR

    docs = spark.read.parquet(SRC).select("doc_id", "text").limit(30)
    store = PR.corpus_profile(
        docs.withColumn("batch", F.col("doc_id") % 3), by="batch"
    )
    corpus = docs.withColumn("batch", F.col("doc_id") % 2)  # {0,1} only
    assert PR.stale_profile_batches(store, corpus) == [2]
    assert PR.stale_profile_batches(
        store, docs.withColumn("batch", F.col("doc_id") % 3)
    ) == []
    with pytest.raises(ValueError, match="batch"):
        PR.stale_profile_batches(store.drop("batch"), corpus)


def test_profile_overlap_between_sources(spark):
    """Sketch-only overlap estimation: planted shared texts between
    two sources are recovered within the stacked sketch error; a
    disjoint pair reads as overlap below its noise floor; a
    self-identical pair reads jaccard ~ 1."""
    n_shared, n_a, n_b = 400, 600, 300
    rows = (
        [(i, "A", f"shared text number {i}") for i in range(n_shared)]
        + [(10_000 + i, "A", f"a-only text {i}") for i in range(n_a)]
        + [(20_000 + i, "B", f"shared text number {i}") for i in range(n_shared)]
        + [(30_000 + i, "B", f"b-only text {i}") for i in range(n_b)]
        + [(40_000 + i, "C", f"c-only text {i}") for i in range(500)]
        + [(50_000 + i, "D", f"a-only text {i}") for i in range(n_a)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    prof = P.corpus_profile(docs, by="source")
    ov = {
        (r.a, r.b): r for r in P.profile_overlap(prof).collect()
    }
    ab = ov[("A", "B")]
    assert abs(ab.overlap_est - n_shared) <= ab.noise_floor + 0.05 * n_shared
    assert ab.jaccard_est == pytest.approx(
        n_shared / (n_shared + n_a + n_b), abs=0.08
    )
    # disjoint: A vs C
    ac = ov[("A", "C")]
    assert abs(ac.overlap_est) <= ac.noise_floor
    assert ac.jaccard_est <= 0.05
    # D duplicates A's a-only half exactly
    ad = ov[("A", "D")]
    assert ad.jaccard_est == pytest.approx(
        n_a / (n_shared + n_a), abs=0.08
    )
    # all 6 unordered pairs of 4 sources
    assert len(ov) == 6


def test_frequent_tokens_exact_and_complete(spark):
    """Heavy hitters: every token at/above support is present with
    its EXACT count (the KPS candidate pass cannot lose one), false
    positives are pruned, and DuckDB agrees on the counts."""
    rows = (
        [(i, "common word filler alpha") for i in range(60)]
        + [(100 + i, "rare beta gamma") for i in range(5)]
        + [(200 + i, f"unique{i} token{i}") for i in range(40)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    total = 60 * 4 + 5 * 3 + 40 * 2
    got = {
        r.token: (r.n_occurrences, r.share)
        for r in P.frequent_tokens(docs, support=0.05).collect()
    }
    for tok in ("common", "word", "filler", "alpha"):
        assert got[tok] == (60, pytest.approx(60 / total))
    assert "rare" not in got          # 5/335 < 0.05
    assert not any(t.startswith("unique") for t in got)

    import duckdb

    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "docs.parquet")
    docs.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    want = con.execute(
        "SELECT tok, count(*) FROM ("
        " SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok"
        f" FROM read_parquet('{p}/*.parquet')) WHERE tok <> ''"
        " GROUP BY tok HAVING count(*) >= 0.05 * (SELECT"
        f"  sum(len(regexp_split_to_array(lower(text), '\\s+')))"
        f"  FROM read_parquet('{p}/*.parquet'))"
        " ORDER BY 2 DESC, 1"
    ).fetchall()
    assert {t: n for t, n in want} == {
        t: n for t, (n, _) in got.items()
    }

    with pytest.raises(ValueError, match="support"):
        P.frequent_tokens(docs, support=0.0)
    with pytest.raises(ValueError, match="candidate"):
        P.frequent_tokens(docs, support=1e-6)
    # [1e-5, 1e-4) used to slip past the guard and crash inside
    # Spark's freqItems require(support >= 1e-4) — now OUR error fires
    with pytest.raises(ValueError, match="1e-4"):
        P.frequent_tokens(docs, support=5e-5)
    # empty corpus: empty frame, stable schema
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = P.frequent_tokens(empty, support=0.5)
    assert out.count() == 0
    assert out.columns == ["token", "n_occurrences", "share"]


def test_cli_profile_by_source(spark, tmp_path_factory, capsys):
    """--profile-by source: per-source rows in the store (re-keyed
    from the input parquet since the pipeline drops 'source'), the
    global merge in the report; batch-only."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("profile_by")
    rows = [
        (i, "web" if i % 3 else "wiki",
         f"document number {i} with several plain words")
        for i in range(60)
    ]
    src = str(base / "docs")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(src)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    out = str(base / "out")
    rep = run(src, out, "--no-pii", "--quality", "0", "--lang", "",
              "--profile", "--profile-by", "source")
    assert rep["profile_groups"] == 2
    assert rep["profile"]["n_docs"] == rep["n_after_filters"] == 60
    stored = spark.read.parquet(f"{out}/profile")
    by = {r.source: r.n_docs for r in stored.collect()}
    assert by == {"web": 40, "wiki": 20}
    # the persisted rows roll up to the reported global numbers
    merged = P.profile_estimates(P.merge_profiles(stored)).collect()[0]
    assert merged.n_tokens == rep["profile"]["n_tokens"]

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # unknown column
        corpus_cli.main([src, str(base / "o2"), "--no-pii", "--quality",
                         "0", "--lang", "", "--profile",
                         "--profile-by", "nope"])
    with _pytest.raises(SystemExit):  # --profile-by without --profile
        corpus_cli.main([src, str(base / "o3"), "--profile-by", "source"])
    import os

    arrivals = str(base / "arrivals")
    os.makedirs(arrivals)
    with _pytest.raises(SystemExit):  # stream mode rejects it
        corpus_cli.main([arrivals, str(base / "o4"), "--ingest-stream",
                         "--index-out", str(base / "idx"), "--profile",
                         "--profile-by", "source"])


def test_mergeable_length_quantiles(spark):
    """len_p50/p90/p99 from the mergeable log-histogram land within
    the documented ±5% of the exact percentiles (plus one bucket of
    discretization) — and merging per-batch partials gives EXACTLY
    the same histogram as profiling the whole corpus."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    est = P.profile_estimates(P.corpus_profile(docs)).collect()[0]
    exact = docs.select(
        F.expr("percentile(length(text), array(0.5, 0.9, 0.99))").alias("p")
    ).collect()[0].p
    for got, want in zip((est.len_p50, est.len_p90, est.len_p99), exact):
        assert abs(got - want) / want < 0.12, (got, want)
    # partials merge to the identical histogram
    parts = P.corpus_profile(
        docs.withColumn("b", F.col("doc_id") % 3), by="b"
    )
    merged = P.merge_profiles(parts)
    whole_hist = P.corpus_profile(docs).collect()[0].len_hist
    merged_hist = merged.collect()[0].len_hist
    assert dict(merged_hist) == dict(whole_hist)
    mest = P.profile_estimates(merged).collect()[0]
    assert (mest.len_p50, mest.len_p90, mest.len_p99) == (
        est.len_p50, est.len_p90, est.len_p99
    )


def test_profile_store_without_len_hist_still_merges(spark):
    """Partials recorded before the histogram existed (older stores)
    must keep merging; quantile columns simply do not appear."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = P.corpus_profile(docs).drop("len_hist")
    est = P.profile_estimates(P.merge_profiles(old)).collect()[0]
    assert est.n_docs == docs.count()
    assert "len_p50" not in est.asDict()


def test_length_quantiles_empty_and_null_text(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, ""), (4, "abcdefghij"), (5, None)],
        "doc_id long, text string",
    )
    est = P.profile_estimates(P.corpus_profile(df)).collect()[0]
    # 3 of 4 non-null texts are empty: the median IS the empty bucket
    assert est.len_p50 == 0.0
    assert est.len_p99 > 0
    all_null = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    est2 = P.profile_estimates(P.corpus_profile(all_null)).collect()[0]
    assert est2.len_p50 is None
