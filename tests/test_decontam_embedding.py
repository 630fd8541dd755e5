"""Embedding-space decontamination (operators/decontam.py): the exact
broadcast scan vs the LSH-bucketed scale path — planted near-matches,
threshold semantics, tiebreaks, guards, and real-embedding self-hits."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import decontam as DC

DIMS = 16
SF_DIR = "/root/testdata/sf0.001"


def _planted(spark, seed=7, n_clean=40, n_bench=6):
    """Corpus = noisy copies of some bench vectors (contaminated) +
    random vectors far from every bench item (clean). 16-dim random
    unit vectors have pairwise |cos| ~ 0.25 with overwhelming
    probability, so threshold 0.9 separates perfectly."""
    rng = np.random.default_rng(seed)

    def unit(v):
        return (v / np.linalg.norm(v)).tolist()

    bench = [(100 + j, unit(rng.normal(size=DIMS))) for j in range(n_bench)]
    corpus, dirty = [], {}
    for i, (bid, bv) in enumerate(bench[: n_bench // 2 * 2]):
        noisy = unit(np.array(bv) + rng.normal(scale=0.02, size=DIMS))
        corpus.append((i, noisy))
        dirty[i] = bid
    base = len(corpus)
    for i in range(n_clean):
        corpus.append((base + i, unit(rng.normal(size=DIMS))))
    c = spark.createDataFrame(corpus, "doc_id long, embedding array<double>")
    b = spark.createDataFrame(bench, "bench_id long, embedding array<double>")
    return c, b, dirty


def test_broadcast_exact_finds_planted(spark):
    c, b, dirty = _planted(spark)
    got = {
        r.doc_id: (r.bench_id, r.cosine)
        for r in DC.decontaminate_embedding(
            c, b, threshold=0.9, dims=DIMS, method="broadcast"
        ).collect()
    }
    assert set(got) == set(dirty)
    for doc, bid in dirty.items():
        assert got[doc][0] == bid
        assert got[doc][1] > 0.99  # tiny noise, near-unit cosine


def test_lsh_matches_broadcast_on_separated_data(spark):
    c, b, dirty = _planted(spark)
    exact = {
        r.doc_id: r.bench_id
        for r in DC.decontaminate_embedding(
            c, b, threshold=0.9, dims=DIMS, method="broadcast"
        ).collect()
    }
    lsh = {
        r.doc_id: r.bench_id
        for r in DC.decontaminate_embedding(
            c, b, threshold=0.9, dims=DIMS, method="lsh",
            n_tables=16, n_planes=8,
        ).collect()
    }
    # near-identical vectors collide in at least one of 16 tables with
    # overwhelming probability — full recall on this data, and no
    # false positives because the exact cosine gate runs on candidates
    assert lsh == exact == dirty


def test_threshold_and_best_match_semantics(spark):
    # one doc equally close to two bench items: min-id tiebreak; one
    # doc at cosine just UNDER threshold: excluded
    e0 = [1.0] + [0.0] * (DIMS - 1)
    e1 = [0.0, 1.0] + [0.0] * (DIMS - 2)
    mid = (np.array(e0) + np.array(e1)) / np.linalg.norm(
        np.array(e0) + np.array(e1)
    )
    c = spark.createDataFrame(
        [(1, e0), (2, mid.tolist())],
        "doc_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(201, e0), (200, e0)],  # duplicate bench item, distinct ids
        "bench_id long, embedding array<double>",
    )
    for method in ("broadcast", "lsh"):
        rows = {
            r.doc_id: r
            for r in DC.decontaminate_embedding(
                c, b, threshold=0.9, dims=DIMS, method=method
            ).collect()
        }
        assert set(rows) == {1}, method  # mid is at cos ~0.707 < 0.9
        assert rows[1].bench_id == 200, method  # exact tie -> min id
        assert rows[1].cosine == pytest.approx(1.0)


def test_guards(spark):
    c = spark.createDataFrame(
        [(1, [1.0] * DIMS)], "doc_id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(2, [1.0] * DIMS)], "bench_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="threshold"):
        DC.decontaminate_embedding(c, b, threshold=0.0, dims=DIMS)
    with pytest.raises(ValueError, match="method"):
        DC.decontaminate_embedding(c, b, threshold=0.9, dims=DIMS, method="x")
    bad = spark.createDataFrame(
        [(3, [1.0] * (DIMS - 1))], "doc_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="!= dims"):
        DC.decontaminate_embedding(
            bad, b, threshold=0.9, dims=DIMS, method="broadcast"
        ).collect()
    # empty bench set: nothing is contaminated, both paths
    empty = spark.createDataFrame([], "bench_id long, embedding array<double>")
    for method in ("broadcast", "lsh"):
        assert (
            DC.decontaminate_embedding(
                c, empty, threshold=0.9, dims=DIMS, method=method
            ).count()
            == 0
        )


def test_real_embeddings_self_contamination(spark):
    """Bench = a sample of the corpus itself: every sampled id must be
    flagged against itself at cosine ~1, none of the disjoint rest at
    a tight threshold beyond their true neighbors."""
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )
    dims = len(emb.first().embedding)
    bench = (
        emb.orderBy("doc_id").limit(8)
        .select(F.col("doc_id").alias("bench_id"), "embedding")
    )
    flagged = {
        r.doc_id: r
        for r in DC.decontaminate_embedding(
            emb, bench, threshold=0.999, dims=dims, method="broadcast"
        ).collect()
    }
    bench_ids = {r.bench_id for r in bench.collect()}
    assert bench_ids <= set(flagged)
    for bid in bench_ids:
        assert flagged[bid].bench_id == bid
        assert flagged[bid].cosine == pytest.approx(1.0)


def test_null_embeddings_raise_loudly(spark):
    """Review r8: null/ragged vectors must surface as the guarded
    ValueError, not an object-dtype TypeError that masks the data
    problem."""
    import pyspark.sql.utils  # noqa: F401

    c = spark.createDataFrame(
        [(1, [1.0] * DIMS), (2, None)],
        "doc_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(9, [1.0] * DIMS)], "bench_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL corpus embedding"):
        DC.decontaminate_embedding(
            c, b, threshold=0.9, dims=DIMS, method="broadcast"
        ).collect()
    nb = spark.createDataFrame(
        [(9, None)], "bench_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL bench embedding"):
        DC.decontaminate_embedding(
            c.limit(1), nb, threshold=0.9, dims=DIMS, method="broadcast"
        )


# --- the per-benchmark-item audit view ----------------------------------------


def test_contamination_audit_hand_computed(spark):
    """Per-item audit: leaked-gram counts, blast radius, clean rows,
    sub-k items as NULL (unmeasurable is not clean), and hash_key
    equivalence on collision-free data."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta other words here"),
            (3, "totally unrelated training text entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            # grams (k=4): 'alpha beta gamma delta' (in train docs 1+2),
            # 'beta gamma delta epsilon' (doc 1), 'gamma delta epsilon zeta' (doc 1)
            (10, "alpha beta gamma delta epsilon zeta"),
            # two grams (5 tokens, k=4), neither in train
            (11, "pristine eval question nobody saw"),
            # too short for k=4
            (12, "tiny item"),
        ],
        "bench_id long, text string",
    )
    for hk in (False, True):
        got = {
            r.bench_id: r
            for r in DC.contamination_audit(
                train, bench, k=4, hash_key=hk
            ).collect()
        }
        a = got[10]
        assert (a.n_grams, a.n_leaked_grams, a.n_train_docs_hit) == (3, 3, 2)
        assert a.leak_ratio == pytest.approx(1.0)
        assert a.clean is False
        b = got[11]
        assert (b.n_grams, b.n_leaked_grams, b.n_train_docs_hit) == (2, 0, 0)
        assert b.clean is True
        c = got[12]
        assert c.n_grams is None and c.clean is None
        assert c.leak_ratio is None


def test_contamination_audit_duckdb_parity(spark, tmp_path_factory):
    """Exact differential vs a DuckDB SQL spelling of the audit over
    real corpus text (train = documents, bench = planted slices)."""
    import duckdb

    base = tmp_path_factory.mktemp("audit")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).orderBy("doc_id").limit(120)
    # bench: 5 verbatim excerpts (leaked) + 3 fresh items
    import pyspark.sql.functions as SF

    excerpts = docs.limit(5).select(
        (SF.col("doc_id") + 9000).alias("bench_id"),
        SF.array_join(
            SF.slice(SF.split(SF.col("text"), r"\s+"), 3, 20), " "
        ).alias("text"),
    )
    fresh = spark.createDataFrame(
        [(9900 + i, f"entirely novel eval question number {i} "
                    "with words the corpus never strings together "
                    f"in this order variant{i}") for i in range(3)],
        "bench_id long, text string",
    )
    bench = excerpts.unionByName(fresh)
    tp, bp = str(base / "train.parquet"), str(base / "bench.parquet")
    docs.coalesce(1).write.parquet(tp)
    bench.coalesce(1).write.parquet(bp)

    got = {
        r.bench_id: (r.n_grams, r.n_leaked_grams, r.n_train_docs_hit)
        for r in DC.contamination_audit(docs, bench, k=8).collect()
    }

    con = duckdb.connect()
    k = 8
    grams_sql = """
        SELECT id, gram FROM (
          SELECT id,
                 list_aggregate(toks[i : i + {km1}], 'string_agg', ' ')
                 AS gram
          FROM (
            SELECT id, toks,
                   unnest(generate_series(1, len(toks) - {km1})) AS i
            FROM (
              SELECT {id} AS id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM read_parquet('{path}/*.parquet')
              WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                    >= {k}
            )
          )
        ) GROUP BY 1, 2
    """
    con.execute(
        "CREATE TABLE tg AS "
        + grams_sql.format(id="doc_id", path=tp, k=k, km1=k - 1)
    )
    con.execute(
        "CREATE TABLE bg AS "
        + grams_sql.format(id="bench_id", path=bp, k=k, km1=k - 1)
    )
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(
            """
            SELECT b.id,
                   count(DISTINCT b.gram),
                   count(DISTINCT t.gram),
                   count(DISTINCT t.id)
            FROM bg b LEFT JOIN tg t USING (gram)
            GROUP BY 1
            """
        ).fetchall()
    }
    for bid, (ng, nl, nd) in want.items():
        assert got[bid] == (ng, nl, nd), (bid, got[bid], (ng, nl, nd))
    # the excerpts leaked, the fresh items are clean
    assert all(got[9900 + i][1] == 0 for i in range(3))
    assert all(got[b][1] > 0 for b in got if b < 9900)


def test_embedding_contamination_audit(spark):
    """Per-bench-item exact nearest-neighbor audit: max cosine vs a
    numpy reference, hit counts at the threshold, min-id ties, the
    sub-threshold margin reported, and empty-corpus NULLs."""
    c, b, dirty = _planted(spark)
    # add two bench items FAR from every corpus vector: clean rows
    # whose sub-threshold margin the audit must still report
    rng = np.random.default_rng(123)
    extra = spark.createDataFrame(
        [
            (900 + j, (lambda v: (v / np.linalg.norm(v)).tolist())(
                rng.normal(size=DIMS)))
            for j in range(2)
        ],
        "bench_id long, embedding array<double>",
    )
    b = b.unionByName(extra)
    got = {
        r.bench_id: r
        for r in DC.embedding_contamination_audit(
            c, b, threshold=0.9, dims=DIMS
        ).collect()
    }
    # numpy reference
    C = {r.doc_id: np.array(r.embedding) for r in c.collect()}
    B = {r.bench_id: np.array(r.embedding) for r in b.collect()}

    def cos(u, v):
        nu, nv = np.linalg.norm(u), np.linalg.norm(v)
        return float(u @ v / ((nu or 1.0) * (nv or 1.0)))

    for bid, bv in B.items():
        sims = {did: cos(dv, bv) for did, dv in C.items()}
        best = max(sims.values())
        nearest = min(d for d, s in sims.items() if s == best)
        hits = sum(1 for s in sims.values() if s >= 0.9)
        r = got[bid]
        assert r.max_cosine == pytest.approx(best, rel=1e-12), bid
        assert r.nearest_doc == nearest, bid
        assert r.n_train_docs_hit == hits, bid
        assert r.contaminated is (best >= 0.9), bid
    # the planted-dirty items are exactly the contaminated ones
    assert {b for b in got if got[b].contaminated} == set(dirty.values())
    # clean items still report their (sub-threshold) margin
    clean = [r for r in got.values() if not r.contaminated]
    assert clean and all(r.max_cosine is not None for r in clean)

    # exact-tie min-id: two identical corpus docs at cosine 1
    e0 = [1.0] + [0.0] * (DIMS - 1)
    c2 = spark.createDataFrame(
        [(7, e0), (3, e0)], "doc_id long, embedding array<double>"
    )
    b2 = spark.createDataFrame(
        [(100, e0)], "bench_id long, embedding array<double>"
    )
    r2 = DC.embedding_contamination_audit(
        c2, b2, threshold=0.9, dims=DIMS
    ).collect()[0]
    assert (r2.nearest_doc, r2.n_train_docs_hit) == (3, 2)

    # empty corpus: NULL margins, contaminated NULL (unprobed)
    empty = spark.createDataFrame([], "doc_id long, embedding array<double>")
    r3 = DC.embedding_contamination_audit(
        empty, b2, threshold=0.9, dims=DIMS
    ).collect()[0]
    assert r3.max_cosine is None and r3.contaminated is None

    with pytest.raises(ValueError, match="threshold"):
        DC.embedding_contamination_audit(c2, b2, threshold=0.0, dims=DIMS)


def test_cli_embedding_audit(spark, tmp_path_factory, capsys):
    """--embedding-audit beside --decontam-bench: the per-item table
    lands at OUT_DIR/embedding_audit and the report counts the
    contaminated items; requires the stage."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("emb_audit_cli")
    c, b, dirty = _planted(spark)
    docs = c.select(
        "doc_id",
        F.concat(F.lit("document body for id "), F.col("doc_id"))
        .alias("text"),
    )
    src, embp, benchp = (
        str(base / "docs"), str(base / "emb"), str(base / "bench"),
    )
    docs.write.parquet(src)
    c.select(F.col("doc_id").alias("vec_id"), "embedding").write.parquet(embp)
    b.write.parquet(benchp)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    out = str(base / "out")
    rep = run(src, out, "--no-pii", "--quality", "0", "--lang", "",
              "--embeddings", embp, "--decontam-bench", benchp,
              "--decontam-threshold", "0.9", "--embedding-audit")
    assert rep["n_bench_items_embedding_contaminated"] == len(
        set(dirty.values())
    )
    audit = {
        r.bench_id: r
        for r in spark.read.parquet(f"{out}/embedding_audit").collect()
    }
    assert {b for b, r in audit.items() if r.contaminated} == set(
        dirty.values()
    )
    assert all(r.max_cosine is not None for r in audit.values())

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # audit without the stage
        corpus_cli.main([src, out, "--embedding-audit"])
