"""Corpus data card: exact stats on a planted corpus, consistency on
the real one, cost shape (two jobs, no row collect)."""

from __future__ import annotations

from solana_snapshot_etl_tools_spark.operators.report import corpus_report


def test_planted_corpus_exact(spark):
    rows = [
        (1, "hello world"),          # 2 tokens, 11 chars
        (2, "hello world"),          # exact dup of 1
        (3, "a b c"),                # 3 tokens
        (4, ""),                     # empty
        (5, None),                   # null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = corpus_report(df)
    assert rep["n_docs"] == 5
    assert rep["n_null_text"] == 1
    assert rep["n_empty_text"] == 1
    assert rep["n_chars"] == 11 + 11 + 5
    # token_count counts the empty string as one token (the declared
    # text_metrics semantics, pinned by its driver oracle)
    assert rep["n_tokens"] == 2 + 2 + 3 + 1
    # 4 non-null texts, 3 distinct -> dup rate exactly 1/4
    assert abs(rep["exact_dup_rate"] - 0.25) < 1e-6
    assert sum(rep["languages"].values()) == 4


def test_real_corpus_consistency(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    rep = corpus_report(docs)
    assert rep["n_docs"] == docs.count()
    assert rep["n_tokens"] > 0 and rep["n_chars"] > rep["n_tokens"]
    pcts = rep["chars_per_doc_percentiles"]
    vals = [pcts[k] for k in ("0.1", "0.5", "0.9")]
    assert vals[0] <= vals[1] <= vals[2]
    assert 0.0 <= rep["exact_dup_rate"] < 1.0
    assert rep["mean_quality"] is not None
    # the documents fixture is english-dominated
    assert max(rep["languages"], key=rep["languages"].get) == "en"


def test_empty_and_all_null(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    rep = corpus_report(df)
    assert rep["n_docs"] == 0 and rep["exact_dup_rate"] == 0.0
    df2 = spark.createDataFrame([(1, None)], "doc_id long, text string")
    rep2 = corpus_report(df2)
    assert rep2["n_null_text"] == 1 and rep2["languages"] == {}


def test_cli_data_card(spark, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("card"))
    assert corpus_cli.main(
        ["/root/testdata/sf0.001/documents.parquet", out, "--no-pii",
         "--data-card", "--records-per-shard", "200"]
    ) == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    card = rep["data_card"]
    assert card["n_docs"] == rep["n_after_filters"]
    assert card["n_null_text"] == 0 and card["n_tokens"] > 0
    assert card["exact_dup_rate"] == 0.0  # post-dedup corpus


def test_dedup_cleaned_zeroes_redaction_residue(spark, tmp_path_factory, capsys):
    """Two docs differing only in PII collide after redaction; the
    --dedup-cleaned pass removes the residue and the data card reads
    exactly zero."""
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("residue")
    body = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, body + "contact alice@example.com for details"),
        (2, body + "contact bob@example.net for details"),
        (3, body + "a genuinely different closing sentence here"),
    ]
    src = str(base / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    def run(*extra):
        out = str(base / ("out" + str(len(extra))))
        assert corpus_cli.main(
            [src, out, "--quality", "0", "--lang", "", "--data-card", *extra]
        ) == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        )

    plain = run()
    assert plain["n_after_filters"] == 3  # raw-distinct docs all survive
    assert plain["data_card"]["exact_dup_rate"] > 0  # ...but 1 and 2 collided
    fixed = run("--dedup-cleaned")
    assert fixed["n_after_filters"] == 2  # min-id copy of the collision kept
    assert fixed["data_card"]["exact_dup_rate"] == 0.0


def test_scripts_mix(spark):
    """The data card's writing-system table: counts per dominant
    script, null text excluded, sums to the non-null doc count."""
    from solana_snapshot_etl_tools_spark.operators.report import (
        corpus_report,
    )

    rows = [
        (1, "plain english text here"),
        (2, "Привет мир, это русский текст"),
        (3, "你好世界 これはテスト"),
        (4, "1234 !!!"),   # scriptless -> unknown
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    card = corpus_report(df)
    assert card["scripts"] == {
        "latin": 1, "cyrillic": 1, "cjk": 1, "unknown": 1
    }
    assert sum(card["scripts"].values()) == card["n_docs"] - card["n_null_text"]
