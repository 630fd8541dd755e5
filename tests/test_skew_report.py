"""key_skew_report / partition_histogram diagnostics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import skew as S


@pytest.fixture(scope="module")
def skewed(spark):
    # 10_000 rows for key "hot", 10 each for 50 cold keys.
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(500).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionAll(cold).cache()


def test_heavy_hitter_ranked_first_with_exact_counts(spark, skewed):
    rep = S.key_skew_report(skewed, "k", top=5, target_partitions=8).collect()
    assert rep[0]["k"] == "hot"
    assert rep[0]["key_count"] == 10_000
    assert rep[0]["share"] == pytest.approx(10_000 / 10_500)
    # 10_000 / (10_500 / 8 partitions) ≈ 7.62 average-partitions of work.
    assert rep[0]["skew_ratio"] == pytest.approx(10_000 / (10_500 / 8))
    assert rep[0]["suggested_salt"] == math.ceil(10_000 / (10_500 / 8))
    # Cold keys are benign: salt suggestion stays at 1.
    assert all(r["suggested_salt"] == 1 for r in rep[1:])
    assert len(rep) == 5


def test_suggested_salt_flattens_the_key(spark, skewed):
    rep = S.key_skew_report(skewed, "k", top=1, target_partitions=8).collect()[0]
    small = spark.createDataFrame([("hot", 1), ("cold0", 2)], "k string, tag int")
    joined = S.salted_join(skewed, small, "k", salt=rep["suggested_salt"])
    plain = skewed.join(small, "k")
    assert joined.count() == plain.count()


def test_sampled_estimate_tracks_exact(spark, skewed):
    rep = S.key_skew_report(
        skewed, "k", top=1, target_partitions=8, sample_fraction=0.2, seed=3
    ).collect()[0]
    assert rep["k"] == "hot"
    # Rescaled count within 20% of truth for a 20% sample of 10k rows.
    assert abs(rep["key_count"] - 10_000) / 10_000 < 0.2
    # share/skew_ratio are ratios within the sample — scale-free.
    assert rep["share"] == pytest.approx(10_000 / 10_500, rel=0.1)


def test_multi_key_and_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("c", 3)], "k string, g int"
    )
    rep = S.key_skew_report(df, ["k", "g"], top=3, target_partitions=4).collect()
    assert (rep[0]["k"], rep[0]["g"], rep[0]["key_count"]) == ("a", 1, 2)
    # Equal-count tail is ordered by key, not hash luck.
    assert [(r["k"], r["g"]) for r in rep[1:]] == [("b", 2), ("c", 3)]


def test_validation(spark, skewed):
    with pytest.raises(ValueError, match="not in"):
        S.key_skew_report(skewed, "nope")
    with pytest.raises(ValueError, match="sample_fraction"):
        S.key_skew_report(skewed, "k", sample_fraction=0.0)


def test_partition_histogram_counts_sum_to_total(spark, skewed):
    hist = S.partition_histogram(skewed.repartition(4)).collect()
    assert sum(r["n_rows"] for r in hist) == 10_500
    assert len(hist) <= 4
    # Round-robin repartition is balanced; no partition holds >40%.
    assert max(r["n_rows"] for r in hist) < 0.4 * 10_500


def test_cli_skew_report_stage(spark, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("corpus_skew"))
    assert corpus_cli.main([
        "/root/testdata/sf0.001/documents.parquet", out,
        "--no-pii", "--skew-report", "lang",
        "--records-per-shard", "100",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rep = json.loads(lines[-1])
    assert rep["skew_key"] == ["lang"]
    assert rep["skew"], "skew rows missing"
    # rows are [lang, count, share, skew_ratio, suggested_salt],
    # ordered by count desc; counts cover the whole final corpus
    # (lang has few distinct values, all inside top-20).
    counts = [r[1] for r in rep["skew"]]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == rep["n_after_filters"]
    assert all(r[4] >= 1 for r in rep["skew"])
    assert sum(r[2] for r in rep["skew"]) == pytest.approx(1.0, abs=1e-4)


def test_cli_skew_report_typo_is_loud(spark, tmp_path_factory, capsys):
    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("corpus_skew_bad"))
    with pytest.raises(ValueError, match="neither"):
        corpus_cli.main([
            "/root/testdata/sf0.001/documents.parquet", out,
            "--no-pii", "--skew-report", "lagn",
        ])


def test_cli_persists_report_json(spark, tmp_path_factory, capsys):
    import json

    from solana_snapshot_etl_tools_spark import corpus_cli

    out = str(tmp_path_factory.mktemp("corpus_rep"))
    assert corpus_cli.main([
        "/root/testdata/sf0.001/documents.parquet", out, "--no-pii",
    ]) == 0
    printed = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    with open(f"{out}/report.json") as f:
        persisted = json.load(f)
    assert persisted == printed
