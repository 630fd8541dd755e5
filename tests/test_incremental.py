"""Incremental shard dedup (operators/incremental.py): planted-corpus
flag semantics, equivalence with one-shot exact dedup, band-collision
parity with the LSH candidate generator, and index loop closure."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import dedup as D
from solana_snapshot_etl_tools_spark.operators import incremental as I

SF_DIR = "/root/testdata/sf0.001"

BOILER = (
    "this license text is repeated verbatim across many documents in the "
    "corpus and is long enough to dominate every minhash band of any "
    "document that embeds it without much unique content of its own "
) * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flag_semantics_on_planted_shard(spark):
    corpus = _docs(
        spark,
        [
            (1, "completely original first document about astronomy"),
            (2, BOILER + "tail one"),
            (3, "another unique piece on woodworking techniques"),
        ],
    )
    index = I.build_index(corpus)
    shard = _docs(
        spark,
        [
            (10, "completely original first document about astronomy"),  # exact old
            (11, BOILER + "tail two"),  # near-dup of 2
            (12, "a genuinely fresh document about tidal pools"),
            (13, "a duplicated within-shard sentence to plant"),
            (14, "a duplicated within-shard sentence to plant"),  # exact of 13
        ],
    )
    got = {
        r.doc_id: (r.dup_exact, r.dup_near_candidate)
        for r in I.dedup_against_index(shard, index).collect()
    }
    assert got[10][0] is True
    assert got[11] == (False, True)
    assert got[12] == (False, False)
    assert got[13][0] is False  # first copy in the shard keeps the text
    assert got[14][0] is True
    # columns pass through plus exactly the two flags
    out = I.dedup_against_index(shard, index)
    assert out.columns == ["doc_id", "text", "dup_exact", "dup_near_candidate"]


def test_incremental_exact_matches_one_shot(spark):
    """For exact dedup, index-probing a shard must keep exactly the
    docs that a full-corpus exact dedup of (corpus UNION shard) would
    keep, when shard ids follow corpus ids (ingestion order = id
    order, so 'already-kept copy stays canonical' = min-id)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    old = D.exact_dedup(docs.filter(F.col("doc_id") <= mid), "doc_id", "text")
    new = docs.filter(F.col("doc_id") > mid)
    flagged = I.dedup_against_index(new, I.build_index(old))
    inc_keep = {r.doc_id for r in old.select("doc_id").collect()} | {
        r.doc_id for r in flagged.filter(~F.col("dup_exact")).collect()
    }
    full_keep = {
        r.doc_id
        for r in D.exact_dedup(
            old.unionByName(new), "doc_id", "text"
        ).collect()
    }
    assert inc_keep == full_keep


def test_near_flags_match_lsh_candidate_adjacency(spark):
    """dup_near_candidate must agree with the uncapped LSH candidate
    generator on the union: a new doc is flagged iff it shares a band
    with an old doc or a smaller-id new doc (same sketch constants,
    same band hashing — drift between the two spellings would break
    yesterday's indexes, so this pins them together)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    old = docs.filter(F.col("doc_id") <= mid)
    new = docs.filter(F.col("doc_id") > mid)
    flagged = {
        r.doc_id: r.dup_near_candidate
        for r in I.dedup_against_index(new, I.build_index(old)).collect()
    }
    sig = D.minhash_signatures(docs, "doc_id", "text")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_candidates(sig, max_bucket_size=None).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected_true = {
        x
        for x in flagged
        if any(y <= mid or y < x for y in adj.get(x, ()))
    }
    assert {x for x, v in flagged.items() if v} == expected_true
    assert expected_true, "corpus near-dup families must cross the split"


def test_refined_mode_kills_background_noise_but_keeps_families(spark):
    """With the signature table, near flags require an estimated
    Jaccard, not mere bucket membership: on this high-background-
    similarity corpus raw mode over-flags massively (the motivating
    measurement: 2500/2500 at sf0.1), refined mode keeps only the
    near-dup families — and never invents a flag raw mode lacks."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    old = docs.filter(F.col("doc_id") <= mid)
    new = docs.filter(F.col("doc_id") > mid)
    idx = I.build_index(old)
    raw = {
        r.doc_id
        for r in I.dedup_against_index(new, idx)
        .filter("dup_near_candidate")
        .collect()
    }
    refined = {
        r.doc_id
        for r in I.dedup_against_index(new, idx, old_sigs=I.signature_table(old))
        .filter("dup_near_candidate")
        .collect()
    }
    assert refined <= raw
    # the margin is corpus-dependent (this synthetic set has high
    # background similarity — avg jaccard 0.44 — so many est values
    # clear 0.7 legitimately); at sf0.1 the measured gap was
    # 2500/2500 raw vs families-only refined
    assert len(refined) < 0.8 * len(raw), (len(refined), len(raw))
    # the verified near-dup pairs that cross the split must survive
    # refinement (est >= threshold-0.1 is the recall-preserving filter
    # the full pipeline itself uses before exact verification)
    verified = D.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    must = {
        max(r.doc_a, r.doc_b)
        for r in verified
        if max(r.doc_a, r.doc_b) > mid
    }
    assert must, "corpus families must cross the split"
    assert must <= refined


def test_refined_witness_cap_still_catches_family_members(spark):
    """A boilerplate family larger than witnesses_per_bucket: a new
    member must still be flagged (witnesses are the min-id members of
    its buckets — the family is a clique, so any witness estimates
    high)."""
    fam = [(i, BOILER + f" member {i}") for i in range(30)]
    corpus = _docs(spark, fam + [(100, "one unrelated document about pottery")])
    idx = I.build_index(corpus)
    sigs = I.signature_table(corpus)
    shard = _docs(
        spark,
        [(200, BOILER + " member 200"), (201, "fresh text about glaciers and ice")],
    )
    got = {
        r.doc_id: r.dup_near_candidate
        for r in I.dedup_against_index(
            shard, idx, old_sigs=sigs, witnesses_per_bucket=4
        ).collect()
    }
    assert got == {200: True, 201: False}


def test_index_loop_closure_over_two_shards(spark):
    corpus = _docs(spark, [(1, "seed document with its own content here")])
    index = I.build_index(corpus)
    s1 = _docs(spark, [(10, "shard one adds this brand new survivor text")])
    f1 = I.dedup_against_index(s1, index)
    assert f1.filter("dup_exact or dup_near_candidate").count() == 0
    index2 = index.unionByName(I.kept_index_rows(f1))
    # shard 2 repeats shard 1's survivor: caught only via the extension
    s2 = _docs(spark, [(20, "shard one adds this brand new survivor text")])
    assert I.dedup_against_index(s2, index).filter("dup_exact").count() == 0
    assert I.dedup_against_index(s2, index2).filter("dup_exact").count() == 1


def test_index_is_compact_and_probe_carries_no_text(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = I.build_index(docs)
    assert idx.columns == ["doc", "band", "key"]
    per_doc = idx.groupBy("doc").count().agg(F.max("count")).first()[0]
    assert per_doc <= D.LSH_BANDS + 1
    # the probe plan never shuffles document text
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        I.dedup_against_index(docs.limit(50), idx).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p


def test_compact_index_preserves_contents_and_probes(spark, tmp_path_factory):
    """Compaction after multi-batch appends: identical row multiset,
    fewer files, identical probe flags; a short rewrite must refuse to
    swap."""
    import glob

    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.incremental import (
        build_index,
        compact_index,
        dedup_against_index,
        signature_table,
    )

    base = tmp_path_factory.mktemp("compact")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in (0, 1)]
    for h in halves:  # two appends => many small files
        build_index(h).write.mode("append").partitionBy("band").parquet(
            f"{base}/index"
        )
        signature_table(h).write.mode("append").parquet(f"{base}/sigs")
    spark.catalog.refreshByPath(f"{base}/index")
    spark.catalog.refreshByPath(f"{base}/sigs")

    probe = docs.limit(20)
    before_idx = sorted(
        (r.doc, r.band, r.key)
        for r in spark.read.parquet(f"{base}/index").collect()
    )
    before_flags = sorted(
        (r.doc_id, r.dup_exact, r.dup_near_candidate)
        for r in dedup_against_index(
            probe,
            spark.read.parquet(f"{base}/index"),
            old_sigs=spark.read.parquet(f"{base}/sigs"),
        ).collect()
    )

    stats = compact_index(spark, str(base))
    assert stats["index_files_after"] < stats["index_files_before"]
    assert stats["sigs_files_after"] <= stats["sigs_files_before"]

    after_idx = sorted(
        (r.doc, r.band, r.key)
        for r in spark.read.parquet(f"{base}/index").collect()
    )
    assert after_idx == before_idx
    assert stats["index_rows"] == len(after_idx)
    after_flags = sorted(
        (r.doc_id, r.dup_exact, r.dup_near_candidate)
        for r in dedup_against_index(
            probe,
            spark.read.parquet(f"{base}/index"),
            old_sigs=spark.read.parquet(f"{base}/sigs"),
        ).collect()
    )
    assert after_flags == before_flags
    # every band directory compacted to one file
    for band_dir in glob.glob(f"{base}/index/band=*"):
        assert len(glob.glob(f"{band_dir}/*.parquet")) == 1


@pytest.mark.slow
def test_compact_stream_store_preserves_batch_layout(spark, tmp_path_factory):
    """Compacting a STREAM-written store (batch-partitioned index/
    sigs/bloom) preserves the batch layout so the ingest loop can
    RESUME afterward: the next batch's dynamic-overwrite write and the
    bloom coverage guard both keep working."""
    import glob

    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.incremental import (
        compact_index,
    )
    from solana_snapshot_etl_tools_spark.streaming.ingest import (
        _prior_bloom,
        process_ingest_batch,
    )

    base = tmp_path_factory.mktemp("compact_stream")
    idx, corp = str(base / "idx"), str(base / "corpus")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(60)
    )
    process_ingest_batch(docs.filter("doc_id % 2 = 0"), 0, idx, corp)
    process_ingest_batch(docs.filter("doc_id % 2 = 1"), 1, idx, corp)

    stats = compact_index(spark, idx)
    assert stats["index_rows"] > 0 and stats["bloom_rows"] >= 1
    # batch dirs survive compaction for all three outputs
    for sub in ("index", "sigs", "bloom"):
        assert glob.glob(f"{idx}/{sub}/batch=*"), sub
    assert _prior_bloom(spark, idx, 2) is not None  # coverage intact

    # the loop RESUMES: batch 2 with planted copies of batch-0 docs
    b2 = docs.filter("doc_id % 2 = 0").limit(4).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    ).unionByName(
        spark.createDataFrame(
            [(9_999_999, "a genuinely new document about compaction")],
            "doc_id long, text string",
        )
    )
    process_ingest_batch(b2, 2, idx, corp)
    spark.catalog.refreshByPath(corp)
    kept = spark.read.parquet(corp)
    assert kept.count() == 61  # 60 + the one new doc; 4 copies died
    assert kept.filter("doc_id = 9999999").count() == 1
