"""Round-5-late queries: benchmark decontamination (operators/
decontam.py), the chunk_cdc registration, and the Q18/Q2/Q22 TPC-H
shapes (plans/relational3.py) — oracle parity, planted-corpus
semantics, and physical-plan properties."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators import decontam as DC
from solana_snapshot_etl_tools_spark.plans import llm_ops2 as L2
from solana_snapshot_etl_tools_spark.plans import relational3 as R3
from tests.compare import assert_matches
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- oracle parity (strict local value-equality, sf0.001) -------------------


def test_q18_oracle_parity(spark):
    df = R3.q18_large_orders(spark, SF_DIR)
    assert df.count() > 0, "threshold must select orders at sf0.001"
    assert_matches(df, R3.Q18_SQL, SF_DIR)


def test_q2_oracle_parity(spark):
    df = R3.q2_min_cost_supplier(spark, SF_DIR)
    assert df.count() > 0
    assert_matches(df, R3.Q2_SQL, SF_DIR)


def test_q22_oracle_parity(spark):
    df = R3.q22_idle_customers(spark, SF_DIR)
    assert df.count() > 0, "cutoff must leave idle customers at sf0.001"
    assert_matches(df, R3.Q22_SQL, SF_DIR)


def test_chunk_cdc_query_oracle_parity(spark):
    assert_matches(L2.q_chunk_cdc(spark, SF_DIR), L2.CHUNK_CDC_SQL, SF_DIR)


def test_excise_query_oracle_parity(spark):
    """The REGISTERED query + oracle pair (not just the operator —
    that's test_excise.py's prototype) on the real corpus: real dup
    spans must be excised and the raw-substring character-survival SQL
    must agree value-for-value."""
    df = L2.q_excise_dup_spans(spark, SF_DIR)
    assert df.filter(F.col("n_excised_chars") > 0).count() > 0, (
        "corpus must contain cross-doc ≥50-char spans (dup_span families)"
    )
    assert_matches(df, L2.EXCISE_SQL, SF_DIR)


def test_pack_query_oracle_parity(spark):
    df = L2.q_pack_sequences(spark, SF_DIR)
    assert df.count() > 100
    assert_matches(df, L2.PACK_SQL, SF_DIR)


def test_decontaminate_oracle_parity(spark):
    df = L2.q_decontaminate(spark, SF_DIR)
    assert df.count() > 0, (
        "the near-dup families must produce cross-set 8-gram overlap"
    )
    assert_matches(df, L2.DECONTAM_SQL, SF_DIR)


# --- planted-corpus semantics ----------------------------------------------


def test_decontaminate_planted_counts(spark):
    """Exact hit accounting on a hand-built corpus: doc 1 contains the
    benchmark sentence verbatim (all its 4-grams hit), doc 2 shares a
    4-token span (exactly one 4-gram hits), doc 3 is clean (absent
    from the output)."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta epsilon y"),
            (2, "q w alpha beta gamma delta r t u i o"),
            (3, "totally unrelated words go here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in DC.decontaminate(train, bench, k=4).collect()
    }
    assert set(out) == {1, 2}
    # doc 1: 7 tokens → 4 distinct 4-grams, the 2 fully-inside ones hit
    assert out[1].n_grams == 4 and out[1].n_hit == 2
    assert abs(out[1].contamination - 0.5) < 1e-15
    # doc 2: 11 tokens → 8 4-grams, exactly one ("alpha beta gamma
    # delta") appears in the benchmark
    assert out[2].n_grams == 8 and out[2].n_hit == 1


def test_decontaminate_hash_key_matches_string_key(spark):
    """The 100 TB spelling (xxhash64 join keys) must select the same
    documents with the same counts as the exact string-key path on the
    real corpus (collisions are possible in principle but not present
    here — and would only ever ADD hits)."""
    from solana_snapshot_etl_tools_spark.plans.relational import _t

    docs = _t(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    train = docs.filter(F.col("doc_id") % 19 != 0)
    a = sorted(
        (r.doc_id, r.n_hit, r.n_grams)
        for r in DC.decontaminate(train, bench).collect()
    )
    b = sorted(
        (r.doc_id, r.n_hit, r.n_grams)
        for r in DC.decontaminate(train, bench, hash_key=True).collect()
    )
    assert a == b and len(a) > 0


def test_chunk_cdc_batching_is_invariant(spark, monkeypatch):
    """The numpy boundary scan (r16) must produce byte-identical
    chunks regardless of Arrow batch size (the per-task chunking knob
    that replaced the old per-row segment bound), including a
    non-multiple length, a doc shorter than the window, and non-ASCII
    text — and (r17) regardless of the bounded-memory scan segment
    size: one pathologically long synthetic document is scanned with
    the segment bound forced far below its length, so it spans many
    (w-1)-overlapping segments."""
    from solana_snapshot_etl_tools_spark.plans import llm_ops as L

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 9),
            (2, "tiny"),
            (3, "ein kleines haus am grünen fluss üß " * 4 + "x"),
            # long doc: non-periodic content so boundaries land at
            # irregular positions that cross segment edges
            (4, " ".join(f"w{(i * i) % 977}" for i in range(40_000))),
        ],
        "doc_id long, text string",
    )
    whole = sorted(tuple(r) for r in L.chunk_cdc(docs).collect())
    monkeypatch.setattr(L, "CDC_SCAN_SEGMENT_CHARS", 101)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        seg = sorted(tuple(r) for r in L.chunk_cdc(docs).collect())
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
        )
    assert seg == whole and len(whole) > 4


def test_token_ngrams_segmentation_is_lossless(spark, monkeypatch):
    """The bounded-memory segmentation (overlap k-1) must emit exactly
    the same distinct gram set as one unbounded pass — forced here by
    shrinking the segment bound far below the document length so every
    doc spans many segments."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 37 + j) % 23}" for j in range(95))) for i in range(4)],
        "doc_id long, text string",
    )
    whole = sorted(
        (r.doc_id, r.gram) for r in DC.token_ngrams(docs, "doc_id", "text", 4).collect()
    )
    monkeypatch.setattr(DC, "SEGMENT_TOKENS", 10)
    seg = sorted(
        (r.doc_id, r.gram) for r in DC.token_ngrams(docs, "doc_id", "text", 4).collect()
    )
    assert seg == whole and len(whole) > 0


def test_chunk_cdc_stream_matches_batch(spark, tmp_path_factory):
    """chunk_cdc is a pure narrow per-row transform, so the SAME
    function must run unchanged under readStream — proven with a real
    availableNow file-source query vs its batch replay (the engine's
    batch/stream-parity contract, cf. the corpus scrub/score stages)."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops import chunk_cdc
    from solana_snapshot_etl_tools_spark.streaming.sinks import run_available_now

    src = "/root/testdata/sf0.001/documents.parquet"
    schema = spark.read.parquet(src).schema
    d = str(tmp_path_factory.mktemp("docs_cdc_stream"))
    spark.read.parquet(src).write.mode("overwrite").parquet(d)

    streamed = run_available_now(spark, d, schema, chunk_cdc)
    batch = chunk_cdc(spark.read.parquet(src))
    cols = ["doc_id", "chunk_id", "chunk", "n_chunk_chars"]

    def rows(df):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    assert rows(streamed) == rows(batch)
    assert streamed.count() > 0


# --- physical-plan properties ----------------------------------------------


def test_decontaminate_bench_side_broadcasts(spark):
    """The benchmark n-gram probe must be a broadcast join (the train
    side streams; only per-doc DISTINCT/count aggregates shuffle) and
    nothing may cartesian."""
    p = _plan(L2.q_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q18_having_set_broadcasts_and_topk(spark):
    p = _plan(R3.q18_large_orders(spark, SF_DIR))
    assert "BroadcastHashJoin" in p, "HAVING-set must broadcast"
    assert "TakeOrderedAndProject" in p, "top-100 must not be a full sort"
    assert "CartesianProduct" not in p


def test_q2_dims_broadcast_and_part_filter_pushdown(spark):
    p = _plan(R3.q2_min_cost_supplier(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "LessThanOrEqual(p_size,10)" in p, "part filter must push to scan"
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_q22_anti_join_with_pruned_scan(spark):
    p = _plan(R3.q22_idle_customers(spark, SF_DIR))
    assert "LeftAnti" in p
    assert "GreaterThanOrEqual(o_orderdate" in p, (
        "cutoff must push to the orders scan"
    )
    # orders contributes only its key column past the scan
    read = [l for l in p.splitlines() if "ReadSchema" in l and "o_custkey" in l]
    assert read and all("o_totalprice" not in l for l in read)
