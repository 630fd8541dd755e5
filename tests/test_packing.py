"""pack_token_sequences vs a direct Python reference (concat in id
order with EOS, chop into seq_len blocks), plus the determinism
contract across partitionings and structural properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_snapshot_etl_tools_spark.operators.packing import pack_token_sequences

ROWS = [
    (0, [1, 2, 3]),
    (1, []),  # empty doc: contributes only EOS
    (2, list(range(10, 33))),  # longer than seq_len: spans sequences
    (3, [7]),
    (4, list(range(100, 109))),
    (5, [42, 43, 44, 45]),
]


def _reference(rows, seq_len, eos_id):
    stream = []
    for _id, toks in sorted(rows):
        stream.extend(toks)
        if eos_id is not None:
            stream.append(eos_id)
    return {
        i: stream[i * seq_len : (i + 1) * seq_len]
        for i in range((len(stream) + seq_len - 1) // seq_len)
    }


def _df(spark, rows, n_part=None):
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    return df.repartition(n_part) if n_part else df


@pytest.mark.parametrize("seq_len,eos", [(16, 0), (8, 99), (16, None)])
def test_pack_matches_reference(spark, seq_len, eos):
    out = {
        r.seq_id: list(r.input_ids)
        for r in pack_token_sequences(
            _df(spark, ROWS), seq_len, eos_id=eos
        ).collect()
    }
    assert out == _reference(ROWS, seq_len, eos)


def test_pack_is_partitioning_invariant(spark):
    a = sorted(
        (r.seq_id, tuple(r.input_ids), r.n_docs)
        for r in pack_token_sequences(
            _df(spark, ROWS, 1), 16, eos_id=0, num_ranges=1
        ).collect()
    )
    b = sorted(
        (r.seq_id, tuple(r.input_ids), r.n_docs)
        for r in pack_token_sequences(
            _df(spark, ROWS, 7), 16, eos_id=0, num_ranges=5
        ).collect()
    )
    assert a == b


def test_pack_deterministic_under_duplicate_ids(spark):
    """Duplicate doc ids must not make packing depend on execution
    order: the window tiebreak orders same-id rows by (length,
    content-hash), so any partitioning/ordering of the input yields
    the same sequences, and the within-id order is pinned (shorter
    doc first, then hash order). Fully identical rows remain
    interchangeable — also covered (two (7, [5,5]) rows)."""
    dup_rows = [
        (0, [1, 2, 3]),
        (1, [10, 11, 12, 13, 14]),
        (1, [20, 21]),  # same id, different length
        (2, [30, 31, 32]),
        (2, [40, 41, 42]),  # same id, same length, different content
        (7, [5, 5]),
        (7, [5, 5]),  # fully identical pair
    ]
    outs = []
    for n_part, n_ranges in ((1, 1), (5, 3), (8, 8)):
        df = spark.createDataFrame(
            dup_rows, "doc_id long, token_ids array<int>"
        ).repartition(n_part)
        outs.append(
            sorted(
                (r.seq_id, tuple(r.input_ids), r.n_docs)
                for r in pack_token_sequences(
                    df, 8, eos_id=0, num_ranges=n_ranges
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    # token conservation under duplicates
    total = sum(len(t) for _, t in dup_rows) + len(dup_rows)
    assert sum(len(t) for _, t, _ in outs[0]) == total


def test_pack_structure(spark):
    seq_len = 16
    out = pack_token_sequences(_df(spark, ROWS), seq_len, eos_id=0).collect()
    total = sum(len(t) for _, t in ROWS) + len(ROWS)  # + one EOS each
    assert sum(r.n_tokens for r in out) == total
    full, last = [r for r in out if r.n_tokens == seq_len], [
        r for r in out if r.n_tokens < seq_len
    ]
    assert len(last) <= 1  # only the final sequence may be partial
    if last:
        assert last[0].seq_id == max(r.seq_id for r in out)
        assert 0 < last[0].fill_frac < 1
    assert all(r.fill_frac == 1.0 for r in full)
    assert sorted(r.seq_id for r in out) == list(range(len(out)))


def test_pack_oracle_parity_prototype(spark):
    """De-risks a round-6 `pack_sequences` query declaration: with
    code-point tokens (deterministic and SQL-spellable; BPE itself is
    not) and EOS=0, the packed sequences must equal a DuckDB spelling
    that computes each char's global offset with a window cumsum and
    groups by offset div L. Array output flattened to CSV on both
    sides (the quantize canonicalization lesson)."""
    from tests.compare import run_oracle

    L = 256
    sql = f"""
WITH d2 AS (
  SELECT doc_id, text, length(text) + 1 AS n FROM documents),
offs AS (
  SELECT doc_id, text, n,
         sum(n) OVER (ORDER BY doc_id) - n AS st
  FROM d2),
chars AS (
  SELECT doc_id, st + CAST(i AS BIGINT) - 1 AS gpos,
    CASE WHEN i <= n - 1
         THEN unicode(substr(text, CAST(i AS INT), 1)) ELSE 0 END AS tok
  FROM offs, unnest(range(1, n + 1)) AS u(i))
SELECT CAST(gpos // {L} AS BIGINT) AS seq_id,
       string_agg(tok, ',' ORDER BY gpos) AS ids_csv,
       count(*) AS n_tokens,
       count(DISTINCT doc_id) AS n_docs,
       CAST(count(*) AS DOUBLE) / {L} AS fill_frac
FROM chars GROUP BY 1
"""
    sf = "/root/testdata/sf0.001"
    _, rows = run_oracle(sql, sf)
    want = sorted(tuple(r) for r in rows)
    from solana_snapshot_etl_tools_spark.plans.llm_ops2 import _codepoint_tokens

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    enc = docs.select("doc_id", _codepoint_tokens(F.col("text")).alias("token_ids"))
    got = sorted(
        (r.seq_id, r.ids_csv, r.n_tokens, r.n_docs, r.fill_frac)
        for r in pack_token_sequences(enc, L, eos_id=0)
        .select(
            "seq_id",
            F.array_join(F.col("input_ids").cast("array<string>"), ",").alias(
                "ids_csv"
            ),
            "n_tokens",
            "n_docs",
            "fill_frac",
        )
        .collect()
    )
    assert len(want) > 100
    assert got == want


def test_codepoint_tokens_empty_doc_contributes_only_eos(spark):
    """split('', '') yields [''] in Spark — the tokenizer must filter
    it so an empty doc packs to exactly one EOS (matching the oracle's
    length(text)+1 accounting), not a phantom 0 + EOS."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops2 import _codepoint_tokens

    docs = spark.createDataFrame(
        [(0, ""), (1, "ab")], "doc_id long, text string"
    )
    enc = docs.select("doc_id", _codepoint_tokens(F.col("text")).alias("token_ids"))
    toks = {r.doc_id: list(r.token_ids) for r in enc.collect()}
    assert toks == {0: [], 1: [97, 98]}
    out = {
        r.seq_id: list(r.input_ids)
        for r in pack_token_sequences(enc, 8, eos_id=0).collect()
    }
    assert out == {0: [0, 97, 98, 0]}


def test_pack_has_no_global_window_exchange(spark):
    """The prefix sum must be the two-pass shape: the within-range
    cumsum window partitions by the shuffle partition id — the naive
    spelling (one global window) would show an
    `Exchange SinglePartition` feeding a Window and funnel the corpus
    through one task."""
    import contextlib
    import io

    df = _df(spark, ROWS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_token_sequences(df, 16, eos_id=0).explain("formatted")
    p = buf.getvalue()
    assert "Window" in p
    assert "Exchange SinglePartition" not in p


def test_pack_end_to_end_with_bpe(spark):
    """corpus → BPE encode → pack: the full token stream survives
    (total token conservation) and sequences are exactly seq_len."""
    from solana_snapshot_etl_tools_spark.operators import bpe as B

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = B.bpe_train(docs, n_merges=128)
    enc = B.bpe_encode(docs, model)
    eos = len(B.bpe_vocab(model))
    packed = pack_token_sequences(enc, 512, eos_id=eos)
    stats = packed.agg(
        F.sum("n_tokens").alias("toks"),
        F.count(F.lit(1)).alias("n"),
        F.min("fill_frac").alias("minfill"),
    ).collect()[0]
    n_docs = enc.filter(F.size("token_ids") >= 0).count()
    want = enc.agg(F.sum("n_tokens")).collect()[0][0] + n_docs
    assert stats.toks == want
    assert stats.n == (want + 511) // 512
    # every EOS present exactly once per doc
    assert (
        packed.select(
            F.explode("input_ids").alias("t")
        ).filter(F.col("t") == eos).count()
        == n_docs
    )


def test_pack_no_split_contract_and_determinism(spark):
    """No-split packing: every document lands whole in one sequence
    with correct boundary offsets; output is a pure function of the
    input regardless of physical partitioning."""
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.packing import pack_no_split

    rows = [
        (i, list(range(i * 100, i * 100 + ln)))
        for i, ln in enumerate([5, 9, 3, 12, 7, 2, 8, 6, 4, 11, 1, 10])
    ]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    out = pack_no_split(df, seq_len=16, num_groups=3).collect()
    by_doc = {}
    for r in out:
        assert r.n_tokens <= 16 and r.n_tokens == len(r.input_ids)
        assert abs(r.fill_frac - r.n_tokens / 16.0) < 1e-9
        assert len(r.doc_ids) == len(r.doc_offsets) == r.n_docs
        for did, off in zip(r.doc_ids, r.doc_offsets):
            by_doc[did] = (r.seq_id, off, r.input_ids)
    # exhaustive + whole: each doc's tokens appear contiguously at its
    # offset in exactly one sequence
    for did, toks in rows:
        seq_id, off, ids = by_doc[did]
        assert ids[off : off + len(toks)] == toks
    assert len(by_doc) == len(rows)

    a = sorted(
        (r.seq_id, tuple(r.input_ids))
        for r in pack_no_split(df.repartition(7), 16, num_groups=3).collect()
    )
    b = sorted((r.seq_id, tuple(r.input_ids)) for r in out)
    assert a == b  # hash-group routing, not physical partitions


def test_pack_no_split_truncation_and_eos(spark):
    from solana_snapshot_etl_tools_spark.operators.packing import pack_no_split

    rows = [(1, list(range(30))), (2, [7, 8])]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    got = {
        did: (r.input_ids, off)
        for r in pack_no_split(df, seq_len=8, eos_id=99, num_groups=1).collect()
        for did, off in zip(r.doc_ids, r.doc_offsets)
    }
    # the long doc is truncated TO seq_len (after EOS append)
    assert got[1][0][got[1][1] : got[1][1] + 8] == list(range(8))
    # the short doc keeps its EOS
    ids2, off2 = got[2]
    assert ids2[off2 : off2 + 3] == [7, 8, 99]

    # truncate=False drops the long doc instead
    kept = {
        did
        for r in pack_no_split(
            df, seq_len=8, eos_id=99, num_groups=1, truncate=False
        ).collect()
        for did in r.doc_ids
    }
    assert kept == {2}


def test_pack_no_split_fill_beats_one_doc_per_sequence(spark):
    """FFD actually packs: far fewer sequences than documents on the
    real corpus encoding."""
    from solana_snapshot_etl_tools_spark.operators import bpe as B
    from solana_snapshot_etl_tools_spark.operators.packing import pack_no_split

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(150)
    )
    model = B.bpe_train(docs, n_merges=64, train_limit=150)
    enc = B.bpe_encode(docs, model)
    max_len = enc.agg({"n_tokens": "max"}).collect()[0][0]
    seq_len = int(max_len) + 16
    out = pack_no_split(enc, seq_len, num_groups=4)
    n_seqs = out.count()
    n_docs = enc.count()
    assert n_seqs < n_docs / 1.5  # genuinely packed
    stats = out.agg({"fill_frac": "avg"}).collect()[0][0]
    assert stats > 0.5

def test_codepoint_tokens_frame_matches_expression(spark):
    """The r17 vectorized tokenizer (one utf-32 decode per doc inside
    mapInPandas) must emit exactly the token arrays of the
    split('')/ascii expression spelling — including the empty doc
    (no phantom token) and an astral-plane char (Spark 4 split('') is
    code-point semantics: ONE element carrying the full code point,
    exactly ord())."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops2 import (
        _codepoint_tokens,
        _codepoint_tokens_frame,
    )

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "ab"),
            (2, "ünïcødé 文字"),
            (3, "astral \U0001F600 char"),
            (4, "the quick brown fox " * 50),
        ],
        "doc_id long, text string",
    )
    expr = {
        r.doc_id: list(r.token_ids)
        for r in docs.select(
            "doc_id", _codepoint_tokens(F.col("text")).alias("token_ids")
        ).collect()
    }
    frame = {
        r.doc_id: list(r.token_ids)
        for r in _codepoint_tokens_frame(docs).collect()
    }
    assert frame == expr
    assert frame[0] == [] and frame[3][7] == 0x1F600
