"""excise_dup_spans vs a pure-Python reference implementation (real
substrings, no hashing) on planted corpora, plus property and plan
checks."""

from __future__ import annotations

import contextlib
import io

from solana_snapshot_etl_tools_spark.operators import excise as E


def _reference(rows: list[tuple[int, str]], k: int) -> dict[int, tuple[str, int]]:
    """Direct restatement of the declared semantics: every k-char
    window occurring in ≥2 docs is cut from every doc except the
    window's min-id owner; overlapping cuts merge; text rebuilt from
    the kept gaps."""
    windows: dict[str, set[int]] = {}
    for did, t in rows:
        for i in range(len(t) - k + 1):
            windows.setdefault(t[i : i + k], set()).add(did)
    out: dict[int, tuple[str, int]] = {}
    for did, t in rows:
        starts = sorted(
            i
            for i in range(len(t) - k + 1)
            if len(windows[t[i : i + k]]) >= 2 and min(windows[t[i : i + k]]) != did
        )
        spans: list[list[int]] = []
        for s in starts:
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + k)
            else:
                spans.append([s, s + k])
        kept, cur = [], 0
        for s, e in spans:
            kept.append(t[cur:s])
            cur = e
        kept.append(t[cur:])
        out[did] = ("".join(kept), sum(e - s for s, e in spans))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_excised_chars)
        for r in E.excise_dup_spans(df, k=k).collect()
    }
    assert got == _reference(rows, k)
    return got


def test_excise_matches_reference_on_planted_corpus(spark):
    boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED BY THE AUTHOR"
    rows = [
        (1, f"unique head one {boiler} unique tail one"),
        (2, f"other beginning here {boiler} and another ending"),
        (3, f"{boiler} starts this document"),
        (4, "completely original text with no duplication at all"),
        (5, "short"),
    ]
    got = _run(spark, rows, k=20)
    # doc 1 is the min-id owner of the boilerplate: untouched
    assert got[1] == (rows[0][1], 0)
    # docs 2 and 3 lose the boilerplate span
    assert boiler not in got[2][0] and got[2][1] > 0
    assert boiler not in got[3][0] and got[3][1] > 0
    # clean and sub-k docs pass through
    assert got[4] == (rows[3][1], 0)
    assert got[5] == ("short", 0)


def test_excise_merges_overlapping_and_multiple_spans(spark):
    a = "A" * 30
    b = "B" * 30
    rows = [
        (1, f"{a}xx{b}"),
        # a and b each duplicated; in doc 2 they abut with one char
        # between, producing two merged cut spans around 'q'
        (2, f"lead {a}q{b} trail"),
        # doc 3 holds a twice: both copies excised (owner is doc 1)
        (3, f"{a} middle {a} end"),
    ]
    got = _run(spark, rows, k=10)
    assert "A" not in got[2][0] and "B" not in got[2][0]
    assert "q" in got[2][0]  # the gap char between spans survives
    assert "A" not in got[3][0] and "middle" in got[3][0]


def test_excise_output_is_dropin_corpus(spark):
    """Every input row appears exactly once in the output, and
    n_excised_chars always equals the length delta."""
    rows = [
        (i, ("shared boilerplate sentence repeated everywhere " if i % 2 else "")
         + f"doc {i} body text with its own words number {i * 7}")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = E.excise_dup_spans(df, k=15).collect()
    assert sorted(r.doc_id for r in out) == list(range(10))
    src = dict(rows)
    for r in out:
        assert r.n_excised_chars == len(src[r.doc_id]) - len(r.text_clean)


def test_excise_segmentation_is_invariant(spark, monkeypatch):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "intro text " + "the quick brown fox jumps over the lazy dog " * 3),
    ]
    whole = _run(spark, rows, k=25)
    monkeypatch.setattr(E, "EXCISE_SEGMENT_CHARS", 13)
    seg = _run(spark, rows, k=25)
    assert whole == seg


def test_excise_oracle_parity_prototype(spark):
    """De-risks a round-6 `excise_dup_spans` query declaration: the
    same semantics spelled in DuckDB over RAW substrings (no hashing)
    via character survival — a char is excised iff some cut window of
    its doc covers it — must equal the operator's hash-keyed interval
    rebuild on the real corpus. Also proves the corpus has real
    cross-doc ≥k spans to excise (the dup_span_stats families)."""
    from tests.compare import run_oracle

    K = 50
    sql = f"""
WITH w AS (
  SELECT doc_id, CAST(i AS INT) AS pos, substr(text, CAST(i AS INT), {K}) AS sub
  FROM documents, unnest(range(1, length(text) - {K} + 2)) AS u(i)),
own AS (
  SELECT sub, min(doc_id) AS owner FROM w
  GROUP BY sub HAVING count(DISTINCT doc_id) >= 2),
cuts AS (
  SELECT w.doc_id, w.pos FROM w
  JOIN own ON w.sub = own.sub AND w.doc_id <> own.owner),
chars AS (
  SELECT doc_id, CAST(i AS INT) AS c, substr(text, CAST(i AS INT), 1) AS ch
  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)),
kept AS (
  SELECT ch.doc_id, ch.c, ch.ch,
    NOT EXISTS (SELECT 1 FROM cuts t WHERE t.doc_id = ch.doc_id
                AND t.pos <= ch.c AND ch.c < t.pos + {K}) AS keep
  FROM chars ch)
SELECT d.doc_id,
  coalesce((SELECT string_agg(ch, '' ORDER BY c) FROM kept
            WHERE kept.doc_id = d.doc_id AND keep), '') AS text_clean,
  (SELECT count(*) FROM kept
   WHERE kept.doc_id = d.doc_id AND NOT keep) AS n_excised_chars
FROM documents d
"""
    sf = "/root/testdata/sf0.001"
    _, rows = run_oracle(sql, sf)
    want = sorted(tuple(r) for r in rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (r.doc_id, r.text_clean, r.n_excised_chars)
        for r in E.excise_dup_spans(docs, k=K).collect()
    )
    assert sum(1 for r in want if r[2] > 0) > 0, "corpus must have dup spans"
    assert got == want


def test_excise_shuffles_carry_hashes_not_text(spark):
    """Like dup_span_stats: the wide stages must move xxhash64 longs,
    never the raw k-char window strings."""
    df = spark.createDataFrame(
        [(1, "some text to excise " * 5), (2, "some text to excise " * 4)],
        "doc_id long, text string",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        E.excise_dup_spans(df, k=20).explain("formatted")
    p = buf.getvalue()
    assert "xxhash64" in p
    assert "CartesianProduct" not in p


def _py_excise_contaminated(doc: str, bench_texts: list[str], k: int) -> str:
    """Pure-Python reference: cut every k-window of doc that appears
    verbatim in any bench text; merge overlaps."""
    bench_wins = set()
    for b in bench_texts:
        for i in range(len(b) - k + 1):
            bench_wins.add(b[i:i + k])
    cuts = [i for i in range(len(doc) - k + 1) if doc[i:i + k] in bench_wins]
    if not cuts:
        return doc
    spans = []
    for p in cuts:
        if spans and p <= spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], p + k)
        else:
            spans.append([p, p + k])
    out, cur = [], 0
    for s, e in spans:
        out.append(doc[cur:s])
        cur = e
    out.append(doc[cur:])
    return "".join(out)


class TestExciseContaminated:
    K = 20

    def _frames(self, spark):
        leak = "the exact benchmark question text sits right here verbatim"
        bench = spark.createDataFrame(
            [(leak,), ("another eval item that nobody quotes",)],
            "text string",
        )
        docs = spark.createDataFrame(
            [
                ("d1", f"intro paragraph. {leak} trailing analysis."),
                ("d2", "a perfectly clean document with original prose only."),
                ("d3", f"{leak} {leak} double quote of the same item"),
                ("d4", "short"),  # below k: passes through untouched
            ],
            "doc_id string, text string",
        )
        return docs, bench, leak

    def test_matches_pure_python_reference(self, spark):
        from solana_snapshot_etl_tools_spark.operators.excise import (
            excise_contaminated_spans,
        )

        docs, bench, leak = self._frames(spark)
        bench_texts = [r.text for r in bench.collect()]
        got = {
            r.doc_id: (r.text_clean, r.n_excised_chars)
            for r in excise_contaminated_spans(docs, bench, k=self.K).collect()
        }
        assert set(got) == {"d1", "d2", "d3", "d4"}
        for r in docs.collect():
            want = _py_excise_contaminated(r.text, bench_texts, self.K)
            assert got[r.doc_id][0] == want, r.doc_id
            assert got[r.doc_id][1] == len(r.text) - len(want)
        # the leak is actually gone, the clean prose actually kept
        assert leak not in got["d1"][0]
        assert "intro paragraph." in got["d1"][0]
        assert "trailing analysis." in got["d1"][0]
        assert got["d2"][1] == 0
        assert got["d4"] == ("short", 0)

    def test_broadcast_shape_and_fallback_agree(self, spark):
        from solana_snapshot_etl_tools_spark.operators.excise import (
            excise_contaminated_spans,
        )

        docs, bench, _ = self._frames(spark)
        a = excise_contaminated_spans(docs, bench, k=self.K)
        b = excise_contaminated_spans(docs, bench, k=self.K,
                                      broadcast_bench=False)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan

    def test_dup_span_parity_unchanged_by_refactor(self, spark):
        # the shared rebuild must leave excise_dup_spans' behavior
        # byte-identical: re-check a known cross-doc case end-to-end
        from solana_snapshot_etl_tools_spark.operators.excise import (
            excise_dup_spans,
        )

        span = "Z" * 25
        docs = spark.createDataFrame(
            [("a", f"keep one {span} copy"), ("b", f"cut the {span} here")],
            "doc_id string, text string",
        )
        rows = {r.doc_id: r for r in excise_dup_spans(docs, k=25).collect()}
        assert span in rows["a"].text_clean
        assert span not in rows["b"].text_clean


def test_cli_decontam_excise_mode(spark, tmp_path, tmp_path_factory, capsys):
    """--decontam-action excise cuts the leaked span and KEEPS the doc;
    drop mode would have removed it."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark import corpus_cli

    leak = ("what is the capital of france answer paris is the capital "
            "city of france since the middle ages")
    bench_dir = str(tmp_path / "bench")
    spark.createDataFrame([(leak,)], "text string").write.parquet(bench_dir)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    poisoned = docs.limit(40).withColumn(
        "text",
        F.when(
            F.col("doc_id") == docs.limit(40).collect()[0].doc_id,
            F.concat(F.col("text"), F.lit(" " + leak + " trailing prose")),
        ).otherwise(F.col("text")),
    )
    src = str(tmp_path / "docs")
    poisoned.write.parquet(src)

    out = str(tmp_path_factory.mktemp("excise_mode"))
    assert corpus_cli.main([
        src, out, "--no-pii",
        "--decontam-ngrams", bench_dir,
        "--decontam-action", "excise", "--decontam-excise-k", "30",
        "--decontam-max-overlap", "0.0001",  # would drop in drop mode
    ]) == 0
    rep = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert rep["n_ngram_decontam_excised_docs"] == 1
    assert rep["n_ngram_decontam_excised_chars"] > 0
    # nothing dropped: excise keeps every document
    assert rep["n_after_ngram_decontam"] == rep["n_after_lm_filter"] \
        if "n_after_lm_filter" in rep else True
    written = None
    for split in ("train", "val", "test"):
        try:
            part = spark.read.parquet(f"{out}/{split}")
        except Exception:
            continue
        written = part if written is None else written.unionByName(part)
    assert written.filter(written.text.contains(leak)).count() == 0

    with pytest.raises(SystemExit):
        corpus_cli.main([src, out, "--decontam-action", "excise"])
