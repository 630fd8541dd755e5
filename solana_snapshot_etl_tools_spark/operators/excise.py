"""Duplicate-span excision — the ACTION side of exact substring dedup
(Lee et al., "Deduplicating Training Data Makes Language Models
Better"): ``operators/dedup.py:dup_span_stats`` measures cross-doc
duplicated ≥k-char spans; this module REMOVES them, keeping each
duplicated span only in its canonical (min-id) document and cutting it
everywhere else, so the corpus retains exactly one copy of every long
repeated substring.

Matching is exact and case-sensitive (the stats operator lowercases;
an excision must rebuild the ORIGINAL text, and case folding is not
length-preserving for all of Unicode, so positions could not be
trusted through it).

Scale shape (mirrors dup_span_stats): the per-position window explode
is narrow with windows xxhash64'd to 8-byte keys before any shuffle —
wide stages move (doc, pos, wh) longs, never 50-char strings. Window
ownership is one groupBy; membership one equi-join; per-doc interval
merge and text rebuild are bounded per-row folds over the doc's OWN
cut list (≤ text length). Dense per-row temporaries are segment-
bounded like chunk_cdc's boundary scan. A hash collision can only
excise a span that wasn't truly duplicated — data loss of one span,
never corruption, and at 64-bit rates negligible; the pytest suite
checks against a pure-Python reference with real substrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Bound for the dense per-row window-hash temporaries (see
# plans/llm_ops.py CDC_SEGMENT_CHARS for the rationale).
EXCISE_SEGMENT_CHARS = 65536


def _chars(t):
    """Per-row character array: windows and the rebuild slice this
    array instead of calling substring(t, i, ..) per position — the
    per-position substring is an O(i) scan on UTF-8 strings, which
    makes any full-position sweep O(n²) per document (the chunk_cdc
    lesson, plans/llm_ops.py). split('') chunks by UTF-16 unit, so
    astral-plane characters would index differently than a code-point
    view; indexing is consistent within the operator either way, and
    BMP text (all driver corpora) is exact."""
    return F.split(t, "")


def _window_positions(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc, pos, wh): xxhash64 of the k-char window starting at pos
    (1-based) for every position — O(k) per window via the char
    array, built segment-by-segment so the dense temporary is bounded
    per row."""
    base = docs.withColumn("_chs", _chars(F.col(text_col)))
    n = F.size(F.col("_chs"))
    seg = EXCISE_SEGMENT_CHARS
    win = lambda i: F.array_join(F.slice(F.col("_chs"), i, k), "")  # noqa: E731
    wins = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1), F.lit(seg)),
            lambda s: F.transform(
                F.sequence(s, F.least(s + (seg - 1), n - (k - 1))),
                lambda i: F.struct(i.alias("pos"), F.xxhash64(win(i)).alias("wh")),
            ),
        )
    )
    return (
        base.filter(n >= k)
        .select(F.col(id_col).alias("doc"), F.explode(wins).alias("w"))
        .select("doc", "w.pos", "w.wh")
    )


def excise_dup_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 50
) -> DataFrame:
    """Remove every k-char window that also occurs in another document,
    except from the window's canonical owner (the smallest doc id
    containing it). Overlapping/adjacent cut windows merge into one
    excised span. Within-doc repeats inside the owner are kept (the
    cross-doc copy is the redundancy being removed).

    Emits every input row as (id, text_clean, n_excised_chars):
    untouched docs pass through with ``n_excised_chars = 0``, so the
    output is a drop-in replacement corpus."""
    w = _window_positions(docs, id_col, text_col, k)
    shared = (
        w.groupBy("wh")
        .agg(
            F.count_distinct("doc").alias("nd"),
            F.min("doc").alias("owner"),
        )
        .filter(F.col("nd") >= 2)
        .select("wh", "owner")
    )
    cuts = (
        w.join(shared, "wh")
        .filter(F.col("doc") != F.col("owner"))
        .groupBy("doc")
        .agg(F.array_sort(F.collect_set("pos")).alias("ps"))
    )
    return _excise_at_cut_positions(docs, cuts, id_col, text_col, k)


def _excise_at_cut_positions(
    docs: DataFrame, cuts: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Shared rebuild stage: ``cuts`` is (doc, ps) — the sorted 1-based
    start positions of k-char windows to remove per document. Emits
    every input row as (id, text_clean, n_excised_chars)."""
    # merge fixed-length-k intervals over the sorted start list, then
    # rebuild the kept text by folding over the merged spans
    iv = "array<struct<s:int,e:int>>"
    merged = F.aggregate(
        F.col("ps").cast("array<int>"),
        F.expr(f"cast(array() as {iv})"),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(F.element_at(acc, -1)["e"], p + k).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + k).alias("e"))))
        ),
    )
    t = F.col(text_col)
    chs = _chars(t)
    n = F.size(chs)
    frag = lambda a, ln: F.array_join(F.slice(chs, a, ln), "")  # noqa: E731
    rebuilt = F.aggregate(
        F.col("_spans"),
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("out")),
        lambda st, s: F.struct(
            s["e"].alias("cur"),
            F.concat(st["out"], frag(st["cur"], s["s"] - st["cur"])).alias("out"),
        ),
        lambda st: F.concat(st["out"], frag(st["cur"], n - st["cur"] + 1)),
    )
    excised = F.aggregate(
        F.col("_spans"),
        F.lit(0),
        lambda acc, s: acc + (s["e"] - s["s"]),
    )
    return (
        docs.join(
            cuts.select(F.col("doc").alias(id_col), merged.alias("_spans")),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.when(F.col("_spans").isNull(), t)
            .otherwise(rebuilt)
            .alias("text_clean"),
            F.coalesce(excised, F.lit(0)).cast("long").alias("n_excised_chars"),
        )
    )


def excise_contaminated_spans(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Surgical decontamination: remove every k-char window that also
    occurs ANYWHERE in the benchmark suite, keeping the rest of the
    document — the excision alternative to `decontam.decontaminate`'s
    drop-the-document rule (the PaLM/GPT-3 appendix choice when the
    leak is a quoted snippet inside an otherwise-clean page).

    Same window machinery as ``excise_dup_spans`` (hashed k-char
    windows, per-row bounded segment sweep, overlap-merged spans,
    array-slice rebuild); the cut set is "window hash ∈ bench windows"
    instead of "window shared across documents". The bench side is
    reduced to DISTINCT window hashes (8 bytes each) and broadcast by
    default — a benchmark suite is MBs, its hash set broadcasts to
    every executor and the corpus-side scan never shuffles document
    text. Set ``broadcast_bench=False`` for a giant bench set to fall
    back to a shuffled semi-join shape.

    Emits every input row as (id, text_clean, n_excised_chars);
    untouched docs pass through with ``n_excised_chars = 0``.
    """
    w = _window_positions(docs, id_col, text_col, k)
    bench_ids = bench.select(
        F.monotonically_increasing_id().alias("_bid"),
        F.col(bench_text_col).alias("_btext"),
    )
    bench_wh = (
        _window_positions(bench_ids, "_bid", "_btext", k)
        .select("wh")
        .distinct()
    )
    if broadcast_bench:
        bench_wh = F.broadcast(bench_wh)
    cuts = (
        w.join(bench_wh, "wh")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_set("pos")).alias("ps"))
    )
    return _excise_at_cut_positions(docs, cuts, id_col, text_col, k)
