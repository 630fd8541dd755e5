"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` is the
declared operator inventory (SURVEY.md §2); ``oracle_sql()`` gives the
DuckDB-equivalent SQL per query. Solana ETL decode queries run the
engine's decoders over a deterministic binary fixture and their
oracles are pre-pack ground-truth ``VALUES`` literals — value-level
correctness, not just row counts (see
solana_snapshot_etl_tools_spark/fixtures.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from solana_snapshot_etl_tools_spark.plans import (
    llm_ops,
    llm_ops2,
    relational,
    relational2,
    relational3,
    solana,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Registration order matters: the verification driver checks queries in
# declaration order with a cap of 50 per round (of 93 declared → 43
# rotate past the cap each round), so the front of the list rotates
# each round to keep consecutive-round unions covering all queries
# with the stalest rows refreshed.
#
# Round 5 front-loads (a) the 32 queries whose last green row is round
# 3 (they fell past round 4's 50-slot cap; media_* is MANDATORY — its
# code changed in r4 after its last green row), then (b) everything
# round 5 touches: the quantize output edge, the three NEW
# exhaustive-parameter ANN parity queries, the overflow-free split/
# sample hash, the simhash sketch kernel, the jaccard default guard,
# and the dedup family that now registers session caches. The r04-green
# untouched remainder (TPC-H, join/window/agg core, etl decode spine)
# rotates past the cap; r04 ∪ r05 covers all 85.
_FRONT = [
    # (a) r03-only green rows — stalest evidence, refresh first
    "media_meta",
    "media_frame_sample",
    "media_features",
    "stream_selected_accounts",
    "stream_offchain_fanout",
    "stream_rooted_slots",
    "stream_block_metadata",
    "stream_tx_filtered",
    "stream_tx_nested",
    "etl_deletion_events",
    "etl_opcode_stats",
    "window_running",
    "window_rank_ties",
    "window_moving",
    "window_values",
    "setops",
    "scalar_funcs",
    "string_funcs",
    "date_funcs",
    "json_extract",
    "distinct_topk",
    "above_avg_orders",
    "top_supplier_per_nation",
    "exists_not_exists",
    "in_subquery_having",
    "conditional_agg",
    "explode_tokens",
    "null_handling",
    "limit_offset",
    "bigram_stats",
    "doc_fingerprint",
    "sample_balanced_lang",  # also touched r5: overflow-free hash
    # (b) code touched in round 5
    "embedding_quantize_int8",  # r4 red row — output edge fixed
    "ann_cosine_ivf_exact",  # NEW r5 — parity, needs first row
    "ann_cosine_pq_exact",  # NEW r5 — parity, needs first row
    "ann_cosine_ivf_pq_exact",  # NEW r5 — parity, needs first row
    "split_train_val_test",  # overflow-free hash
    "dedup_simhash",  # sketch kernel sub-chunked
    "dedup_jaccard_ngram",  # finite max_doc_freq default
    "dedup_minhash_lsh",  # session-cache registry
    "dedup_components",  # session-cache registry
    "pipeline_clean_corpus",  # embeds the capped dedup
    # NEW round-5 operators — first driver rows
    "pii_scrub",
    "quality_repetition",
    "token_doc_freq",
    "doc_rarity_score",
    "dedup_semantic",  # hash-checks cosine_pairs + components end-to-end
    "pipeline_pretrain_corpus",  # NEW r5 — composite, first row
    "q4_order_priority",  # NEW r5 — first row
    "q19_disjunctive_revenue",  # NEW r5 — first row
    # NOT re-queued despite similarity.py/dedup.py/llm_ops.py changing
    # this round (slots went to the eight new queries):
    # ann_cosine_{lsh,ivf,pq,ivf_pq} — their r04 rows are rows-only by
    # design, and the SAME code paths now get hash-green rows via the
    # *_exact parity queries above; embedding_cosine_pairs +
    # ann_cosine_topk — the exact-cosine kernel and ANN_TOPK_SQL
    # oracle are hash-checked this round by the three *_exact rows and
    # dedup_semantic; dedup_exact + chunk_documents — r04-green, their
    # implementing FUNCTIONS are untouched this round (module-level
    # diffs are elsewhere; see git log -L on exact_dedup_groups /
    # q_chunk_documents), and exact_dedup is re-exercised hash-green
    # inside both pipeline_* composites.
    # cap (50) lands here. Past it, all r04-green with unchanged code:
    # q1/q3/q5/q6/q10/q14, join/asof/window/agg/pivot families,
    # collect_sorted, percentiles, text_metrics, lang_id,
    # doc_length_histogram, dup_span_stats, split/salted leftovers,
    # and the etl_* fixture decode spine — PLUS the five round-5-late
    # NEW queries (chunk_cdc, decontaminate_ngram, q18/q2/q22 shapes in
    # llm_ops2/relational3), deliberately registered past the cap: they
    # have full pytest + local driver-sim evidence this round and take
    # 5 of round 6's 7 free prefix slots for their first driver rows
    # (43 must-refresh + 5 new = 48 ≤ 50; see TODO.md).
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT if k in d}
    front.update({k: v for k, v in d.items() if k not in front})
    return front


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(relational2.QUERIES)
    out.update(solana.QUERIES)
    out.update(llm_ops.QUERIES)
    out.update(llm_ops2.QUERIES)
    out.update(relational3.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(relational2.ORACLES)
    out.update(solana.oracles())
    out.update(llm_ops.ORACLES)
    out.update(llm_ops2.ORACLES)
    out.update(relational3.ORACLES)
    return _ordered(out)
