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
# declaration order with a cap of 50 per round (of 100 declared → 50
# rotate past the cap each round), so the front of the list rotates
# each round to keep consecutive-round unions covering all queries
# with the stalest rows refreshed. With 100 declared the rotation has
# ZERO slack: each round's prefix is exactly the 50 past the previous
# round's cap (tools/plan_next_front.py derives it; check_rotation.py
# gates it).
#
# Round 15 front-loads the 50 queries whose last green row is round 13
# (they fell past round 14's cap) — exactly
# tools/plan_next_front.py's output; r14 ∪ r15 covers all 100. No
# round-14 code change touched any of these queries' implementing
# functions (the round's edits were warc/robots/sitemaps/manifest/url/
# CLI/bench/entry-rotation surfaces only, per the r14 verdict diff
# audit), so this rotation carries no extra re-certification burden.
_FRONT = [
    "window_running",
    "window_rank_ties",
    "window_moving",
    "setops",
    "scalar_funcs",
    "json_extract",
    "distinct_topk",
    "above_avg_orders",
    "q4_order_priority",
    "q19_disjunctive_revenue",
    "top_supplier_per_nation",
    "exists_not_exists",
    "in_subquery_having",
    "conditional_agg",
    "string_funcs",
    "date_funcs",
    "window_values",
    "explode_tokens",
    "null_handling",
    "limit_offset",
    "etl_deletion_events",
    "etl_opcode_stats",
    "media_meta",
    "media_frame_sample",
    "media_features",
    "stream_selected_accounts",
    "stream_offchain_fanout",
    "stream_rooted_slots",
    "stream_block_metadata",
    "stream_tx_filtered",
    "stream_tx_nested",
    "pipeline_clean_corpus",
    "pipeline_pretrain_corpus",
    "embedding_quantize_int8",
    "dedup_jaccard_ngram",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_simhash",
    "ann_cosine_ivf_exact",
    "ann_cosine_pq_exact",
    "ann_cosine_ivf_pq_exact",
    "doc_fingerprint",
    "bigram_stats",
    "sample_balanced_lang",
    "split_train_val_test",
    "pii_scrub",
    "quality_repetition",
    "token_doc_freq",
    "doc_rarity_score",
    "dedup_semantic",
    # cap (50) lands here — zero slack. Past it: the entire r14-green
    # front (q1/q3/q5, join_{semi,anti,theta}, window_topk, sessionize,
    # rollup/cube/pivot/unpivot, tumbling/sliding windows, asof_join,
    # q6/q10/q14/q18/q2/q22, grouping_sets, percentiles_stddev,
    # collect_sorted, etl_* decode suite ×9, dup_span_stats,
    # dedup_exact, chunk_{documents,cdc}, ann_cosine_{topk,lsh,ivf,pq,
    # ivf_pq}, embedding_cosine_pairs, text_metrics, lang_id,
    # doc_length_histogram, salted_join_orders, decontaminate_ngram,
    # excise_dup_spans, pack_sequences).
    # Round-15 code changes must NOT touch their implementing functions
    # (evidence = r14 green row + git log -L function-unchanged).
    # Exception by necessity would need a driver_sim re-green — avoid.
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
