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

from solana_snapshot_etl_tools_spark.plans import llm_ops, relational, relational2, solana


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Registration order matters: the verification driver checks queries in
# declaration order with a cap of 50 per round (of 82 declared), so the
# front of the list rotates each round to keep consecutive-round unions
# covering all queries with the stalest rows refreshed.
#
# Round 4 front-loads (a) the 21 queries whose only green row is from
# round 2 (rotated past round 3's 50-slot cap — the stalest evidence
# in the repo), then (b) everything whose code changes THIS round: the
# banded dedup family (hot-bucket cap), the similarity family (LSH
# candidate dedup on ids, re-rank path), etl_token_metadata (staged
# projection merge), and the composite pipeline that embeds the capped
# dedup. The relational/window core checked green in round 3 with
# unchanged code sits last. r03 ∪ r04 again covers all 82.
_FRONT = [
    # r02-only green rows — stalest, refresh first
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "join_semi",
    "join_anti",
    "join_theta",
    "asof_join",
    "window_topk",
    "sliding_window",
    "tumbling_window",
    "sessionize",
    "rollup_agg",
    "cube_agg",
    "grouping_sets",
    "pivot",
    "unpivot",
    "collect_sorted",
    "percentiles_stddev",
    "text_metrics",
    "lang_id",
    "doc_length_histogram",
    # touched in round 4: hot-bucket caps (dedup bands), LSH/IVF
    # candidate handling, exact-cosine re-rank, T4 projection merge
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_exact",
    "dedup_jaccard_ngram",
    "pipeline_clean_corpus",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_cosine_ivf",
    "embedding_cosine_pairs",
    "embedding_quantize_int8",  # NEW round 4 — needs its first row
    "dup_span_stats",  # NEW round 4 — needs its first row
    "ann_cosine_pq",  # NEW round 4 — needs its first row
    "ann_cosine_ivf_pq",  # NEW round 4 — needs its first row
    "dedup_components",  # NEW round 4 — needs its first row
    "chunk_documents",  # NEW round 4 — needs its first row
    "split_train_val_test",  # NEW round 4 — needs its first row
    "salted_join_orders",  # NEW round 4 — needs its first row
    "q6_revenue_delta",  # NEW round 4 — needs its first row
    "q10_returned_items",  # NEW round 4 — needs its first row
    "q14_promo_share",  # NEW round 4 — needs its first row
    "etl_token_metadata",
    "etl_offchain_uri",
    # fixture-fed decode family: unchanged code but shares fixture +
    # decoder modules with the T4 merge — keep its evidence fresh
    "etl_snapshot_scan",
    "etl_account",
    "etl_token_account",
    "etl_token_mint",
    "etl_token_multisig",
    "etl_program_elfs",
    "etl_csv_projection",
    "etl_deletion_events",
    "etl_opcode_stats",
    "stream_selected_accounts",
    "stream_offchain_fanout",
    "stream_rooted_slots",
    "stream_block_metadata",
    "stream_tx_filtered",
    "stream_tx_nested",
    "media_meta",
    "media_frame_sample",
    "media_features",
    # r03-green, untouched this round — rotate past the 50 cap. With 82
    # declared, the cap lands after etl_csv_projection: everything from
    # etl_deletion_events down (etl_deletion_events, etl_opcode_stats,
    # all stream_*, all media_*) falls past it — all r03-green with
    # unchanged code. Plus, unlisted:
    # window_running/rank_ties/moving/values, setops, scalar/string/
    # date_funcs, json_extract, distinct_topk, above_avg_orders,
    # top_supplier_per_nation, exists/in_subquery, conditional_agg,
    # explode_tokens, null_handling, limit_offset, bigram_stats,
    # sample_balanced_lang, doc_fingerprint. Round 5 must front-load
    # ALL of these (~32) first.
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
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(relational2.ORACLES)
    out.update(solana.oracles())
    out.update(llm_ops.ORACLES)
    return _ordered(out)
