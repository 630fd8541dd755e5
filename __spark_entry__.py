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
# Round 17 front-loads the 50 queries whose last green row is round 14
# (they fell past rounds 15's and 16's identical cap — r16's mid-build
# rotation was reverted, so the r15 front ran twice) — exactly
# tools/plan_next_front.py's output; r16 ∪ r17 covers all 100. This
# front deliberately includes every query path the r16 optimization
# round restructured (dup_span_stats, chunk_cdc, decontaminate_ngram,
# pack_sequences, etl_token_metadata, ann_cosine_{topk,lsh,ivf,pq,
# ivf_pq}), putting them under the driver's own oracle per the r16
# verdict's Next-round #7.
_FRONT = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "join_semi",
    "join_anti",
    "join_theta",
    "window_topk",
    "sessionize",
    "rollup_agg",
    "cube_agg",
    "pivot",
    "unpivot",
    "tumbling_window",
    "asof_join",
    "q6_revenue_delta",
    "q10_returned_items",
    "q14_promo_share",
    "sliding_window",
    "grouping_sets",
    "percentiles_stddev",
    "collect_sorted",
    "etl_account",
    "etl_token_account",
    "etl_token_mint",
    "etl_token_multisig",
    "etl_token_metadata",
    "etl_offchain_uri",
    "etl_program_elfs",
    "etl_csv_projection",
    "etl_snapshot_scan",
    "dup_span_stats",
    "dedup_exact",
    "chunk_documents",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_cosine_ivf",
    "ann_cosine_pq",
    "ann_cosine_ivf_pq",
    "embedding_cosine_pairs",
    "text_metrics",
    "lang_id",
    "doc_length_histogram",
    "salted_join_orders",
    "chunk_cdc",
    "decontaminate_ngram",
    "excise_dup_spans",
    "pack_sequences",
    "q18_large_orders",
    "q2_min_cost_supplier",
    "q22_idle_customers",
    # cap (50) lands here — zero slack. Past it: the entire r16-green
    # front (window_{running,rank_ties,moving,values}, setops,
    # scalar/string/date_funcs, json_extract, distinct_topk,
    # above_avg_orders, q4/q19, top_supplier_per_nation,
    # exists/in_subquery, conditional_agg, explode_tokens,
    # null_handling, limit_offset, etl_{deletion_events,opcode_stats},
    # media_* ×3, stream_* ×6, pipeline_* ×2, embedding_quantize_int8,
    # dedup_{jaccard_ngram,minhash_lsh,components,simhash,semantic},
    # ann_cosine_{ivf,pq,ivf_pq}_exact, doc_fingerprint, bigram_stats,
    # sample_balanced_lang, split_train_val_test, pii_scrub,
    # quality_repetition, token_doc_freq, doc_rarity_score).
    # Round-17 code changes to THOSE implementing functions are covered
    # by their r16 green rows only if the function is untouched; any
    # this-round change to one of them needs a driver_sim re-green
    # (tools/driver_sim.py by name) recorded in OPTIMIZATION_r17.md.
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
