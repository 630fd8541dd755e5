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
# declaration order with a cap of 50 per round (of 71 declared), so the
# front of the list rotates each round to keep consecutive-round unions
# covering all queries with the stalest rows refreshed.
#
# Round 3 front-loads (a) the 18 relational queries whose only green
# row is from round 1 (rotated out of round 2's 50-slot window, the
# stalest evidence in the repo), then (b) everything whose inputs or
# code changed THIS round: the fixture-fed queries (fixture DataFrames
# now materialize through a parquet cache), the similarity queries
# (bounded cosine_pairs guard, lsh dims guard), and etl_snapshot_scan
# (bank skip-walk layout fixes). The stable relational core checked
# green in round 2 with unchanged code sits last. r02 ∪ r03 again
# covers all 71.
_FRONT = [
    # r01-only green rows — stalest, refresh first
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
    # touched in round 3: fixture materialization path (all fixture-fed
    # queries), bank.py layout fixes (etl_snapshot_scan), similarity
    # guards (ann_*, embedding_cosine_pairs)
    "etl_snapshot_scan",
    "etl_account",
    "etl_token_account",
    "etl_token_mint",
    "etl_token_multisig",
    "etl_token_metadata",
    "etl_offchain_uri",
    "etl_program_elfs",
    "etl_csv_projection",
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
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_cosine_ivf",  # new this round (IVF coarse-quantizer ANN)
    "embedding_cosine_pairs",
    "dedup_exact",
    "dedup_jaccard_ngram",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "pipeline_clean_corpus",
    "bigram_stats",  # new this round (Gopher-style repetition/rarity)
    "sample_balanced_lang",  # new this round (deterministic mixing)
    "doc_fingerprint",
    # text_metrics / lang_id / doc_length_histogram: green r02,
    # untouched — rotate past the cap this round
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
