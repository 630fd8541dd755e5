"""Physical-plan regression tests: the scale properties claimed in
README/docstrings must stay true as queries evolve — pushdown reaches
the parquet scan, column pruning drops the fat columns, top-k compiles
to TakeOrderedAndProject, small dims broadcast."""

from __future__ import annotations

import contextlib
import io

from solana_snapshot_etl_tools_spark.plans import relational as R
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark):
    p = _plan(R.q1_pricing_summary(spark, SF_DIR))
    assert "LessThanOrEqual(l_shipdate" in p, "date filter must push to scan"
    # pruning: the 4 unused lineitem columns must not be read
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    for dropped in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert dropped not in read_schema, f"{dropped} should be pruned"


def test_q3_topk_is_take_ordered(spark):
    p = _plan(R.q3_top_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p, "limit+sort must not be a full sort"


def test_q5_small_dims_broadcast(spark):
    p = _plan(R.q5_nation_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in _plan(R.q_semi_join(spark, SF_DIR))
    assert "LeftAnti" in _plan(R.q_anti_join(spark, SF_DIR))


def test_dedup_is_aggregate_not_window(spark, raw_accounts):
    """X3 must stay a (partial-aggregating) max_by, not a window sort:
    the plan should contain HashAggregate/SortAggregate/ObjectHashAggregate
    and no Window node."""
    from solana_snapshot_etl_tools_spark.operators.decoders import (
        dedup_last_write_wins,
    )

    p = _plan(dedup_last_write_wins(raw_accounts))
    assert "Aggregate" in p
    assert "Window" not in p


def test_token_metadata_no_python_stage(spark, raw_accounts):
    """T4 is pure Catalyst since round 3: the plan must contain no
    ArrowEvalPython / BatchEvalPython node (no Python workers in the
    ETL hot path), and the whole decode must sit below an Aggregate
    (the optimizer barrier that keeps user filters from re-inlining
    the staged decode — see decoders.token_metadata_table)."""
    from solana_snapshot_etl_tools_spark.operators.decoders import (
        token_metadata_table,
    )

    p = _plan(token_metadata_table(raw_accounts))
    assert "EvalPython" not in p, "metadata decode must not spawn Python workers"
    assert "Aggregate" in p


def test_ivf_ann_no_cartesian(spark):
    """IVF candidate generation must be an equi-join on list_id — never
    a cross join against the corpus (that is the guarded exact path's
    job). The only allowed nested-loop is the tiny literal centroid
    explode."""
    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.similarity import ivf_ann_topk
    from solana_snapshot_etl_tools_spark.plans.relational import _t

    emb = _t(spark, SF_DIR, "embeddings")
    p = _plan(ivf_ann_topk(emb, emb.filter(F.col("vec_id") < 3), k=3, n_lists=4))
    assert "CartesianProduct" not in p
    assert "CrossJoin" not in p


def test_balanced_sample_has_no_global_window(spark):
    """Stratum sizing must stay a broadcast aggregate join — a global
    window (min over ()) funnels the corpus through one partition."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops import (
        q_sample_balanced_lang,
    )

    p = _plan(q_sample_balanced_lang(spark, SF_DIR))
    assert "Window" not in p, p
    assert "BroadcastHashJoin" in p


def test_asof_is_single_shuffle(spark):
    """The as-of join must not contain a join node at all — it is a
    union + one windowed sort."""
    from solana_snapshot_etl_tools_spark.plans.relational2 import q_asof_join

    p = _plan(q_asof_join(spark, SF_DIR))
    assert "Join" not in p.replace("AdaptiveSparkPlan", "")
    assert "Union" in p and "Window" in p


def test_lsh_ann_candidate_dedup_carries_ids_only(spark):
    """The LSH ANN candidate distinct must shuffle (query_id,
    neighbor_id) pairs only — never the embedding arrays (at 1-4k dims
    the vectors dwarf the ids, and distinct-on-doubles is both slow
    and float-equality-fragile). Vectors rejoin after the dedup, query
    side broadcast."""
    import re

    from pyspark.sql import functions as F

    from solana_snapshot_etl_tools_spark.operators.similarity import lsh_ann_topk
    from solana_snapshot_etl_tools_spark.plans.relational import _t

    emb = _t(spark, SF_DIR, "embeddings")
    p = _plan(lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 3), dims=64, k=3))
    assert "_v_" not in p, "signature vectors leaked into the candidate plan"
    # the dedup is a two-key hash aggregate over the id pair
    assert re.search(r"Keys \[2\]: \[query_id#\d+\w*, neighbor_id#\d+", p), p
    assert "BroadcastHashJoin" in p  # query vectors rejoin broadcast


def test_dup_span_shuffles_carry_hashes_not_text(spark):
    """dup_span_stats claims its wide stages move 8-byte window hashes,
    never the k-char strings: no Exchange in the plan may carry a
    string-typed window column, and xxhash64 must sit below the first
    shuffle."""
    from solana_snapshot_etl_tools_spark.operators import dedup as DD

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = _plan(DD.dup_span_stats(df, "doc_id", "text", k=50))
    assert "xxhash64" in p
    # every Exchange's output columns must be numeric (doc/wh/counts)
    for line in p.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "string" not in line, f"text column in shuffle: {line}"


def test_q6_is_scan_plus_aggregate(spark):
    """TPC-H Q6 must collapse to a pushed-down parquet scan plus a
    partial/final aggregate — no joins, no exchange beyond the single
    aggregation shuffle, date filter at the scan."""
    from solana_snapshot_etl_tools_spark.plans import relational2 as R2

    p = _plan(R2.q6_revenue_delta(spark, SF_DIR))
    assert "Join" not in p
    assert "GreaterThanOrEqual(l_shipdate" in p, "date filter must push to scan"
    assert p.count("Exchange") <= 2  # partial->final agg only


def test_q10_dims_broadcast(spark):
    from solana_snapshot_etl_tools_spark.plans import relational2 as R2

    p = _plan(R2.q10_returned_items(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p  # top-20 must not be a full sort


def test_pii_scrub_is_single_codegen_projection(spark):
    """PII scrub must stay a narrow zero-exchange map (chained
    regexp_replace in one whole-stage-codegen'd projection — no UDF,
    no Python stage, no shuffle)."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops import q_pii_scrub

    p = _plan(q_pii_scrub(spark, SF_DIR))
    assert "Exchange" not in p
    assert "Python" not in p and "ArrowEval" not in p
    assert "codegen id" in p


def test_doc_rarity_joins_distinct_tokens_not_occurrences(spark):
    """The rarity join must aggregate to per-doc DISTINCT tokens
    BEFORE joining the tf table (join volume = Σ distinct per doc,
    not Σ occurrences): both join children must be aggregates."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops import q_doc_rarity

    p = _plan(q_doc_rarity(spark, SF_DIR))
    join_line = [l for l in p.splitlines() if "SortMergeJoin" in l or "ShuffledHashJoin" in l or "BroadcastHashJoin" in l]
    assert join_line, "expected a join in the rarity plan"
    # no generate (explode) may sit between the join and either agg —
    # the explode feeds the aggregates, not the join directly
    gen_after_join = p.split(join_line[0])[0]
    assert "Generate" not in gen_after_join.split("HashAggregate")[0]


def test_cosine_pairs_norms_precomputed_once(spark):
    """cosine_pairs must fold each row's norm BEFORE the pair join —
    the join-side projections carry a scalar norm column, and the
    post-join projection computes only the dot product (one aggregate
    lambda, not three)."""
    from solana_snapshot_etl_tools_spark.operators import similarity as SIM
    from solana_snapshot_etl_tools_spark.plans.relational import _t

    emb = _t(spark, SF_DIR, "embeddings")
    p = _plan(SIM.cosine_pairs(emb, threshold=0.4))
    # the final (post-join) projection computing sim must reference the
    # precomputed na/nb scalars rather than re-folding transform(x*x)
    post_join = p.split("CartesianProduct")[0]
    assert "na" in post_join and "nb" in post_join


def test_q4_exists_is_semi_join(spark):
    """Q4's EXISTS must compile to a left-semi join (never a
    count-then-join or a full inner join + distinct)."""
    from solana_snapshot_etl_tools_spark.plans.relational2 import (
        q4_order_priority,
    )

    p = _plan(q4_order_priority(spark, SF_DIR))
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q19_disjunction_pushed_to_part_scan(spark):
    """Q19's OR-of-ANDs mixes columns of both tables; Catalyst must
    still extract the part-only disjunction and push it into the part
    scan (filtering before the broadcast build side), not filter the
    joined rows only."""
    from solana_snapshot_etl_tools_spark.plans.relational2 import (
        q19_disjunctive_revenue,
    )

    p = _plan(q19_disjunctive_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    part_scan = [
        blk
        for blk in p.split("\n\n")
        if "Scan parquet" in blk and "part.parquet" in blk
    ]
    assert part_scan, "expected a part scan block"
    assert "Or(" in part_scan[0] and "p_brand" in part_scan[0], (
        "part-only disjunction must reach the part scan's PushedFilters"
    )


def test_chunk_cdc_is_narrow_no_wide_shuffle(spark):
    """Content-defined chunking must stay a narrow per-row pipeline:
    one Arrow-batched numpy boundary pass (r16 — replaced the
    interpreted per-position HOF lambda, guide §4.2), no
    row-at-a-time Python, and no shuffle beyond the small-input
    round-robin spread (which is a planning no-op once the scan has
    ≥ core-count partitions — at 100 TB there is no Exchange here)."""
    from solana_snapshot_etl_tools_spark.plans.llm_ops import chunk_cdc

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = _plan(chunk_cdc(df))
    assert "BatchEvalPython" not in p
    assert "MapInPandas" in p or "ArrowEval" in p
    # no keyed (wide) exchange — only the round-robin spread may appear
    assert "hashpartitioning" not in p and "rangepartitioning" not in p


def test_dup_span_single_scan_shuffle_hash(spark):
    """Optimization r16: dup_span_stats' window-frame subtree (scan →
    explode → hash → distinct) is computed ONCE at runtime — with AQE
    off the planner's ReuseExchange rule must dedupe the distinct's
    exchange between the doc-frequency build and the membership probe
    (AQE applies the same reuse at runtime); the membership join is a
    shuffled-hash join (no sort on either side) and there is no Window
    node anywhere."""
    from solana_snapshot_etl_tools_spark.operators import dedup as DD

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = DD.dup_span_stats(df, "doc_id", "text", k=50)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = _plan(q)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ShuffledHashJoin" in p, "membership join must be shuffle-hash"
    assert "ReusedExchange" in p, "the distinct's exchange must be shared"
    assert "Window" not in p
    assert "SortMergeJoin" not in p


def test_decontaminate_shuffles_and_broadcast_carry_hashes_not_grams(spark):
    """Optimization r16: decontaminate keys on xxhash64(gram) — no
    Exchange (shuffle OR broadcast) may carry the gram string; the
    bench probe stays a broadcast hash join."""
    from solana_snapshot_etl_tools_spark.plans import llm_ops2 as L2

    p = _plan(L2.q_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "xxhash64(gram" in p
    for line in p.splitlines():
        if "Exchange" in line:
            assert "gram#" not in line, f"gram string in exchange: {line}"
