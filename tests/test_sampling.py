"""balanced_sample (operators/sampling.py): exact agreement with the
declared sample_balanced_lang semantics, target mode, determinism,
and the cluster-then-balance composition."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from solana_snapshot_etl_tools_spark.operators.sampling import (
    balanced_sample,
    mix_corpora,
    temperature_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _skewed(spark):
    rows = [(i, "big" if i % 10 else "small") for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, stratum string")


def test_matches_declared_query_semantics(spark):
    """On the real corpus, the generic operator with the lang stratum
    must select EXACTLY the ids of the declared sample_balanced_lang
    query (same hash, same threshold)."""
    from solana_snapshot_etl_tools_spark.functions import text as TXT
    from solana_snapshot_etl_tools_spark.plans import llm_ops as L

    declared = {r.doc_id for r in L.q_sample_balanced_lang(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", TXT.lang_id(F.col("text")).alias("lang_pred")
    )
    got = {r.doc_id for r in balanced_sample(docs, "lang_pred").collect()}
    assert got == declared and len(got) > 0


def test_equalizes_to_smallest_stratum(spark):
    out = balanced_sample(_skewed(spark), "stratum").groupBy("stratum").count()
    sizes = {r.stratum: r["count"] for r in out.collect()}
    # the small stratum (100 rows) passes through whole; the big one
    # (900) lands near 100 in expectation
    assert sizes["small"] == 100
    assert 60 <= sizes["big"] <= 140


def test_target_mode_and_pass_through(spark):
    sizes = {
        r.stratum: r["count"]
        for r in balanced_sample(_skewed(spark), "stratum", target=50)
        .groupBy("stratum")
        .count()
        .collect()
    }
    assert 25 <= sizes["big"] <= 80 and 25 <= sizes["small"] <= 75
    # target above every stratum: everything survives
    assert balanced_sample(_skewed(spark), "stratum", target=10_000).count() == 1000


def test_deterministic_and_append_stable(spark):
    df = _skewed(spark)
    a = {r.doc_id for r in balanced_sample(df, "stratum").collect()}
    b = {r.doc_id for r in balanced_sample(df.repartition(7), "stratum").collect()}
    assert a == b
    # appending rows to ONE stratum never flips survivors in the other
    extra = spark.createDataFrame(
        [(10_000 + i, "big") for i in range(500)], "doc_id long, stratum string"
    )
    c = {
        r.doc_id
        for r in balanced_sample(df.unionAll(extra), "stratum").collect()
    }
    assert {i for i in a if i % 10 == 0} == {i for i in c if i < 1000 and i % 10 == 0}


def test_null_stratum_is_a_stratum(spark):
    """Rows with a NULL stratum must be counted and sampled as their
    own stratum, never silently dropped by the count join."""
    rows = [(i, None if i < 50 else "en") for i in range(650)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = balanced_sample(df, "stratum").collect()
    nulls = [r.doc_id for r in out if r.stratum is None]
    assert len(nulls) == 50  # smallest stratum passes through whole
    ens = [r for r in out if r.stratum == "en"]
    assert 20 <= len(ens) <= 90
    # target mode keeps NULL rows too
    out2 = balanced_sample(df, "stratum", target=1000)
    assert out2.count() == 650


def test_temperature_alpha_one_is_identity(spark):
    """alpha=1 with the default feasible total keeps natural
    proportions — i.e. everything survives (pure downsampling never
    reshapes a mixture that is already at its natural shape)."""
    df = _skewed(spark)
    assert temperature_sample(df, "stratum", alpha=1.0).count() == 1000


def test_temperature_alpha_zero_equals_balanced(spark):
    """alpha=0 (uniform over strata) must select EXACTLY the
    balanced_sample survivors — same hash, same threshold."""
    df = _skewed(spark)
    a = {r.doc_id for r in balanced_sample(df, "stratum").collect()}
    b = {r.doc_id for r in temperature_sample(df, "stratum", alpha=0.0).collect()}
    assert a == b


def test_temperature_flattens_but_preserves_order(spark):
    """0 < alpha < 1 keeps the big stratum bigger, but lifts the tail
    share above natural: share_small grows from 10% toward 50%."""
    df = _skewed(spark)
    out = temperature_sample(df, "stratum", alpha=0.5, total=400)
    sizes = {r.stratum: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert sizes["big"] > sizes["small"]
    small_share = sizes["small"] / (sizes["small"] + sizes["big"])
    assert 0.15 < small_share < 0.45  # natural is 0.10, uniform 0.50
    # deterministic across layouts
    again = temperature_sample(df.repartition(9), "stratum", alpha=0.5, total=400)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_temperature_stratum_cardinality_cap(spark):
    """A high-cardinality stratum column (here: the id itself) must
    fail loudly BEFORE the driver-side collect, not OOM silently; a
    deliberate max_strata raise re-enables it."""
    rows = [(i, f"s{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    with pytest.raises(ValueError, match="distinct strata"):
        temperature_sample(df, "stratum", max_strata=10)
    assert temperature_sample(df, "stratum", alpha=0.0, max_strata=50).count() == 50


def _src(spark, n, start=0):
    return spark.createDataFrame(
        [(start + i, f"doc {start + i}") for i in range(n)],
        "doc_id long, text string",
    )


def test_mix_corpora_rates_and_feasibility(spark):
    """70/30 mixture of a large and a small source: the default total
    is the largest pure-downsampling size (limited by the small
    source), rates land near the weights, and the limiting source is
    included whole."""
    web, books = _src(spark, 2000), _src(spark, 300, start=10_000)
    out = mix_corpora([("web", web, 0.7), ("books", books, 0.3)])
    sizes = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert sizes["books"] == 300  # limiting source fully included
    expect_web = 300 / 0.3 * 0.7
    assert abs(sizes["web"] - expect_web) < 0.25 * expect_web
    assert out.columns == ["doc_id", "text", "source"]


def test_mix_corpora_is_deterministic_and_salted_per_source(spark):
    """Same ids in two sources must NOT be selected identically — the
    per-source salt decorrelates the acceptance sets."""
    a, b = _src(spark, 1000), _src(spark, 1000)  # identical id ranges
    out = mix_corpora([("a", a, 1.0), ("b", b, 1.0)], total=1000)
    ids = {
        s: {r.doc_id for r in out.filter(F.col("source") == s).collect()}
        for s in ("a", "b")
    }
    overlap = len(ids["a"] & ids["b"]) / max(1, len(ids["a"]))
    assert 0.25 < overlap < 0.75, overlap  # ~random, not ~1.0
    again = mix_corpora(
        [("a", a.repartition(7), 1.0), ("b", b, 1.0)], total=1000
    )
    assert {(r.doc_id, r.source) for r in out.collect()} == {
        (r.doc_id, r.source) for r in again.collect()
    }


def test_mix_corpora_validation(spark):
    a = _src(spark, 10)
    with pytest.raises(ValueError, match="schema"):
        mix_corpora([("a", a, 1.0), ("b", a.drop("text"), 1.0)])
    with pytest.raises(ValueError, match="positive"):
        mix_corpora([("a", a, 0.0)])
    with pytest.raises(ValueError, match="duplicate"):
        mix_corpora([("a", a, 1.0), ("a", _src(spark, 5, 100), 1.0)])
    with pytest.raises(ValueError, match="negative"):
        mix_corpora([("a", a, 2.0), ("b", _src(spark, 5, 100), -1.0)])
    with pytest.raises(ValueError, match="'source'"):
        mix_corpora([("a", a.withColumn("source", F.lit("x")), 1.0)])
    # zero-weight source contributes nothing but doesn't error
    out = mix_corpora([("a", a, 1.0), ("b", _src(spark, 10, 100), 0.0)])
    assert {r.source for r in out.collect()} == {"a"}


def test_mix_corpora_infeasible_total_raises_with_shortfall(spark):
    """An explicit total that over-asks a source must not silently cap
    (the realized mixture would be off-weight with no signal): it
    raises naming the short sources, and allow_shortfall=True opts
    into the capped behavior."""
    a, b = _src(spark, 1000), _src(spark, 50, start=5000)
    # 50/50 of total=400 wants 200 from b, which has 50
    with pytest.raises(ValueError, match=r"b: wants 200 has 50"):
        mix_corpora([("a", a, 1.0), ("b", b, 1.0)], total=400)
    out = mix_corpora(
        [("a", a, 1.0), ("b", b, 1.0)], total=400, allow_shortfall=True
    )
    sizes = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert sizes["b"] == 50  # over-asked source included whole
    assert abs(sizes["a"] - 200) < 60
    # the default (feasible) total never triggers the guard
    assert mix_corpora([("a", a, 1.0), ("b", b, 1.0)]).count() > 0


def test_temperature_empty_input_returns_empty(spark):
    df = _skewed(spark).filter(F.lit(False))
    assert temperature_sample(df, "stratum").count() == 0


def test_temperature_handles_null_stratum(spark):
    rows = [(i, None if i < 100 else "en") for i in range(700)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = temperature_sample(df, "stratum", alpha=0.0)
    sizes = {r.stratum: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert sizes.get(None) == 100  # smallest stratum intact


def test_cluster_then_balance_composition(spark):
    """The corpus-mixture recipe end-to-end: k-means domains over the
    real embeddings, then per-cluster balancing with a target."""
    from solana_snapshot_etl_tools_spark.operators import cluster as C

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    model = C.kmeans_fit(emb, 3, max_iter=4, seed=3)
    assigned = C.kmeans_assign(emb, model)
    out = balanced_sample(assigned, "cluster_id", id_col="vec_id", target=20)
    sizes = [r["count"] for r in out.groupBy("cluster_id").count().collect()]
    assert len(sizes) == 3 and all(5 <= s <= 45 for s in sizes)
    assert out.columns == assigned.columns  # rows survive intact


def test_upsample_corpus_fractional(spark):
    import pytest as _pytest

    from solana_snapshot_etl_tools_spark.operators.sampling import upsample_corpus

    n = 2000
    df = spark.range(n).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    out = upsample_corpus(df, 2.5)
    per_doc = {r.doc_id: r.cnt for r in out.groupBy("doc_id").agg(
        F.count("*").alias("cnt")).collect()}
    assert set(per_doc.values()) <= {2, 3}
    total = sum(per_doc.values())
    assert abs(total - 2.5 * n) < 5 * (0.25 * n) ** 0.5  # binomial bound
    # deterministic on rerun, different under another seed
    again = upsample_corpus(df, 2.5).groupBy("doc_id").agg(F.count("*").alias("cnt"))
    assert {(r.doc_id, r.cnt) for r in again.collect()} == set(per_doc.items())
    other = upsample_corpus(df, 2.5, seed=9).groupBy("doc_id").agg(
        F.count("*").alias("cnt"))
    assert {(r.doc_id, r.cnt) for r in other.collect()} != set(per_doc.items())
    # epochs are 1-based and unique per (id, epoch)
    assert out.filter(F.col("epoch") < 1).count() == 0
    assert out.select("doc_id", "epoch").distinct().count() == total

    # integer factor is exact; factor < 1 downsamples
    assert upsample_corpus(df, 2.0).count() == 2 * n
    down = upsample_corpus(df, 0.3).count()
    assert abs(down - 0.3 * n) < 5 * (0.21 * n) ** 0.5
    with _pytest.raises(ValueError):
        upsample_corpus(df, 0.0)


def test_stratified_split_exact_counts(spark):
    from solana_snapshot_etl_tools_spark.operators.sampling import stratified_split

    # skewed strata incl. a tiny one and a NULL stratum
    rows = (
        [(i, "en") for i in range(1000)]
        + [(10_000 + i, "fr") for i in range(100)]
        + [(20_000 + i, "sw") for i in range(7)]
        + [(30_000 + i, None) for i in range(23)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_split(df, "lang", train_pct=80, val_pct=10)
    assert out.count() == len(rows)  # exhaustive
    got = {
        (r.lang, r.split): r.n
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    for lang, t in (("en", 1000), ("fr", 100), ("sw", 7), (None, 23)):
        n_tr = t * 80 // 100
        n_val = t * 90 // 100 - n_tr
        assert got.get((lang, "train"), 0) == n_tr, (lang, got)
        assert got.get((lang, "val"), 0) == n_val, (lang, got)
        assert got.get((lang, "test"), 0) == t - n_tr - n_val, (lang, got)
    # the tiny stratum kept an exact held-out share (80/10 of 7 = 5/1/1)
    assert got[("sw", "val")] == 1 and got[("sw", "test")] == 1

    # deterministic across reruns and partitionings; seed changes
    # membership but not counts
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {
        (r.doc_id, r.split)
        for r in stratified_split(
            df.repartition(17), "lang", train_pct=80, val_pct=10
        ).collect()
    }
    assert a == b
    c = {
        (r.doc_id, r.split)
        for r in stratified_split(
            df, "lang", train_pct=80, val_pct=10, seed=5
        ).collect()
    }
    assert c != a
    assert {s for _, s in c} == {"train", "val", "test"}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_split(df, "lang", train_pct=80, val_pct=30)


def test_stratified_split_property(spark):
    """Hypothesis: for ANY strata sizes and percentages, the split is
    exhaustive, disjoint, and floor-exact per stratum."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from solana_snapshot_etl_tools_spark.operators.sampling import (
        stratified_split,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        sizes=st.lists(st.integers(1, 40), min_size=1, max_size=4),
        tr=st.integers(0, 100),
        extra=st.integers(0, 100),
    )
    def check(sizes, tr, extra):
        va = min(100 - tr, extra)
        rows, nid = [], 0
        for s_i, n in enumerate(sizes):
            for _ in range(n):
                rows.append((nid, f"s{s_i}"))
                nid += 1
        df = spark.createDataFrame(rows, "doc_id long, stratum string")
        out = stratified_split(
            df, "stratum", train_pct=tr, val_pct=va, seed=nid
        ).collect()
        assert len(out) == len(rows)
        assert len({r.doc_id for r in out}) == len(rows)
        per: dict = {}
        for r in out:
            per.setdefault(r.stratum, {}).setdefault(r.split, 0)
            per[r.stratum][r.split] += 1
        for s_i, n in enumerate(sizes):
            got = per[f"s{s_i}"]
            n_tr = n * tr // 100
            n_va = n * (tr + va) // 100 - n_tr
            assert got.get("train", 0) == n_tr
            assert got.get("val", 0) == n_va
            assert got.get("test", 0) == n - n_tr - n_va

    check()


def test_stratified_split_loud_driver_row_cap(spark):
    """VERDICT r6 item 3: a high-cardinality stratum column errors
    loudly instead of collecting ranges x strata rows driver-side; a
    deliberate max_driver_rows raise re-enables it (the
    temperature_sample cap contract)."""
    import pytest as _pytest

    from solana_snapshot_etl_tools_spark.operators.sampling import (
        stratified_split,
    )

    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(60)], ["doc_id", "stratum"]
    )
    with _pytest.raises(ValueError, match="driver-side"):
        stratified_split(df, "stratum", max_driver_rows=10)
    out = stratified_split(
        df, "stratum", train_pct=50, val_pct=25, max_driver_rows=1000
    )
    assert out.count() == 60


# --- target_mixture_sample -----------------------------------------------------


def _mixture_frame(spark):
    # web 700, code 200, books 60, junk 40 (unlisted), one NULL row
    rows = (
        [(i, "web") for i in range(700)]
        + [(1000 + i, "code") for i in range(200)]
        + [(2000 + i, "books") for i in range(60)]
        + [(3000 + i, "junk") for i in range(40)]
        + [(4000, None)]
    )
    return spark.createDataFrame(rows, "doc_id long, stratum string")


def _expected_ids(df, targets_by_stratum):
    """The operator's exact keep rule replayed row-by-row:
    knuth_hash(id) * n_stratum < tgt_stratum * 2^32."""
    from solana_snapshot_etl_tools_spark.functions.hashing import (
        _2_32,
        knuth_hash32,
    )

    rows = df.select(
        "doc_id", "stratum", knuth_hash32(F.col("doc_id")).alias("h")
    ).collect()
    counts: dict = {}
    for r in rows:
        counts[r.stratum] = counts.get(r.stratum, 0) + 1
    keep = set()
    for r in rows:
        t = targets_by_stratum.get(r.stratum)
        if t is None:
            continue
        tgt = min(counts[r.stratum], t)
        if float(r.h) * counts[r.stratum] < tgt * float(_2_32):
            keep.add(r.doc_id)
    return keep


def test_target_mixture_exact_keep_rule_and_scale(spark):
    from solana_snapshot_etl_tools_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    target = {"web": 0.7, "code": 0.2, "books": 0.1}
    out = target_mixture_sample(df, "stratum", target)
    got = {r.doc_id for r in out.collect()}
    # books is the scarcest stratum relative to its share:
    # total = 60 / 0.1 = 600 -> want web 420, code 120, books 60
    want = _expected_ids(
        df, {"web": 600 * 0.7, "code": 600 * 0.2, "books": 600 * 0.1}
    )
    assert got == want
    # unlisted strata (junk, NULL) never survive
    srcs = {r.stratum for r in out.select("stratum").distinct().collect()}
    assert srcs <= {"web", "code", "books"}
    # realized shares near the recipe (hash acceptance is expectation)
    sizes = {
        r.stratum: r["count"]
        for r in out.groupBy("stratum").count().collect()
    }
    assert sizes["books"] == 60  # scarcest passes through whole
    assert 340 <= sizes["web"] <= 500 and 90 <= sizes["code"] <= 150


def test_target_mixture_null_key_and_unnormalized_weights(spark):
    from solana_snapshot_etl_tools_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    # weights need not sum to 1; a None key addresses the NULL stratum
    out = target_mixture_sample(
        df, "stratum", {None: 1.0, "books": 59.0}, total=60
    )
    got = {r.doc_id for r in out.collect()}
    want = _expected_ids(df, {None: 1.0, "books": 59.0})
    assert got == want
    assert 4000 in got  # the single NULL row fills its whole share


def test_target_mixture_shortfall_contract(spark):
    from solana_snapshot_etl_tools_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    # infeasible explicit total names the over-asked strata
    with pytest.raises(ValueError, match="books.*wants 100 has 60"):
        target_mixture_sample(
            df, "stratum", {"web": 0.5, "books": 0.5}, total=200
        )
    # allow_shortfall: books passes whole, web fills its want
    out = target_mixture_sample(
        df, "stratum", {"web": 0.5, "books": 0.5}, total=200,
        allow_shortfall=True,
    )
    sizes = {
        r.stratum: r["count"] for r in out.groupBy("stratum").count().collect()
    }
    assert sizes["books"] == 60
    # a listed stratum absent from the corpus raises...
    with pytest.raises(ValueError, match="no corpus rows"):
        target_mixture_sample(df, "stratum", {"web": 0.9, "wiki": 0.1})
    # ...unless allow_shortfall, which scales to the present strata
    out2 = target_mixture_sample(
        df, "stratum", {"web": 0.9, "wiki": 0.1}, allow_shortfall=True
    )
    assert 0 < out2.count() <= 700
    assert {r.stratum for r in out2.select("stratum").distinct().collect()} == {
        "web"
    }


def test_target_mixture_validation_and_determinism(spark):
    from solana_snapshot_etl_tools_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    with pytest.raises(ValueError, match="non-empty"):
        target_mixture_sample(df, "stratum", {})
    with pytest.raises(ValueError, match="negative"):
        target_mixture_sample(df, "stratum", {"web": -1.0})
    with pytest.raises(ValueError, match="positive"):
        target_mixture_sample(df, "stratum", {"web": 0.0})
    a = {
        r.doc_id
        for r in target_mixture_sample(
            df.repartition(1), "stratum", {"web": 0.5, "code": 0.5}
        ).collect()
    }
    b = {
        r.doc_id
        for r in target_mixture_sample(
            df.repartition(17), "stratum", {"web": 0.5, "code": 0.5}
        ).collect()
    }
    assert a == b and a


def test_target_mixture_property_matches_replay(spark):
    """Hypothesis: on ANY frame and recipe, the kept set equals a
    pure-Python replay of the documented keep rule (per listed
    stratum: tgt = min(n_s, total*w/Σw) with total = min over present
    strata of n_s*Σw/w_s; keep iff knuth_hash(id)*n_s < tgt*2^32)."""
    import pytest as _pytest

    hypothesis = _pytest.importorskip("hypothesis")
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from solana_snapshot_etl_tools_spark.functions.hashing import (
        _2_32,
        knuth_hash32,
    )
    from solana_snapshot_etl_tools_spark.operators.sampling import (
        target_mixture_sample,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", None]),
                st.integers(min_value=0, max_value=2**20),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[1],
        ),
        wa=st.floats(min_value=0.1, max_value=5),
        wb=st.floats(min_value=0.1, max_value=5),
        with_null=st.booleans(),
    )
    def check(rows, wa, wb, with_null):
        target = {"a": wa, "b": wb}
        if with_null:
            target[None] = 1.0
        present = {s for s, _ in rows}
        if not ({"a", "b"} | ({None} if with_null else set())) <= present:
            return  # absent listed strata raise by contract; covered elsewhere
        df = spark.createDataFrame(
            [(i, s) for s, i in rows], "doc_id long, stratum string"
        )
        hashes = {
            r.doc_id: r.h
            for r in df.select(
                "doc_id", knuth_hash32(F.col("doc_id")).alias("h")
            ).collect()
        }
        counts: dict = {}
        for s, _ in rows:
            counts[s] = counts.get(s, 0) + 1
        wsum = sum(target.values())
        total = int(min(counts[s] * wsum / w for s, w in target.items()))
        keep = set()
        for s, i in rows:
            if s not in target:
                continue
            tgt = min(counts[s], total * target[s] / wsum)
            if float(hashes[i]) * counts[s] < tgt * float(_2_32):
                keep.add(i)
        got = {
            r.doc_id
            for r in target_mixture_sample(df, "stratum", target)
            .select("doc_id").collect()
        }
        assert got == keep

    check()


# --- token-budget planning ---------------------------------------------------

from solana_snapshot_etl_tools_spark.operators.sampling import (
    apply_token_budget_plan,
    token_budget_plan,
)


def _budget_corpus(spark):
    rows = (
        [(i, "web", "w " * 10) for i in range(1000)]          # 10k tokens
        + [(2000 + i, "wiki", "k " * 20) for i in range(50)]  # 1k tokens
        + [(3000 + i, "code", "c " * 5) for i in range(100)]  # 500 tokens
        + [(4000 + i, None, "n " * 10) for i in range(20)]    # NULL source
    )
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_token_budget_plan_math(spark):
    docs = _budget_corpus(spark)
    plan = token_budget_plan(
        docs, {"web": 7, "wiki": 2, "code": 1}, budget_tokens=5000
    )
    s = plan["sources"]
    assert s["web"]["available_tokens"] == 10_000
    assert s["wiki"]["available_tokens"] == 1_000
    assert s["code"]["available_tokens"] == 500
    assert s["web"]["factor"] == pytest.approx(3500 / 10_000)
    assert s["wiki"]["factor"] == pytest.approx(1000 / 1_000)
    assert s["code"]["factor"] == pytest.approx(500 / 500)
    assert plan["planned_tokens"] == 5000
    assert plan["shortfall_tokens"] == 0
    assert plan["planned_shares"]["web"] == pytest.approx(0.7)

    # scarce high-weight source upsamples; max_epochs caps it and the
    # shortfall is reported, never silently renormalized
    plan2 = token_budget_plan(
        docs, {"web": 1, "code": 1}, budget_tokens=8000
    )
    assert plan2["sources"]["code"]["factor"] == pytest.approx(8.0)
    plan3 = token_budget_plan(
        docs, {"web": 1, "code": 1}, budget_tokens=8000, max_epochs=4
    )
    assert plan3["sources"]["code"]["factor"] == 4.0
    assert plan3["sources"]["code"]["capped"] is True
    assert plan3["shortfall_tokens"] == 2000
    assert plan3["planned_tokens"] == 6000

    # a listed source with zero corpus rows: honest zero + shortfall
    plan4 = token_budget_plan(docs, {"web": 1, "books": 1}, 2000)
    assert plan4["sources"]["books"]["factor"] == 0.0
    assert plan4["shortfall_tokens"] == 1000

    # NULL-source addressing via the None key
    plan5 = token_budget_plan(docs, {None: 1}, 100)
    assert plan5["sources"][None]["available_tokens"] == 200

    import json as _json

    _json.dumps(plan3)  # the plan is JSON-safe by construction

    with pytest.raises(ValueError, match="non-empty"):
        token_budget_plan(docs, {}, 100)
    with pytest.raises(ValueError, match="> 0"):
        token_budget_plan(docs, {"web": 0}, 100)
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_plan(docs, {"web": 1}, 0)
    with pytest.raises(ValueError, match="max_epochs"):
        token_budget_plan(docs, {"web": 1}, 100, max_epochs=0)


def test_apply_token_budget_plan(spark):
    from solana_snapshot_etl_tools_spark.functions.text import token_count

    docs = _budget_corpus(spark)
    plan = token_budget_plan(
        docs, {"web": 1, "wiki": 2, None: 1}, budget_tokens=4000
    )
    out = apply_token_budget_plan(docs, plan)
    got = {
        r.source: r.toks
        for r in out.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("toks"))
        .collect()
    }
    for src in ("web", "wiki", None):
        want = plan["sources"][src]["factor"] * plan["sources"][src][
            "available_tokens"
        ]
        sd = 3 * (plan["sources"][src]["available_tokens"] ** 0.5) * 25
        assert abs(got[src] - want) <= max(sd, 600), (src, got[src], want)
    # unlisted source dropped; epochs 1-based; (id, epoch) unique
    assert out.filter(F.col("source") == "code").count() == 0
    assert out.agg(F.min("epoch")).collect()[0][0] == 1
    n = out.count()
    assert out.select("doc_id", "epoch").distinct().count() == n
    # wiki's factor = 2000/1000 = 2: every wiki doc appears >= 2 times
    wiki_epochs = out.filter(F.col("source") == "wiki").groupBy(
        "doc_id"
    ).count()
    assert wiki_epochs.agg(F.min("count")).collect()[0][0] >= 2
    # determinism + partition invariance
    out2 = apply_token_budget_plan(docs.repartition(17), plan)
    a = sorted((r.doc_id, r.epoch) for r in out.collect())
    b = sorted((r.doc_id, r.epoch) for r in out2.collect())
    assert a == b
    # zero shuffles: broadcast join + generator only
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str.replace("BroadcastExchange", "BX")


def test_cli_token_budget_stage(spark, tmp_path_factory, capsys):
    """--token-budget: the mixture stage plans in tokens, applies the
    downsampling side, and reports the full plan (incl. the >1 epoch
    factors the CLI deliberately does not materialize)."""
    import json as _json

    from solana_snapshot_etl_tools_spark import corpus_cli

    base = tmp_path_factory.mktemp("budget_cli")
    # texts must be unique per doc: the CLI's exact-dedup tier runs
    # before the mixture stage and would collapse identical rows
    rows = (
        [(i, "web", "plain web words " * 4 + f"w{i} x y") for i in range(400)]
        + [(1000 + i, "wiki", "wiki words here " * 4 + f"k{i} x y")
           for i in range(40)]
    )
    src = str(base / "docs")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(src)

    def run(*argv):
        assert corpus_cli.main(list(argv)) == 0
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return _json.loads(out[-1])

    # web: 400x15=6000 tokens, wiki: 40x15=600. budget 3000 at 50/50
    # -> web factor 0.25 (applied), wiki factor 2.5 (reported only)
    rep = run(src, str(base / "out"), "--no-pii", "--quality", "0",
              "--lang", "", "--source-mixture", "web=1,wiki=1",
              "--token-budget", "3000", "--max-epochs", "4")
    plan = rep["token_budget_plan"]
    assert plan["sources"]["web"]["factor"] == pytest.approx(0.25)
    assert plan["sources"]["wiki"]["factor"] == pytest.approx(2.5)
    assert plan["shortfall_tokens"] == 0
    # applied corpus: web downsampled to ~100 docs, wiki whole (clamp)
    n = rep["n_after_source_mixture"]
    assert 40 + 60 <= n <= 40 + 145, n

    # both mixture modes must hand the downstream chain (and thus the
    # output shards) an IDENTICAL schema — --token-budget drops the
    # synthetic 'epoch' AND 'source' exactly where the plain
    # --source-mixture path drops 'source'
    rep_plain = run(src, str(base / "out_plain"), "--no-pii",
                    "--quality", "0", "--lang", "",
                    "--source-mixture", "web=1,wiki=1")

    def shard_schema(out_dir, rep_):
        for name, v in rep_["splits"].items():
            if v["rows"]:
                return spark.read.parquet(f"{out_dir}/{name}").schema
        raise AssertionError("no non-empty split")

    assert shard_schema(str(base / "out"), rep) == shard_schema(
        str(base / "out_plain"), rep_plain
    )

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # budget without mixture
        corpus_cli.main([src, str(base / "o2"), "--token-budget", "100"])
    with _pytest.raises(SystemExit):  # max-epochs without budget
        corpus_cli.main([src, str(base / "o3"), "--source-mixture",
                         "web=1", "--max-epochs", "2"])
