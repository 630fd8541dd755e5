"""Model-based document quality filtering — the classifier tier of a
pretraining pipeline (GPT-3 Appendix A; LLaMA / RefinedWeb data cards:
a linear classifier over hashed bag-of-words scores every crawl
document against a curated positive set, then a stochastic Pareto
rule keeps high-scoring docs without a hard cliff).

The heuristic tiers already exist (`functions/text.py:quality_score`,
`operators/quality.py` Gopher rules); this adds the LEARNED tier as an
idiomatic ``pyspark.ml`` Pipeline — fastText-style features (lowercase
word unigrams + bigrams, feature-hashed into a fixed dim) into
L-BFGS-trained logistic regression. Everything is JVM-side: tokenize /
NGram / HashingTF / LR transform are all catalyst-planned stages, no
Python in the hot path at train OR serve time.

Scale notes: training is MLlib's distributed L-BFGS (tree-aggregated
gradients, the same partial-agg shape as `operators/cluster.py`'s
hand-rolled k-means — here the battle-tested implementation is the
right choice because the algorithm IS the standard one); scoring is a
narrow per-row transform; the Pareto keep rule is a deterministic
hash-uniform column expression, so reruns and shard appends keep
identical documents (same property as `operators/sampling.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 2**18
TOKEN_PATTERN = r"\W+"


def _pipeline(text_col: str, label_col: str, dim: int, reg: float,
              elastic_net: float, max_iter: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, SQLTransformer

    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="_qm_tokens",
                pattern=TOKEN_PATTERN,
                toLowercase=True,
                minTokenLength=1,
            ),
            NGram(n=2, inputCol="_qm_tokens", outputCol="_qm_bigrams"),
            SQLTransformer(
                statement="SELECT *, concat(_qm_tokens, _qm_bigrams) "
                "AS _qm_terms FROM __THIS__"
            ),
            HashingTF(
                inputCol="_qm_terms", outputCol="_qm_features", numFeatures=dim
            ),
            LogisticRegression(
                featuresCol="_qm_features",
                labelCol=label_col,
                regParam=reg,
                elasticNetParam=elastic_net,
                maxIter=max_iter,
                standardization=False,  # hashed counts share a scale;
                # standardizing 2^18 sparse dims densifies the summary
            ),
        ]
    )


def quality_model_train(
    labeled_docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = FEATURE_DIM,
    reg: float = 1e-4,
    elastic_net: float = 0.0,
    max_iter: int = 100,
):
    """Fit the quality classifier on (text, label ∈ {0.0, 1.0}) rows —
    label 1 = curated/high-quality positives, 0 = raw-crawl negatives
    (the GPT-3 setup). Returns a ``PipelineModel`` (MLlib-persistable
    via ``model.write().save(path)``)."""
    model = _pipeline(text_col, label_col, dim, reg, elastic_net, max_iter).fit(
        labeled_docs.withColumn(label_col, F.col(label_col).cast("double"))
    )
    # strip the training summary: it pins the SparkSession (and its
    # non-serializable ObservationManager) inside the LR stage, and
    # transform()'s probability UDF closure captures the model — on a
    # session where any Observation ever ran, every later scoring
    # task then dies with "Task not serializable". The summary also
    # pins the training predictions DataFrame on the driver. (A
    # save/load roundtrip drops it too; this avoids the I/O.)
    lr = model.stages[-1]
    try:
        empty = labeled_docs.sparkSession._jvm.scala.Option.empty()
        lr._java_obj.setSummary(empty)
    except Exception:  # accessor moved in a future Spark: fall back
        pass  # to serialization working on observation-free sessions
    return model


def quality_model_score(
    docs: DataFrame, model, text_col: str = "text"
) -> DataFrame:
    """All input columns + ``quality_prob`` (P(label=1)); null text
    scores as the empty document (skip-not-fail)."""
    from pyspark.ml.functions import vector_to_array

    # the pipeline's tokenizer needs a non-null text_col; score on a
    # coalesced copy but return the ORIGINAL column — a null text must
    # come back null, not '' (downstream null/empty accounting)
    prepared = docs.withColumn("_qm_orig", F.col(text_col)).withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    # element_at is 1-based; class 1's probability is the second slot
    scored = model.transform(prepared).withColumn(
        "quality_prob",
        F.element_at(vector_to_array("probability"), 2),
    )
    return scored.select(
        *[
            F.col("_qm_orig").alias(text_col) if c == text_col else F.col(c)
            for c in docs.columns
        ],
        "quality_prob",
    )


def pareto_keep(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """The GPT-3 Appendix-A keep rule: a document is kept iff
    ``pareto(alpha) > 1 - score`` — high-quality docs are (almost)
    always kept, low-quality docs still leak through occasionally, so
    the tail of the distribution is represented instead of cliffed.

    Deterministic: the Pareto draw is the inverse-CDF transform
    ``(1-u)^(-1/alpha) - 1`` of a hash-uniform in (0,1) keyed by
    (id, seed) — identical decisions on rerun or shard append, the
    same contract as ``operators/sampling.py``."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 32)) + 0.5
    ) / F.lit(float(1 << 32))
    pareto = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return scored.filter(pareto > (1.0 - F.col(score_col)))


def quality_model_filter(
    docs: DataFrame,
    model,
    text_col: str = "text",
    threshold: float | None = None,
    alpha: float | None = 9.0,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Score-and-keep in one call: hard ``threshold`` cut when given,
    else the Pareto rule with ``alpha`` (the GPT-3 default shape)."""
    scored = quality_model_score(docs, model, text_col)
    if threshold is not None:
        return scored.filter(F.col("quality_prob") >= threshold)
    if alpha is None:
        raise ValueError("give threshold or alpha")
    return pareto_keep(scored, id_col=id_col, alpha=alpha, seed=seed)
