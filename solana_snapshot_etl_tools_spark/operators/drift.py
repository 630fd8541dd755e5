"""Corpus DISTRIBUTION drift between two snapshots (PSI report).

The third leg of the corpus-comparison stack: ``operators/diff.py``
answers "which ROWS changed", ``operators/profile.py`` answers "what
are the summary stats" — this answers "did the DISTRIBUTIONS shift",
the question a pipeline owner asks when a new crawl/filter/source
lands before retraining on it. The metric is PSI (population
stability index, the standard drift alarm: ``Σ (p_new - p_old) ·
ln(p_new / p_old)`` per feature) over narrow per-document features:

- ``len_log2`` — floor(log2(text length)) buckets (doc-length shape);
- ``punct_ratio`` / ``digit_ratio`` / ``upper_ratio`` — 10 fixed-width
  buckets of the quality-heuristic character ratios;
- ``lang`` — categorical shares (when a language column exists).

Conventional reading (industry rule of thumb, surfaced as ``level``):
PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift.

Scale shape: each corpus contributes ONE projection computing the
per-doc features (no token explode, no text shuffle) followed by a
groupBy on (feature, bin) — a kilobyte histogram regardless of corpus
size. The drift join is kilobyte × kilobyte. Laplace smoothing
(``+0.5`` per bin over the UNION of bins) keeps the log finite when a
bin exists on one side only — exactly the bins drift reports exist to
catch.

Reference scope note: the reference ETL has no analog; this is part
of the training-data surface the Spark engine adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RATIO_FEATURES = ("punct_ratio", "digit_ratio", "upper_ratio")
RATIO_BINS = 10

PSI_MODERATE = 0.1
PSI_MAJOR = 0.25


def _ratio_bin(num, den) -> F.Column:
    r = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    # 10 fixed-width bins over [0, 1]; ratio==1.0 folds into the top
    return F.least(F.floor(r * RATIO_BINS), F.lit(RATIO_BINS - 1)).cast(
        "string"
    )


def feature_histograms(
    df: DataFrame,
    *,
    text_col: str = "text",
    lang_col: str | None = None,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """(feature, bin, n) histogram rows — ONE narrow pass over the
    corpus, one groupBy on kilobyte keys. ``bin`` is a string so
    numeric buckets and categorical values share one frame. ``by``
    adds grouping columns (e.g. the ingest store's ``batch``) so one
    pass yields one histogram per group."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    length = F.length(t)
    n_punct = length - F.length(F.regexp_replace(t, r"[\p{Punct}]", ""))
    n_digit = length - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = length - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    feats = [
        F.struct(
            F.lit("len_log2").alias("feature"),
            F.when(length > 0, F.floor(F.log2(length)))
            .otherwise(F.lit(-1))
            .cast("string")
            .alias("bin"),
        ),
        F.struct(
            F.lit("punct_ratio").alias("feature"),
            _ratio_bin(n_punct, length).alias("bin"),
        ),
        F.struct(
            F.lit("digit_ratio").alias("feature"),
            _ratio_bin(n_digit, length).alias("bin"),
        ),
        F.struct(
            F.lit("upper_ratio").alias("feature"),
            _ratio_bin(n_upper, length).alias("bin"),
        ),
    ]
    if lang_col is not None:
        feats.append(
            F.struct(
                F.lit("lang").alias("feature"),
                F.coalesce(F.col(lang_col), F.lit("<null>")).alias("bin"),
            )
        )
    return (
        df.select(*by, F.explode(F.array(*feats)).alias("_f"))
        .groupBy(
            *by,
            F.col("_f.feature").alias("feature"),
            F.col("_f.bin").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    *,
    text_col: str = "text",
    lang_col: str | None = None,
) -> DataFrame:
    """Per-(feature, bin) drift rows between two corpora:
    ``(feature, bin, n_old, n_new, share_old, share_new, psi_term)``.

    Shares are Laplace-smoothed (+0.5 per bin over the union of each
    feature's bins) so one-sided bins — new languages, new length
    regimes, the exact shifts worth alarming on — contribute finite,
    large PSI terms instead of dividing by zero.

    At 100 TB, don't rescan the old corpus per comparison: persist its
    ``feature_histograms`` once (kilobytes) and use
    ``drift_vs_reference`` — same math, reference side is an artifact
    read."""
    h_old = feature_histograms(old, text_col=text_col, lang_col=lang_col)
    h_new = feature_histograms(new, text_col=text_col, lang_col=lang_col)
    return histogram_drift(h_old, h_new)


def drift_vs_reference(
    new: DataFrame,
    reference_hist: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Drift of ``new`` against a PERSISTED reference histogram
    (``feature_histograms`` output saved as parquet) — the scale-right
    shape: the reference corpus is scanned exactly once in its life,
    every later comparison (a new shard, a micro-batch in the ingest
    stream via ``foreachBatch``) reads the kilobyte artifact instead.
    Features compared are exactly those present in the reference
    (``lang`` rides along automatically when the reference recorded
    it and ``new`` has the column)."""
    feats = {r.feature for r in reference_hist.select("feature").distinct().collect()}
    lang_col = "lang" if "lang" in feats and "lang" in new.columns else None
    h_new = feature_histograms(new, text_col=text_col, lang_col=lang_col)
    if lang_col is None and "lang" in feats:
        reference_hist = reference_hist.filter(F.col("feature") != "lang")
    return histogram_drift(reference_hist, h_new)


def histogram_drift(
    h_old: DataFrame, h_new: DataFrame, by: tuple[str, ...] = ()
) -> DataFrame:
    """The PSI core over two (feature, bin, n) histogram frames —
    kilobyte × kilobyte regardless of the corpora behind them.

    ``by`` names extra grouping columns carried by ``h_new`` (e.g.
    ``("batch",)`` for the ingest stream's per-arrival histograms):
    the reference is compared against EVERY group in one plan (a
    cross-join of two kilobyte frames — the one place a cross-join is
    the right tool) and PSI windows partition per group."""
    by = tuple(by)
    if by:
        groups = h_new.select(*by).distinct()
        h_old = groups.crossJoin(h_old)
    keys = [*by, "feature", "bin"]
    joined = (
        h_old.withColumnRenamed("n", "n_old")
        .join(
            h_new.withColumnRenamed("n", "n_new"),
            keys,
            "full_outer",
        )
        .select(
            *by,
            "feature",
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*by, "feature")
    tot_old = F.sum("n_old").over(w)
    tot_new = F.sum("n_new").over(w)
    nbins = F.count(F.lit(1)).over(w)
    p_old = (F.col("n_old") + F.lit(0.5)) / (tot_old + 0.5 * nbins)
    p_new = (F.col("n_new") + F.lit(0.5)) / (tot_new + 0.5 * nbins)
    return joined.select(
        *by,
        "feature",
        "bin",
        "n_old",
        "n_new",
        p_old.alias("share_old"),
        p_new.alias("share_new"),
        ((p_new - p_old) * F.log(p_new / p_old)).alias("psi_term"),
    )


def drift_summary(drift: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """(feature, psi, n_bins, level) — one row per feature (per
    ``by`` group when given), ``level`` the conventional PSI reading:
    stable (< 0.1), moderate (< 0.25), major (>= 0.25)."""
    by = tuple(by)
    psi = F.sum("psi_term")
    return (
        drift.groupBy(*by, "feature")
        .agg(
            psi.alias("psi"),
            F.count(F.lit(1)).alias("n_bins"),
        )
        .select(
            *by,
            "feature",
            "psi",
            "n_bins",
            F.when(F.col("psi") < PSI_MODERATE, "stable")
            .when(F.col("psi") < PSI_MAJOR, "moderate")
            .otherwise("major")
            .alias("level"),
        )
    )
