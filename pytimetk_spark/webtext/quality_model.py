"""Trained document-quality classifier (GPT-3 / PaLM-style).

The third member of the selection family (alongside the Stupid-Backoff
perplexity gate in ``lm.py`` and DSIR in ``sampling.py``): train a
logistic-regression classifier to distinguish a high-quality TARGET
corpus (positives) from the RAW crawl (negatives) on hashed n-gram
features, score every raw document, and keep documents
Pareto-stochastically — ``keep if score > 1 - X, X ~ Pareto(alpha)`` —
so high-scoring documents are mostly kept but low-scoring ones still
enter with small probability (Brown et al. 2020, GPT-3 appendix A,
which uses alpha = 9; the same recipe appears in PaLM and LLaMA's
"quality classifier" stages).

Scale design: the whole path is JVM-side — uni..max_n-gram arrays are
built with array HOFs, ``pyspark.ml.feature.HashingTF`` buckets them
(MurmurHash3; engine-local is fine here — unlike the samplers this op
has no SQL oracle to mirror), and the classifier is ``pyspark.ml``
LogisticRegression: a distributed L-BFGS fit whose entire model is one
dense coefficient vector of ``n_buckets`` floats that Spark broadcasts
into the scoring projection. No explode, no shuffle in scoring, no
per-row Python. The Pareto draw derives from the deterministic md5
uniform shared with ``sampling.py``, so the keep decision reproduces
across runs and cluster sizes. The iterative fit makes this
pytest-pinned rather than SQL-oracle-checked (same boundary as
BPE/PQ/IVF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pytimetk_spark.webtext.sampling import _u52


def _ngram_array(text_col: str, max_n: int) -> Column:
    """Uni..max_n-gram strings of the textstats tokenization, one array."""
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    toks = F.filter(toks, lambda x: x != "")

    def _joiner(m: int):
        return lambda i: F.array_join(F.slice(F.col("__toks__"), i, m), " ")

    parts = []
    for m in range(1, max_n + 1):
        idx = F.when(
            F.size(F.col("__toks__")) >= m,
            F.sequence(F.lit(1), F.size(F.col("__toks__")) - F.lit(m - 1)),
        ).otherwise(F.expr("array()").cast("array<int>"))
        parts.append(F.transform(idx, _joiner(m)))
    return toks, F.flatten(F.array(*parts))


def _assemble_features(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, max_n: int
) -> DataFrame:
    """(id, features SparseVector of hashed n-gram counts) — HashingTF
    keeps the whole featurization in the JVM."""
    from pyspark.ml.feature import HashingTF

    toks, grams = _ngram_array(text_col, max_n)
    staged = df.select(F.col(id_col), toks.alias("__toks__"))
    staged = staged.select(F.col(id_col), grams.alias("__grams__"))
    tf = HashingTF(
        inputCol="__grams__", outputCol="features", numFeatures=n_buckets
    )
    return tf.transform(staged).select(id_col, "features")


def fit_quality_classifier(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    max_n: int = 2,
    reg_param: float = 0.01,
    max_iter: int = 50,
    balance_classes: bool = True,
):
    """Fit the target-vs-raw LR. Returns the pyspark.ml model (its
    coefficients are the only state — one dense vector of n_buckets).

    ``balance_classes`` (default) weights each class inversely to its
    size — the target corpus is typically orders of magnitude smaller
    than the crawl, and an unweighted fit would push every probability
    toward 0, starving the downstream Pareto rule. Raw documents that
    also appear in the target should be excluded by the caller if ids
    overlap (the standard setup samples negatives from the crawl at
    large)."""
    from pyspark.ml.classification import LogisticRegression

    t = _assemble_features(target, text_col, id_col, n_buckets, max_n)
    r = _assemble_features(raw, text_col, id_col, n_buckets, max_n)
    train = (
        t.withColumn("label", F.lit(1.0))
        .unionByName(r.withColumn("label", F.lit(0.0)))
        .select("features", "label")
    )
    kwargs = dict(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    if balance_classes:
        n_pos, n_neg = target.count(), raw.count()
        tot = float(n_pos + n_neg)
        train = train.withColumn(
            "weight",
            F.when(F.col("label") == 1.0, F.lit(tot / (2.0 * n_pos)))
            .otherwise(F.lit(tot / (2.0 * n_neg))),
        )
        kwargs["weightCol"] = "weight"
    return LogisticRegression(**kwargs).fit(train)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    max_n: int = 2,
) -> DataFrame:
    """Classifier P(target | doc) per document: ``(id_col,
    quality_prob)``. ``n_buckets``/``max_n`` must match the fit. One
    narrow projection — the model broadcast rides the transform; the
    probability vector is unpacked JVM-side (vector_to_array)."""
    from pyspark.ml.functions import vector_to_array

    feats = _assemble_features(df, text_col, id_col, n_buckets, max_n)
    scored = model.transform(feats)
    return scored.select(
        F.col(id_col),
        F.element_at(vector_to_array("probability"), 2).alias(
            "quality_prob"
        ),
    )


def pareto_filter(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """GPT-3's stochastic keep rule: keep a document iff
    ``score > 1 - X`` with ``X ~ Pareto(alpha)`` (Lomax form:
    X = u^(-1/alpha) - 1 for uniform u). High scores are near-certainly
    kept; low scores survive with probability ~ their score's tail mass,
    preserving some distributional diversity instead of a hard cutoff.

    The draw is the deterministic md5 uniform of (seed, id) — re-runs
    and audits reproduce the exact keep set. Returns the scored rows
    that pass, with the draw exposed as ``pareto_draw``."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = _u52(F.lit(str(seed)), F.col(id_col).cast("string"))
    # clamp away from 0: u^(-1/alpha) explodes at u=0
    u = F.greatest(u, F.lit(1e-12))
    x = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return (
        scored.withColumn("pareto_draw", x)
        .filter(F.col(score_col) > F.lit(1.0) - F.col("pareto_draw"))
    )


def quality_classifier_filter(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    max_n: int = 2,
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """End-to-end: fit target-vs-raw, score raw, Pareto-keep. Returns
    the input rows that pass plus ``quality_prob`` and ``pareto_draw``."""
    model = fit_quality_classifier(
        target, raw, text_col, id_col, n_buckets, max_n
    )
    scored = score_quality(raw, model, text_col, id_col, n_buckets, max_n)
    kept = pareto_filter(scored, id_col, alpha=alpha, seed=seed)
    return raw.join(kept, id_col, "inner")
