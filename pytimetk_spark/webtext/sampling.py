"""Corpus selection and mixing: DSIR importance resampling and
temperature-based domain mixture sampling.

Two published selection schemes every large-scale LM data pipeline runs
between curation and training:

* **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling", NeurIPS): score each raw document by the
  log-likelihood ratio of a hashed-n-gram bag-of-words model of a small
  TARGET corpus vs one of the RAW corpus, add Gumbel noise, keep the
  top-k. Selects raw documents distributed like the target domain
  without training a classifier.
* **Temperature / alpha mixing** (the multinomial temperature-sampling
  scheme of multilingual pretraining — Lample & Conneau 2019 (XLM) §3.1,
  mT5's alpha sweep): re-weight per-domain sampling rates
  q_d ∝ p_d^alpha so low-resource domains are up-weighted, then emit a
  deterministic per-document copy count realizing those rates.

Scale design: every step is exact-count groupBy / broadcast-join
Catalyst; the only per-document state is a hash. Bucket distributions
are ``n_buckets``-sized (broadcast); nothing corpus-sized reaches the
driver. Determinism: all randomness derives from md5 of (seed, doc id)
— reproducible across runs, engines and cluster sizes (Spark's
xxhash64 is engine-local, so cross-engine-checkable ops use the md5
uniform instead; see ``_u52``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^13 = 2^52: a 13-hex-digit md5 prefix divided by it is an exact
# dyadic rational in [0, 1) — identical in any IEEE-754 engine
_U52_DEN = float(16 ** 13)


def _u52(*cols: Column) -> Column:
    """Deterministic uniform [0,1) from md5 of the concatenated inputs.

    Unlike xxhash64 this is reproducible OUTSIDE Spark (DuckDB:
    ``CAST('0x' || substr(md5(s), 1, 13) AS BIGINT) / 16^13``), which is
    what makes sampling decisions oracle-checkable."""
    h = F.md5(F.concat_ws("\x1f", *cols))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(
        _U52_DEN
    )


def _hash_bucket(gram: Column, n_buckets: int) -> Column:
    """Feature-hash a gram string into [0, n_buckets) via the same
    cross-engine md5 prefix (pmod of an exact 52-bit integer)."""
    v = F.conv(F.substring(F.md5(gram), 1, 13), 16, 10).cast("long")
    return F.pmod(v, F.lit(n_buckets))


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
) -> DataFrame:
    """Per-document hashed n-gram counts: ``(id_col, bucket, cnt)``.

    DSIR's feature space (Xie et al. §3: hashed uni+bigrams). One
    explode + one groupBy; tokens are the textstats whitespace
    tokenization."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    toks = F.filter(toks, lambda x: x != "")
    staged = df.select(F.col(id_col), toks.alias("__toks__"))
    t = F.col("__toks__")
    # position explode + per-order gram COLUMNS unpivoted via stack
    # (r7): transform lambdas evaluate interpreted per element; these are
    # the same array_join(slice(...)) gram expressions evaluated inside
    # WholeStageCodegen (~1.8× on the featurization core, identical gram
    # multiset — the same rework as lm.py / repetition_signals). Docs
    # shorter than m tokens yield NULL gram columns that the filter
    # drops; greatest(size, 1) guards Spark's descending-sequence
    # behavior for empty/NULL token arrays.
    i = F.col("__i__")
    pos = staged.select(
        F.col(id_col),
        "__toks__",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)))
        ).alias("__i__"),
    )
    gcols = [
        F.when(
            i <= F.size(t) - m + 1,
            F.array_join(F.slice(t, i, m), " "),
        ).alias(f"__g{m}__")
        for m in range(1, max_n + 1)
    ]
    stack = "stack({}, {}) as __g__".format(
        max_n, ", ".join(f"__g{m}__" for m in range(1, max_n + 1))
    )
    exploded = (
        pos.select(F.col(id_col), *gcols)
        .selectExpr(f"`{id_col}`", stack)
        .filter(F.col("__g__").isNotNull())
    )
    return (
        exploded.withColumn("bucket", _hash_bucket(F.col("__g__"), n_buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _corpus_grand(feats: DataFrame, alias: str) -> DataFrame:
    """1-row total gram count of a corpus, derived LAZILY from its
    hashed features: every gram hits exactly one bucket, so the sum of
    all (doc, bucket) counts IS the gram total. Riding the main query
    (instead of the old eager narrow-scan ``collect``) removes one
    full corpus scan and one Spark action per corpus, and — because
    the subtree is the same featurization the scoring/totals branches
    consume — AQE's exchange reuse shares its shuffle stage with them
    (r7; the empty-corpus total coalesces to 0 as before)."""
    return feats.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias(alias)
    )


def _smoothed_log_ratio(
    tgt_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int,
    smoothing: float,
) -> DataFrame:
    """(bucket, llr) log-probability-ratio table with add-``smoothing``
    mass: llr = log((c_t + s)/(grand_t + s·B)) − log((c_r + s)/(grand_r
    + s·B)). A bucket missing from one corpus contributes c = 0, which
    makes its term log(s/denom) — exactly the old separate "unseen
    bucket default", so present and missing buckets share one
    expression and no driver-side constants (or actions) are needed.
    The two 1-row grand totals broadcast into the ≤ n_buckets-row
    frame."""
    tt = tgt_feats.groupBy("bucket").agg(F.sum("cnt").alias("__tc__"))
    rt = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("__rc__"))
    grands = _corpus_grand(tgt_feats, "__tg__").crossJoin(
        _corpus_grand(raw_feats, "__rg__")
    )
    s_b = F.lit(smoothing * n_buckets)
    t_denom = F.col("__tg__").cast("double") + s_b
    r_denom = F.col("__rg__").cast("double") + s_b
    lt = F.log(
        (F.coalesce(F.col("__tc__"), F.lit(0)).cast("double")
         + F.lit(smoothing)) / t_denom
    )
    lr = F.log(
        (F.coalesce(F.col("__rc__"), F.lit(0)).cast("double")
         + F.lit(smoothing)) / r_denom
    )
    return (
        tt.join(rt, "bucket", "full")
        .crossJoin(F.broadcast(grands))
        .select("bucket", (lt - lr).alias("llr"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight: ``(id_col, n_feat,
    log_w)`` with log_w = sum_b cnt_b * (log p_target(b) - log p_raw(b)).

    Both bucket distributions are exact counts with add-``smoothing``
    mass; the (<= n_buckets)-row log-ratio table is broadcast into one
    join against the raw documents' hashed features.

    A feature-less (empty) document has likelihood 1 under both models,
    so log_w = 0 — the DSIR-faithful value, and usually the corpus
    maximum since typical weights are negative. Run AFTER length/quality
    gates (the paper's pipeline does) or empties win the resample.

    NULL-``id_col`` raw documents are excluded from the raw bucket
    distribution and gram total (r7): they can never receive a weight
    anyway (the output left join cannot match a NULL key — they emit
    (0, 0.0) rows exactly as before), and filtering them UP-FRONT makes
    the two consumers of the raw feature pass canonically identical —
    the output join pushes an IsNotNull(id) into the scoring branch's
    scan, and without the explicit filter that pushed predicate
    desynchronized the subtrees so AQE's exchange reuse never fired and
    the (explode + md5-per-gram) featurization of the raw corpus ran
    TWICE per query (verified in the executed adaptive plan: 0 reused
    stages before, shared ShuffleQueryStage after)."""
    raw_nn = raw.filter(F.col(id_col).isNotNull())
    raw_feats = hashed_ngram_features(
        raw_nn, text_col, id_col, n_buckets, max_n
    )
    tgt_feats = hashed_ngram_features(
        target, text_col, id_col, n_buckets, max_n
    )
    ratio = _smoothed_log_ratio(tgt_feats, raw_feats, n_buckets, smoothing)
    per_doc = (
        raw_feats.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feat"),
            F.sum(F.col("cnt").cast("double") * F.col("llr")).alias("log_w"),
        )
    )
    # total over the raw corpus: feature-less (empty) docs carry weight 0
    return raw.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_feat", F.lit(0)).alias("n_feat"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
    smoothing: float = 1.0,
    seed: int = 0,
    gumbel: bool = True,
) -> DataFrame:
    """Gumbel-top-k importance resampling (Xie et al. §3.2): keep the k
    raw documents maximizing log_w + Gumbel noise — equivalent to
    sampling without replacement proportionally to the importance
    weights. ``gumbel=False`` keeps the top-k weights deterministically.

    Returns ``(id_col, n_feat, log_w, score)``, one row per kept doc.
    Top-k of a scalar is a TakeOrdered (per-partition heap + driver
    merge of k rows) — no global sort materialization."""
    w = dsir_weights(
        raw, target, text_col, id_col, n_buckets, max_n, smoothing
    )
    if gumbel:
        u = _u52(F.lit(str(seed)), F.col(id_col).cast("string"))
        # clamp away from {0,1}: -log(-log(u)) must stay finite
        u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        score = F.col("log_w") - F.log(-F.log(u))
    else:
        score = F.col("log_w")
    return (
        w.withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def temperature_mixture_weights(
    df: DataFrame,
    domain_col: str = "lang",
    alpha: float = 0.5,
    target_frac: float = 1.0,
) -> DataFrame:
    """Per-domain sampling rates for temperature-``alpha`` mixing:
    ``(domain_col, n_docs, p, q, rate)`` where p_d is the empirical
    domain share, q_d ∝ p_d^alpha the tempered mixture, and
    rate_d = target_frac * q_d / p_d the expected copies per document
    (so the expected output size is target_frac * corpus size and the
    output is distributed ~q). alpha=1 reproduces the corpus; alpha=0
    weights all domains equally; alpha<1 up-samples the tail.

    One groupBy over the corpus; the result is domain-cardinality-sized
    (broadcast it into the sampler)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_frac <= 0:
        raise ValueError(f"target_frac must be > 0, got {target_frac}")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    grand = counts.agg(F.sum("n_docs")).collect()[0][0] or 0
    if grand == 0:
        raise ValueError("empty corpus")
    p = F.col("n_docs").cast("double") / F.lit(float(grand))
    with_p = counts.withColumn("p", p).withColumn(
        "q_raw", F.pow(F.col("p"), F.lit(float(alpha)))
    )
    z = with_p.agg(F.sum("q_raw")).collect()[0][0]
    return with_p.select(
        domain_col,
        "n_docs",
        "p",
        (F.col("q_raw") / F.lit(float(z))).alias("q"),
        (
            F.lit(float(target_frac))
            * (F.col("q_raw") / F.lit(float(z)))
            / F.col("p")
        ).alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    domain_col: str = "lang",
    alpha: float = 0.5,
    target_frac: float = 1.0,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Realize the temperature mixture as deterministic per-document
    copy counts: each document of domain d appears
    floor(rate_d) + Bernoulli(frac(rate_d)) times, with the Bernoulli
    decided by the cross-engine md5 uniform of (seed, id) — stable
    across runs and cluster sizes, and exactly re-derivable for audits.

    Returns the input columns plus ``n_copies`` and, exploded per copy,
    ``copy_idx`` (0-based). Documents with n_copies = 0 are dropped.
    Rates may exceed 1 (oversampled tail domains emit repeats — the
    standard trade-off of temperature mixing; cap via target_frac)."""
    rates = temperature_mixture_weights(df, domain_col, alpha, target_frac)
    u = _u52(F.lit(str(seed)), F.col(id_col).cast("string"))
    n_copies = (
        F.floor(F.col("rate")).cast("long")
        + (u < (F.col("rate") - F.floor(F.col("rate")))).cast("long")
    )
    with_n = df.join(
        F.broadcast(rates.select(domain_col, "rate")), domain_col, "left"
    ).withColumn("n_copies", n_copies)
    return (
        with_n.filter(F.col("n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - F.lit(1))),
        )
        .drop("rate")
    )
