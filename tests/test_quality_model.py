"""GPT-3-style trained quality classifier (webtext/quality_model.py):
LR on hashed n-gram features + Pareto-thresholded stochastic keep.
The Pareto rule is verified EXACTLY against a pure-Python differential
of the shared md5 uniform; the classifier is verified on held-out
documents (scoring in-training negatives rewards memorization — the
real pipeline scores the crawl at large)."""

from __future__ import annotations

import hashlib
import random

import pytest

from pytimetk_spark.webtext.quality_model import (
    fit_quality_classifier,
    pareto_filter,
    quality_classifier_filter,
    score_quality,
)

QV = ["alpha", "bridge", "candle", "dolphin", "ember", "forest",
      "garden", "harbor", "island", "jasmine", "kernel", "lantern"]
SV = ["click", "free", "casino", "winner", "prize", "buy",
      "now", "claim", "bonus", "jackpot", "offer", "deal"]


def _mk(rng, vocab, n, base, k=40):
    return [(base + i, " ".join(rng.choices(vocab, k=k))) for i in range(n)]


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(0)
    target = spark.createDataFrame(
        _mk(rng, QV, 100, 1000), "doc_id long, text string")
    raw_train = spark.createDataFrame(
        _mk(rng, SV, 45, 100) + _mk(rng, QV, 5, 0),
        "doc_id long, text string")
    heldout = spark.createDataFrame(
        _mk(rng, QV, 20, 2000) + _mk(rng, SV, 20, 3000),
        "doc_id long, text string")
    return target, raw_train, heldout


def test_classifier_separates_heldout(spark, corpora):
    target, raw_train, heldout = corpora
    model = fit_quality_classifier(target, raw_train)
    sc = {r.doc_id: r.quality_prob
          for r in score_quality(heldout, model).collect()}
    good = [sc[2000 + i] for i in range(20)]
    bad = [sc[3000 + i] for i in range(20)]
    assert min(good) > 0.5 and max(bad) < 0.1
    assert sum(good) / 20 > 0.9


def test_pareto_filter_exact_differential(spark):
    """keep iff score > 1 - (u^(-1/alpha) - 1) with u the md5 uniform —
    recomputed independently with hashlib."""
    sdf = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)],
        "doc_id long, quality_prob double")
    got = sorted(r.doc_id
                 for r in pareto_filter(sdf, seed=7, alpha=9.0).collect())

    def u52(seed, i):
        s = f"{seed}\x1f{i}"
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) / 2 ** 52

    want = [i for i in range(100)
            if i / 100.0 > 1.0 - (max(u52(7, i), 1e-12) ** (-1 / 9.0) - 1.0)]
    assert got == want and 0 < len(got) < 100
    # different seed -> different (still deterministic) keep set
    got2 = sorted(r.doc_id
                  for r in pareto_filter(sdf, seed=8, alpha=9.0).collect())
    assert got2 != got


def test_end_to_end_filter_composition(spark, corpora):
    target, raw_train, heldout = corpora
    model = fit_quality_classifier(target, raw_train)
    kept = {r.doc_id
            for r in pareto_filter(score_quality(heldout, model),
                                   seed=4).collect()}
    good_kept = len([i for i in kept if i < 3000])
    bad_kept = len(kept) - good_kept
    assert good_kept >= 15 and bad_kept <= 4
    # determinism of the full path
    kept2 = {r.doc_id
             for r in pareto_filter(score_quality(heldout, model),
                                    seed=4).collect()}
    assert kept == kept2


def test_quality_classifier_filter_wrapper(spark, corpora):
    target, raw_train, _ = corpora
    out = quality_classifier_filter(raw_train, target, seed=1, alpha=2.0)
    assert {"doc_id", "text", "quality_prob", "pareto_draw"} <= set(
        out.columns)
    rows = out.collect()
    assert all(r.quality_prob > 1.0 - r.pareto_draw for r in rows)


def test_validation(spark, corpora):
    _, raw_train, _ = corpora
    with pytest.raises(ValueError, match="alpha"):
        pareto_filter(raw_train.withColumn("quality_prob",
                                           raw_train.doc_id * 0.0),
                      alpha=0)


def test_scale_smoke_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter("doc_id % 5 = 0")
    raw = docs.filter("doc_id % 5 <> 0")
    model = fit_quality_classifier(target, raw, max_iter=10)
    scored = score_quality(raw, model)
    assert scored.count() == raw.count()
    pdf = scored.toPandas()
    assert ((pdf.quality_prob >= 0) & (pdf.quality_prob <= 1)).all()
