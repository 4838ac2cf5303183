"""DSIR importance resampling + temperature mixture sampling
(webtext/sampling.py) — verified against independent pure-Python
references (hashlib md5 feature hashing, closed-form mixture weights).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pytimetk_spark.webtext.sampling import (
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
    temperature_mixture_weights,
    temperature_sample,
)

DOCS = [
    (0, "the cat sat", "en"),
    (1, "the dog sat", "en"),
    (2, "le chat noir", "fr"),
    (3, "der hund", "de"),
    (4, "", "en"),
    (5, "the cat ran", "en"),
    (6, "the cat sat", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _ref_feats(text: str, n_buckets: int, max_n: int = 2) -> dict[int, int]:
    toks = [w for w in text.lower().strip().split() if w]
    grams = []
    for m in range(1, max_n + 1):
        grams += [" ".join(toks[i:i + m]) for i in range(len(toks) - m + 1)]
    out: dict[int, int] = {}
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % n_buckets
        out[b] = out.get(b, 0) + 1
    return out


def test_feature_hashing_matches_reference(docs):
    feats = hashed_ngram_features(docs, n_buckets=50, max_n=2).collect()
    for doc_id, text, _ in DOCS:
        want = _ref_feats(text, 50)
        got = {r.bucket: r.cnt for r in feats if r.doc_id == doc_id}
        assert got == want, doc_id


def test_dsir_weights_match_reference(docs):
    """Full independent recomputation of the importance log-weights."""
    B, lam = 512, 1.0
    target_ids = {0, 5, 6}
    target = docs.filter(F.col("doc_id").isin(*target_ids))
    got = {r.doc_id: r for r in dsir_weights(docs, target, n_buckets=B).collect()}

    per_doc = {i: _ref_feats(t, B) for i, t, _ in DOCS}
    def dist(ids):
        tot: dict[int, int] = {}
        for i in ids:
            for b, c in per_doc[i].items():
                tot[b] = tot.get(b, 0) + c
        grand = sum(tot.values())
        return tot, grand
    t_tot, t_grand = dist(target_ids)
    r_tot, r_grand = dist([i for i, _, _ in DOCS])
    def logp(tot, grand, b):
        return math.log((tot.get(b, 0) + lam) / (grand + lam * B))
    for doc_id, text, _ in DOCS:
        want = sum(
            c * (logp(t_tot, t_grand, b) - logp(r_tot, r_grand, b))
            for b, c in per_doc[doc_id].items()
        )
        assert got[doc_id].log_w == pytest.approx(want, abs=1e-9)
        assert got[doc_id].n_feat == sum(per_doc[doc_id].values())
    # target-like raw docs outrank out-of-domain ones
    assert got[0].log_w > got[1].log_w > got[2].log_w
    # empty doc: no evidence, log ratio 0 (documented DSIR-faithful value)
    assert got[4].log_w == 0.0 and got[4].n_feat == 0


def test_dsir_select_topk_deterministic(docs):
    target = docs.filter(F.col("doc_id").isin(0, 5, 6))
    sel = dsir_select(docs, target, k=3, n_buckets=512, gumbel=False).collect()
    # 0.0 (empty) > -0.10 (cat ran) > -0.389 tie broken by id
    assert [r.doc_id for r in sel] == [4, 5, 0]
    g1 = dsir_select(docs, target, k=3, n_buckets=512, seed=7).collect()
    g2 = dsir_select(docs, target, k=3, n_buckets=512, seed=7).collect()
    assert [r.doc_id for r in g1] == [r.doc_id for r in g2]
    assert len(g1) == 3


def test_temperature_weights_closed_form(docs):
    tw = {r.lang: r for r in
          temperature_mixture_weights(docs, alpha=0.5).collect()}
    p = {"en": 5 / 7, "fr": 1 / 7, "de": 1 / 7}
    z = sum(v ** 0.5 for v in p.values())
    for lang in p:
        assert tw[lang].p == pytest.approx(p[lang])
        assert tw[lang].q == pytest.approx(p[lang] ** 0.5 / z)
        assert tw[lang].rate == pytest.approx((p[lang] ** 0.5 / z) / p[lang])
    # tail domains upsampled above 1, head below
    assert tw["fr"].rate > 1.0 > tw["en"].rate
    # expected output size preserved at target_frac=1
    exp = sum(tw[l].rate * tw[l].n_docs for l in tw)
    assert exp == pytest.approx(7.0)
    # alpha=1 is the identity mixture
    tw1 = {r.lang: r for r in
           temperature_mixture_weights(docs, alpha=1.0).collect()}
    assert all(tw1[l].rate == pytest.approx(1.0) for l in tw1)


def test_temperature_sample_copies_and_determinism(docs):
    rows = temperature_sample(docs, alpha=0.5, seed=1).collect()
    rows2 = temperature_sample(docs, alpha=0.5, seed=1).collect()
    key = lambda rs: sorted((r.doc_id, r.copy_idx) for r in rs)
    assert key(rows) == key(rows2)
    assert all(0 <= r.copy_idx < r.n_copies for r in rows)
    # every surviving doc's copy count realizes floor(rate) or ceil(rate)
    tw = {r.lang: r.rate for r in
          temperature_mixture_weights(docs, alpha=0.5).collect()}
    from collections import Counter
    per_doc = Counter(r.doc_id for r in rows)
    lang_of = {i: l for i, _, l in DOCS}
    for doc_id, n in per_doc.items():
        rate = tw[lang_of[doc_id]]
        assert n in (math.floor(rate), math.ceil(rate))


def test_validation_errors(docs):
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture_weights(docs, alpha=-1)
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mixture_weights(docs, target_frac=0)
    with pytest.raises(ValueError, match="max_n"):
        hashed_ngram_features(docs, max_n=0)


def test_scale_smoke_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    sel = dsir_select(docs, target, k=20, n_buckets=4096, seed=3)
    assert sel.count() == 20
    plan = sel._jdf.queryExecution().executedPlan().toString()
    # log-ratio table joins broadcast; top-k is TakeOrdered, no global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_dsir_featurization_exchange_reused(spark):
    """The raw corpus's hashed-feature pass is consumed twice (bucket
    totals + per-doc scoring); the explicit NULL-id pre-filter keeps
    both subtrees canonically identical so AQE reuses one shuffle stage
    for them — without it the output join's pushed IsNotNull made the
    scans differ and the explode + md5-per-gram featurization ran twice
    per query (r7). Pin: the executed adaptive plan contains a Reused
    node."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    sel = dsir_select(docs, target, k=20, n_buckets=4096, seed=3)
    sel.collect()
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "Reused" in plan
