"""Product quantization (PQ) for embedding compression + ADC search.

The FAISS-PQ memory/scale path (Jégou et al. 2011, "Product
quantization for nearest neighbor search"): split each d-dim vector
into ``m`` sub-vectors, k-means each subspace into ``2^nbits``
centroids, store each vector as ``m`` small codes (e.g. 768 floats ->
8 bytes at m=8/nbits=8). Search scores candidates with an
asymmetric-distance lookup table (ADC): one table of
``m x 2^nbits`` partial distances per query, each corpus row scored by
``m`` table lookups — no float vector ever touched at scan time.

Scale design mirrors ivf_ann (similarity.py): the codebook FIT sees a
bounded driver-side sample (centroids need a sketch, not a pass over
100 TB); ENCODE and SEARCH are single-pass Arrow-vectorized jobs over
the full corpus (numpy einsum per batch — the argmin-over-centroids
kernel is exactly what pandas UDFs are for; a Catalyst expression tree
over m*k centroids would blow up codegen). Encoded corpora are what
gets STORED — at 100 TB the 48-96x compression is the difference
between an in-memory ANN tier and none.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    nbits: int = 4,
    vec_col: str = "embedding",
    fit_sample: int = 100_000,
    n_iter: int = 20,
    seed: int = 42,
) -> list[np.ndarray]:
    """Fit PQ codebooks on a bounded corpus sample -> list of ``m``
    arrays, each ``(2^nbits, d/m)``. Deterministic: seeded sample,
    seeded init (distinct points), fixed Lloyd iteration count with
    empty-cluster re-seeding to the farthest point."""
    k = 1 << nbits
    n_corpus = corpus.count()
    frac = min(1.0, (1.5 * fit_sample / n_corpus) if n_corpus else 1.0)
    sample = (
        corpus.select(F.col(vec_col))
        .sample(False, frac, seed=seed)
        .limit(fit_sample)
        .toPandas()[vec_col]
    )
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in sample])
    if X.ndim != 2 or X.shape[0] < k:
        raise ValueError(
            f"need >= {k} sample vectors to fit {k}-centroid codebooks"
        )
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        sub = X[:, j * ds : (j + 1) * ds]
        cent = sub[rng.choice(len(sub), k, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(0)
                else:  # re-seed an empty cluster to the farthest point
                    cent[c] = sub[d2.min(1).argmax()]
        books.append(cent)
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[np.ndarray],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode the FULL corpus -> (id, pq_code array<int>): one Arrow
    pass, argmin over each subspace's centroids via a batched matmul
    (||x-c||^2 = -2 x.c + ||c||^2 up to a per-row constant)."""
    m = len(codebooks)
    ds = codebooks[0].shape[1]
    books = [b.copy() for b in codebooks]
    half_norms = [0.5 * (b * b).sum(1) for b in books]

    schema = T.StructType([
        T.StructField("__pqid__", T.LongType()),
        T.StructField("pq_code", T.ArrayType(T.IntegerType())),
    ])

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v__"]]
            )
            if len(X) == 0:
                continue
            codes = np.empty((len(X), m), np.int32)
            for j in range(m):
                sub = X[:, j * ds : (j + 1) * ds]
                scores = sub @ books[j].T - half_norms[j]
                codes[:, j] = scores.argmax(1)
            yield pd.DataFrame({
                "__pqid__": pdf["__pqid__"].astype("int64"),
                "pq_code": list(codes.tolist()),
            })

    src = corpus.select(
        F.col(id_col).cast("long").alias("__pqid__"),
        F.col(vec_col).alias("__v__"),
    )
    return src.mapInPandas(encode, schema=schema).withColumnRenamed(
        "__pqid__", id_col
    )


def pq_search(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list[np.ndarray],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: driver-side LUT per query (m x 2^nbits partial
    squared distances — queries are a small frame), broadcast into one
    Arrow pass over the encoded corpus; ties break on id like the
    exact searchers. Returns (query_id, vec_id, adc_dist2, rank)."""
    m = len(codebooks)
    ds = codebooks[0].shape[1]
    qpdf = queries.select(
        F.col(query_id_col).cast("long"), F.col(vec_col)
    ).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    Q = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in qpdf[vec_col]]
    )
    # LUT[q, j, c] = || q_sub_j - centroid_jc ||^2
    luts = np.empty((len(Q), m, codebooks[0].shape[0]))
    for j in range(m):
        diff = Q[:, None, j * ds : (j + 1) * ds] - codebooks[j][None, :, :]
        luts[:, j, :] = (diff * diff).sum(-1)

    schema = T.StructType([
        T.StructField("__qid__", T.LongType()),
        T.StructField("__pqid__", T.LongType()),
        T.StructField("adc_dist2", T.DoubleType()),
    ])

    def score(batches):
        import pandas as pd

        for pdf in batches:
            codes = np.asarray(list(pdf["pq_code"]), dtype=np.int64)
            if codes.size == 0:
                continue
            ids = pdf["__pqid__"].to_numpy()
            # dist[q, row] = sum_j LUT[q, j, codes[row, j]]
            dist = np.zeros((len(qids), len(ids)))
            for j in range(m):
                dist += luts[:, j, :][:, codes[:, j]]
            qq, rr = np.meshgrid(
                np.arange(len(qids)), np.arange(len(ids)), indexing="ij"
            )
            yield pd.DataFrame({
                "__qid__": qids[qq.ravel()],
                "__pqid__": ids[rr.ravel()],
                "adc_dist2": dist.ravel(),
            })

    src = encoded.select(
        F.col(id_col).cast("long").alias("__pqid__"), "pq_code"
    )
    scored = src.mapInPandas(score, schema=schema)
    w = Window.partitionBy("__qid__").orderBy(
        F.col("adc_dist2"), F.col("__pqid__")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid__").alias(query_id_col),
            F.col("__pqid__").alias(id_col),
            "adc_dist2", "rank",
        )
        .orderBy(query_id_col, "rank")
    )
