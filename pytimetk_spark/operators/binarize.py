"""binarize / correlate — correlation-funnel discretization.

Reference: /root/reference/src/pytimetk/core/correlationfunnel.py —
binarize :19-31,461-508 (numeric → qcut(n_bins) one-hot named
``col__lo_hi``; numeric with ≤ n_bins+3 uniques → categorical; infrequent
category levels (< thresh_infreq) → ``-OTHER``; bool → int; categorical →
one-hot ``col__level``), correlate :224-247,407-417 (corr of every binary
column vs target, sorted by |corr| desc, names split on "__").

Spark: bin edges via ``approxQuantile`` (exact percentile at relativeError
0 is available but the reference's qcut itself is estimation — sketches are
the scale-correct choice), level frequencies via one groupBy, one-hot as
``when/otherwise`` projections — a single pass, no UDFs. ``correlate`` is
one aggregate computing ``corr(c, target)`` for every column
simultaneously (one shuffle), Spearman via rank-transform windows first.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fmt(v: float) -> str:
    if v == int(v):
        return str(int(v))
    return f"{v:g}"


def binarize(
    df: DataFrame,
    n_bins: int = 4,
    thresh_infreq: float = 0.01,
    name_infreq: str = "-OTHER",
    one_hot: bool = True,
) -> DataFrame:
    numeric_types = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")
    total = df.count()
    out_cols = []
    for c, t in df.dtypes:
        base = t.split("(")[0]
        if base == "boolean":
            out_cols.append(F.col(c).cast("int").alias(c))
            continue
        if base in numeric_types:
            uniques = df.select(c).distinct().limit(n_bins + 4).count()
            if uniques > n_bins + 3:
                qs = [i / n_bins for i in range(n_bins + 1)]
                edges = df.stat.approxQuantile(c, qs, 0.0001)
                # dedupe edges (qcut duplicates="drop")
                uniq_edges = sorted(set(edges))
                for lo, hi in zip(uniq_edges[:-1], uniq_edges[1:]):
                    nm = f"{c}__{_fmt(lo)}_{_fmt(hi)}"
                    first = lo == uniq_edges[0]
                    cond = (
                        (F.col(c) >= lo) if first else (F.col(c) > lo)
                    ) & (F.col(c) <= hi)
                    out_cols.append(cond.cast("int").alias(nm))
                continue
            # low-cardinality numeric → categorical
        # categorical (string or low-card numeric): trim infrequent levels
        freqs = (
            df.groupBy(F.col(c).cast("string").alias("lvl")).count().collect()
        )
        levels, infreq = [], False
        for row in freqs:
            if row["count"] / total < thresh_infreq:
                infreq = True
            else:
                levels.append(row["lvl"])
        for lvl in sorted(x for x in levels if x is not None):
            safe = re.sub(r"\s+", " ", str(lvl))
            out_cols.append(
                (F.col(c).cast("string") == lvl).cast("int").alias(f"{c}__{safe}")
            )
        if infreq:
            keep = [x for x in levels if x is not None]
            out_cols.append(
                (~F.col(c).cast("string").isin(keep)).cast("int").alias(
                    f"{c}__{name_infreq}"
                )
            )
    if not one_hot:
        raise NotImplementedError("one_hot=False (ordinal) not supported")
    return df.select(*out_cols)


def correlate(
    df: DataFrame, target: str, method: str = "pearson"
) -> pd.DataFrame:
    """Correlation of every column vs ``target``, sorted by |corr| desc;
    returns a small pandas frame (feature, bin, correlation) — one
    aggregate row collected, matching the reference's in-memory output."""
    cols = [c for c, t in df.dtypes if c != target]
    if method == "spearman":
        ranked = df
        for c in [*cols, target]:
            ranked = ranked.withColumn(
                c + "__rk", F.avg(F.row_number().over(Window.orderBy(c)).cast("double")).over(Window.partitionBy(c))
            )
        df = ranked.select(
            *[F.col(c + "__rk").alias(c) for c in [*cols, target]]
        )
    elif method != "pearson":
        raise ValueError("method must be 'pearson' or 'spearman'")
    # backtick-quote: bin names contain dots (e.g. "income__55.6_103.1")
    aggs = [
        F.corr(F.col(f"`{c}`"), F.col(f"`{target}`")).alias(c) for c in cols
    ]
    row = df.agg(*aggs).first().asDict()
    out = pd.DataFrame(
        {"feature_full": list(row.keys()), "correlation": list(row.values())}
    )
    split = out["feature_full"].str.split("__", n=1, expand=True)
    out["feature"] = split[0]
    out["bin"] = split[1] if split.shape[1] > 1 else None
    out = out.sort_values(
        "correlation", key=lambda s: s.abs(), ascending=False
    ).reset_index(drop=True)
    return out[["feature", "bin", "correlation"]]
