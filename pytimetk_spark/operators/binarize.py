"""binarize / correlate — correlation-funnel discretization.

Reference: /root/reference/src/pytimetk/core/correlationfunnel.py —
binarize :19-31,461-508 (numeric → qcut(n_bins) one-hot named
``col__lo_hi``; numeric with ≤ n_bins+3 uniques → categorical; infrequent
category levels (< thresh_infreq) → ``-OTHER``; bool → int; categorical →
one-hot ``col__level``), correlate :224-247,407-417 (corr of every binary
column vs target, sorted by |corr| desc, names split on "__").

Scale design (round-2 rework — round 1 issued 2 Spark jobs PER COLUMN):

* ``binarize`` runs exactly THREE jobs regardless of column count:
  (1) one aggregate with ``approx_count_distinct`` for every numeric
  column (+ total count), (2) one multi-column ``approxQuantile`` sketch
  pass for all binned columns, (3) one posexplode→groupBy "melt" that
  returns exact level frequencies for every categorical / low-cardinality
  candidate column at once. The one-hot projection itself is pure
  Catalyst.
* ``correlate(method="spearman")`` never sorts globally: average ranks
  come from a per-column value-frequency aggregate, range-bucketed by
  approxQuantile edges so the cumulative count is a window PARTITIONED BY
  bucket (distributed) plus a tiny driver-side offset map — then one hash
  join back. rank(v) = (#rows < v) + (#rows == v + 1)/2, the standard
  tie-average, so it matches pandas ``rank(method="average")`` exactly.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_BASES = (
    "int", "bigint", "smallint", "tinyint", "double", "float", "decimal"
)


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
    # ``one_hot`` replicated reference quirk: correlationfunnel.py accepts
    # the flag (:29) but create_recipe (:461-501) never branches on it —
    # pd.get_dummies is unconditional, so one_hot=False produces the SAME
    # one-hot output as one_hot=True. Verified by running the reference's
    # recipe kernel under both flags (tests/test_anomalize_binarize.py).
    del one_hot

    bool_cols, numeric_cols, string_cols = [], [], []
    for c, t in df.dtypes:
        base = t.split("(")[0]
        if base == "boolean":
            bool_cols.append(c)
        elif base in _NUMERIC_BASES:
            numeric_cols.append(c)
        else:
            string_cols.append(c)

    # job 1: total count + approximate distinct count of every numeric
    # column in ONE aggregate
    probe = df.agg(
        F.count(F.lit(1)).alias("__n__"),
        *[F.approx_count_distinct(c, 0.01).alias(c) for c in numeric_cols],
    ).first()
    total = probe["__n__"]
    # candidates for categorical treatment: the sketch is tightened to
    # rsd=1%, and every column whose approx count is within 2× of the
    # categorical threshold goes through the exact melt below — the final
    # categorical-vs-binned decision is always made on exact counts, so an
    # unlucky over- OR undercount can't silently change the one-hot
    # contract for a borderline column
    approx_thresh = (n_bins + 3) * 2 + 4
    maybe_categ = [c for c in numeric_cols if probe[c] <= approx_thresh]
    bin_cols = [c for c in numeric_cols if c not in maybe_categ]

    # job 2: quantile sketches for every binned column in one pass
    edges_by_col: dict[str, list[float]] = {}
    if bin_cols:
        qs = [i / n_bins for i in range(n_bins + 1)]
        sketches = df.stat.approxQuantile(bin_cols, qs, 0.0001)
        edges_by_col = dict(zip(bin_cols, sketches))

    # job 3: exact level frequencies for all categorical candidates at once
    freq_cols = string_cols + maybe_categ
    level_counts: dict[str, list[tuple[str | None, int]]] = {c: [] for c in freq_cols}
    if freq_cols:
        melted = df.select(
            F.posexplode(
                F.array(*[F.col(c).cast("string") for c in freq_cols])
            ).alias("__ci__", "__lvl__")
        )
        for row in (
            melted.groupBy("__ci__", "__lvl__").count().collect()
        ):
            level_counts[freq_cols[row["__ci__"]]].append(
                (row["__lvl__"], row["count"])
            )

    out_cols: list[Column] = []
    for c, t in df.dtypes:
        base = t.split("(")[0]
        if base == "boolean":
            out_cols.append(F.col(c).cast("int").alias(c))
            continue
        if c in edges_by_col or (
            c in maybe_categ and len(level_counts[c]) > n_bins + 3
        ):
            # numeric, enough uniques → quantile bins. A maybe_categ column
            # that turned out high-cardinality gets its edges from a tiny
            # extra sketch (rare: only when the approx sketch undercounted)
            edges = edges_by_col.get(c)
            if edges is None:
                qs = [i / n_bins for i in range(n_bins + 1)]
                edges = df.stat.approxQuantile(c, qs, 0.0001)
            uniq_edges = sorted(set(edges))  # qcut duplicates="drop"
            for lo, hi in zip(uniq_edges[:-1], uniq_edges[1:]):
                nm = f"{c}__{_fmt(lo)}_{_fmt(hi)}"
                first = lo == uniq_edges[0]
                cond = (
                    (F.col(c) >= lo) if first else (F.col(c) > lo)
                ) & (F.col(c) <= hi)
                out_cols.append(cond.cast("int").alias(nm))
            continue
        # categorical (string or low-cardinality numeric): trim infrequent
        levels, infreq = [], False
        for lvl, cnt in level_counts[c]:
            if cnt / total < thresh_infreq:
                infreq = True
            else:
                levels.append(lvl)
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
    return df.select(*out_cols)


def _edges_below(value: Column, edges: list[float]) -> Column:
    """Range-bucket id = number of edges strictly below ``value`` (equal
    values always share a bucket). Small literal-array fold — pure
    projection."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    return F.aggregate(
        arr, F.lit(0), lambda acc, e: acc + F.when(e < value, 1).otherwise(0)
    )


def _with_avg_rank(df: DataFrame, col: str, out: str, n_buckets: int = 32) -> DataFrame:
    """Append pandas-style average rank of ``col`` without any global sort:
    value-frequency aggregate → bucket by quantile edges → per-bucket
    cumulative window (PARTITIONED, so no single-reducer funnel) + a
    driver-side bucket-offset map → hash join back on the value."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = sorted(set(df.stat.approxQuantile(col, qs, 0.001)))
    freq = df.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt__"))
    freq = freq.withColumn("__bkt__", _edges_below(F.col(f"`{col}`"), edges))
    bucket_tot = {
        r["__bkt__"]: r["s"]
        for r in freq.groupBy("__bkt__").agg(F.sum("__cnt__").alias("s")).collect()
    }
    running, offsets = 0, {}
    for b in sorted(bucket_tot):
        offsets[b] = running
        running += bucket_tot[b]
    off = F.lit(0)
    for b, o in offsets.items():
        off = F.when(F.col("__bkt__") == b, F.lit(o)).otherwise(off)
    w = (
        Window.partitionBy("__bkt__")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranks = freq.select(
        F.col(f"`{col}`"),
        (
            off
            + F.sum("__cnt__").over(w)
            - F.col("__cnt__")
            + (F.col("__cnt__") + 1) / 2.0
        ).cast("double").alias(out),
    )
    return df.join(ranks, on=col, how="left")


def _kendall_from_contingency(cont) -> float:
    """Exact Kendall tau-b from a (sorted-x × sorted-y) contingency table —
    the standard C/D/ties formulation, O(levels²) on the driver. Equals
    pandas ``corr(method="kendall")`` (scipy tau-b) exactly."""
    import numpy as np

    cont = np.asarray(cont, dtype=np.float64)
    n = cont.sum()
    if n < 2:
        return float("nan")

    def _strict_suffix(m):
        s = np.flip(np.flip(m, 0), 1).cumsum(0).cumsum(1)
        s = np.flip(np.flip(s, 0), 1)
        out = np.zeros((m.shape[0] + 1, m.shape[1] + 1))
        out[: m.shape[0], : m.shape[1]] = s
        return out

    conc = (cont * _strict_suffix(cont)[1:, 1:]).sum()
    cf = cont[:, ::-1]
    disc = (cf * _strict_suffix(cf)[1:, 1:]).sum()
    n0 = n * (n - 1) / 2
    r, c = cont.sum(axis=1), cont.sum(axis=0)
    n1 = (r * (r - 1) / 2).sum()
    n2 = (c * (c - 1) / 2).sum()
    denom = ((n0 - n1) * (n0 - n2)) ** 0.5
    return float((conc - disc) / denom) if denom > 0 else float("nan")


def _spearman_paired(df: DataFrame, target: str) -> DataFrame:
    """(rank_x, rank_y) pairs for every (column, row) — the single-pass
    spearman plan. One multi-column approxQuantile sketch, one posexplode
    melt for exact per-(column, value) frequencies, bucket offsets via a
    window over the tiny (cols × buckets) totals frame, and exactly three
    joins total (two broadcast) regardless of column count."""
    cols = [c for c, t in df.dtypes if c != target]
    allc = [*cols, target]
    n_buckets = 32
    qs = [i / n_buckets for i in range(1, n_buckets)]
    sketches = df.stat.approxQuantile(allc, qs, 0.001)  # ONE multi-col job
    edges_lit = F.array(
        *[
            F.array(*[F.lit(float(e)) for e in (sorted(set(sk)) or [0.0])])
            for sk in sketches
        ]
    )
    melted = df.select(
        F.posexplode(
            F.array(*[F.col(f"`{c}`").cast("double") for c in allc])
        ).alias("__ci__", "__v__")
    )
    freq = (
        melted.filter(F.col("__v__").isNotNull())
        .groupBy("__ci__", "__v__")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
    )
    freq = freq.withColumn(
        "__bkt__",
        F.aggregate(
            F.element_at(edges_lit, F.col("__ci__") + 1),
            F.lit(0),
            lambda acc, e: acc + F.when(e < F.col("__v__"), 1).otherwise(0),
        ),
    )
    # bucket offsets: cumulative below-bucket totals per column — a window
    # over the (cols × buckets)-row totals frame, broadcast back
    btot = freq.groupBy("__ci__", "__bkt__").agg(
        F.sum("__cnt__").alias("__btot__")
    )
    woff = (
        Window.partitionBy("__ci__")
        .orderBy("__bkt__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        "__ci__",
        "__bkt__",
        F.coalesce(F.sum("__btot__").over(woff), F.lit(0)).alias("__off__"),
    )
    wrk = (
        Window.partitionBy("__ci__", "__bkt__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranks = freq.join(F.broadcast(offsets), ["__ci__", "__bkt__"]).select(
        "__ci__",
        "__v__",
        (
            F.col("__off__")
            + F.sum("__cnt__").over(wrk)
            - F.col("__cnt__")
            + (F.col("__cnt__") + 1) / 2.0
        ).cast("double").alias("__rk__"),
    )
    ti = len(allc) - 1
    pairs = df.select(
        F.posexplode(
            F.array(*[F.col(f"`{c}`").cast("double") for c in cols])
        ).alias("__ci__", "__x__"),
        F.col(f"`{target}`").cast("double").alias("__y__"),
    )
    rx = ranks.withColumnRenamed("__v__", "__x__").withColumnRenamed(
        "__rk__", "__rx__"
    )
    ry = ranks.filter(F.col("__ci__") == ti).select(
        F.col("__v__").alias("__y__"), F.col("__rk__").alias("__ry__")
    )
    return pairs.join(rx, ["__ci__", "__x__"], "left").join(
        F.broadcast(ry), ["__y__"], "left"
    )


def _funnel_frame(corr_by_name: dict[str, float]) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "feature_full": list(corr_by_name.keys()),
            "correlation": list(corr_by_name.values()),
        }
    )
    split = out["feature_full"].str.split("__", n=1, expand=True)
    out["feature"] = split[0]
    out["bin"] = split[1] if split.shape[1] > 1 else None
    out = out.sort_values(
        "correlation", key=lambda s: s.abs(), ascending=False
    ).reset_index(drop=True)
    return out[["feature", "bin", "correlation"]]


def correlate(
    df: DataFrame,
    target: str,
    method: str = "pearson",
    max_pairs_per_column: int = 100_000,
) -> pd.DataFrame:
    """Correlation of every column vs ``target``, sorted by |corr| desc;
    returns a small pandas frame (feature, bin, correlation) — one
    aggregate row collected, matching the reference's in-memory output.

    ``kendall`` (reference correlationfunnel.py:402) is exact tau-b
    computed from per-column (value, target) contingency tables — ONE
    posexplode melt + groupBy over all columns, then the C/D/ties closed
    form on the driver. Scales with Σ distinct (value, target) pairs (the
    funnel's binarized inputs are 0/1, so the table per column is 2×k),
    never with row count. ``max_pairs_per_column`` guards the driver: a
    high-cardinality numeric column would otherwise collect ~rows cells —
    such columns fail fast with instructions instead of OOMing the driver.

    ``spearman`` (round-3 rework — round 2 ran ~2 driver jobs + 1 join PER
    COLUMN): one multi-column ``approxQuantile`` sketch, one posexplode
    melt → exact per-(column, value) frequencies bucketed by the sketch
    edges, bucket offsets via a tiny window over bucket totals (no driver
    map), average ranks joined back onto the melted rows, and a single
    ``groupBy(column).agg(corr(rank_x, rank_y))``. Bounded job count and
    exactly TWO joins regardless of column count. rank(v) =
    (#rows < v) + (#ties + 1)/2 — pandas ``rank(method="average")``."""
    cols = [c for c, t in df.dtypes if c != target]
    if method == "kendall":
        melted = df.select(
            F.posexplode(
                F.array(*[F.col(f"`{c}`").cast("double") for c in cols])
            ).alias("__ci__", "__x__"),
            F.col(f"`{target}`").cast("double").alias("__y__"),
        )
        counts_df = melted.groupBy("__ci__", "__x__", "__y__").count()
        counts_df.persist()
        try:
            sizes = {
                r["__ci__"]: r["n"]
                for r in counts_df.groupBy("__ci__")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            over = [
                cols[ci] for ci, n in sizes.items() if n > max_pairs_per_column
            ]
            if over:
                raise ValueError(
                    "correlate(method='kendall'): columns "
                    f"{over} exceed max_pairs_per_column="
                    f"{max_pairs_per_column} distinct (value, target) pairs; "
                    "kendall's contingency tables are driver-side. Binarize/"
                    "bucket these columns first, sample the frame, or raise "
                    "max_pairs_per_column explicitly."
                )
            counts = counts_df.collect()
        finally:
            counts_df.unpersist()
        by_col: dict[int, dict[tuple, int]] = {}
        for row in counts:
            by_col.setdefault(row["__ci__"], {})[(row["__x__"], row["__y__"])] = row[
                "count"
            ]
        taus = {}
        for ci, cells in by_col.items():
            xs = sorted({k[0] for k in cells}, key=lambda v: (v is None, v))
            ys = sorted({k[1] for k in cells}, key=lambda v: (v is None, v))
            cont = [[cells.get((x, y), 0) for y in ys] for x in xs]
            taus[cols[ci]] = _kendall_from_contingency(cont)
        return _funnel_frame(taus)
    if method == "spearman":
        paired = _spearman_paired(df, target)
        rows = (
            paired.groupBy("__ci__")
            .agg(F.corr("__rx__", "__ry__").alias("c"))
            .collect()
        )
        corr_by_ci = {r["__ci__"]: r["c"] for r in rows}
        return _funnel_frame({c: corr_by_ci.get(i) for i, c in enumerate(cols)})
    if method != "pearson":
        raise ValueError("method must be 'pearson', 'spearman' or 'kendall'")
    # backtick-quote: bin names contain dots (e.g. "income__55.6_103.1")
    aggs = [
        F.corr(F.col(f"`{c}`"), F.col(f"`{target}`")).alias(c) for c in cols
    ]
    row = df.agg(*aggs).first().asDict()
    return _funnel_frame(row)
