"""future_frame / make_future_timeseries — extend each group with future
timestamps after its max observation.

Reference: /root/reference/src/pytimetk/core/future.py:314-449 (per-group
max + pd.date_range(start=last, periods=n+1)[1:]; group-constant columns
forward-filled; bind_data unions with the source) and
core/make_future_timeseries.py:12-146.

Spark plan: per-group ``max(ts)`` (tiny aggregate) → ``sequence(next,
next + length·interval, interval)`` + ``explode`` → ``unionByName`` with the
source. Group-constant passenger columns are carried with
``first(col, ignorenulls)`` over the per-group aggregate — no window over
the fact table, no extra shuffle beyond the one aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pytimetk_spark.functions.datetime import Freq, parse_freq


def _step_expr(f: Freq, k: str) -> str:
    """SQL expression advancing __max_ts__ by k periods (k a column name)."""
    if f.is_fixed:
        return f"__max_ts__ + make_interval(0,0,0,0,0,0,{k} * {f.seconds})"
    if f.is_week:
        return f"__max_ts__ + make_interval(0,0,{k} * {f.n},0,0,0,0)"
    return f"__max_ts__ + make_interval(0,{k} * {f.months},0,0,0,0,0)"


def make_future_timeseries(
    df: DataFrame,
    date_column: str,
    length_out: int,
    freq: str,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The next ``length_out`` timestamps after each group's max, at ``freq``
    (reference: pd.date_range(start=last, periods=n+1, freq)[1:])."""
    group_cols = list(group_cols or [])
    f = parse_freq(freq)
    agg = df.groupBy(*group_cols).agg(F.max(date_column).alias("__max_ts__")) \
        if group_cols else df.agg(F.max(date_column).alias("__max_ts__"))
    in_ts_type = dict(df.dtypes)[date_column]
    out = agg.select(
        *group_cols,
        F.explode(F.expr(f"sequence(1, {length_out})")).alias("__k__"),
        F.col("__max_ts__"),
    ).select(
        *group_cols,
        F.expr(_step_expr(f, "__k__")).cast(in_ts_type).alias(date_column),
    )
    return out


def future_frame(
    df: DataFrame,
    date_column: str,
    length_out: int,
    freq: str,
    group_cols: Sequence[str] | None = None,
    bind_data: bool = True,
    sort: bool = False,
) -> DataFrame:
    """Extend ``df`` with ``length_out`` future rows per group; value columns
    NULL in the future rows, group keys carried (reference future.py:371-449).
    ``sort`` pays the global range-shuffle only on request (Spark frames are
    unordered; same policy as pad_by_time/summarize_by_time).
    """
    group_cols = list(group_cols or [])
    future = make_future_timeseries(df, date_column, length_out, freq, group_cols)
    value_cols = [c for c in df.columns if c != date_column and c not in group_cols]
    for c, t in df.dtypes:
        if c in value_cols:
            future = future.withColumn(c, F.lit(None).cast(t))
    future = future.select(*df.columns)
    out = future if not bind_data else df.unionByName(future)
    return out.orderBy(*group_cols, date_column) if sort else out
