"""Shift-family augment operators: lags, leads, diffs, pct_change.

Reference column-name contracts (asserted by the reference test suite):
  - augment_lags   → ``{col}_lag_{k}``      (feature_engineering/lags.py:213-242)
  - augment_leads  → ``{col}_lead_{k}``     (leads.py:162-170)
  - augment_diffs  → ``{col}_diff_{p}``     (diffs.py:220-260)
  - augment_pct_change → ``{col}_pctdiff_{p}`` (pct_change.py:119-130)

Spark: a single ``Window.partitionBy(groups).orderBy(ts)`` pass; all shifts
for all columns/periods are evaluated in one shuffle+sort. These are native
JVM window functions — whole-stage codegen, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pytimetk_spark.functions.windows import ordered_window

from pytimetk_spark.functions.selection import ColumnSelector, resolve_columns


def _as_list(v) -> list[int]:
    if isinstance(v, int):
        return [v]
    if isinstance(v, tuple) and len(v) == 2:
        return list(range(v[0], v[1] + 1))
    return list(v)


def _window(group_cols: Sequence[str], date_column: str):
    return ordered_window(group_cols, date_column, "augment_shift")


def augment_lags(
    df: DataFrame,
    date_column: str,
    value_column: ColumnSelector,
    lags: int | tuple | Sequence[int] = 1,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    group_cols = list(group_cols or [])
    cols = resolve_columns(df.columns, value_column)
    w = _window(group_cols, date_column)
    out = df
    for c in cols:
        for k in _as_list(lags):
            out = out.withColumn(f"{c}_lag_{k}", F.lag(c, k).over(w))
    return out


def augment_leads(
    df: DataFrame,
    date_column: str,
    value_column: ColumnSelector,
    leads: int | tuple | Sequence[int] = 1,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    group_cols = list(group_cols or [])
    cols = resolve_columns(df.columns, value_column)
    w = _window(group_cols, date_column)
    out = df
    for c in cols:
        for k in _as_list(leads):
            out = out.withColumn(f"{c}_lead_{k}", F.lead(c, k).over(w))
    return out


def augment_diffs(
    df: DataFrame,
    date_column: str,
    value_column: ColumnSelector,
    periods: int | tuple | Sequence[int] = 1,
    group_cols: Sequence[str] | None = None,
    normalize: bool = False,
) -> DataFrame:
    """x - lag(x, p); with normalize=True → x/lag(x, p) - 1 (the reference's
    diffs.py:235 delegation used by pct_change)."""
    group_cols = list(group_cols or [])
    cols = resolve_columns(df.columns, value_column)
    w = _window(group_cols, date_column)
    out = df
    for c in cols:
        for p in _as_list(periods):
            prev = F.lag(c, p).over(w)
            if normalize:
                # NULL (not ±inf/ANSI error) on a zero base — Spark ANSI
                # division would otherwise abort the whole job on one zero
                out = out.withColumn(
                    f"{c}_pctdiff_{p}",
                    F.when(prev != 0, F.col(c) / prev - 1),
                )
            else:
                out = out.withColumn(f"{c}_diff_{p}", F.col(c) - prev)
    return out


def augment_pct_change(
    df: DataFrame,
    date_column: str,
    value_column: ColumnSelector,
    periods: int | tuple | Sequence[int] = 1,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    return augment_diffs(
        df, date_column, value_column, periods, group_cols, normalize=True
    )
