"""Frame utility helpers mirrored from the reference's utils/pandas_helpers
(transform_columns, drop_zero_variance, sort_dataframe) — Spark-native.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pytimetk_spark.functions.selection import ColumnSelector, resolve_columns


def transform_columns(
    df: DataFrame,
    columns: ColumnSelector,
    transform: Callable[[Column], Column],
) -> DataFrame:
    """Apply a Column→Column transform to the selected columns in place
    (reference utils/pandas_helpers.py transform_columns)."""
    cols = resolve_columns(df.columns, columns)
    return df.select(
        *[
            transform(F.col(c)).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


def drop_zero_variance(df: DataFrame) -> DataFrame:
    """Drop numeric columns whose variance is 0 / undefined (reference
    utils/pandas_helpers.py drop_zero_variance). One aggregate pass."""
    numeric = [
        c
        for c, t in df.dtypes
        if t.split("(")[0]
        in ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")
    ]
    if not numeric:
        return df
    row = df.agg(
        *[F.var_samp(F.col(c).cast("double")).alias(c) for c in numeric]
    ).first()
    keep_pred = {c: (row[c] is not None and row[c] > 0) for c in numeric}
    drops = [c for c in numeric if not keep_pred[c]]
    return df.drop(*drops)


def sort_dataframe(
    df: DataFrame, date_column: str, group_cols: Sequence[str] | None = None
) -> DataFrame:
    """Deterministic (group..., ts) ordering (the reference sorts before
    every kernel; in Spark ordering is only meaningful at output)."""
    return df.orderBy(*(list(group_cols or []) + [date_column]))
