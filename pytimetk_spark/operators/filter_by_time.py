"""filter_by_time — inclusive range predicate on the date column.

Reference: /root/reference/src/pytimetk/core/filter_by_time.py:256-295 and
parse_end_date (utils/datetime_helpers.py:626-646): a partial end-date
string expands to the end of its granularity — "2024" → 2024-12-31 00:00
(YearEnd offset), "2024-02" → 2024-02-29 00:00 (MonthEnd), "2024-02-05" →
…05 23:59:59, "2024-02-05 13" → 13:59:59, "…13:45" → 13:45:59.

Spark: a plain Catalyst ``BETWEEN`` predicate — pushes down to the parquet/
Iceberg scan (PushedFilters) and prunes `days(warc_ts)` partitions, which
is the whole point at 100 TB.
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_end_date(date_str: str) -> pd.Timestamp:
    """Granularity-aware end-of-period expansion (reference
    datetime_helpers.py:626-646 — note year/month expand to period-end
    MIDNIGHT, day and finer expand to :59 boundaries)."""
    date = pd.to_datetime(date_str)
    n = len(date_str)
    if n == 4:
        return date + pd.offsets.YearEnd()
    if n == 7:
        return date + pd.offsets.MonthEnd()
    if n == 10:
        return pd.Timestamp(date_str).replace(hour=23, minute=59, second=59)
    if n == 13:
        return pd.Timestamp(date_str).replace(minute=59, second=59)
    if n == 16:
        return pd.Timestamp(date_str).replace(second=59)
    if n == 19:
        return date
    return pd.Timestamp(date_str).replace(hour=23, minute=59, second=59)


def filter_by_time(
    df: DataFrame,
    date_column: str,
    start_date: str | _dt.datetime = "start",
    end_date: str | _dt.datetime = "end",
) -> DataFrame:
    """Keep rows with start_date <= date_column <= end_date (inclusive both
    ends). "start"/"end" keywords mean unbounded on that side."""
    ts = F.col(date_column)
    out = df
    if start_date != "start":
        lo = pd.to_datetime(start_date) if isinstance(start_date, str) else start_date
        out = out.filter(ts >= F.lit(lo).cast(dict(df.dtypes)[date_column]))
    if end_date != "end":
        hi = (
            parse_end_date(end_date)
            if isinstance(end_date, str)
            else pd.to_datetime(end_date)
        )
        out = out.filter(ts <= F.lit(hi).cast(dict(df.dtypes)[date_column]))
    return out
