"""TimeSeriesCV — time-based train/forecast splits.

Reference: /root/reference/src/pytimetk/crossvalidation/time_series_cv.py:27-110
(params frequency, train_size, forecast_horizon, gap, stride,
window="rolling"|"expanding").

Spark: pure split arithmetic over the distinct sorted time grid (driver-side
on the per-fold BOUNDS only), yielding filter predicates — each fold is a
pushdown-able range filter on the fact table, so folds prune partitions
instead of materializing copies.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FREQ_TO_TIMEDELTA = {
    "seconds": lambda n: pd.Timedelta(seconds=n),
    "minutes": lambda n: pd.Timedelta(minutes=n),
    "hours": lambda n: pd.Timedelta(hours=n),
    "days": lambda n: pd.Timedelta(days=n),
    "weeks": lambda n: pd.Timedelta(weeks=n),
}


class TimeSeriesCV:
    """Walk-forward splits: train window (rolling or expanding) + gap +
    forecast horizon, stepping back from the series end by ``stride``."""

    def __init__(
        self,
        frequency: str = "days",
        train_size: int = 30,
        forecast_horizon: int = 7,
        gap: int = 0,
        stride: int | None = None,
        window: str = "rolling",
    ):
        if frequency not in _FREQ_TO_TIMEDELTA:
            raise ValueError(f"frequency must be one of {list(_FREQ_TO_TIMEDELTA)}")
        if window not in ("rolling", "expanding"):
            raise ValueError("window must be 'rolling' or 'expanding'")
        self.frequency = frequency
        self.train_size = train_size
        self.forecast_horizon = forecast_horizon
        self.gap = gap
        self.stride = stride or forecast_horizon
        self.window = window

    def _delta(self, n: int) -> pd.Timedelta:
        return _FREQ_TO_TIMEDELTA[self.frequency](n)

    def split_bounds(
        self, start: _dt.datetime, end: _dt.datetime
    ) -> list[tuple[pd.Timestamp, pd.Timestamp, pd.Timestamp, pd.Timestamp]]:
        """[(train_lo, train_hi, test_lo, test_hi)] walking backward from
        ``end`` (inclusive bounds, test window right-aligned)."""
        start, end = pd.Timestamp(start), pd.Timestamp(end)
        folds = []
        test_hi = end
        while True:
            test_lo = test_hi - self._delta(self.forecast_horizon)
            train_hi = test_lo - self._delta(self.gap)
            train_lo = (
                start if self.window == "expanding" else train_hi - self._delta(self.train_size)
            )
            if train_lo < start or train_hi <= train_lo:
                break
            folds.append((train_lo, train_hi, test_lo, test_hi))
            test_hi = test_hi - self._delta(self.stride)
        return list(reversed(folds))

    def split(
        self, df: DataFrame, date_column: str
    ) -> Iterator[tuple[DataFrame, DataFrame]]:
        """Yield (train_df, test_df) pairs as range-filtered views."""
        row = df.agg(
            F.min(date_column).alias("lo"), F.max(date_column).alias("hi")
        ).first()
        ts = F.col(date_column)
        for train_lo, train_hi, test_lo, test_hi in self.split_bounds(
            row["lo"], row["hi"]
        ):
            train = df.filter((ts >= F.lit(train_lo)) & (ts < F.lit(train_hi)))
            test = df.filter((ts > F.lit(test_lo)) & (ts <= F.lit(test_hi)))
            yield train, test
