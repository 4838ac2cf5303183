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
        mode: str = "backward",
        split_limit: int | None = None,
    ):
        if frequency not in _FREQ_TO_TIMEDELTA:
            raise ValueError(f"frequency must be one of {list(_FREQ_TO_TIMEDELTA)}")
        if window not in ("rolling", "expanding"):
            raise ValueError("window must be 'rolling' or 'expanding'")
        if mode not in ("backward", "forward"):
            raise ValueError("mode must be 'backward' or 'forward'")
        self.frequency = frequency
        self.train_size = train_size
        self.forecast_horizon = forecast_horizon
        self.gap = gap
        self.stride = stride or forecast_horizon
        self.window = window
        self.mode = mode
        self.split_limit = split_limit

    def _delta(self, n: int) -> pd.Timedelta:
        return _FREQ_TO_TIMEDELTA[self.frequency](n)

    def split_bounds(
        self, start: _dt.datetime, end: _dt.datetime
    ) -> list[tuple[pd.Timestamp, pd.Timestamp, pd.Timestamp, pd.Timestamp]]:
        """[(train_lo, train_hi, test_lo, test_hi)] in chronological order.

        mode="backward" (reference default, time_series_cv.py:568-570):
        test windows right-aligned at ``end``, walking backward by stride;
        mode="forward": train starts at ``start``, walking forward.
        ``split_limit`` keeps the first N splits in generation order."""
        start, end = pd.Timestamp(start), pd.Timestamp(end)
        folds = []
        if self.mode == "backward":
            test_hi = end
            while True:
                test_lo = test_hi - self._delta(self.forecast_horizon)
                train_hi = test_lo - self._delta(self.gap)
                train_lo = (
                    start
                    if self.window == "expanding"
                    else train_hi - self._delta(self.train_size)
                )
                if train_lo < start or train_hi <= train_lo:
                    break
                folds.append((train_lo, train_hi, test_lo, test_hi))
                test_hi = test_hi - self._delta(self.stride)
            if self.split_limit is not None:
                folds = folds[: self.split_limit]
            return list(reversed(folds))
        # forward: left-aligned at start
        train_lo = start
        train_hi = start + self._delta(self.train_size)
        while True:
            test_lo = train_hi + self._delta(self.gap)
            test_hi = test_lo + self._delta(self.forecast_horizon)
            if test_hi > end:
                break
            folds.append((train_lo, train_hi, test_lo, test_hi))
            train_hi = train_hi + self._delta(self.stride)
            if self.window == "rolling":
                train_lo = train_hi - self._delta(self.train_size)
        if self.split_limit is not None:
            folds = folds[: self.split_limit]
        return folds

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


try:  # sklearn is optional in this environment
    from sklearn.model_selection import BaseCrossValidator as _BaseCV
except ImportError:  # pragma: no cover
    _BaseCV = object


class TimeSeriesCVSplitter(_BaseCV):
    """scikit-learn compatible adapter over :class:`TimeSeriesCV`
    (reference crossvalidation/time_series_cv.py:455-560): holds the time
    axis as a pandas Series/Index and yields positional (train_idx,
    test_idx) arrays, so it plugs into sklearn search CV objects. When
    sklearn is absent the class still duck-types ``split`` /
    ``get_n_splits`` — all sklearn actually calls."""

    def __init__(
        self,
        *,
        frequency: str,
        train_size: int,
        forecast_horizon: int,
        time_series,
        gap: int = 0,
        stride: int | None = None,
        window: str = "rolling",
        mode: str = "backward",
        start_dt=None,
        end_dt=None,
        split_limit: int | None = None,
    ):
        self.splitter = TimeSeriesCV(
            frequency=frequency,
            train_size=train_size,
            forecast_horizon=forecast_horizon,
            gap=gap,
            stride=stride,
            window=window,
            mode=mode,
            split_limit=split_limit,
        )
        self.time_series_ = pd.Series(pd.to_datetime(pd.Series(time_series).values))
        self.start_dt_ = start_dt
        self.end_dt_ = end_dt
        self.size_ = len(self.time_series_)
        self.n_splits = self._compute_n_splits()

    def _bounds(self):
        start = self.start_dt_ or self.time_series_.min()
        end = self.end_dt_ or self.time_series_.max()
        return self.splitter.split_bounds(start, end)

    def _compute_n_splits(self) -> int:
        return len(self._bounds())

    def split(self, X=None, y=None, groups=None):
        """Yield (train_indices, test_indices) positional arrays."""
        self._validate_split_args(self.size_, X, y, groups)
        import numpy as np

        ts = self.time_series_
        idx = np.arange(self.size_)
        for train_lo, train_hi, test_lo, test_hi in self._bounds():
            train_mask = ((ts >= train_lo) & (ts < train_hi)).to_numpy()
            test_mask = ((ts > test_lo) & (ts <= test_hi)).to_numpy()
            yield idx[train_mask], idx[test_mask]

    def get_n_splits(self, X=None, y=None, groups=None) -> int:
        self._validate_split_args(self.size_, X, y, groups)
        return self.n_splits

    @staticmethod
    def _validate_split_args(size: int, X=None, y=None, groups=None) -> None:
        for name, arr in (("X", X), ("y", y), ("groups", groups)):
            if arr is not None and len(arr) != size:
                raise ValueError(
                    f"Invalid shape: {name} has {len(arr)} elements, "
                    f"expected {size}."
                )
