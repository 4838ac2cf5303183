"""Tests for TimeSeriesCV walk-forward splits."""

from __future__ import annotations

import pandas as pd
import pytest

from pytimetk_spark import TimeSeriesCV


def test_split_bounds_rolling():
    cv = TimeSeriesCV(frequency="days", train_size=30, forecast_horizon=7, gap=0, stride=7)
    folds = cv.split_bounds(pd.Timestamp("2024-01-01"), pd.Timestamp("2024-03-31"))
    assert len(folds) >= 5
    for train_lo, train_hi, test_lo, test_hi in folds:
        assert train_hi - train_lo == pd.Timedelta(days=30)
        assert test_hi - test_lo == pd.Timedelta(days=7)
        assert train_hi <= test_lo
        assert train_lo >= pd.Timestamp("2024-01-01")
    # folds step forward by stride
    assert folds[1][3] - folds[0][3] == pd.Timedelta(days=7)


def test_split_bounds_expanding_and_gap():
    cv = TimeSeriesCV(
        frequency="days", train_size=30, forecast_horizon=7, gap=3,
        stride=14, window="expanding",
    )
    folds = cv.split_bounds(pd.Timestamp("2024-01-01"), pd.Timestamp("2024-06-30"))
    for train_lo, train_hi, test_lo, test_hi in folds:
        assert train_lo == pd.Timestamp("2024-01-01")  # expanding
        assert test_lo - train_hi == pd.Timedelta(days=3)  # gap
    # later folds have longer training windows
    assert folds[-1][1] > folds[0][1]


def test_split_dataframes(spark):
    pdf = pd.DataFrame(
        {
            "date": pd.date_range("2024-01-01", periods=120, freq="D"),
            "value": range(120),
        }
    )
    sdf = spark.createDataFrame(pdf)
    cv = TimeSeriesCV(frequency="days", train_size=60, forecast_horizon=14, stride=14)
    folds = list(cv.split(sdf, "date"))
    assert len(folds) >= 3
    for train, test in folds:
        tr = train.toPandas()
        te = test.toPandas()
        assert len(tr) > 0 and len(te) > 0
        assert tr["date"].max() <= te["date"].min()
        assert len(te) == 14


def test_invalid_params():
    with pytest.raises(ValueError):
        TimeSeriesCV(frequency="fortnights")
    with pytest.raises(ValueError):
        TimeSeriesCV(window="sliding")


def test_cv_splitter_indices_and_modes(spark):
    """TimeSeriesCVSplitter yields positional index arrays consistent with
    TimeSeriesCV's range predicates; forward mode walks from the start."""
    import numpy as np
    from pytimetk_spark import TimeSeriesCVSplitter

    ts = pd.Series(pd.date_range("2023-01-01", "2023-01-31", freq="D"))
    cv = TimeSeriesCVSplitter(
        time_series=ts, frequency="days", train_size=14,
        forecast_horizon=7, gap=0, stride=7, window="rolling",
    )
    splits = list(cv.split())
    assert cv.get_n_splits() == len(splits) > 0
    for tr, te in splits:
        # contiguous, ordered, non-overlapping, train strictly before test
        assert len(tr) == 14 and len(te) == 7
        assert tr.max() < te.min()
        assert np.array_equal(te, np.arange(te.min(), te.max() + 1))
    # size validation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cv.get_n_splits(X=np.zeros(5))

    fwd = TimeSeriesCVSplitter(
        time_series=ts, frequency="days", train_size=10,
        forecast_horizon=5, stride=5, window="expanding", mode="forward",
        split_limit=2,
    )
    fsplits = list(fwd.split())
    assert len(fsplits) == 2
    # expanding: first train is the smallest, trains grow
    assert len(fsplits[0][0]) < len(fsplits[1][0])
    assert fsplits[0][0].min() == 0 and fsplits[1][0].min() == 0


def test_apply_by_time_wide_format(spark):
    from pytimetk_spark import apply_by_time

    pdf = pd.DataFrame(
        {
            "date": pd.to_datetime(
                ["2020-01-01", "2020-01-02", "2020-01-01", "2020-01-05"]
            ),
            "g": ["a", "a", "b", "b"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        apply_by_time(
            sdf, "date", freq="D", group_cols=["g"], wide_format=True,
            vsum=lambda d: d["v"].sum(),
        )
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["date", "vsum_a", "vsum_b"]
    assert out.loc[0, "vsum_a"] == 1.0 and out.loc[0, "vsum_b"] == 3.0
    # fillna=0 default fills pivot gaps
    assert out.loc[1, "vsum_b"] == 0.0
