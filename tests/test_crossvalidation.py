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
