"""Golden tests for the augment family, ported from the reference suites
(tests/feature_engineering/test_rolling.py, test_lags.py) plus pandas
differential oracles for expanding/ewm/signature."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pytimetk_spark import (
    augment_diffs,
    augment_ewm,
    augment_expanding,
    augment_lags,
    augment_leads,
    augment_pct_change,
    augment_rolling,
    augment_rolling_apply,
    augment_timeseries_signature,
)
from tests.conftest import assert_pdf_equal


@pytest.fixture
def small3(spark):
    pdf = pd.DataFrame(
        {"date": pd.date_range("2021-01-01", periods=3), "value": [1.0, 2, 3]}
    )
    return spark.createDataFrame(pdf), pdf


@pytest.fixture
def grouped5(spark):
    pdf = pd.DataFrame(
        {
            "date": list(pd.date_range("2021-01-01", periods=5)),
            "value": [1.0, 2, 3, 4, 5],
            "id": ["A", "A", "A", "B", "B"],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_lags(grouped5):
    sdf, pdf = grouped5
    out = augment_lags(sdf, "date", "value", lags=(1, 2), group_cols=["id"]).toPandas()
    out = out.sort_values(["id", "date"]).reset_index(drop=True)
    assert out.columns.tolist() == ["date", "value", "id", "value_lag_1", "value_lag_2"]
    a = out[out.id == "A"]
    assert a["value_lag_1"].tolist()[1] == 1.0
    assert pd.isna(out[out.id == "B"]["value_lag_1"].iloc[0])


def test_leads_diffs_pct_change(small3):
    sdf, pdf = small3
    out = augment_leads(sdf, "date", "value", leads=1).toPandas().sort_values("date")
    assert out["value_lead_1"].tolist()[:2] == [2.0, 3.0]
    out = augment_diffs(sdf, "date", "value", periods=1).toPandas().sort_values("date")
    assert out["value_diff_1"].tolist()[1:] == [1.0, 1.0]
    out = (
        augment_pct_change(sdf, "date", "value", periods=1)
        .toPandas()
        .sort_values("date")
    )
    assert out["value_pctdiff_1"].tolist()[1:] == [1.0, 0.5]


def test_rolling_single_window(small3):
    """Reference golden test_rolling.py:42-54."""
    sdf, pdf = small3
    out = (
        augment_rolling(sdf, "date", "value", window=2, window_func="mean")
        .toPandas()
        .sort_values("date")
    )
    assert out["value_rolling_mean_win_2"].tolist()[1:] == [1.5, 2.5]
    assert pd.isna(out["value_rolling_mean_win_2"].iloc[0])


def test_rolling_multi_window_multi_func(small3):
    """Reference golden test_rolling.py:56-73 — pins the sticky min_periods
    quirk (win_3 inherits win_2's min_periods)."""
    sdf, pdf = small3
    out = (
        augment_rolling(
            sdf, "date", "value", window=[2, 3], window_func=["mean", "sum"]
        )
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    expected = {
        "value_rolling_mean_win_2": [np.nan, 1.5, 2.5],
        "value_rolling_sum_win_2": [np.nan, 3.0, 5.0],
        "value_rolling_mean_win_3": [np.nan, 1.5, 2.0],
        "value_rolling_sum_win_3": [np.nan, 3.0, 6.0],
    }
    for col, vals in expected.items():
        np.testing.assert_allclose(out[col].to_numpy(), vals, equal_nan=True)


def test_rolling_grouped_parity_with_pandas(spark):
    rng = np.random.RandomState(42)
    pdf = pd.DataFrame(
        {
            "id": np.repeat([f"g{i}" for i in range(5)], 60),
            "date": list(pd.date_range("2020-01-01", periods=60, freq="D")) * 5,
            "value": rng.randn(300).cumsum() + 50,
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        augment_rolling(
            sdf,
            "date",
            "value",
            window=7,
            window_func=["mean", "std", "min", "max", "median", "skew", "kurt"],
            group_cols=["id"],
        )
        .toPandas()
        .sort_values(["id", "date"])
        .reset_index(drop=True)
    )
    g = pdf.sort_values(["id", "date"]).groupby("id")["value"]
    for func in ["mean", "std", "min", "max", "median", "skew", "kurt"]:
        expected = g.transform(lambda s, fn=func: getattr(s.rolling(7), fn)())
        # skew/kurt use closed-form rolling power sums — catastrophic
        # cancellation bounds agreement to ~1e-5 relative
        rtol = 1e-4 if func in ("skew", "kurt") else 1e-9
        np.testing.assert_allclose(
            out[f"value_rolling_{func}_win_7"].to_numpy(),
            expected.to_numpy(),
            equal_nan=True,
            rtol=rtol,
            atol=1e-7 if func in ("skew", "kurt") else 0,
            err_msg=func,
        )


def test_rolling_center(spark):
    pdf = pd.DataFrame(
        {"date": pd.date_range("2021-01-01", periods=10), "value": np.arange(10.0)}
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        augment_rolling(sdf, "date", "value", window=3, window_func="mean", center=True)
        .toPandas()
        .sort_values("date")
    )
    expected = pdf["value"].rolling(3, center=True).mean()
    np.testing.assert_allclose(
        out["value_rolling_mean_win_3"].to_numpy(), expected, equal_nan=True
    )


def test_rolling_apply_custom(small3):
    """Reference golden test_rolling.py custom func → rolling_range_win_2."""
    sdf, pdf = small3
    out = (
        augment_rolling_apply(
            sdf,
            "date",
            window=2,
            window_func=[("range", lambda d: d["value"].max() - d["value"].min())],
        )
        .toPandas()
        .sort_values("date")
    )
    np.testing.assert_allclose(
        out["rolling_range_win_2"].to_numpy(), [np.nan, 1.0, 1.0], equal_nan=True
    )


def test_expanding(small3):
    sdf, pdf = small3
    out = (
        augment_expanding(sdf, "date", "value", window_func=["mean", "sum"])
        .toPandas()
        .sort_values("date")
    )
    assert out["value_expanding_mean"].tolist() == [1.0, 1.5, 2.0]
    assert out["value_expanding_sum"].tolist() == [1.0, 3.0, 6.0]


def test_ewm_parity(spark):
    pdf = pd.DataFrame(
        {
            "id": ["A"] * 30 + ["B"] * 30,
            "date": list(pd.date_range("2020-01-01", periods=30)) * 2,
            "value": np.arange(60, dtype="float64") ** 1.5,
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        augment_ewm(sdf, "date", "value", window_func=["mean", "std"], alpha=0.1,
                    group_cols=["id"])
        .toPandas()
        .sort_values(["id", "date"])
        .reset_index(drop=True)
    )
    ref = pdf.sort_values(["id", "date"]).reset_index(drop=True)
    for fn in ["mean", "std"]:
        expected = (
            ref.groupby("id")["value"].transform(
                lambda s, f=fn: getattr(s.ewm(alpha=0.1), f)()
            )
        )
        np.testing.assert_allclose(
            out[f"value_ewm_{fn}_alpha_0.1"].to_numpy(),
            expected.to_numpy(),
            equal_nan=True,
            rtol=1e-9,
        )


def test_timeseries_signature_quarter_boundaries(spark):
    """The r7 month/day-arithmetic quarter features (quarterstart,
    quarterend, qday — replacing date_trunc/last_day/add_months per-row
    date rebuilding) must match pandas on every quarter boundary ±1 day
    across leap, non-leap, century (1900) and 400-year (2000) years."""
    days = []
    for y in (1899, 1900, 1901, 1999, 2000, 2004, 2023, 2024, 2100):
        for m, d in [(1, 1), (3, 31), (4, 1), (6, 30), (7, 1),
                     (9, 30), (10, 1), (12, 31), (2, 28), (3, 1)]:
            days.append(pd.Timestamp(year=y, month=m, day=d, hour=23,
                                     minute=59, second=59))
            days.append(pd.Timestamp(year=y, month=m, day=d))
    pdf = pd.DataFrame({"date": days})
    out = (augment_timeseries_signature(spark.createDataFrame(pdf), "date")
           .toPandas().sort_values("date").reset_index(drop=True))
    d = out["date"]
    np.testing.assert_array_equal(
        out["date_quarterstart"].to_numpy(),
        d.dt.is_quarter_start.astype(int).to_numpy())
    np.testing.assert_array_equal(
        out["date_quarterend"].to_numpy(),
        d.dt.is_quarter_end.astype(int).to_numpy())
    np.testing.assert_array_equal(
        out["date_qday"].to_numpy(),
        ((d - pd.PeriodIndex(d, freq="Q").start_time).dt.days + 1)
        .to_numpy())


def test_timeseries_signature_parity(spark):
    pdf = pd.DataFrame(
        {"date": pd.date_range("2019-12-28 05:30:15", periods=200, freq="13h")}
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        augment_timeseries_signature(sdf, "date")
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    d = pdf["date"]
    checks = {
        "date_index_num": d.astype(np.int64) // 10**9,
        "date_year": d.dt.year,
        "date_year_iso": d.dt.isocalendar().year.astype("int64"),
        "date_yearstart": d.dt.is_year_start.astype(int),
        "date_yearend": d.dt.is_year_end.astype(int),
        "date_leapyear": d.dt.is_leap_year.astype(int),
        "date_half": np.where(d.dt.quarter <= 2, 1, 2),
        "date_quarter": d.dt.quarter,
        "date_quarterstart": d.dt.is_quarter_start.astype(int),
        "date_quarterend": d.dt.is_quarter_end.astype(int),
        "date_month": d.dt.month,
        "date_month_lbl": d.dt.month_name(),
        "date_monthstart": d.dt.is_month_start.astype(int),
        "date_monthend": d.dt.is_month_end.astype(int),
        "date_yweek": d.dt.isocalendar().week.astype("int64"),
        "date_mweek": (d.dt.day - 1) // 7 + 1,
        "date_wday": d.dt.dayofweek + 1,
        "date_wday_lbl": d.dt.day_name(),
        "date_mday": d.dt.day,
        "date_qday": (d - pd.PeriodIndex(d, freq="Q").start_time).dt.days + 1,
        "date_yday": d.dt.dayofyear,
        "date_weekend": np.where(d.dt.dayofweek <= 5, 0, 1),
        "date_hour": d.dt.hour,
        "date_minute": d.dt.minute,
        "date_second": d.dt.second,
        "date_am_pm": np.where(d.dt.hour <= 12, "am", "pm"),
    }
    for col, expected in checks.items():
        np.testing.assert_array_equal(
            out[col].to_numpy(), np.asarray(expected), err_msg=col
        )
