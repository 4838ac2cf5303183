"""Differential tests for the Arrow-UDF finance kernels (EWM/Wilder
recurrences and windowed nonlinear kernels) vs direct pandas/numpy ports of
the reference formulas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pytimetk_spark import (
    augment_adx,
    augment_ewma_volatility,
    augment_fip_momentum,
    augment_hurst_exponent,
    augment_qsmomentum,
    augment_rolling_risk_metrics,
)


@pytest.fixture(scope="module")
def prices(spark):
    rng = np.random.RandomState(21)
    n = 160
    close = 100 * np.exp(np.cumsum(rng.randn(n) * 0.01))
    high = close * (1 + np.abs(rng.randn(n)) * 0.005)
    low = close * (1 - np.abs(rng.randn(n)) * 0.005)
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * (n // 2) + ["Y"] * (n // 2),
            "date": list(pd.date_range("2022-01-03", periods=n // 2, freq="D")) * 2,
            "close": close,
            "high": high,
            "low": low,
        }
    )
    return spark.createDataFrame(pdf), pdf


def _sorted(df):
    return df.sort_values(["symbol", "date"]).reset_index(drop=True)


def test_ewma_volatility(prices):
    sdf, pdf = prices
    out = _sorted(
        augment_ewma_volatility(
            sdf, "date", "close", windows=10, decay_factor=0.94,
            group_cols=["symbol"],
        ).toPandas()
    )
    ref = _sorted(pdf.copy())

    def vol(s):
        prev = s.shift(1)
        r = np.log((s / prev).where(prev != 0))
        r = r.replace([np.inf, -np.inf], np.nan)
        return np.sqrt((r**2).ewm(alpha=0.06, min_periods=10).mean())

    expected = ref.groupby("symbol")["close"].transform(vol)
    np.testing.assert_allclose(
        out["close_ewma_vol_10_0.94"].to_numpy(), expected, equal_nan=True, rtol=1e-9
    )


def test_adx(prices):
    sdf, pdf = prices
    out = _sorted(
        augment_adx(sdf, "date", "high", "low", "close", periods=14,
                    group_cols=["symbol"]).toPandas()
    )
    ref = _sorted(pdf.copy())

    def adx_frame(d):
        prev_h, prev_l, prev_c = d["high"].shift(1), d["low"].shift(1), d["close"].shift(1)
        tr = pd.concat(
            [d["high"] - d["low"], (d["high"] - prev_c).abs(), (d["low"] - prev_c).abs()],
            axis=1,
        ).max(axis=1)
        up, down = d["high"] - prev_h, prev_l - d["low"]
        plus_dm = pd.Series(np.where(up > down, np.maximum(up, 0), 0), index=d.index)
        minus_dm = pd.Series(np.where(down > up, np.maximum(down, 0), 0), index=d.index)
        sm = lambda s: s.ewm(alpha=1 / 14, adjust=False, min_periods=14).mean()
        plus_di = 100 * sm(plus_dm) / sm(tr)
        minus_di = 100 * sm(minus_dm) / sm(tr)
        dx = 100 * (plus_di - minus_di).abs() / (plus_di + minus_di)
        return pd.DataFrame(
            {"p": plus_di, "m": minus_di,
             "a": dx.ewm(alpha=1 / 14, adjust=False, min_periods=14).mean()}
        )

    expected = ref.groupby("symbol", group_keys=False).apply(
        adx_frame, include_groups=False
    )
    np.testing.assert_allclose(
        out["close_plus_di_14"], expected["p"], equal_nan=True, rtol=1e-9
    )
    np.testing.assert_allclose(
        out["close_adx_14"], expected["a"], equal_nan=True, rtol=1e-9
    )


def test_hurst(prices):
    sdf, pdf = prices
    out = _sorted(
        augment_hurst_exponent(sdf, "date", "close", windows=30,
                               group_cols=["symbol"]).toPandas()
    )
    # NaN until the window fills; values in [0, 1]
    col = out["close_hurst_30"]
    per_symbol_nans = out.groupby(out["symbol"])["close_hurst_30"].apply(
        lambda s: s.head(29).isna().all()
    )
    assert per_symbol_nans.all()
    valid = col.dropna()
    assert len(valid) > 0
    assert valid.between(0, 1).all()
    # a random walk's R/S hurst should be distinctly > 0.3
    assert valid.mean() > 0.3


def test_fip_momentum(prices):
    sdf, pdf = prices
    out = _sorted(
        augment_fip_momentum(sdf, "date", "close", windows=20,
                             group_cols=["symbol"]).toPandas()
    )
    ref = _sorted(pdf.copy())

    def fip(s):
        rets = s / s.shift(1) - 1

        def calc(x):
            x = x.dropna()
            if len(x) < 20:
                return np.nan
            tot = np.prod(1 + x) - 1
            return tot * ((x < 0).mean() - (x > 0).mean())

        return rets.rolling(20, min_periods=20).apply(
            lambda a: calc(pd.Series(a)), raw=False
        )

    expected = ref.groupby("symbol")["close"].transform(fip)
    np.testing.assert_allclose(
        out["close_fip_momentum_20"], expected, equal_nan=True, rtol=1e-9
    )


def test_qsmomentum(prices):
    sdf, pdf = prices
    out = _sorted(
        augment_qsmomentum(
            sdf, "date", "close", roc_fast_period=5, roc_slow_period=20,
            returns_period=10, group_cols=["symbol"],
        ).toPandas()
    )
    ref = _sorted(pdf.copy())

    def qs_arr(close):
        close = pd.Series(close).dropna()
        if len(close) < 21:
            return np.nan
        returns = close.pct_change(fill_method=None).iloc[-10:]
        std = np.std(returns, ddof=0)
        if not np.isfinite(std) or abs(std) < 1e-10:
            return np.nan
        fast_c, slow_c = close.iloc[-6], close.iloc[-21]
        roc_slow = (fast_c - slow_c) / (slow_c + 1e-10)
        roc_fast = (close.iloc[-1] - fast_c) / (fast_c + 1e-10)
        return (roc_slow - roc_fast) / std

    expected = ref.groupby("symbol")["close"].transform(
        lambda s: s.rolling(21, min_periods=21).apply(qs_arr, raw=True)
    )
    np.testing.assert_allclose(
        out["close_qsmom_5_20_10"], expected, equal_nan=True, rtol=1e-9
    )


def test_rolling_risk_metrics(prices):
    sdf, pdf = prices
    out = _sorted(
        augment_rolling_risk_metrics(
            sdf, "date", "close", windows=20, group_cols=["symbol"]
        ).toPandas()
    )
    ref = _sorted(pdf.copy())
    rets = ref.groupby("symbol")["close"].transform(lambda s: s / s.shift(1) - 1)
    ref = ref.assign(ret=rets)
    g = ref.groupby("symbol")["ret"]
    # reference warm-up: min_periods = max(1, window // 2)
    mean20 = g.transform(lambda s: s.rolling(20, min_periods=10).mean())
    std20 = g.transform(lambda s: s.rolling(20, min_periods=10).std())
    ann = np.sqrt(252)
    expected_sharpe = mean20 / std20 * ann
    np.testing.assert_allclose(
        out["close_sharpe_ratio_20"], expected_sharpe, equal_nan=True, rtol=1e-9
    )
    np.testing.assert_allclose(
        out["close_volatility_annualized_20"], std20 * ann, equal_nan=True, rtol=1e-9
    )
