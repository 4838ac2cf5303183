"""Differential tests for finance indicators vs direct pandas ports of the
reference kernels (reference: /root/reference/src/pytimetk/finance/*)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pytimetk_spark import (
    augment_atr,
    augment_bbands,
    augment_cmo,
    augment_drawdown,
    augment_macd,
    augment_ppo,
    augment_roc,
    augment_rsi,
    augment_stochastic_oscillator,
)


@pytest.fixture(scope="module")
def ohlcv(spark):
    rng = np.random.RandomState(7)
    n = 120
    close = 100 + rng.randn(n).cumsum()
    high = close + np.abs(rng.randn(n))
    low = close - np.abs(rng.randn(n))
    pdf = pd.DataFrame(
        {
            "symbol": ["AAA"] * (n // 2) + ["BBB"] * (n // 2),
            "date": list(pd.date_range("2021-01-01", periods=n // 2, freq="D")) * 2,
            "close": close,
            "high": high,
            "low": low,
        }
    )
    return spark.createDataFrame(pdf), pdf


def _sorted(df):
    return df.sort_values(["symbol", "date"]).reset_index(drop=True)


def test_rsi(ohlcv):
    sdf, pdf = ohlcv
    out = _sorted(
        augment_rsi(sdf, "date", "close", periods=14, group_cols=["symbol"]).toPandas()
    )
    ref = _sorted(pdf.copy())

    def rsi(series, period=14):
        delta = series.diff()
        gains = delta.where(delta > 0, 0)
        losses = -delta.where(delta < 0, 0)
        return 100 - (100 / (1 + gains.rolling(period).mean() / losses.rolling(period).mean()))

    expected = ref.groupby("symbol")["close"].transform(rsi)
    np.testing.assert_allclose(
        out["close_rsi_14"].to_numpy(), expected.to_numpy(), equal_nan=True, rtol=1e-9
    )


def test_bbands(ohlcv):
    sdf, pdf = ohlcv
    out = _sorted(
        augment_bbands(
            sdf, "date", "close", periods=20, std_dev=2, group_cols=["symbol"]
        ).toPandas()
    )
    ref = _sorted(pdf.copy())
    g = ref.groupby("symbol")["close"]
    ma = g.transform(lambda s: s.rolling(20).mean())
    sd = g.transform(lambda s: s.rolling(20).std())
    np.testing.assert_allclose(
        out["close_bband_middle_20_2.0"].to_numpy(), ma, equal_nan=True, rtol=1e-9
    )
    np.testing.assert_allclose(
        out["close_bband_upper_20_2.0"].to_numpy(), ma + 2 * sd, equal_nan=True, rtol=1e-9
    )


def test_atr(ohlcv):
    sdf, pdf = ohlcv
    out = _sorted(
        augment_atr(
            sdf, "date", "high", "low", "close", periods=14, group_cols=["symbol"]
        ).toPandas()
    )
    ref = _sorted(pdf.copy())

    def atr(d):
        prev_c = d["close"].shift(1)
        tr = pd.concat(
            [d["high"] - d["low"], (d["high"] - prev_c).abs(), (d["low"] - prev_c).abs()],
            axis=1,
        ).max(axis=1)
        return tr.rolling(14, min_periods=1).mean()

    expected = ref.groupby("symbol", group_keys=False).apply(atr)
    np.testing.assert_allclose(
        out["close_atr_14"].to_numpy(),
        expected.to_numpy(),
        equal_nan=True,
        rtol=1e-9,
    )


def test_roc_cmo_drawdown(ohlcv):
    sdf, pdf = ohlcv
    ref = _sorted(pdf.copy())
    g = ref.groupby("symbol")["close"]

    out = _sorted(
        augment_roc(sdf, "date", "close", periods=10, group_cols=["symbol"]).toPandas()
    )
    expected = g.transform(lambda s: s.pct_change(10))
    np.testing.assert_allclose(
        out["close_roc_0_10"].to_numpy(), expected, equal_nan=True, rtol=1e-9
    )

    out = _sorted(
        augment_cmo(sdf, "date", "close", periods=14, group_cols=["symbol"]).toPandas()
    )

    def cmo(s):
        delta = s.diff()
        gains = delta.where(delta > 0, 0.0)
        losses = -delta.where(delta < 0, 0.0)
        gs = gains.rolling(14, min_periods=14).sum()
        ls = losses.rolling(14, min_periods=14).sum()
        return 100 * (gs - ls) / (gs + ls)

    np.testing.assert_allclose(
        out["close_cmo_14"].to_numpy(), g.transform(cmo), equal_nan=True, rtol=1e-9
    )

    out = _sorted(augment_drawdown(sdf, "date", "close", group_cols=["symbol"]).toPandas())
    peak = g.transform("cummax")
    np.testing.assert_allclose(out["close_peak"].to_numpy(), peak, rtol=1e-12)
    np.testing.assert_allclose(
        out["close_drawdown"].to_numpy(), ref["close"] - peak, rtol=1e-9, atol=1e-12
    )


def test_macd_ppo(ohlcv):
    sdf, pdf = ohlcv
    ref = _sorted(pdf.copy())
    g = ref.groupby("symbol")["close"]
    out = _sorted(
        augment_macd(sdf, "date", "close", group_cols=["symbol"]).toPandas()
    )
    ema_f = g.transform(lambda s: s.ewm(span=12, adjust=False).mean())
    ema_s = g.transform(lambda s: s.ewm(span=26, adjust=False).mean())
    macd = ema_f - ema_s
    np.testing.assert_allclose(
        out["close_macd_line_12_26_9"].to_numpy(), macd, rtol=1e-9
    )
    out = _sorted(augment_ppo(sdf, "date", "close", group_cols=["symbol"]).toPandas())
    np.testing.assert_allclose(
        out["close_ppo_line_12_26"].to_numpy(), (ema_f - ema_s) / ema_s * 100, rtol=1e-9
    )


def test_stochastic(ohlcv):
    sdf, pdf = ohlcv
    ref = _sorted(pdf.copy())
    out = _sorted(
        augment_stochastic_oscillator(
            sdf, "date", "high", "low", "close", k_periods=14, d_periods=3,
            group_cols=["symbol"],
        ).toPandas()
    )

    def k(d):
        ll = d["low"].rolling(14, min_periods=1).min()
        hh = d["high"].rolling(14, min_periods=1).max()
        return 100 * (d["close"] - ll) / (hh - ll)

    expected_k = ref.groupby("symbol", group_keys=False).apply(k)
    np.testing.assert_allclose(
        out["close_stoch_k_14"].to_numpy(), expected_k.to_numpy(), rtol=1e-9
    )


# ---------------------------------------------------------------------------
# regime detection (numpy Gaussian-HMM backend — hmmlearn absent)


def test_regime_detection_differential_and_quality(spark):
    """Spark grouped-map output must equal the numpy kernel run directly
    per group (distribution-layer differential), and on planted two-regime
    data the labels must separate the volatility segments."""
    from pytimetk_spark import augment_regime_detection
    from pytimetk_spark.operators.finance import _detect_regimes

    rng = np.random.RandomState(3)
    frames = []
    for sym in ["AAA", "BBB"]:
        lr = np.concatenate(
            [rng.randn(200) * 0.01, rng.randn(200) * 0.05, rng.randn(200) * 0.01]
        )
        close = 100 * np.exp(np.cumsum(lr))
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "date": pd.date_range("2020-01-01", periods=600, freq="D"),
                    "close": close,
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    sdf = spark.createDataFrame(pdf)

    out = (
        augment_regime_detection(
            sdf, "date", "close", window=150, n_regimes=2, step_size=25,
            group_cols=["symbol"],
        )
        .toPandas()
        .sort_values(["symbol", "date"])
        .reset_index(drop=True)
    )

    for sym, g in pdf.groupby("symbol"):
        vals = g["close"].to_numpy()
        lr = np.log(vals / np.concatenate(([np.nan], vals[:-1])))
        lr[~np.isfinite(lr)] = np.nan
        expected = _detect_regimes(lr, 150, 2, 25, 100)
        got = out.loc[out["symbol"] == sym, "close_regime_150"].to_numpy()
        assert np.allclose(got, expected, equal_nan=True), sym

    # operator-level: labels are in {0,1} and land exactly where the
    # reference's stride loop puts them (step labels per fit)
    g = out[out["symbol"] == "AAA"]["close_regime_150"].to_numpy()
    lab = g[np.isfinite(g)]
    assert set(np.unique(lab)) <= {0.0, 1.0}
    n_fits = (600 - 150) // 25 + 1
    assert len(lab) == n_fits * 25

    # kernel-level: on one window spanning both regimes, Viterbi labels
    # must separate the volatility segments (vol identification quality)
    from pytimetk_spark.functions.hmm import GaussianHMM1D

    rng2 = np.random.RandomState(11)
    x = np.concatenate([rng2.randn(250) * 0.01, rng2.randn(250) * 0.05])
    labels = GaussianHMM1D(2, n_iter=100).fit(x).predict(x)
    lo_maj = np.bincount(labels[:250], minlength=2).argmax()
    hi_maj = np.bincount(labels[250:], minlength=2).argmax()
    assert lo_maj != hi_maj
    assert (labels[:250] == lo_maj).mean() > 0.9
    assert (labels[250:] == hi_maj).mean() > 0.9
    # determinism across refits (task-retry safety)
    assert np.array_equal(labels, GaussianHMM1D(2, n_iter=100).fit(x).predict(x))


def test_regime_detection_validation(spark):
    from pytimetk_spark import augment_regime_detection

    pdf = pd.DataFrame(
        {"date": pd.date_range("2020-01-01", periods=10), "close": np.arange(10.0)}
    )
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError):
        augment_regime_detection(sdf, "date", "close", method="kalman")
    with pytest.raises(ValueError):
        augment_regime_detection(sdf, "date", "close", n_regimes=1)
    with pytest.raises(ValueError):
        augment_regime_detection(sdf, "date", "close", step_size=0)


def test_rsi_zero_loss_window(spark):
    """Monotonically rising window → RSI 100.0 (reference: avg_loss==0 with
    gains → 100); flat window (no gains, no losses) → NULL."""
    from pytimetk_spark import augment_rsi

    pdf = pd.DataFrame(
        {
            "date": pd.date_range("2021-01-01", periods=12, freq="D"),
            "close": [100.0] * 6 + [101, 102, 103, 104, 105, 106],
        }
    )
    out = (
        augment_rsi(spark.createDataFrame(pdf), "date", "close", periods=3)
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    col = out["close_rsi_3"]
    # rows 3..5 sit in an all-flat window: gains == losses == 0 → NaN
    assert col.iloc[3:6].isna().all()
    # rows 8.. sit in an all-gain window: RSI == 100.0
    assert (col.iloc[8:] == 100.0).all()
