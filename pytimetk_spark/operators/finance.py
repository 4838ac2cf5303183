"""Finance indicators — composites of the augment primitives.

Reference: /root/reference/src/pytimetk/finance/*.py (column-name contracts
cited per function). SMA/rolling-extrema/cummax families are pure native
Window expressions (one shuffle+sort for all indicators over the same
group/order); EMA/Wilder recurrences (macd, ppo, adx, ewma_volatility) and
windowed nonlinear kernels (hurst, fip, qsmomentum) run as Arrow
grouped-map UDFs — the same dispatch the reference uses, minus Ray.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pytimetk_spark.functions.windows import ordered_window

from pytimetk_spark.operators.augment_rolling import _grouped_apply


def _norm_periods(periods) -> list[int]:
    if isinstance(periods, int):
        return [periods]
    if isinstance(periods, tuple) and len(periods) == 2:
        return list(range(periods[0], periods[1] + 1))
    return [int(p) for p in periods]


def _base(group_cols: Sequence[str], date_column: str):
    return ordered_window(group_cols, date_column, "finance")


def _gated_avg(col: Column, frame, min_periods: int) -> Column:
    return F.when(F.count(col).over(frame) >= min_periods, F.avg(col).over(frame))


# ---------------------------------------------------------------------------
# native (window-expression) indicators


def augment_rsi(
    df: DataFrame,
    date_column: str,
    close_column: str,
    periods=14,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_rsi_{p}`` — SMA-of-gains / SMA-of-losses RSI
    (finance/rsi.py:381-396)."""
    group_cols = list(group_cols or [])
    w = _base(group_cols, date_column)
    delta = F.col(close_column) - F.lag(close_column).over(w)
    out = df.withColumn("__gain__", F.when(delta > 0, delta).otherwise(F.lit(0.0)))
    out = out.withColumn("__loss__", F.when(delta < 0, -delta).otherwise(F.lit(0.0)))
    wb = _base(group_cols, date_column)
    for p in _norm_periods(periods):
        frame = wb.rowsBetween(-(p - 1), 0)
        g = _gated_avg(F.col("__gain__"), frame, p)
        l_ = _gated_avg(F.col("__loss__"), frame, p)
        # zero rolling loss: reference yields 100.0 when gains exist
        # (mean_gains/0 → inf → RSI 100; polars path does it explicitly),
        # NULL only when gains AND losses are both zero
        out = out.withColumn(
            f"{close_column}_rsi_{p}",
            F.when(l_ == 0, F.when(g != 0, F.lit(100.0))).otherwise(
                100 - (100 / (1 + g / l_))
            ),
        )
    return out.drop("__gain__", "__loss__")


def augment_bbands(
    df: DataFrame,
    date_column: str,
    close_column: str,
    periods=20,
    std_dev: float | Sequence[float] = 2,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_bband_{middle|upper|lower}_{p}_{sd:.1f}`` (finance/bbands.py:287-312)."""
    group_cols = list(group_cols or [])
    wb = _base(group_cols, date_column)
    sds = [std_dev] if isinstance(std_dev, (int, float)) else list(std_dev)
    out = df
    c = F.col(close_column)
    for p in _norm_periods(periods):
        frame = wb.rowsBetween(-(p - 1), 0)
        gate = F.count(c).over(frame) >= p
        ma = F.when(gate, F.avg(c).over(frame))
        sd_col = F.when(gate, F.stddev_samp(c).over(frame))
        for sd in sds:
            fmt = f"{float(sd):.1f}"
            out = (
                out.withColumn(f"{close_column}_bband_middle_{p}_{fmt}", ma)
                .withColumn(f"{close_column}_bband_upper_{p}_{fmt}", ma + sd * sd_col)
                .withColumn(f"{close_column}_bband_lower_{p}_{fmt}", ma - sd * sd_col)
            )
    return out


def augment_atr(
    df: DataFrame,
    date_column: str,
    high_column: str,
    low_column: str,
    close_column: str,
    periods=14,
    normalize: bool = False,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{close}_{atr|natr}_{p}`` — TR = max(H−L, |H−prevC|, |L−prevC|);
    ATR = SMA(TR, p, min_periods=1); NATR = 100·ATR/close
    (finance/atr.py:265-322)."""
    group_cols = list(group_cols or [])
    w = _base(group_cols, date_column)
    prev_c = F.lag(close_column).over(w)
    h, low = F.col(high_column), F.col(low_column)
    tr = F.greatest(h - low, F.abs(h - prev_c), F.abs(low - prev_c))
    out = df.withColumn("__tr__", tr)
    wb = _base(group_cols, date_column)
    type_str = "natr" if normalize else "atr"
    for p in _norm_periods(periods):
        frame = wb.rowsBetween(-(p - 1), 0)
        atr = F.avg("__tr__").over(frame)  # min_periods=1
        expr = 100 * atr / F.col(close_column) if normalize else atr
        out = out.withColumn(f"{close_column}_{type_str}_{p}", expr)
    return out.drop("__tr__")


def augment_roc(
    df: DataFrame,
    date_column: str,
    close_column: str,
    periods=1,
    start_index: int = 0,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_roc_{start}_{p}`` = shift(start)/shift(p) − 1
    (finance/roc.py:277-369), null where the denominator is 0."""
    group_cols = list(group_cols or [])
    w = _base(group_cols, date_column)
    out = df
    for p in _norm_periods(periods):
        num = F.col(close_column) if start_index == 0 else F.lag(
            close_column, start_index
        ).over(w)
        den = F.lag(close_column, p).over(w)
        out = out.withColumn(
            f"{close_column}_roc_{start_index}_{p}",
            F.when(den != 0, num / den - 1),
        )
    return out


def augment_cmo(
    df: DataFrame,
    date_column: str,
    close_column: str,
    periods=14,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_cmo_{p}`` = 100·(ΣG−ΣL)/(ΣG+ΣL) over rolling p, min_periods=p
    (finance/cmo.py:262-324)."""
    group_cols = list(group_cols or [])
    w = _base(group_cols, date_column)
    delta = F.col(close_column) - F.lag(close_column).over(w)
    out = df.withColumn("__gain__", F.when(delta > 0, delta).otherwise(F.lit(0.0)))
    out = out.withColumn("__loss__", F.when(delta < 0, -delta).otherwise(F.lit(0.0)))
    wb = _base(group_cols, date_column)
    for p in _norm_periods(periods):
        frame = wb.rowsBetween(-(p - 1), 0)
        gate = F.count("__gain__").over(frame) >= p
        gs = F.when(gate, F.sum("__gain__").over(frame))
        ls = F.when(gate, F.sum("__loss__").over(frame))
        out = out.withColumn(
            f"{close_column}_cmo_{p}", 100 * (gs - ls) / (gs + ls)
        )
    return out.drop("__gain__", "__loss__")


def augment_drawdown(
    df: DataFrame,
    date_column: str,
    close_column: str,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_peak, _drawdown, _drawdown_pct`` — running cummax
    (finance/drawdown.py:255-279)."""
    group_cols = list(group_cols or [])
    frame = _base(group_cols, date_column).rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max(close_column).over(frame)
    out = df.withColumn(f"{close_column}_peak", peak)
    out = out.withColumn(
        f"{close_column}_drawdown", F.col(close_column) - F.col(f"{close_column}_peak")
    )
    out = out.withColumn(
        f"{close_column}_drawdown_pct",
        F.col(f"{close_column}_drawdown") / F.col(f"{close_column}_peak"),
    )
    return out


def augment_stochastic_oscillator(
    df: DataFrame,
    date_column: str,
    high_column: str,
    low_column: str,
    close_column: str,
    k_periods=14,
    d_periods=3,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_stoch_k_{k}``, ``{c}_stoch_d_{k}_{d}`` — %K on rolling extrema
    (min_periods=1), %D = SMA(%K, d, min_periods=1)
    (finance/stochastic_oscillator.py:327-372)."""
    group_cols = list(group_cols or [])
    wb = _base(group_cols, date_column)
    out = df
    for k in _norm_periods(k_periods):
        frame = wb.rowsBetween(-(k - 1), 0)
        ll = F.min(low_column).over(frame)
        hh = F.max(high_column).over(frame)
        k_alias = f"{close_column}_stoch_k_{k}"
        out = out.withColumn(
            k_alias, 100 * (F.col(close_column) - ll) / (hh - ll)
        )
        for d in _norm_periods(d_periods):
            frame_d = wb.rowsBetween(-(d - 1), 0)
            out = out.withColumn(
                f"{close_column}_stoch_d_{k}_{d}", F.avg(k_alias).over(frame_d)
            )
    return out


def augment_rolling_risk_metrics(
    df: DataFrame,
    date_column: str,
    close_column: str,
    windows=252,
    risk_free_rate: float = 0.0,
    annualization_factor: int = 252,
    benchmark_column: str | None = None,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_sharpe_ratio_{w}, _sortino_ratio_{w}, _volatility_annualized_{w},
    _omega_ratio_{w}, _skewness_{w}, _kurtosis_{w}``
    (finance/rolling_risk_metrics.py:414-490). Spark skewness/kurtosis are
    population moments — identical to the reference's scipy defaults
    (bias=True, Fisher=True)."""
    group_cols = list(group_cols or [])
    w = _base(group_cols, date_column)
    prev = F.lag(close_column).over(w)
    ret = F.col(close_column) / prev - 1
    out = (
        df.withColumn("__ret__", ret)
        .withColumn("__neg_sq__", F.when(ret < 0, ret * ret).otherwise(F.lit(0.0)))
        .withColumn("__pos__", F.when(ret > 0, ret).otherwise(F.lit(0.0)))
        .withColumn("__neg__", F.when(ret < 0, ret).otherwise(F.lit(0.0)))
    )
    if benchmark_column is not None:
        bprev = F.lag(benchmark_column).over(w)
        bret = F.col(benchmark_column) / bprev - 1
        out = (
            out.withColumn("__bret__", bret)
            .withColumn("__rb_prod__", F.col("__ret__") * bret)
            .withColumn("__b_sq__", bret * bret)
            .withColumn("__active__", F.col("__ret__") - bret)
        )
    ann = float(np.sqrt(annualization_factor))
    wb = _base(group_cols, date_column)
    c = close_column
    for win in _norm_periods(windows):
        frame = wb.rowsBetween(-(win - 1), 0)
        # reference warm-up: every rolling aggregate uses
        # min_periods = max(1, window // 2) (rolling_risk_metrics.py:402,614)
        gate = F.count("__ret__").over(frame) >= F.lit(max(1, win // 2))
        mean_ret = F.when(gate, F.avg("__ret__").over(frame))
        std_ret = F.when(gate, F.stddev_samp("__ret__").over(frame))
        downside_var = F.when(gate, F.avg("__neg_sq__").over(frame))
        downside_dev = F.when(downside_var > 1e-12, F.sqrt(downside_var))
        pos_sum = F.when(gate, F.sum("__pos__").over(frame))
        neg_sum = F.when(gate, F.sum("__neg__").over(frame))
        out = (
            out.withColumn(
                f"{c}_sharpe_ratio_{win}",
                (mean_ret - risk_free_rate) / std_ret * ann,
            )
            .withColumn(
                f"{c}_sortino_ratio_{win}",
                (mean_ret - risk_free_rate) / downside_dev * ann,
            )
            .withColumn(f"{c}_volatility_annualized_{win}", std_ret * ann)
            .withColumn(
                f"{c}_omega_ratio_{win}",
                F.when(-neg_sum != 0, pos_sum / (-neg_sum)),
            )
            .withColumn(
                f"{c}_skewness_{win}", F.when(gate, F.skewness("__ret__").over(frame))
            )
            .withColumn(
                f"{c}_kurtosis_{win}", F.when(gate, F.kurtosis("__ret__").over(frame))
            )
        )
        if benchmark_column is not None:
            # treynor = (mean_ret - rf)/beta · ann; beta = cov(r,b)/var(b)
            # (population moments over the window — reference
            # rolling_risk_metrics.py:757-789)
            b_mean = F.avg("__bret__").over(frame)
            cov = F.avg("__rb_prod__").over(frame) - mean_ret * b_mean
            b_var = F.avg("__b_sq__").over(frame) - b_mean * b_mean
            beta = F.when(b_var != 0, cov / b_var)
            te = F.stddev_samp("__active__").over(frame)
            out = (
                out.withColumn(
                    f"{c}_treynor_ratio_{win}",
                    (mean_ret - risk_free_rate) / beta * ann,
                )
                .withColumn(
                    f"{c}_information_ratio_{win}",
                    F.when(te != 0, (mean_ret - b_mean) / te),
                )
            )
    drops = ["__ret__", "__neg_sq__", "__pos__", "__neg__"]
    if benchmark_column is not None:
        drops += ["__bret__", "__rb_prod__", "__b_sq__", "__active__"]
    return out.drop(*drops)


# ---------------------------------------------------------------------------
# EMA / recurrence / nonlinear-window indicators (Arrow grouped-map UDFs)


def augment_macd(
    df: DataFrame,
    date_column: str,
    close_column: str,
    fast_period: int = 12,
    slow_period: int = 26,
    signal_period: int = 9,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_macd_line_{f}_{s}_{sig}``, ``_macd_signal_line_…``,
    ``_macd_histogram_…`` — EMA(span, adjust=False) (finance/macd.py:269-334)."""
    group_cols = list(group_cols or [])
    c, f_, s, sig = close_column, fast_period, slow_period, signal_period
    line = f"{c}_macd_line_{f_}_{s}_{sig}"
    signal = f"{c}_macd_signal_line_{f_}_{s}_{sig}"
    hist = f"{c}_macd_histogram_{f_}_{s}_{sig}"

    def macd_all(pdf: pd.DataFrame) -> dict[str, pd.Series]:
        ema_f = pdf[c].ewm(span=f_, adjust=False, min_periods=0).mean()
        ema_s = pdf[c].ewm(span=s, adjust=False, min_periods=0).mean()
        ml = ema_f - ema_s
        sl = ml.ewm(span=sig, adjust=False, min_periods=0).mean()
        return {line: ml, signal: sl, hist: ml - sl}

    return _grouped_apply(
        df, date_column, group_cols, {},
        multi_kernel=macd_all, multi_names=[line, signal, hist],
        op_name="augment_macd",
    )


def augment_ppo(
    df: DataFrame,
    date_column: str,
    close_column: str,
    fast_period: int = 12,
    slow_period: int = 26,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_ppo_line_{f}_{s}`` = (EMAf−EMAs)/EMAs·100 (finance/ppo.py:279-313)."""
    group_cols = list(group_cols or [])
    c = close_column
    name = f"{c}_ppo_line_{fast_period}_{slow_period}"

    def ppo(pdf: pd.DataFrame) -> pd.Series:
        ema_f = pdf[c].ewm(span=fast_period, adjust=False, min_periods=0).mean()
        ema_s = pdf[c].ewm(span=slow_period, adjust=False, min_periods=0).mean()
        return (ema_f - ema_s) / ema_s * 100

    return _grouped_apply(df, date_column, group_cols, {name: ppo},
                          op_name="augment_ppo")


def augment_adx(
    df: DataFrame,
    date_column: str,
    high_column: str,
    low_column: str,
    close_column: str,
    periods=14,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_plus_di_{p}``, ``{c}_minus_di_{p}``, ``{c}_adx_{p}`` — Wilder
    smoothing = ewm(alpha=1/p, adjust=False, min_periods=p)
    (finance/adx.py:300-344)."""
    group_cols = list(group_cols or [])
    c, h, lo = close_column, high_column, low_column
    plist = _norm_periods(periods)
    names = [
        n for p in plist
        for n in (f"{c}_plus_di_{p}", f"{c}_minus_di_{p}", f"{c}_adx_{p}")
    ]

    def adx_all(pdf: pd.DataFrame) -> dict[str, pd.Series]:
        prev_h = pdf[h].shift(1)
        prev_l = pdf[lo].shift(1)
        prev_c = pdf[c].shift(1)
        tr = pd.concat(
            [pdf[h] - pdf[lo], (pdf[h] - prev_c).abs(), (pdf[lo] - prev_c).abs()],
            axis=1,
        ).max(axis=1)
        up, down = pdf[h] - prev_h, prev_l - pdf[lo]
        plus_dm = pd.Series(np.where(up > down, np.maximum(up, 0), 0), index=pdf.index)
        minus_dm = pd.Series(np.where(down > up, np.maximum(down, 0), 0), index=pdf.index)
        out: dict[str, pd.Series] = {}
        for p in plist:
            alpha = 1 / p
            sm = lambda s_: s_.ewm(alpha=alpha, adjust=False, min_periods=p).mean()
            tr_s, pdm_s, mdm_s = sm(tr), sm(plus_dm), sm(minus_dm)
            plus_di = 100 * pdm_s / tr_s
            minus_di = 100 * mdm_s / tr_s
            dx = 100 * (plus_di - minus_di).abs() / (plus_di + minus_di)
            out[f"{c}_plus_di_{p}"] = plus_di
            out[f"{c}_minus_di_{p}"] = minus_di
            out[f"{c}_adx_{p}"] = dx.ewm(alpha=alpha, adjust=False, min_periods=p).mean()
        return out

    return _grouped_apply(
        df, date_column, group_cols, {}, multi_kernel=adx_all,
        multi_names=names, op_name="augment_adx",
    )


def augment_ewma_volatility(
    df: DataFrame,
    date_column: str,
    close_column: str,
    windows=20,
    decay_factor: float = 0.94,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_ewma_vol_{w}_{λ:.2f}`` — EWM(α=1−λ, min_periods=w) of squared
    log returns, then sqrt (finance/ewma_volatility.py:278-324)."""
    group_cols = list(group_cols or [])
    c = close_column
    new_cols = {}
    for w in _norm_periods(windows):

        def make(w=w):
            def kernel(pdf: pd.DataFrame) -> pd.Series:
                prev = pdf[c].shift(1)
                ratio = (pdf[c] / prev).where(prev != 0)
                r = np.log(ratio)
                r = r.replace([np.inf, -np.inf], np.nan)
                var = (r**2).ewm(alpha=1 - decay_factor, min_periods=w).mean()
                return np.sqrt(var)

            return kernel

        new_cols[f"{c}_ewma_vol_{w}_{decay_factor:.2f}"] = make()
    return _grouped_apply(df, date_column, group_cols, new_cols,
                          op_name="augment_ewma_volatility")


def augment_hurst_exponent(
    df: DataFrame,
    date_column: str,
    close_column: str,
    windows=100,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_hurst_{w}`` — rolling simplified R/S: H = log(R/S)/log(n)
    (finance/hurst_exponent.py:265-283)."""
    group_cols = list(group_cols or [])
    c = close_column

    def hurst_arr(values: np.ndarray, min_size: int = 8) -> float:
        if values.size < min_size or np.all(values == values[0]):
            return np.nan
        centered = values - values.mean()
        cumulative = np.cumsum(centered)
        r = cumulative.max() - cumulative.min()
        s = values.std()
        if s == 0 or r == 0:
            return np.nan
        hurst = np.log(r / s) / np.log(len(values))
        return float(hurst) if 0 <= hurst <= 1 else np.nan

    new_cols = {}
    for w in _norm_periods(windows):

        def make(w=w):
            def kernel(pdf: pd.DataFrame) -> pd.Series:
                return (
                    pdf[c]
                    .rolling(window=w, min_periods=w)
                    .apply(lambda x: hurst_arr(np.asarray(x, dtype=float)), raw=True)
                )

            return kernel

        new_cols[f"{c}_hurst_{w}"] = make()
    return _grouped_apply(df, date_column, group_cols, new_cols,
                          op_name="augment_hurst_exponent")


def augment_fip_momentum(
    df: DataFrame,
    date_column: str,
    close_column: str,
    windows=252,
    fip_method: str = "original",
    skip_window: int = 0,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{c}_fip_momentum_{w}`` (finance/fip_momentum.py:270-330):
    original → total_return·(%neg − %pos); modified → sign(total_return)·
    (%pos − %neg), over rolling returns windows (min_periods=w).

    Native window expressions, NO UDF: the rolling return product
    Π(1+r_j) over a w-return window telescopes to close/lag(close, w)
    (valid exactly when all w returns in the frame are non-null — the
    same condition pandas' min_periods=w imposes), and the pos/neg
    percentages are plain conditional counts. Stays in whole-stage
    codegen; within ~1e-14 of the reference's np.prod accumulation."""
    group_cols = list(group_cols or [])
    c = close_column
    w = _base(group_cols, date_column)
    prev = F.lag(c).over(w)
    ret = F.when(prev != 0, F.col(c) / prev - 1)
    out = df.withColumn("__ret__", ret)
    rown = F.row_number().over(_base(group_cols, date_column))
    wb = _base(group_cols, date_column)
    for win in _norm_periods(windows):
        frame = wb.rowsBetween(-(win - 1), 0)
        gate = F.count("__ret__").over(frame) >= F.lit(win)
        tot = F.col(c) / F.lag(c, win).over(wb) - 1
        ppos = (
            F.sum(F.when(F.col("__ret__") > 0, 1).otherwise(0)).over(frame)
            / float(win)
        )
        pneg = (
            F.sum(F.when(F.col("__ret__") < 0, 1).otherwise(0)).over(frame)
            / float(win)
        )
        if fip_method == "original":
            fip = tot * (pneg - ppos)
        else:
            fip = F.signum(tot) * (ppos - pneg)
        if skip_window > 0:
            gate = gate & (rown > F.lit(skip_window))
        out = out.withColumn(
            f"{c}_fip_momentum_{win}", F.when(gate, fip)
        )
    return out.drop("__ret__")


def augment_qsmomentum(
    df: DataFrame,
    date_column: str,
    close_column: str,
    roc_fast_period: int = 21,
    roc_slow_period: int = 252,
    returns_period: int = 126,
    group_cols: Sequence[str] | None = None,
    exact_nan_window: bool = False,
) -> DataFrame:
    """``{c}_qsmom_{f}_{s}_{r}`` — (ROC_slow − ROC_fast) / std of last r
    returns, over rolling windows of slow_period+1
    (finance/qsmomentum.py:277-299).

    Native Catalyst rewrite (round 4): the reference's rolling-window
    custom function decomposes into plain lags and a rolling population
    std — roc_slow = (close[t−f] − close[t−s]) / (close[t−s]+1e-10),
    roc_fast = (close[t] − close[t−f]) / (close[t−f]+1e-10), std =
    stddev_pop of the last r returns, gated on a full s+1-row window. One
    Window node, no Python (the Arrow kernel was O(n·s) Python lambdas —
    ~20 s at sf0.1, now sub-second, and the only scalable shape at 10^12
    rows). NaN closes: the reference COMPACTS each window (dropna) before
    indexing; the native path instead propagates NaN through the lags.
    Pass ``exact_nan_window=True`` to run the original Arrow kernel when
    closes contain NaNs and that exact semantics matters."""
    group_cols = list(group_cols or [])
    c = close_column
    fp, sp, rp = roc_fast_period, roc_slow_period, returns_period
    out_name = f"{c}_qsmom_{fp}_{sp}_{rp}"

    if exact_nan_window:
        def qs(close_arr: np.ndarray) -> float:
            close = pd.Series(close_arr).dropna()
            if len(close) < sp + 1:
                return np.nan
            returns = close.pct_change(fill_method=None).iloc[-rp:]
            std_returns = np.std(returns, ddof=0)
            if not np.isfinite(std_returns) or abs(std_returns) < 1e-10:
                return np.nan
            fast_close = close.iloc[-(fp + 1)]
            slow_close = close.iloc[-(sp + 1)]
            roc_slow = (fast_close - slow_close) / (slow_close + 1e-10)
            roc_fast = (close.iloc[-1] - fast_close) / (fast_close + 1e-10)
            return (roc_slow - roc_fast) / std_returns

        def kernel(pdf: pd.DataFrame) -> pd.Series:
            return pdf[c].rolling(window=sp + 1, min_periods=sp + 1).apply(
                lambda x: qs(np.asarray(x, dtype=float)), raw=True
            )

        return _grouped_apply(df, date_column, group_cols,
                              {out_name: kernel},
                              op_name="augment_qsmomentum")

    w = _base(group_cols, date_column)
    ret = F.col(c) / F.lag(c).over(w) - 1
    work = df.withColumn("__qs_ret__", ret)
    sd = F.stddev_pop("__qs_ret__").over(w.rowsBetween(-(rp - 1), 0))
    cnt = F.count(c).over(w.rowsBetween(-sp, 0))
    fast = F.lag(c, fp).over(w)
    slow = F.lag(c, sp).over(w)
    roc_slow = (fast - slow) / (slow + F.lit(1e-10))
    roc_fast = (F.col(c) - fast) / (fast + F.lit(1e-10))
    qsmom = F.when(
        (cnt == sp + 1) & sd.isNotNull() & (sd >= 1e-10),
        (roc_slow - roc_fast) / sd,
    )
    return work.withColumn(out_name, qsmom).drop("__qs_ret__")


def _detect_regimes(
    log_returns: np.ndarray,
    window: int,
    n_regimes: int,
    step_size: int,
    n_iter: int,
) -> np.ndarray:
    """Rolling-refit HMM regimes over a log-return stream — mirrors the
    reference's detect_regimes loop (regime_detection.py:390-453): at every
    ``step_size``-th position fit on the window's finite values (warm-
    starting from the previous fit), Viterbi-decode, and write the last
    ``step_size`` labels back at their source positions."""
    from pytimetk_spark.functions.hmm import GaussianHMM1D

    values = np.asarray(log_returns, dtype=np.float64)
    n = len(values)
    regimes = np.full(n, np.nan)
    min_obs = max(window // 2, n_regimes * 10)
    model = GaussianHMM1D(n_regimes, n_iter=n_iter, tol=1e-3)
    warm = False
    for i in range(window - 1, n, step_size):
        start = max(0, i - window + 1)
        window_values = values[start : i + 1]
        finite_idx = np.where(np.isfinite(window_values))[0]
        if len(finite_idx) < min_obs:
            continue
        x = window_values[finite_idx]
        try:
            model.fit(x, warm_start=warm)
            warm = True
            predicted = model.predict(x)
        except (ValueError, FloatingPointError):  # pragma: no cover
            continue
        tail_len = min(step_size, len(finite_idx))
        regimes[finite_idx[-tail_len:] + start] = predicted[-tail_len:]
    return regimes


def augment_regime_detection(
    df: DataFrame,
    date_column: str,
    close_column: str,
    window: int | Sequence[int] = 252,
    n_regimes: int = 2,
    method: str = "hmm",
    step_size: int = 1,
    n_iter: int = 100,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """HMM regime labels over rolling windows of log returns.

    Reference: finance/regime_detection.py:84-141 (API), :356-470 (pandas
    kernel: log returns → rolling re-fit GaussianHMM with warm start →
    Viterbi labels at stride positions, NaN elsewhere). Column per window:
    ``{close}_regime_{w}`` (float; labels 0..n_regimes-1).

    Spark: per-group Arrow grouped-map (the fit is inherently sequential
    per series); the HMM itself is the self-contained numpy Baum-Welch in
    functions/hmm.py (hmmlearn is not installed — deterministic quantile
    init replaces its seeded-random kmeans, a documented deviation; label
    IDENTITY is backend-arbitrary in the reference too)."""
    if method.lower() != "hmm":
        raise ValueError("Only 'hmm' method is currently supported.")
    if n_regimes < 2:
        raise ValueError("n_regimes must be at least 2.")
    if step_size < 1:
        raise ValueError("step_size must be at least 1.")
    windows = [window] if isinstance(window, int) else [int(w) for w in window]
    group_cols = list(group_cols or [])
    c = close_column
    out_names = [f"{c}_regime_{w}" for w in windows]

    def kernel(pdf: pd.DataFrame) -> dict[str, pd.Series]:
        vals = pdf[c].to_numpy(dtype=np.float64)
        prev = np.concatenate(([np.nan], vals[:-1]))
        with np.errstate(divide="ignore", invalid="ignore"):
            lr = np.log(vals / prev)
        lr[~np.isfinite(lr)] = np.nan
        return {
            f"{c}_regime_{w}": pd.Series(
                _detect_regimes(lr, w, n_regimes, step_size, n_iter)
            )
            for w in windows
        }

    return _grouped_apply(
        df, date_column, group_cols, {}, multi_kernel=kernel,
        multi_names=out_names, op_name="augment_regime_detection",
    )
