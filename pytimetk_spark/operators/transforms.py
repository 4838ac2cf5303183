"""Per-series signal transforms: Hilbert analytic signal, continuous
wavelet transform, spline basis expansion — numpy kernels (scipy/patsy are
unavailable; the math is the standard public construction) dispatched as
Arrow grouped-map UDFs.

Reference surface: feature_engineering/hilbert.py:209-220,
wavelet.py:279-325,446-451, spline.py:59-101.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hilbert_np(x: np.ndarray) -> np.ndarray:
    """Analytic signal via FFT (scipy.signal.hilbert algorithm)."""
    n = len(x)
    Xf = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1 : n // 2] = 2
    else:
        h[0] = 1
        h[1 : (n + 1) // 2] = 2
    return np.fft.ifft(Xf * h)


def augment_hilbert(
    df: DataFrame,
    date_column: str,
    value_column: str,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{col}_hilbert_real``, ``{col}_hilbert_imag`` (hilbert.py:209-220)."""
    from pytimetk_spark.operators.augment_rolling import _grouped_apply

    c = value_column

    def real(pdf):
        return pd.Series(np.real(_hilbert_np(pdf[c].to_numpy(float))), index=pdf.index)

    def imag(pdf):
        return pd.Series(np.imag(_hilbert_np(pdf[c].to_numpy(float))), index=pdf.index)

    return _grouped_apply(
        df, date_column, list(group_cols or []),
        {f"{c}_hilbert_real": real, f"{c}_hilbert_imag": imag},
        op_name="augment_hilbert",
    )


def _wavelet(kind: str, scale: float, length: int) -> np.ndarray:
    t = np.arange(length) - (length - 1) / 2
    x = t / scale
    if kind == "morlet":
        return np.exp(1j * 5 * x) * np.exp(-(x**2) / 2)
    if kind == "analytic_morlet":
        w = np.exp(1j * 5 * x) * np.exp(-(x**2) / 2)
        return w * (x >= -np.inf)  # analytic variant keeps complex form
    if kind == "ricker":
        return (1 - x**2) * np.exp(-(x**2) / 2) + 0j
    if kind == "bump":
        out = np.zeros_like(x, dtype=complex)
        mask = np.abs(x) < 1
        out[mask] = np.exp(-1 / (1 - x[mask] ** 2))
        return out
    raise ValueError(f"unknown wavelet: {kind}")


def augment_wavelet(
    df: DataFrame,
    date_column: str,
    value_column: str,
    scales: Sequence[float] = (2, 4, 8),
    method: str = "morlet",
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{method}_scale_{s}_real/_imag`` — CWT by direct convolution with
    the sampled mother wavelet (wavelet.py:279-325 naming :446-451)."""
    from pytimetk_spark.operators.augment_rolling import _grouped_apply

    c = value_column
    new_cols = {}
    for s in scales:
        def make(s=s, part="real"):
            def kernel(pdf):
                x = pdf[c].to_numpy(float)
                wav = _wavelet(method, s, min(10 * int(s) + 1, max(len(x), 3)))
                conv = np.convolve(x, np.conj(wav)[::-1], mode="same") / np.sqrt(s)
                vals = np.real(conv) if part == "real" else np.imag(conv)
                return pd.Series(vals, index=pdf.index)

            return kernel

        sl = f"{s:g}"
        new_cols[f"{method}_scale_{sl}_real"] = make(s, "real")
        new_cols[f"{method}_scale_{sl}_imag"] = make(s, "imag")
    return _grouped_apply(df, date_column, list(group_cols or []), new_cols,
                          op_name="augment_wavelet")


def _bspline_basis(x: np.ndarray, knots: np.ndarray, degree: int) -> np.ndarray:
    """Cox–de Boor B-spline basis matrix (patsy bs() equivalent)."""
    aug = np.concatenate(
        [[knots[0]] * degree, knots, [knots[-1]] * degree]
    ).astype(float)
    n_basis = len(aug) - degree - 1

    def b(i, d, t):
        if d == 0:
            last = i + 1 == n_basis + degree
            return ((t >= aug[i]) & ((t < aug[i + 1]) | (last & (t == aug[i + 1])))).astype(float)
        left_den = aug[i + d] - aug[i]
        right_den = aug[i + d + 1] - aug[i + 1]
        left = ((t - aug[i]) / left_den) * b(i, d - 1, t) if left_den > 0 else 0.0
        right = (
            ((aug[i + d + 1] - t) / right_den) * b(i + 1, d - 1, t)
            if right_den > 0
            else 0.0
        )
        return left + right

    cols = [b(i, degree, x) for i in range(n_basis)]
    basis = np.column_stack(cols)
    # right-closed support for the max point (patsy convention)
    basis[x == aug[-1], -1] = 1.0
    return basis


def augment_spline(
    df: DataFrame,
    date_column: str,
    value_column: str,
    df_spline: int = 5,
    degree: int = 3,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """B-spline basis columns ``{col}_spline_{i}`` over the value column
    (spline.py:59-101; knots at quantiles, patsy bs() construction)."""
    from pytimetk_spark.operators.augment_rolling import _grouped_apply

    c = value_column
    # n_basis = n_inner + degree + 1 must equal df_spline
    n_inner = max(df_spline - degree - 1, 0)

    new_cols = {}

    def make(i):
        def kernel(pdf):
            x = pdf[c].to_numpy(float)
            qs = np.linspace(0, 1, n_inner + 2)
            knots = np.quantile(x, qs)
            knots = np.unique(knots)
            if len(knots) < 2:
                return pd.Series(np.zeros(len(x)), index=pdf.index)
            basis = _bspline_basis(x, knots, degree)
            col = basis[:, i] if i < basis.shape[1] else np.zeros(len(x))
            return pd.Series(col, index=pdf.index)

        return kernel

    for i in range(df_spline):
        new_cols[f"{c}_spline_{i}"] = make(i)
    return _grouped_apply(df, date_column, list(group_cols or []), new_cols,
                          op_name="augment_spline")
