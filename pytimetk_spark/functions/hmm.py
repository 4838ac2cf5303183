"""Self-contained 1-D Gaussian Hidden Markov Model (numpy only).

Standard Baum-Welch EM + Viterbi decoding (Rabiner 1989 tutorial
equations, scaled forward-backward). Used by
``augment_regime_detection`` because neither hmmlearn nor pomegranate is
available in this environment; the reference operator's contract
(finance/regime_detection.py:390-453) only needs fit + predict on a 1-D
observation stream with warm-startable parameters.

Initialization is DETERMINISTIC (quantile-spread means, shared variance,
self-biased transitions) so Spark retries / resumed jobs reproduce the
same labels — hmmlearn's kmeans init is seeded-random, which would make
the operator nondeterministic across task retries.
"""

from __future__ import annotations

import numpy as np

_VAR_FLOOR = 1e-10
_PROB_FLOOR = 1e-300


class GaussianHMM1D:
    """K-state HMM with scalar-Gaussian emissions.

    Parameters persist across ``fit`` calls when ``warm_start=True`` —
    the rolling-refit loop in regime detection re-uses the previous
    window's parameters exactly like the reference does with hmmlearn
    (regime_detection.py:408-427).
    """

    def __init__(self, n_states: int, n_iter: int = 100, tol: float = 1e-3):
        self.k = int(n_states)
        self.n_iter = int(n_iter)
        self.tol = float(tol)
        self.startprob_: np.ndarray | None = None
        self.transmat_: np.ndarray | None = None
        self.means_: np.ndarray | None = None
        self.vars_: np.ndarray | None = None

    # -- initialization -----------------------------------------------------

    def _init_params(self, x: np.ndarray) -> None:
        k = self.k
        self.startprob_ = np.full(k, 1.0 / k)
        self.transmat_ = np.full((k, k), 0.1 / max(k - 1, 1))
        np.fill_diagonal(self.transmat_, 0.9)
        self.means_ = np.quantile(x, (np.arange(k) + 0.5) / k)
        v = max(float(np.var(x)), _VAR_FLOOR)
        self.vars_ = np.full(k, v)

    # -- E step helpers -----------------------------------------------------

    def _emissions(self, x: np.ndarray) -> np.ndarray:
        """B[t, i] = N(x_t | mu_i, var_i), floored away from zero."""
        d = x[:, None] - self.means_[None, :]
        b = np.exp(-0.5 * d * d / self.vars_) / np.sqrt(2 * np.pi * self.vars_)
        return np.maximum(b, _PROB_FLOOR)

    def _forward_backward(self, b: np.ndarray):
        n, k = b.shape
        alpha = np.empty((n, k))
        c = np.empty(n)
        a = self.startprob_ * b[0]
        c[0] = a.sum()
        alpha[0] = a / c[0]
        tm = self.transmat_
        for t in range(1, n):
            a = (alpha[t - 1] @ tm) * b[t]
            c[t] = a.sum()
            alpha[t] = a / c[t]
        beta = np.empty((n, k))
        beta[n - 1] = 1.0
        for t in range(n - 2, -1, -1):
            beta[t] = (tm @ (b[t + 1] * beta[t + 1])) / c[t + 1]
        ll = float(np.log(c).sum())
        gamma = alpha * beta
        gamma /= gamma.sum(axis=1, keepdims=True)
        # xi summed over t: Σ_t alpha[t,i] A[i,j] b[t+1,j] beta[t+1,j] / c[t+1]
        xi_sum = tm * (
            alpha[:-1].T @ ((b[1:] * beta[1:]) / c[1:, None])
        )
        return ll, gamma, xi_sum

    # -- public API ----------------------------------------------------------

    def fit(self, x: np.ndarray, warm_start: bool = False) -> "GaussianHMM1D":
        x = np.asarray(x, dtype=np.float64).ravel()
        if len(x) < self.k:
            raise ValueError("not enough observations for n_states")
        if not warm_start or self.means_ is None:
            self._init_params(x)
        prev_ll = -np.inf
        for _ in range(self.n_iter):
            b = self._emissions(x)
            ll, gamma, xi_sum = self._forward_backward(b)
            occ = gamma.sum(axis=0)
            self.startprob_ = gamma[0] / gamma[0].sum()
            denom = np.maximum(xi_sum.sum(axis=1, keepdims=True), _PROB_FLOOR)
            self.transmat_ = xi_sum / denom
            self.means_ = (gamma.T @ x) / np.maximum(occ, _PROB_FLOOR)
            d = x[:, None] - self.means_[None, :]
            self.vars_ = np.maximum(
                (gamma * d * d).sum(axis=0) / np.maximum(occ, _PROB_FLOOR),
                _VAR_FLOOR,
            )
            if ll - prev_ll < self.tol:
                break
            prev_ll = ll
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        """Viterbi decode (log space) → int state labels."""
        x = np.asarray(x, dtype=np.float64).ravel()
        logb = np.log(self._emissions(x))
        loga = np.log(np.maximum(self.transmat_, _PROB_FLOOR))
        n, k = logb.shape
        delta = np.log(np.maximum(self.startprob_, _PROB_FLOOR)) + logb[0]
        psi = np.empty((n, k), dtype=np.int64)
        for t in range(1, n):
            cand = delta[:, None] + loga
            psi[t] = cand.argmax(axis=0)
            delta = cand[psi[t], np.arange(k)] + logb[t]
        states = np.empty(n, dtype=np.int64)
        states[-1] = int(delta.argmax())
        for t in range(n - 2, -1, -1):
            states[t] = psi[t + 1][states[t + 1]]
        return states
