"""MCMC effective-sample-size estimation (coda-compatible approach).

The reference post-processing computes per-parameter ESS with R's
coda::effectiveSize (scripts/run_bootstrap_asr_ess.R:35-40): the spectral
density at frequency zero from an AR fit with AIC-selected order.  This is
a numpy implementation of the same estimator (Yule-Walker via
Levinson-Durbin, order up to 10*log10(N)).
"""

from __future__ import annotations

import numpy as np


def _autocovariances(x: np.ndarray, max_lag: int) -> np.ndarray:
    n = len(x)
    x = x - x.mean()
    acov = np.empty(max_lag + 1)
    for k in range(max_lag + 1):
        acov[k] = np.dot(x[: n - k], x[k:]) / n
    return acov


def spectrum0_ar(x: np.ndarray) -> float:
    """AR-estimated spectral density at frequency zero."""
    x = np.asarray(x, float)
    n = len(x)
    if n < 3 or np.allclose(x, x[0]):
        return 0.0
    order_max = min(int(10 * np.log10(n)), n - 2)
    acov = _autocovariances(x, order_max)
    if acov[0] <= 0:
        return 0.0

    # Levinson-Durbin over all orders, AIC order selection (as R ar.yw).
    best_aic = n * np.log(acov[0])
    best = (acov[0], np.array([]))
    phi = np.zeros(0)
    sigma2 = acov[0]
    for p in range(1, order_max + 1):
        if sigma2 <= 0:
            break
        k = (acov[p] - phi @ acov[p - 1:0:-1]) / sigma2
        phi = np.concatenate([phi - k * phi[::-1], [k]])
        sigma2 = sigma2 * (1 - k * k)
        aic = n * np.log(max(sigma2, 1e-300)) + 2 * p
        if aic < best_aic:
            best_aic = aic
            best = (sigma2, phi.copy())

    sigma2, phi = best
    denom = (1.0 - phi.sum()) ** 2
    if denom <= 0:
        return 0.0
    return sigma2 / denom


def effective_sample_size(x: np.ndarray) -> float:
    """coda-style ESS: N * var(x) / spectrum0."""
    x = np.asarray(x, float)
    spec = spectrum0_ar(x)
    if spec == 0:
        return 0.0
    return len(x) * x.var(ddof=1) / spec
