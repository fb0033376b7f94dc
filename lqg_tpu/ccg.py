"""Cross-correlogram (CCG) analysis.

Capability parity with reference ``lqg/ccg.py``: batched cross-correlation
along the last axis plus difference-of-Gaussians and skewed-Gabor shape fits.

TPU-first difference: the cross-correlation runs as a JAX FFT (device-placed,
batched), not scipy ``fftconvolve``; the tiny curve fits stay on CPU/scipy.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.optimize import curve_fit


def xcorr(x, y, maxlags: int = 60, normed: bool = True):
    """Batched cross correlation of ``x`` and ``y`` along the last axis.

    Returns ``(lags, correlations)`` with ``lags`` in ``[-maxlags, maxlags]``
    - same contract as reference ``xcorr`` (``ccg.py:6-35``).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    Nx = x.shape[-1]

    if maxlags is None:
        maxlags = Nx - 1
    if maxlags >= Nx or maxlags < 1:
        raise ValueError(
            f"maxlags must be None or strictly positive < {Nx}")

    # full linear cross-correlation via FFT: correlate(x, y)[k] =
    # sum_t x[t] y[t - k + (Ny-1)]  == conv(x, reverse(y))
    nfft = 1
    while nfft < 2 * Nx - 1:
        nfft *= 2
    X = jnp.fft.rfft(x, n=nfft)
    Y = jnp.fft.rfft(y[..., ::-1], n=nfft)
    correls = jnp.fft.irfft(X * Y, n=nfft)[..., : 2 * Nx - 1]

    if normed:
        denom = jnp.sqrt(
            jnp.sum(x * x, axis=-1) * jnp.sum(y * y, axis=-1))[..., None]
        correls = correls / denom

    lags = np.arange(-maxlags, maxlags + 1)
    correls = correls[..., Nx - 1 - maxlags: Nx + maxlags]
    return lags, correls


def dog(x, a1, a2, mu1, mu2, sigma1, sigma2):
    """Difference of Gaussians (reference ``ccg.py:38-42``)."""
    g = a1 / (sigma1 * np.sqrt(2 * np.pi)) * np.exp(
        -0.5 * (x - mu1) ** 2 / sigma1 ** 2)
    h = a2 / (sigma2 * np.sqrt(2 * np.pi)) * np.exp(
        -0.5 * (x - mu2) ** 2 / sigma2 ** 2)
    return g - h


def skewed_gabor(x, a, mu, sigma1, sigma2, w):
    """Skewed Gabor (reference ``ccg.py:45-51``)."""
    right = (x >= mu) * a * np.exp(
        -0.5 * (x - mu) ** 2 / sigma1 ** 2) * np.sin(2 * np.pi * w * (x - mu))
    left = (x < mu) * a * np.exp(
        -0.5 * (x - mu) ** 2 / sigma2 ** 2) * np.sin(2 * np.pi * w * (x - mu))
    return right + left


def fit_dog(x, y):
    params = curve_fit(dog, np.asarray(x), np.asarray(y))[0]
    return dict(a1=params[0], a2=params[1], mu1=params[2], mu2=params[3],
                sigma1=params[4], sigma2=params[5])


def fit_skewed_gabor(x, y):
    params = curve_fit(
        skewed_gabor, np.asarray(x), np.asarray(y), max_nfev=5000,
        p0=np.array([0.5, 1.0, 5.0, 2.0, 1.0]), method="trf",
        bounds=(np.array([0.0, 0.0, 0.1, 0.1, 0.1]),
                np.array([1.0, 50.0, 50.0, 50.0, 5.0])))[0]
    return dict(a=params[0], mu=params[1], sigma1=params[2], sigma2=params[3],
                w=params[4])
