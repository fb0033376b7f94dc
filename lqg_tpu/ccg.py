"""Cross-correlogram (CCG) analysis of tracking trajectories.

Capability parity with the reference's analysis module (``lqg/ccg.py``):
windowed cross-correlation plus parametric CCG shape fits (difference of
Gaussians, skewed Gabor).

Design differences: the correlation itself is a device-placed, batched JAX
rFFT (arbitrary leading batch axes, one fused kernel) instead of a scipy
``fftconvolve`` call; the shape-fit layer is a small registry around
``scipy.optimize.curve_fit`` with vectorized batch fitting.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import curve_fit


# --- cross-correlation ------------------------------------------------------

def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@partial(jax.jit, static_argnames=("n_lags", "normed"))
def _windowed_xcorr(x, y, n_lags: int, normed: bool):
    """Linear cross-correlation restricted to lags ``[-n_lags, n_lags]``.

    ``corr[k] = sum_t x[t + k] y[t]`` computed as a circular convolution of
    ``x`` with time-reversed ``y`` on a zero-padded power-of-two grid.
    """
    n = x.shape[-1]
    grid = _next_pow2(2 * n - 1)
    spec = jnp.fft.rfft(x, n=grid) * jnp.fft.rfft(y[..., ::-1], n=grid)
    full = jnp.fft.irfft(spec, n=grid)
    # index n-1 of the full correlation is lag zero
    window = full[..., n - 1 - n_lags: n + n_lags]
    if normed:
        energy = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1)
        window = window / energy[..., None]
    return window


def xcorr(x, y, maxlags: int = 60, normed: bool = True):
    """Batched cross-correlation of ``x`` against ``y`` along the last axis.

    Returns ``(lags, correls)`` with integer lags spanning
    ``[-maxlags, maxlags]`` - the same contract as the reference ``xcorr``.
    Leading axes broadcast, so ``(conditions, trials, T)`` inputs produce
    ``(conditions, trials, 2 * maxlags + 1)`` correlograms in one call.
    """
    x, y = jnp.asarray(x), jnp.asarray(y)
    n = x.shape[-1]
    if maxlags is None:
        maxlags = n - 1
    if not 0 < maxlags < n:
        raise ValueError(
            f"maxlags must be None or strictly positive < {n}")
    return np.arange(-maxlags, maxlags + 1), _windowed_xcorr(
        x, y, n_lags=int(maxlags), normed=bool(normed))


# --- parametric CCG shapes ---------------------------------------------------

def _bell(x, center, width):
    """Unnormalized Gaussian bump."""
    z = (x - center) / width
    return np.exp(-0.5 * z * z)


def dog(x, a1, a2, mu1, mu2, sigma1, sigma2):
    """Difference of two normalized Gaussians."""
    scale1 = a1 / (sigma1 * np.sqrt(2.0 * np.pi))
    scale2 = a2 / (sigma2 * np.sqrt(2.0 * np.pi))
    return scale1 * _bell(x, mu1, sigma1) - scale2 * _bell(x, mu2, sigma2)


def skewed_gabor(x, a, mu, sigma1, sigma2, w):
    """Sine carrier under a Gaussian envelope whose width differs on either
    side of the peak ``mu`` (skewed Gabor)."""
    carrier = a * np.sin(2.0 * np.pi * w * (x - mu))
    width = np.where(x >= mu, sigma1, sigma2)
    return carrier * _bell(x, mu, width)


# shape registry: name -> (function, parameter names, curve_fit kwargs)
_SHAPES = {
    "dog": (dog, ("a1", "a2", "mu1", "mu2", "sigma1", "sigma2"), {}),
    "skewed_gabor": (
        skewed_gabor, ("a", "mu", "sigma1", "sigma2", "w"),
        dict(p0=[0.5, 1.0, 5.0, 2.0, 1.0], method="trf", max_nfev=5000,
             bounds=([0.0, 0.0, 0.1, 0.1, 0.1],
                     [1.0, 50.0, 50.0, 50.0, 5.0]))),
}


def fit_ccg_shape(shape: str, lags, correls) -> dict:
    """Least-squares fit of a registered CCG shape to one correlogram.

    Returns a dict of fitted parameter values keyed by parameter name.
    """
    fn, names, kwargs = _SHAPES[shape]
    popt, _ = curve_fit(fn, np.asarray(lags, dtype=float),
                        np.asarray(correls, dtype=float), **kwargs)
    return dict(zip(names, popt))


def fit_ccg_shape_batch(shape: str, lags, correls) -> list:
    """Fit a CCG shape to each correlogram in a batch ``(..., n_lags)``;
    returns a flat list of parameter dicts (row-major over leading axes),
    with ``None`` for correlograms where the fit does not converge."""
    flat = np.asarray(correls, dtype=float).reshape(-1, np.shape(correls)[-1])
    out = []
    for row in flat:
        try:
            out.append(fit_ccg_shape(shape, lags, row))
        except RuntimeError:
            out.append(None)
    return out


def fit_dog(x, y) -> dict:
    """Difference-of-Gaussians fit (named-shape shorthand)."""
    return fit_ccg_shape("dog", x, y)


def fit_skewed_gabor(x, y) -> dict:
    """Skewed-Gabor fit (named-shape shorthand)."""
    return fit_ccg_shape("skewed_gabor", x, y)
