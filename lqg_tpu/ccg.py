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
from jax import lax
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
#
# Each shape is defined once over a pluggable array namespace so the same
# formula serves both fit engines: ``numpy`` for scipy's curve_fit and
# ``jax.numpy`` for the on-device vmapped Levenberg-Marquardt fitter.

def _make_shapes(xp):
    def bell(x, center, width):
        z = (x - center) / width
        return xp.exp(-0.5 * z * z)

    def dog(x, a1, a2, mu1, mu2, sigma1, sigma2):
        """Difference of two normalized Gaussians."""
        scale1 = a1 / (sigma1 * xp.sqrt(2.0 * xp.pi))
        scale2 = a2 / (sigma2 * xp.sqrt(2.0 * xp.pi))
        return scale1 * bell(x, mu1, sigma1) - scale2 * bell(x, mu2, sigma2)

    def skewed_gabor(x, a, mu, sigma1, sigma2, w):
        """Sine carrier under a Gaussian envelope whose width differs on
        either side of the peak ``mu`` (skewed Gabor)."""
        carrier = a * xp.sin(2.0 * xp.pi * w * (x - mu))
        width = xp.where(x >= mu, sigma1, sigma2)
        return carrier * bell(x, mu, width)

    return {"dog": dog, "skewed_gabor": skewed_gabor}


_SHAPES_NP = _make_shapes(np)
_SHAPES_JNP = _make_shapes(jnp)
dog = _SHAPES_NP["dog"]
skewed_gabor = _SHAPES_NP["skewed_gabor"]

# shape registry: name -> (parameter names, p0, (lo, hi) bounds or None)
_SHAPE_META = {
    "dog": (("a1", "a2", "mu1", "mu2", "sigma1", "sigma2"),
            [1.0] * 6, None),
    "skewed_gabor": (("a", "mu", "sigma1", "sigma2", "w"),
                     [0.5, 1.0, 5.0, 2.0, 1.0],
                     ([0.0, 0.0, 0.1, 0.1, 0.1],
                      [1.0, 50.0, 50.0, 50.0, 5.0])),
}


def fit_ccg_shape(shape: str, lags, correls) -> dict:
    """Least-squares fit of a registered CCG shape to one correlogram
    (scipy ``curve_fit``).  Returns fitted values keyed by parameter name.
    """
    names, p0, bounds = _SHAPE_META[shape]
    kwargs = dict(p0=p0)
    if bounds is not None:
        kwargs.update(bounds=bounds, method="trf", max_nfev=5000)
    popt, _ = curve_fit(_SHAPES_NP[shape], np.asarray(lags, dtype=float),
                        np.asarray(correls, dtype=float), **kwargs)
    return dict(zip(names, popt))


@partial(jax.jit, static_argnames=("shape", "steps", "restarts"))
def _lm_fit_batch(shape: str, lags, correls, steps: int = 60,
                  restarts: int = 8, seed: int = 0):
    """Vmapped multi-start Levenberg-Marquardt over a batch of correlograms.

    One compiled program fits every (correlogram x restart) in parallel -
    each LM iteration is a batch of tiny (npoints x nparams) normal-equation
    solves, which XLA fuses into a handful of batched matmuls.  Bounds are
    enforced by projection after each accepted step; the best restart (by
    residual loss) wins.  Restarts are near-free on device and rescue the
    oscillatory shapes (the gabor carrier creates local minima that trap any
    single-start local optimizer).
    """
    fn = _SHAPES_JNP[shape]
    _, p0, bounds = _SHAPE_META[shape]
    p0 = jnp.asarray(p0, dtype=correls.dtype)

    # restart inits: the registry p0 plus log-uniform-ish jitters around it
    # (kept inside the bounds when the shape has them)
    jitter = jax.random.uniform(
        jax.random.PRNGKey(seed), (restarts - 1, p0.shape[0]),
        dtype=correls.dtype, minval=0.25, maxval=4.0)
    p0s = jnp.concatenate([p0[None], p0[None] * jitter], axis=0)
    if bounds is not None:
        lo, hi = (jnp.asarray(b, p0.dtype) for b in bounds)
        p0s = jnp.clip(p0s, lo, hi)

    def residual(p, y):
        return fn(lags, *p) - y

    def fit_from(p0, y):
        def lm_step(carry, _):
            p, lam, loss = carry
            r = residual(p, y)
            J = jax.jacfwd(residual)(p, y)
            JtJ = J.T @ J
            step_mat = JtJ + lam * jnp.diag(jnp.diagonal(JtJ) + 1e-12)
            delta = jnp.linalg.solve(step_mat, -(J.T @ r))
            p_new = p + delta
            if bounds is not None:
                lo, hi = (jnp.asarray(b, p.dtype) for b in bounds)
                p_new = jnp.clip(p_new, lo, hi)
            loss_new = jnp.sum(residual(p_new, y) ** 2)
            accept = loss_new < loss
            p = jnp.where(accept, p_new, p)
            loss = jnp.where(accept, loss_new, loss)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e9)
            return (p, lam, loss), None

        loss0 = jnp.sum(residual(p0, y) ** 2)
        (p, _, loss), _ = lax.scan(
            lm_step, (p0, jnp.asarray(1e-2, y.dtype), loss0), None,
            length=steps)
        return p, loss

    def fit_one(y):
        ps, losses = jax.vmap(fit_from, in_axes=(0, None))(p0s, y)
        best = jnp.argmin(losses)
        return ps[best], losses[best]

    return jax.vmap(fit_one)(correls)


def fit_ccg_shape_batch(shape: str, lags, correls, engine: str = "scipy"):
    """Fit a CCG shape to each correlogram in a batch ``(..., n_lags)``.

    Args:
        engine: ``"scipy"`` loops ``curve_fit`` on host (reference-equivalent
            numbers; returns a flat row-major list of parameter dicts, with
            ``None`` where a fit fails to converge).  ``"jax"`` runs every
            fit in parallel on device via vmapped Levenberg-Marquardt and
            returns ``(params, losses)`` arrays with the batch shape
            preserved: ``params (..., nparams)``, ``losses (...)``.
    """
    if engine == "jax":
        batch_shape = np.shape(correls)[:-1]
        flat = jnp.asarray(correls, dtype=jnp.float32).reshape(
            -1, np.shape(correls)[-1])
        p, loss = _lm_fit_batch(shape, jnp.asarray(lags, jnp.float32), flat)
        return (p.reshape(batch_shape + (p.shape[-1],)),
                loss.reshape(batch_shape))
    if engine != "scipy":
        raise ValueError(f"engine must be 'scipy' or 'jax', got {engine!r}")
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
