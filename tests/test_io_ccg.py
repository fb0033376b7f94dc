"""Data loader and cross-correlogram tests."""

import os

import numpy as np
import pytest

from lqg_tpu.ccg import xcorr, dog, fit_dog
from lqg_tpu.io import load_tracking_data, find_data_file


def test_xcorr_matches_numpy_correlate():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 256))
    y = rng.standard_normal((4, 256))

    lags, c = xcorr(x, y, maxlags=30, normed=False)
    assert lags.shape == (61,)
    assert c.shape == (4, 61)

    # oracle: direct correlation for one batch element
    full = np.correlate(x[0], y[0], mode="full")
    np.testing.assert_allclose(np.asarray(c[0]), full[256 - 1 - 30:256 + 30],
                               rtol=1e-4, atol=1e-4)


def test_xcorr_normed_peak():
    t = np.linspace(0, 10, 500)
    x = np.sin(t)[None]
    _, c = xcorr(x, x, maxlags=10, normed=True)
    assert np.argmax(c[0]) == 10  # zero lag
    np.testing.assert_allclose(c[0, 10], 1.0, rtol=1e-5)


def test_fit_dog_recovers():
    x = np.linspace(-10, 10, 200)
    true = dict(a1=1.0, a2=0.5, mu1=0.0, mu2=0.0, sigma1=1.0, sigma2=2.0)
    y = dog(x, **true)
    params = fit_dog(x, y)
    np.testing.assert_allclose(dog(x, **params), y, atol=1e-5)


def test_fit_batch_jax_engine():
    """Vmapped multi-start LM reaches the noise floor on a batch of DoGs."""
    from lqg_tpu.ccg import fit_ccg_shape_batch, skewed_gabor

    lags = np.arange(-60, 61).astype(float)
    rng = np.random.default_rng(0)
    y = dog(lags, 1.2, 0.8, 3.0, -2.0, 6.0, 9.0)
    noise = 0.002
    batch = y + noise * rng.standard_normal((3, 5) + y.shape)

    params, losses = fit_ccg_shape_batch("dog", lags, batch, engine="jax")
    assert params.shape == (3, 5, 6)
    assert losses.shape == (3, 5)
    # noise floor: E[sum r^2] = n_points * noise^2
    assert float(np.median(losses)) < 3 * len(lags) * noise**2

    yg = skewed_gabor(lags, 0.4, 8.0, 10.0, 5.0, 0.02)
    bg = yg + 0.001 * rng.standard_normal((4,) + yg.shape)
    pg, lg = fit_ccg_shape_batch("skewed_gabor", lags, bg, engine="jax")
    # multi-start rescues the oscillatory shape from p0's local minimum
    assert float(np.median(lg)) < 0.05

    with pytest.raises(ValueError):
        fit_ccg_shape_batch("dog", lags, batch, engine="bogus")


def _have_data():
    try:
        find_data_file()
        return True
    except FileNotFoundError:
        return False


@pytest.mark.skipif(not _have_data(), reason="data.mat not available")
def test_load_tracking_data():
    data, sigmas = load_tracking_data(delay=12, clip=120)
    assert data.ndim == 4
    assert data.shape[0] == len(sigmas) == 6
    assert data.shape[1] == 20
    assert data.shape[3] == 2
    # delay + clip shortens 1200 to 1068
    assert data.shape[2] == 1200 - 120 - 12
    # target zeroed at t=0
    np.testing.assert_allclose(data[:, :, 0, 0], 0.0, atol=1e-6)
