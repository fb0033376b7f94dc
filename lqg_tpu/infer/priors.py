"""Default priors for tracking-model parameters.

Values match the reference (``lqg/infer/prior.py:7-24``) exactly, expressed
with the native distributions of :mod:`lqg_tpu.infer.dists`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import norm

from lqg_tpu.infer.dists import HalfNormal, LogNormal


def default_prior():
    d = {
        "action_cost": LogNormal(-2.0, 1.0),
        "sigma_target": HalfNormal(50.0),
        "action_variability": HalfNormal(1.0),
        "signal_dep_noise": HalfNormal(1.0),
        "sigma_cursor": HalfNormal(12.5),
        "sigma": HalfNormal(50.0),
        "subj_noise": HalfNormal(1.0),
        "subj_vel_noise": HalfNormal(2.0),
    }
    for n in range(6):
        d[f"sigma_target_{n}"] = HalfNormal(50.0)
    return d


# module-level singleton, like the reference's ``default_prior`` dict
DEFAULT_PRIOR = default_prior()


def prior():
    """Reference-compatible accessor (``lqg/infer/prior.py:26-27``)."""
    return DEFAULT_PRIOR


def lognormal_params(mu, sigma):
    """Moment-match a log-normal (reference ``prior.py:30-31``)."""
    return (np.log(mu**2 / np.sqrt(mu**2 + sigma**2)),
            np.log(1 + sigma**2 / mu**2))


def lognormal_from_quantiles(x1, x2, p1=0.05, p2=0.95):
    """Log-normal parameters such that F(x1) = p1 and F(x2) = p2
    (reference ``prior.py:34-48``)."""
    sigma = (jnp.log(x2) - jnp.log(x1)) / (norm.ppf(p2) - norm.ppf(p1))
    mu = (jnp.log(x2) * norm.ppf(p2) - jnp.log(x1) * norm.ppf(p1)) / (
        norm.ppf(p2) - norm.ppf(p1))
    return mu, sigma


def sample_params(key, prior_dict):
    """Draw one value per parameter from a prior dict."""
    import jax.random as random

    params = {}
    keys = random.split(key, len(prior_dict))
    for k, (name, d) in zip(keys, sorted(prior_dict.items())):
        params[name] = d.sample(k)
    return params
