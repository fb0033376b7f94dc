"""Prior registry for tracking-model parameters.

Organized as a declarative table (``PRIOR_TABLE``) mapping parameter names to
distribution factories, from which the default prior dict is materialized.
The distribution choices and hyperparameters reproduce the reference's
published priors (``lqg/infer/prior.py:7-24``) so that posterior fits are
comparable; the representation (registry + factories + vectorized sampling)
is this framework's own.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import jax.numpy as jnp
import jax.random as random
from jax.scipy.stats import norm

from lqg_tpu.infer.dists import Distribution, HalfNormal, LogNormal

# Number of blob-width conditions in the Bonnen et al. dataset; the
# hierarchical data fit needs one per-condition target-noise site each.
N_DATA_CONDITIONS = 6

# name -> zero-arg factory producing a fresh Distribution.  Factories (rather
# than instances) keep the module import side-effect free and let callers
# materialize independent copies.
PRIOR_TABLE: Dict[str, Callable[[], Distribution]] = {
    # control effort weight: broad log-normal centered near e^-2
    "action_cost": lambda: LogNormal(-2.0, 1.0),
    # the delay-register models name their action cost "c" (reference
    # delay.py:44); same prior (the reference's table has no entry, so its
    # own stack cannot fit this model hierarchically - greenfield fix)
    "c": lambda: LogNormal(-2.0, 1.0),
    # motor/process noise scales: half-normals
    "action_variability": lambda: HalfNormal(1.0),
    "signal_dep_noise": lambda: HalfNormal(1.0),
    # observation noise scales
    "sigma_target": lambda: HalfNormal(50.0),
    "sigma_cursor": lambda: HalfNormal(12.5),
    "sigma": lambda: HalfNormal(50.0),
    # subjective internal-model noise scales
    "subj_noise": lambda: HalfNormal(1.0),
    "subj_vel_noise": lambda: HalfNormal(2.0),
}


def default_prior() -> Dict[str, Distribution]:
    """Materialize the default prior dict.

    Includes one ``sigma_target_{c}`` site per dataset condition so the
    hierarchical (shared-parameter) model can address them directly.
    """
    out = {name: make() for name, make in PRIOR_TABLE.items()}
    per_condition = PRIOR_TABLE["sigma_target"]
    for c in range(N_DATA_CONDITIONS):
        out[f"sigma_target_{c}"] = per_condition()
    return out


DEFAULT_PRIOR = default_prior()


def prior() -> Dict[str, Distribution]:
    """Accessor returning the module-level default prior dict."""
    return DEFAULT_PRIOR


def register_prior(name: str, factory: Callable[[], Distribution]) -> None:
    """Add (or override) a parameter prior in the registry and the
    materialized default dict - the extension point for user model zoos."""
    PRIOR_TABLE[name] = factory
    DEFAULT_PRIOR[name] = factory()


def sample_params(key, prior_dict=None) -> Dict[str, jnp.ndarray]:
    """One joint draw from a prior dict (default: ``DEFAULT_PRIOR``).

    Sites are keyed in sorted-name order so the draw is reproducible
    regardless of dict insertion order.
    """
    if prior_dict is None:
        prior_dict = DEFAULT_PRIOR
    names = sorted(prior_dict)
    subkeys = random.split(key, len(names))
    return {name: prior_dict[name].sample(k)
            for name, k in zip(names, subkeys)}


# --- log-normal hyperparameter helpers -------------------------------------

def lognormal_params(mean, std):
    """``(mu, sigma^2)`` of the log-normal with the given mean and std
    (moment matching)."""
    m2, s2 = np.square(mean), np.square(std)
    return np.log(m2 / np.sqrt(m2 + s2)), np.log1p(s2 / m2)


def lognormal_from_quantiles(x1, x2, p1=0.05, p2=0.95):
    """``(mu, sigma)`` of the log-normal whose CDF passes through
    ``(x1, p1)`` and ``(x2, p2)``.

    Solves the 2x2 linear system ``mu + sigma * z_i = log(x_i)`` where
    ``z_i = Phi^{-1}(p_i)``.
    """
    z1, z2 = norm.ppf(p1), norm.ppf(p2)
    l1, l2 = jnp.log(x1), jnp.log(x2)
    sigma = (l2 - l1) / (z2 - z1)
    mu = (l2 * z2 - l1 * z1) / (z2 - z1)
    return mu, sigma
