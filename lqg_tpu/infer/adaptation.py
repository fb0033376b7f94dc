"""Stan-style warmup adaptation: dual-averaging step size + diagonal mass.

Jittable companions to :mod:`lqg_tpu.infer.hmc`:

* :func:`find_reasonable_step_size` - double/halve until the one-step
  acceptance probability crosses 0.5.
* Dual averaging (Nesterov / Hoffman-Gelman) targeting a given acceptance.
* Welford accumulator for the posterior variance -> diagonal inverse mass.
* :func:`build_schedule` - the Stan warmup window schedule, precomputed as
  boolean arrays so the adaptation scan stays data-independent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from lqg_tpu.infer.hmc import (IntegratorState, leapfrog, kinetic,
                               sample_momentum)


# --- dual averaging ---
class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    grad_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(step_size):
    log_step = jnp.log(step_size)
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=jnp.zeros_like(log_step),
        grad_avg=jnp.zeros_like(log_step),
        t=jnp.zeros_like(log_step),
        mu=jnp.log(10.0) + log_step,
    )


def da_update(state: DualAveragingState, accept_prob,
              target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    t = state.t + 1.0
    g = target - accept_prob
    grad_avg = (1 - 1 / (t + t0)) * state.grad_avg + g / (t + t0)
    log_step = state.mu - jnp.sqrt(t) / gamma * grad_avg
    eta = t ** -kappa
    log_step_avg = eta * log_step + (1 - eta) * state.log_step_avg
    return DualAveragingState(log_step=log_step, log_step_avg=log_step_avg,
                              grad_avg=grad_avg, t=t, mu=state.mu)


# --- Welford variance / covariance ---
class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray  # (zdim,) running variance or (zdim, zdim) covariance
    count: jnp.ndarray


def welford_init(zdim, dense: bool = False):
    m2 = jnp.zeros((zdim, zdim)) if dense else jnp.zeros(zdim)
    return WelfordState(mean=jnp.zeros(zdim), m2=m2, count=jnp.zeros(()))


def welford_update(state: WelfordState, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    if state.m2.ndim == 2:
        m2 = state.m2 + jnp.outer(delta, x - mean)
    else:
        m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean=mean, m2=m2, count=count)


def welford_variance(state: WelfordState, regularize: bool = True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit variance
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def welford_mass(state: WelfordState, regularize: bool = True):
    """Inverse-mass estimate in the representation :mod:`hmc` expects.

    Diagonal accumulator -> posterior-variance vector.  Dense accumulator
    -> lower-Cholesky factor of the (shrunk) posterior covariance, so the
    sampler's metric whitens linear correlations (Stan's dense metric) -
    this is what collapses hierarchical posteriors' max-depth trees that a
    diagonal mass cannot (observed on the data.mat fit: every tree at
    depth 10 under diag).
    """
    if state.m2.ndim == 1:
        return welford_variance(state, regularize)
    cov = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        n = state.count
        zdim = state.mean.shape[0]
        cov = ((n / (n + 5.0)) * cov
               + 1e-3 * (5.0 / (n + 5.0)) * jnp.eye(zdim))
    return jnp.linalg.cholesky(cov)


# --- step-size search ---
def find_reasonable_step_size(potential_fn, inv_mass, z, pe, grad, rng_key,
                              init_step=1.0, target=0.5, max_iter=60):
    """Heuristic of Hoffman & Gelman (2014), Algorithm 4."""
    r = sample_momentum(rng_key, inv_mass, z.shape)
    energy0 = pe + kinetic(inv_mass, r)
    state0 = IntegratorState(z=z, r=r, pe=pe, grad=grad)

    def accept_prob(step):
        s = leapfrog(potential_fn, inv_mass, step, state0)
        energy = s.pe + kinetic(inv_mass, s.r)
        delta = energy0 - energy
        return jnp.where(jnp.isnan(delta), -jnp.inf, delta)

    log_target = jnp.log(target)
    delta0 = accept_prob(init_step)
    direction = jnp.where(delta0 > log_target, 1.0, -1.0)

    def cond(c):
        step, it, _ = c
        delta = accept_prob(step)
        crossed = jnp.where(direction > 0, delta <= log_target,
                            delta >= log_target)
        return (~crossed) & (it < max_iter)

    def body(c):
        step, it, _ = c
        step = jnp.where(direction > 0, step * 2.0, step * 0.5)
        return (step, it + 1, direction)

    step, _, _ = lax.while_loop(cond, body, (jnp.asarray(init_step), 0,
                                             direction))
    return step


# --- warmup schedule ---
def build_schedule(num_warmup, init_buffer=75, term_buffer=50, window=25):
    """Stan's three-phase schedule.

    Returns numpy bool arrays of length ``num_warmup``:
    ``(in_window, window_end)`` - whether step i is inside a slow
    (mass-estimation) window, and whether it closes one.
    """
    in_window = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)

    if num_warmup < 20:
        return in_window, window_end

    if init_buffer + window + term_buffer > num_warmup:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.1 * num_warmup)
        window = num_warmup - init_buffer - term_buffer

    start = init_buffer
    size = window
    while start < num_warmup - term_buffer:
        end = min(start + size, num_warmup - term_buffer)
        # expand the last window to absorb the remainder
        if end + 2 * size > num_warmup - term_buffer:
            end = num_warmup - term_buffer
        in_window[start:end] = True
        window_end[end - 1] = True
        start = end
        size *= 2

    return in_window, window_end
