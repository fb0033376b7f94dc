"""Canonical 1D-per-dimension tracking models (Straub & Rothkopf 2022).

Semantics match reference ``lqg/tracking/basic.py``: per tracked dimension the
state is (target, cursor); the target follows a random walk with standard
deviation ``process_noise``; the cursor integrates the control with motor
variability ``action_variability``; both are observed with separate sensory
noises; the cost penalizes (target - cursor) error plus a quadratic action
cost.

Constructors are pure JAX functions of their scalar parameters, so a whole
model (parameters -> matrices -> gains -> likelihood) traces into one
differentiable XLA graph - and ``vmap`` over constructors batches parameter
particles for free.  Specs are *stationary* (no time stacks in HBM).
"""

from __future__ import annotations

import jax.numpy as jnp

from lqg_tpu.system import System
from lqg_tpu.utils import stationary_spec


def _per_dim_blockdiag(block: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Block-diagonal replication of a (traced) block, ``dim`` times."""
    r, c = block.shape
    out = jnp.zeros((dim * r, dim * c), dtype=block.dtype)
    for i in range(dim):
        out = out.at[i * r:(i + 1) * r, i * c:(i + 1) * c].set(block)
    return out


def tracking_spec(dim, process_noise, action_variability, sigma_target,
                  sigma_cursor, action_cost, dt):
    """Stationary spec for the basic tracking task
    (reference ``tracking/basic.py:20-38``)."""
    d = 2 * dim
    A = jnp.eye(d)
    B = dt * _per_dim_blockdiag(jnp.array([[0.0], [1.0]]), dim)
    F = jnp.eye(d)
    V = jnp.diag(jnp.tile(jnp.stack([jnp.asarray(process_noise, dtype=jnp.result_type(float)),
                                     jnp.asarray(action_variability, dtype=jnp.result_type(float))]), dim))
    W = jnp.diag(jnp.tile(jnp.stack([jnp.asarray(sigma_target, dtype=jnp.result_type(float)),
                                     jnp.asarray(sigma_cursor, dtype=jnp.result_type(float))]), dim))
    Q = _per_dim_blockdiag(jnp.array([[1.0, -1.0], [-1.0, 1.0]]), dim)
    R = jnp.eye(B.shape[1]) * action_cost
    return stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)


class TrackingTask(System):
    def __init__(self, dim=1, process_noise=1.0, action_variability=0.5,
                 sigma_target=6.0, sigma_cursor=6.0, action_cost=1.0,
                 dt=1.0 / 60.0, T=1000):
        self.dim = dim
        self.process_noise = process_noise
        spec = tracking_spec(dim, process_noise, action_variability,
                             sigma_target, sigma_cursor, action_cost, dt)
        super().__init__(actor=spec, dynamics=spec, horizon=T)


class BoundedActor(TrackingTask):
    """Parameter alias of :class:`TrackingTask`
    (reference ``tracking/basic.py:41-62``)."""

    def __init__(self, dim=1, process_noise=1.0, action_variability=0.5,
                 sigma_target=6.0, sigma_cursor=6.0, action_cost=1.0,
                 dt=1.0 / 60, T=1000):
        super().__init__(dim=dim, process_noise=process_noise,
                         action_variability=action_variability,
                         sigma_target=sigma_target, sigma_cursor=sigma_cursor,
                         action_cost=action_cost, dt=dt, T=T)


class OptimalActor(TrackingTask):
    """Bounded actor with a fixed, near-zero action cost
    (reference ``tracking/basic.py:65-87``)."""

    def __init__(self, dim=1, process_noise=1.0, action_variability=0.5,
                 sigma_target=6.0, sigma_cursor=6.0, dt=1.0 / 60, T=1000):
        super().__init__(dim=dim, process_noise=process_noise,
                         action_variability=action_variability,
                         sigma_target=sigma_target, sigma_cursor=sigma_cursor,
                         action_cost=1e-3, dt=dt, T=T)


class RelativeObservationBoundedActor(System):
    """Observes only the (target - cursor) difference, one sensory noise
    (reference ``tracking/basic.py:90-124``)."""

    def __init__(self, dim=1, process_noise=1.0, action_variability=0.5,
                 sigma=6.0, action_cost=1.0, dt=1.0 / 60.0, T=1000):
        self.dim = dim
        self.process_noise = process_noise
        d = 2 * dim
        A = jnp.eye(d)
        B = dt * _per_dim_blockdiag(jnp.array([[0.0], [1.0]]), dim)
        F = _per_dim_blockdiag(jnp.array([[1.0, -1.0]]), dim)
        V = jnp.diag(jnp.tile(jnp.stack([jnp.asarray(process_noise, dtype=jnp.result_type(float)),
                                         jnp.asarray(action_variability, dtype=jnp.result_type(float))]), dim))
        W = jnp.diag(jnp.tile(jnp.asarray(sigma, dtype=jnp.result_type(float))[None], dim))
        Q = _per_dim_blockdiag(jnp.array([[1.0, -1.0], [-1.0, 1.0]]), dim)
        R = jnp.eye(B.shape[1]) * action_cost
        spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
        super().__init__(actor=spec, dynamics=spec, horizon=T)
