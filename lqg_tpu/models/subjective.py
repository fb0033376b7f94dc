"""Subjective-actor model: the agent's internal model differs from the truth.

Semantics match reference ``lqg/tracking/subjective.py``: the true system per
tracked dimension has 2 states (target, cursor, random-walk target), but the
actor *believes* the target has a velocity - 3 states per dimension (target
pos, cursor pos, target velocity) - with subjective noise magnitudes
``subj_noise`` / ``subj_vel_noise``.

``swap_dims`` permutes the actor state so the OBSERVED dims come first within
the joint (state, belief) system - the convention required by the likelihood
machinery (``lqg_tpu/ops/gaussian.py``; reference ``subjective.py:7-12`` /
``system.py:210-233``).
"""

from __future__ import annotations

from itertools import chain

import jax.numpy as jnp

from lqg_tpu.system import System
from lqg_tpu.utils import stationary_spec
from lqg_tpu.models.basic import _per_dim_blockdiag


def swap_dims(d: int, dim: int):
    """Permutation putting each per-dimension (pos, cursor) pair first.

    Parity with reference ``swap_dims`` (``tracking/subjective.py:7-12``).
    """
    idx = list(range(d))
    obs_dims = [idx[(d // dim) * i:((d // dim) * i + 2)] for i in range(dim)]
    unobs_dims = [idx[((d // dim) * i + 2):(d // dim) * (i + 1)]
                  for i in range(dim)]
    return list(chain(*(obs_dims + unobs_dims)))


class SubjectiveActor(System):
    def __init__(self, dim=1, process_noise=1.0, action_cost=1.0,
                 action_variability=0.5, subj_noise=1.0, subj_vel_noise=0.5,
                 sigma_target=6.0, sigma_cursor=6.0, dt=1.0 / 60, T=1000):
        f = jnp.result_type(float)
        # true dynamics: 2 states per dim, random-walk target
        A = jnp.eye(2 * dim)
        B = _per_dim_blockdiag(jnp.array([[0.0], [1.0 * dt]]), dim)
        F = jnp.eye(2 * dim)
        V = jnp.diag(jnp.tile(jnp.stack([jnp.asarray(process_noise, f),
                                         jnp.asarray(action_variability, f)]), dim))
        W = jnp.diag(jnp.tile(jnp.stack([jnp.asarray(sigma_target, f),
                                         jnp.asarray(sigma_cursor, f)]), dim))
        xdim = A.shape[0]
        udim = B.shape[1]
        dyn = stationary_spec(A=A, B=B, F=F, V=V, W=W,
                              Q=jnp.zeros((xdim, xdim)),
                              R=jnp.zeros((udim, udim)))

        # actor's internal model: 3 states per dim (adds target velocity)
        A_a = _per_dim_blockdiag(
            jnp.array([[1.0, 0.0, dt], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]), dim)
        B_a = _per_dim_blockdiag(jnp.array([[0.0], [1.0 * dt], [0.0]]), dim)
        F_a = _per_dim_blockdiag(
            jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), dim)
        V_a = jnp.diag(jnp.tile(jnp.stack([jnp.asarray(subj_noise, f),
                                           jnp.asarray(action_variability, f),
                                           jnp.asarray(subj_vel_noise, f)]), dim))
        Q_a = _per_dim_blockdiag(
            jnp.array([[1.0, -1.0, 0.0], [-1.0, 1.0, 0.0], [0.0, 0.0, 0.0]]),
            dim)
        R_a = jnp.eye(B_a.shape[1]) * action_cost

        # permute actor state: observed dims first
        dims = jnp.array(swap_dims(A_a.shape[0], dim))
        A_a = A_a[dims, :][:, dims]
        B_a = B_a[dims, :]
        V_a = V_a[dims, :]
        F_a = F_a[:, dims]
        Q_a = Q_a[dims, :][:, dims]

        act = stationary_spec(A=A_a, B=B_a, F=F_a, V=V_a, W=W, Q=Q_a, R=R_a)
        super().__init__(actor=act, dynamics=dyn, horizon=T)
