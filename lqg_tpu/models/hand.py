"""Hand-motion tracking model (second-order muscle dynamics).

Ports the capability of the reference's notebook-only model
(``notebooks/HandModel.ipynb`` cell 1): 5 states = [target, hand pos, hand
vel, muscle activation, muscle excitation]; only target and hand position are
observed; the control drives the excitation through two first-order lags.
"""

from __future__ import annotations

import jax.numpy as jnp

from lqg_tpu.system import System
from lqg_tpu.utils import stationary_spec


class HandMotionModelTrackingTask(System):
    def __init__(self, process_noise=1.0, action_variability=0.5,
                 sigma_target=6.0, sigma_cursor=6.0, action_cost=1.0,
                 dt=1.0 / 60.0, m=1.0, tau=0.04, T=1000):
        f = jnp.result_type(float)
        self.process_noise = process_noise

        A_cursor = jnp.array([
            [1.0, dt, 0.0, 0.0],
            [0.0, 1.0, dt / m, 0.0],
            [0.0, 0.0, 1.0 - dt / tau, dt / tau],
            [0.0, 0.0, 0.0, 1.0 - dt / tau],
        ])
        A = jnp.zeros((5, 5)).at[0, 0].set(1.0).at[1:, 1:].set(A_cursor)
        B = (dt / tau) * jnp.array([[0.0], [0.0], [0.0], [0.0], [1.0]])
        F = jnp.eye(2, 5)
        # the 1e-2 hand-position noise floor keeps the observed-block
        # covariance nonsingular (hand position is otherwise deterministic
        # given velocity, which makes the marginalized likelihood degenerate
        # at t=0); small enough to leave behavior unchanged
        V = jnp.diag(jnp.stack([jnp.asarray(process_noise, f),
                                jnp.full((), 1e-2, f), jnp.zeros((), f),
                                jnp.zeros((), f),
                                jnp.asarray(action_variability, f)]))
        W = jnp.diag(jnp.stack([jnp.asarray(sigma_target, f),
                                jnp.asarray(sigma_cursor, f)]))
        Q = jnp.zeros((5, 5)).at[:2, :2].set(
            jnp.array([[1.0, -1.0], [-1.0, 1.0]]))
        R = jnp.eye(B.shape[1]) * action_cost

        spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
        super().__init__(actor=spec, dynamics=spec, horizon=T)
