"""Point-mass cursor model with exact ZOH discretization.

Semantics match reference ``lqg/tracking/point_mass.py``: the cursor is a
continuous-time point mass with viscous damping and first-order muscle
activation, discretized exactly via the block matrix exponential; the process
noise is discretized with van Loan's method.  State = [target, cursor pos,
cursor vel, muscle activation]; velocity is unobserved.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import expm

from lqg_tpu.system import System
from lqg_tpu.utils import stationary_spec
from lqg_tpu.ops.linalg import make_psd


def discretize_linear_system(A, B, dt):
    """Exact zero-order-hold discretization of ``x' = A x + B u`` via the
    block matrix exponential (reference ``point_mass.py:50-79``)."""
    n = A.shape[0]
    m = B.shape[1]
    M = jnp.zeros((n + m, n + m), dtype=A.dtype)
    M = M.at[:n, :n].set(A)
    M = M.at[:n, n:].set(B)
    M_exp = expm(M * dt)
    return M_exp[:n, :n], M_exp[:n, n:]


def van_loan_discretization(A, G, dt, Qc=None):
    """Discrete process-noise covariance via van Loan's method
    (reference ``point_mass.py:82-110``)."""
    n = A.shape[0]
    if Qc is None:
        Qc = jnp.eye(G.shape[1], dtype=G.dtype)
    Q = G @ Qc @ G.T
    M = jnp.block([[A, Q], [jnp.zeros_like(A), -A.T]])
    M_exp = expm(M * dt)
    return M_exp[:n, n:]


def point_mass_dynamics_matrices(damping, m, tau, action_variability, dt):
    """Discretized point-mass + muscle dynamics and noise Cholesky
    (reference ``point_mass.py:113-127``)."""
    A_c = jnp.array([[0.0, 1.0, 0.0],
                     [0.0, -damping / m, 1.0 / m],
                     [0.0, 0.0, -1.0 / tau]])
    B_c = jnp.array([[0.0], [0.0], [1.0 / tau]])

    A, B = discretize_linear_system(A_c, B_c, dt)
    # NOTE: upper-triangular (scipy-convention) factor, matching the
    # reference's jax.scipy cholesky call exactly (point_mass.py:123-125) -
    # the noise covariance used downstream is V V^T with V upper.
    from jax.scipy.linalg import cholesky as scipy_cholesky
    V = scipy_cholesky(
        make_psd(van_loan_discretization(A_c, 1e-2 * action_variability * B_c,
                                         dt)))
    return A, B, V


class PointMassBoundedActor(System):
    def __init__(self, process_noise=1.0, action_variability=1e-3,
                 sigma_target=6.0, sigma_cursor=6.0, action_cost=0.01,
                 dt=1.0 / 60.0, T=1000, damping=0.1, m=1.0, tau=0.0015):
        f = jnp.result_type(float)
        A, B, V = point_mass_dynamics_matrices(
            damping=damping, m=m, tau=tau,
            action_variability=action_variability, dt=dt)

        # add target position as a leading constant state
        A_full = jnp.zeros((4, 4), dtype=A.dtype).at[0, 0].set(1.0)
        A_full = A_full.at[1:, 1:].set(A)
        B_full = jnp.concatenate([jnp.zeros((1, 1), dtype=B.dtype), B], axis=0)
        V_full = jnp.zeros((4, 4), dtype=V.dtype)
        V_full = V_full.at[0, 0].set(jnp.asarray(process_noise, f))
        V_full = V_full.at[1:, 1:].set(V)

        F = jnp.eye(3, 4)  # positions observed, velocity hidden
        W = jnp.diag(jnp.stack([jnp.asarray(sigma_target, f),
                                jnp.asarray(sigma_cursor, f),
                                jnp.asarray(sigma_cursor, f)]))
        Q = jnp.zeros((4, 4)).at[:2, :2].set(
            jnp.array([[1.0, -1.0], [-1.0, 1.0]]))
        R = jnp.eye(B_full.shape[1]) * action_cost * dt

        spec = stationary_spec(A=A_full, B=B_full, F=F, V=V_full, W=W, Q=Q,
                               R=R)
        super().__init__(actor=spec, dynamics=spec, horizon=T)
