"""Associative (parallel-in-time) scans for the Riccati recursions.

The reference computes both Riccati-type recursions strictly sequentially
(``lax.scan`` at ``lqg/control/lqr.py:38`` and ``lqg/belief/kf.py:18``) - at
T=1000 this is 1000 serial dependent steps.  Here the recursions are
reformulated as an associative semigroup so ``jax.lax.associative_scan``
evaluates them in O(log T) depth, enabling horizon (sequence) parallelism
within a chip and, sharded over a mesh axis, across chips.

Math: every covariance/value Riccati step is a linear-fractional map in the
canonical form

    Phi(X) = C + A_e (I + X J)^{-1} X A_e^T

and these maps are closed under composition (the semigroup of
"Riccati/Moebius" maps used in the temporal-parallelization literature on
Kalman filtering and LQ control; see PAPERS.md "The Parallelization of
Riccati Recursion"):

    (Phi_j o Phi_i):  A = A_j (I + C_i J_j)^{-1} A_i
                      C = A_j (I + C_i J_j)^{-1} C_i A_j^T + C_j
                      J = A_i^T (I + J_j C_i)^{-1} J_j A_i + J_i

* Kalman covariance step (predict with (A, Q=VV^T), update with
  (F, R=WW^T)):   element  A_e = (I + Q S)^{-1} A,  C = (I + Q S)^{-1} Q,
  J = A^T (I + S Q)^{-1} S A,  with  S = F^T R^{-1} F.
* Control Riccati step  S_t = Q + A^T (I + S_{t+1} S_B)^{-1} S_{t+1} A
  (zero affine/cross terms):  element  A_e = A^T,  C = Q,  J = S_B
  with  S_B = B R^{-1} B^T.

Requirements: ``W W^T`` / ``R`` invertible (all shipped models satisfy
this); affine cost terms zero (true for every model the reference builds -
``time_stack_spec`` zeroes them).  The sequential kernels remain the
general-path fallback.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from lqg_tpu.spec import LQGSpec
from lqg_tpu.ops.linalg import mT, psd_solve, symmetrize
from lqg_tpu.ops.riccati import Gains


class RicattiElement(NamedTuple):
    A: jnp.ndarray
    C: jnp.ndarray
    J: jnp.ndarray


def _compose(first: RicattiElement, second: RicattiElement) -> RicattiElement:
    """Composition ``second o first`` (apply ``first``, then ``second``)."""
    Ai, Ci, Ji = first
    Aj, Cj, Jj = second
    n = Ai.shape[-1]
    eye = jnp.eye(n, dtype=Ai.dtype)

    M = jnp.linalg.solve(eye + Ci @ Jj, jnp.concatenate([Ai, Ci], axis=-1))
    MAi = M[..., :, :n]
    MCi = M[..., :, n:]
    A = Aj @ MAi
    C = Aj @ MCi @ mT(Aj) + Cj
    Jn = jnp.linalg.solve(eye + Jj @ Ci, Jj @ Ai)
    J = mT(Ai) @ Jn + Ji
    return RicattiElement(A=A, C=symmetrize(C), J=symmetrize(J))


def _apply(e: RicattiElement, X: jnp.ndarray) -> jnp.ndarray:
    n = e.A.shape[-1]
    eye = jnp.eye(n, dtype=e.A.dtype)
    Y = jnp.linalg.solve(eye + X @ e.J, X)
    return symmetrize(e.C + e.A @ Y @ mT(e.A))


def _tl(x, spec: LQGSpec, horizon: int):
    """Time-leading (T, ..., n, m) stack of a spec field."""
    if x.ndim == spec.Qf.ndim:  # stationary
        return jnp.broadcast_to(x[None], (horizon,) + x.shape)
    return jnp.moveaxis(x, -3, 0)


def kalman_forward_assoc(spec: LQGSpec, Sigma0: jnp.ndarray,
                         horizon: Optional[int] = None) -> jnp.ndarray:
    """Kalman gain schedule via associative scan; parity with
    :func:`lqg_tpu.ops.kalman.forward`."""
    if horizon is None:
        horizon = spec.A.shape[-3]
    A = _tl(spec.A, spec, horizon)
    F = _tl(spec.F, spec, horizon)
    V = _tl(spec.V, spec, horizon)
    W = _tl(spec.W, spec, horizon)

    Q = V @ mT(V)
    R = W @ mT(W)
    S = mT(F) @ psd_solve(R, F)

    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    IQS = eye + Q @ S
    AC = jnp.linalg.solve(IQS, jnp.concatenate([A, Q], axis=-1))
    Ae = AC[..., :, :n]
    Ce = symmetrize(AC[..., :, n:])
    Je = symmetrize(mT(A) @ jnp.linalg.solve(eye + S @ Q, S @ A))
    elems = RicattiElement(A=Ae, C=Ce, J=Je)

    # prefix_t = step_t o ... o step_0
    with jax.default_matmul_precision("highest"):
        prefix = lax.associative_scan(
            lambda a, b: _compose(first=a, second=b), elems, axis=0)

    # P_{t|t} = prefix_t(Sigma0) for t = 0..T-1; filtered covs shifted by one
    Pf = jax.vmap(lambda e: _apply(e, Sigma0))(prefix)
    Pf_prev = jnp.concatenate([Sigma0[None], Pf[:-1]], axis=0)  # P_{t-1|t-1}

    # predicted covariance and gain at step t (pointwise, fully parallel)
    Pp = A @ Pf_prev @ mT(A) + Q
    G = symmetrize(F @ Pp @ mT(F) + R)
    K = mT(psd_solve(G, F @ mT(Pp)))
    return K


def lqr_backward_assoc(spec: LQGSpec,
                       horizon: Optional[int] = None) -> Gains:
    """LQR gains via associative scan; parity with
    :func:`lqg_tpu.ops.riccati.backward` for zero affine/cross terms."""
    if horizon is None:
        horizon = spec.A.shape[-3]
    A = _tl(spec.A, spec, horizon)
    B = _tl(spec.B, spec, horizon)
    Q = _tl(spec.Q, spec, horizon)
    R = _tl(spec.R, spec, horizon)

    SB = B @ psd_solve(R, mT(B))
    elems = RicattiElement(A=mT(A), C=Q, J=SB)

    # backward composition: value_t = step_t o step_{t+1} o ... o step_{T-1}
    with jax.default_matmul_precision("highest"):
        prefix = lax.associative_scan(
            lambda a, b: _compose(first=b, second=a), elems, axis=0,
            reverse=True)

    Qf = spec.Qf
    S = jax.vmap(lambda e: _apply(e, Qf))(prefix)  # S_t for t = 0..T-1
    # gains at step t need S_{t+1}
    S_next = jnp.concatenate([S[1:], jnp.broadcast_to(
        Qf, (1,) + Qf.shape)], axis=0)

    H = symmetrize(R + mT(B) @ S_next @ B)
    G = mT(B) @ S_next @ A
    L = -psd_solve(H, G)
    l = jnp.zeros(L.shape[:-2] + (L.shape[-2],), dtype=L.dtype)
    return Gains(L=L, l=l, H=H)


class AffineElement(NamedTuple):
    M: jnp.ndarray
    c: jnp.ndarray


def affine_scan(M: jnp.ndarray, c: jnp.ndarray, x0: jnp.ndarray):
    """Parallel evaluation of ``x_{t+1} = M_t x_t + c_t``.

    ``M``: (T, n, n); ``c``: (T, n) or (T, n, k) batched columns.  Returns
    the stacked ``x_1..x_T``.  Used for horizon-parallel evaluation of the
    conditional-mean recursion in the likelihood (``lqg_tpu/ops/gaussian``).
    """
    vec = c.ndim == M.ndim - 1
    if vec:
        c = c[..., None]
        x0 = x0[..., None]

    def compose(first, second):
        return AffineElement(M=second.M @ first.M,
                             c=second.M @ first.c + second.c)

    prefix = lax.associative_scan(compose, AffineElement(M=M, c=c), axis=0)
    out = prefix.M @ x0 + prefix.c
    return out[..., 0] if vec else out
