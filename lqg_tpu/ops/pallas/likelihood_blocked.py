"""Blocked (MXU-tile) Pallas kernel for the large-j marginalized likelihood.

The per-element-lane kernel in :mod:`lqg_tpu.ops.pallas.likelihood` unrolls
``j x j`` matrices as separate (8, 128) tiles - straight-line FMA code that
is unbeatable for ``j <= 12`` but fundamentally cannot scale past that (the
delay-register models sit at ``j ~ 26-65``, reference
``lqg/tracking/delay.py:9-33``).  This module takes the opposite layout:
each joint-state matrix is ONE zero-padded (128, 128) VMEM tile and every
recursion step is a handful of real MXU matmuls, with trials riding the
128 lanes of the mean tile.

Key padding identities (d = observed dims, top-left (d, d) block S):

* ``J = FS[:, :d] @ S^-1`` == ``FS @ Sinv_full`` where ``Sinv_full`` embeds
  the tiny closed-form inverse in its top-left block (zeros elsewhere);
* ``J @ P^T`` == ``J @ FS^T`` because J's columns >= d are zero;
* the innovation ``E`` rows >= d may hold garbage - every consumer
  multiplies them by structurally-zero blocks.

Scope: ``12 < j <= 128``, ``d <= 4``, trials ``n <= 128``, float32.  The
backward pass differentiates an XLA scan twin of the same recursion (the
analytic blocked adjoint is a follow-up); the primal is the win the delay
models need - the j=65 scan costs ~11 ms (value) at T=500 on chip
(BENCH_notes_r3) while this kernel runs ~4 dependent MXU ops per step.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)
BJ = 128   # padded joint dim (MXU tile)
BD = 8     # padded observed-dim rows for the data stream


def _minor(rows, i0, j0, nn):
    return [rows[r * nn + c] for r in range(nn) if r != i0
            for c in range(nn) if c != j0]


def _det_n(rows, nn):
    if nn == 1:
        return rows[0]
    acc = None
    for c in range(nn):
        term = rows[c] * _det_n(_minor(rows, 0, c, nn), nn - 1)
        term = term if c % 2 == 0 else -term
        acc = term if acc is None else acc + term
    return acc


def _small_inv_det(s, d, eps):
    """Closed-form inverse + determinant of the (d, d) list-of-scalars
    ``s`` (row-major, traced), d <= 4, via cofactor expansion."""
    det = _det_n(s, d)
    inv = 1.0 / (det + eps)
    out = [None] * (d * d)
    for i0 in range(d):
        for j0 in range(d):
            cof = _det_n(_minor(s, j0, i0, d), d - 1) if d > 1 else 1.0
            if (i0 + j0) % 2 == 1:
                cof = -cof
            out[i0 * d + j0] = cof * inv
    return out, det


def _ll_blocked_kernel(F_ref, FT_ref, Q_ref, X_ref, xT_ref, ll_ref,
                       Sig_scr, MU_scr, acc_scr,
                       *, j, d, n, T, tc, eps):
    """Forward conditioned recursion on (128, 128) tiles.

    Same math as ``likelihood._ll_fwd_kernel`` (and the scan twin
    ``gaussian.conditional_kernel`` + ``trial_log_likelihood``): one
    parameter set per grid row, trials on lanes of the mean tile.
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    row2 = jax.lax.broadcasted_iota(jnp.int32, (BJ, BJ), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (BJ, BJ), 1)

    def embed_rows(Xblk):
        # (BD, 128) data block -> (BJ, BJ) with rows >= d zeroed
        full = jnp.pad(Xblk, ((0, BJ - BD), (0, 0)))
        return jnp.where(row2 < d, full, 0.0)

    @pl.when(c == 0)
    def _():
        # Sigma_0 = Q_0 ; MU_0 = [X_0 ; 0]
        Sig_scr[...] = Q_ref[0]
        MU_scr[...] = embed_rows(X_ref[0])
        acc_scr[...] = jnp.zeros_like(acc_scr)

    tl_mask = jnp.where((row2 < d) & (col2 < d), 1.0, 0.0)
    eye_mask = jnp.where((row2 == col2) & (row2 < d), 1.0, 0.0)

    def score(Sig, MU, Xblk):
        """(quad per lane, logdet scalar, Sinv_full, E) of the predictive."""
        if d == 2:
            # scalar-FREE small inverse via Cayley-Hamilton:
            #   S^-1 = (tr(S) I - S) / det,  det = (tr^2 - tr(S^2)) / 2
            # (tr(S^2) = sum(S*S) for symmetric S).  Two reductions feed
            # scalar broadcasts instead of d^2 element extractions - the
            # vector->scalar syncs were the measured per-step bottleneck.
            Smask = Sig * tl_mask
            tr = jnp.sum(Sig * eye_mask)
            det = 0.5 * (tr * tr - jnp.sum(Smask * Smask))
            Sinv = (tr * eye_mask - Smask) * (1.0 / (det + eps))
        else:
            s_el = [Sig[r, k] for r in range(d) for k in range(d)]
            inv_rows, det = _small_inv_det(s_el, d, eps)
            Sinv = jnp.zeros((BJ, BJ), jnp.float32)
            for r in range(d):
                for k in range(d):
                    Sinv = Sinv + inv_rows[r * d + k] * jnp.where(
                        (row2 == r) & (col2 == k), 1.0, 0.0)
        E = embed_rows(Xblk) - jnp.where(row2 < d, MU, 0.0)
        SE = jnp.dot(Sinv, E, preferred_element_type=jnp.float32)
        quad = jnp.sum(E * SE, axis=0)          # (128,) per-lane
        return quad, jnp.log(det), Sinv, E

    def step(i, carry):
        # carries ride the fori_loop VALUES (no per-step scratch
        # load/store ordering constraints); scratch only bridges chunks
        Sig, MU, qacc, ldacc = carry
        F = F_ref[i]
        FT = FT_ref[i]
        Q = Q_ref[i]

        quad, ld, Sinv, E = score(Sig, MU, X_ref[i])
        t_global = c * tc + i
        mask = jnp.where(t_global >= 1, 1.0, 0.0)
        qacc = qacc + mask * quad
        ldacc = ldacc + mask * ld

        FS = jnp.dot(F, Sig, preferred_element_type=jnp.float32)
        J = jnp.dot(FS, Sinv, preferred_element_type=jnp.float32)
        MU = (jnp.dot(F, MU, preferred_element_type=jnp.float32)
              + jnp.dot(J, E, preferred_element_type=jnp.float32))
        Sig_new = (jnp.dot(FS, FT, preferred_element_type=jnp.float32) + Q
                   - jnp.dot(J, FS.T, preferred_element_type=jnp.float32))
        Sig = 0.5 * (Sig_new + Sig_new.T)
        return (Sig, MU, qacc, ldacc)

    Sig_f, MU_f, q_f, ld_f = jax.lax.fori_loop(
        0, tc, step, (Sig_scr[...], MU_scr[...], acc_scr[0, :],
                      acc_scr[1, :]))
    Sig_scr[...] = Sig_f
    MU_scr[...] = MU_f
    acc_scr[0, :] = q_f
    acc_scr[1, :] = ld_f

    @pl.when(c == n_chunks - 1)
    def _():
        quad, ld, _, _ = score(Sig_scr[...], MU_scr[...], xT_ref[0])
        total = (acc_scr[0, :] + quad + acc_scr[1, :] + ld
                 + T * d * _LOG_2PI)
        ll_ref[...] = jnp.broadcast_to((-0.5 * total)[None], (BD, 128))


def blocked_ll_available(j: int, d: int, n: int, dtype) -> bool:
    return 12 < j <= BJ and d <= 4 and n <= 128 and dtype == jnp.float32


def _squeeze_lead(kernel):
    """Adapt refs carrying the size-1 parameter-set block dim."""
    def wrapped(F_ref, FT_ref, Q_ref, X_ref, xT_ref, ll_ref, *scr, **kw):
        return kernel(F_ref.at[0], FT_ref.at[0], Q_ref.at[0], X_ref.at[0],
                      xT_ref.at[0], ll_ref.at[0], *scr, **kw)
    return wrapped


@functools.partial(jax.jit, static_argnames=("eps",))
def _blocked_ll_call(F, Q, X, eps: float = 1e-12):
    """Run the blocked forward kernel.

    Args:
        F, Q: ``(P, T, j, j)`` joint transition / noise covariance.
        X: ``(P, n, T+1, d)`` observed trajectories.

    Returns:
        ``(P, n)`` per-trial log likelihoods.
    """
    P, T, j, _ = F.shape
    n = X.shape[1]
    d = X.shape[-1]
    dtype = F.dtype

    Fp = jnp.pad(F, ((0, 0), (0, 0), (0, BJ - j), (0, BJ - j)))
    FTp = jnp.swapaxes(Fp, -1, -2)
    Qp = jnp.pad(Q, ((0, 0), (0, 0), (0, BJ - j), (0, BJ - j)))
    # X: (P, n, T+1, d) -> per-step (d, n) blocks padded to (BD, 128)
    Xt = jnp.moveaxis(X, 1, -1)                      # (P, T+1, d, n)
    Xt = jnp.pad(Xt, ((0, 0), (0, 0), (0, BD - d), (0, 128 - n)))
    X_in = Xt[:, :T]                                  # (P, T, BD, 128)
    xT_in = Xt[:, T:T + 1]                            # (P, 1, BD, 128)

    tc = max(1, min(T, (2 << 20) // ((3 * BJ + BD) * BJ * 4)))
    while T % tc:
        tc -= 1
    n_chunks = T // tc

    grid = (P, n_chunks)
    interpret = jax.default_backend() != "tpu"
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))

    def spec_t(r):
        return pl.BlockSpec((1, tc, r, BJ), lambda p, c: (p, c, 0, 0),
                            memory_space=pltpu.VMEM)

    ll = pl.pallas_call(
        functools.partial(_squeeze_lead(_ll_blocked_kernel),
                          j=j, d=d, n=n, T=T, tc=tc, eps=eps),
        grid=grid,
        in_specs=[spec_t(BJ), spec_t(BJ), spec_t(BJ), spec_t(BD),
                  pl.BlockSpec((1, 1, BD, 128), lambda p, c: (p, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BD, 128), lambda p, c: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, BD, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((BJ, BJ), dtype),   # Sigma
            pltpu.VMEM((BJ, BJ), dtype),   # MU
            pltpu.VMEM((BD, 128), dtype),  # row 0: quad (lanes); [1,0]: logdet
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(Fp, FTp, Qp, X_in, xT_in)

    return ll[:, 0, :n]


def _scan_twin(F, Q, X):
    """Differentiable XLA twin working directly from the covariance Q
    (delay models' Q = G G^T is LOW-RANK, so no Cholesky of Q here)."""
    from lqg_tpu.ops.linalg import symmetrize, cho_solve, mT

    d = X.shape[-1]

    def one(Fj, Qj, Xn):
        Sigma0 = Qj[0]
        mu0 = jnp.concatenate(
            [mT(Xn[:, 0, :]),
             jnp.zeros((Fj.shape[-1] - d, Xn.shape[0]), Fj.dtype)], axis=0)

        def stepfn(carry, inp):
            Sigma, MU = carry
            Ft, Qt, xt = inp          # xt: (n, d)
            S = symmetrize(Sigma[:d, :d])
            chol = jnp.linalg.cholesky(S)
            E = mT(xt) - MU[:d]       # (d, n)
            w = jax.scipy.linalg.solve_triangular(chol, E, lower=True)
            quad = jnp.sum(w * w, axis=0)
            ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
            FS = Ft @ Sigma
            J = mT(cho_solve(chol, mT(FS[:, :d])))
            MU_new = Ft @ MU + J @ E
            Sigma_new = symmetrize(FS @ mT(Ft) + Qt - J @ mT(FS[:, :d]))
            return (Sigma_new, MU_new), (quad, ld)

        with jax.default_matmul_precision("highest"):
            (SigT, MUT), (quads, lds) = jax.lax.scan(
                stepfn, (Sigma0, mu0),
                (Fj, Qj, jnp.swapaxes(Xn[:, :-1], 0, 1)))
        T = Fj.shape[0]
        # scores for t = 1..T-1 accumulated minus the t=0 term, plus final
        S = symmetrize(SigT[:d, :d])
        chol = jnp.linalg.cholesky(S)
        E = mT(Xn[:, -1, :]) - MUT[:d]
        w = jax.scipy.linalg.solve_triangular(chol, E, lower=True)
        quad_T = jnp.sum(w * w, axis=0)
        ld_T = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        total = (jnp.sum(quads[1:], axis=0) + quad_T
                 + jnp.sum(lds[1:]) + ld_T + T * d * _LOG_2PI)
        return -0.5 * total

    return jax.vmap(one)(F, Q, X)


@jax.custom_vjp
def conditioned_log_likelihood_blocked(F, Q, X):
    """Marginalized trajectory log likelihood for large joint dims.

    Same contract as
    :func:`lqg_tpu.ops.pallas.likelihood.conditioned_log_likelihood_fused`
    (``(P, T, j, j)`` schedules, ``(P, n, T+1, d)`` data -> ``(P, n)``),
    for ``12 < j <= 128``.  Gradient: XLA scan twin (see module doc).
    """
    return _blocked_ll_call(F, Q, X)


def _blk_fwd(F, Q, X):
    return _blocked_ll_call(F, Q, X), (F, Q, X)


def _blk_bwd(res, llbar):
    F, Q, X = res
    _, vjp = jax.vjp(_scan_twin, F, Q, X)
    return vjp(llbar)


conditioned_log_likelihood_blocked.defvjp(_blk_fwd, _blk_bwd)
