"""Fused Pallas TPU kernel for the marginalized trajectory likelihood.

The inverse-OC likelihood (reference ``lqg/system.py:142-248``) is the #1
hot path: every NUTS leapfrog and every MLE step evaluates it and its
gradient.  The XLA implementation (:mod:`lqg_tpu.ops.gaussian`) runs
``lax.scan`` s over T whose per-step cost is bound by the strictly
sequential chain of tiny (j x j) matrix ops (~20 us/step measured on TPU
v5e); the fused kernel below runs the same recursion at ~3.5 us/step,
~4x faster for value+grad at T=1000; with the analytic gains adjoint
kernel engaged the full NUTS leapfrog sits at ~2.9 ms vs round 3's
17.7 ms (measured: docs/perf.md, BENCH_notes_r4.json).

This module keeps the WHOLE conditioned/marginalized recursion on-chip:

* **Layout**: like :mod:`lqg_tpu.ops.pallas.gains`, lanes are batch - here a
  flattened (parameter-set, trial) axis filling (8, 128) VPU tiles; the
  ``j x j`` joint-state matrices are unrolled as per-element tiles, so each
  recursion step is straight-line FMA code at full vector width.
* **Time-chunked grid** with the carry (``Sigma_t``, ``mu_t``, accumulators)
  in VMEM scratch; per-chunk HBM streaming of the joint transition/noise
  schedules.
* **Analytic adjoint**: a second Pallas kernel runs the reverse-mode
  recursion (derived by hand, see ``_ll_bwd_kernel``) over per-step states
  stored by the forward pass, so ``jax.value_and_grad`` of the likelihood is
  also a fused kernel instead of an XLA scan chain.

Scope: joint dim ``j <= 12``, observed dim ``d <= 4``, float32 - every
shipped tracking model at dim=1 and dim=2 fits; deeper models (delay
registers) route to the blocked MXU-tile kernel
(:mod:`lqg_tpu.ops.pallas.likelihood_blocked`) or the XLA scan
automatically (see ``fused_ll_available`` / ``blocked_ll_available``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.custom_batching
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lqg_tpu.ops.pallas.gains import (SUB, LANE, BLOCK, _mat, _idx, _matmul,
                                      _transpose, _add, _sub, _neg, _read)

_LOG_2PI = math.log(2.0 * math.pi)


# --- small symmetric inverse with determinant ---


def _sym_inv_det(A, eps):
    """(inverse, determinant) of a symmetric PD matrix, d <= 4."""
    rows, n, m = A
    assert n == m <= 4
    if n == 1:
        det = rows[0]
        return _mat([pl.reciprocal(det + eps, approx=False)], 1, 1), det
    if n == 2:
        a, b, _, dd = rows
        det = a * dd - b * b
        inv = pl.reciprocal(det + eps, approx=False)
        return _mat([dd * inv, -b * inv, -b * inv, a * inv], 2, 2), det
    if n == 3:
        a, b, c, _, e, f, _, _, i = rows
        A11 = e * i - f * f
        A12 = c * f - b * i
        A13 = b * f - c * e
        det = a * A11 + b * A12 + c * A13
        inv = pl.reciprocal(det + eps, approx=False)
        A22 = a * i - c * c
        A23 = b * c - a * f
        A33 = a * e - b * b
        return _mat([A11 * inv, A12 * inv, A13 * inv,
                     A12 * inv, A22 * inv, A23 * inv,
                     A13 * inv, A23 * inv, A33 * inv], 3, 3), det
    # n = 4: blockwise Schur-complement inverse on 2x2 blocks
    # [[A, B], [B^T, C]]^-1 = [[Ai + Ai B Si B^T Ai, -Ai B Si],
    #                          [-Si B^T Ai,           Si       ]]
    # det = det(A) det(S),  S = C - B^T Ai B
    Ab = _mat([_idx(A, r, k) for r in range(2) for k in range(2)], 2, 2)
    Bb = _mat([_idx(A, r, k + 2) for r in range(2) for k in range(2)], 2, 2)
    Cb = _mat([_idx(A, r + 2, k + 2) for r in range(2) for k in range(2)],
              2, 2)
    Ai, detA = _sym_inv_det(Ab, eps)
    AiB = _matmul(Ai, Bb)
    S = _sym(_sub(Cb, _matmul(_transpose(Bb), AiB)))
    Si, detS = _sym_inv_det(S, eps)
    TL = _add(Ai, _matmul(AiB, _matmul(Si, _transpose(AiB))))
    TR = _neg(_matmul(AiB, Si))
    out = [None] * 16
    for r in range(2):
        for k in range(2):
            out[r * 4 + k] = _idx(TL, r, k)
            out[r * 4 + (k + 2)] = _idx(TR, r, k)
            out[(r + 2) * 4 + k] = _idx(TR, k, r)  # (-Si B^T Ai) = TR^T
            out[(r + 2) * 4 + (k + 2)] = _idx(Si, r, k)
    return _mat(out, 4, 4), detA * detS


def _scale(M, s):
    rows, n, m = M
    return _mat([r * s for r in rows], n, m)


def _sym(M):
    rows, n, m = M
    assert n == m
    return _mat([0.5 * (_idx(M, i, k) + _idx(M, k, i))
                 for i in range(n) for k in range(n)], n, n)


def _block(M, rows_n, cols_n):
    """Top-left (rows_n, cols_n) block."""
    return _mat([_idx(M, i, k) for i in range(rows_n)
                 for k in range(cols_n)], rows_n, cols_n)


def _zeros_like_tile(t):
    return t * 0.0


def _read_t(ref, t, n, m):
    return _mat([ref[t, i] for i in range(n * m)], n, m)


def _write_t(ref, t, M):
    rows, n, m = M
    for i in range(n * m):
        ref[t, i] = rows[i]


def _write_scr(ref, M):
    rows, n, m = M
    for i in range(n * m):
        ref[i] = rows[i]


def _read_scr(ref, n, m):
    return _mat([ref[i] for i in range(n * m)], n, m)


# --- forward kernel ---


def _neumaier_add(s, comp, v):
    """Compensated accumulate: ``s += v`` keeping the lost low bits in
    ``comp``.  The per-lane quad/logdet accumulators reach O(1e4) nats over
    T~1e3 steps; plain f32 accumulation random-walks ~0.03 nats/lane, which
    (x ~100 trial lanes) is exactly the potential noise floor that pinned
    NUTS step sizes at the flagship fit (lqg_tpu.utils.numerics)."""
    t = s + v
    comp = comp + jnp.where(jnp.abs(s) >= jnp.abs(v), (s - t) + v,
                            (v - t) + s)
    return t, comp


def _ll_fwd_kernel(F_ref, Q_ref, X_ref, xT_ref, ll_ref, SigS_ref, muS_ref,
                   SigT_ref, muT_ref, Sig_scr, mu_scr, acc_scr,
                   *, j, d, T, tc, eps):
    """Forward conditioned recursion; stores per-step (Sigma_t, mu_t).

    Recursion (per lane; matches :func:`lqg_tpu.ops.gaussian.conditional_kernel`
    + ``trial_log_likelihood`` exactly):

        init:  Sigma_0 = Q_0,  mu_0 = [x_0; 0]
        t = 0..T-1:
            S = Sigma[:d,:d]; Sinv = S^-1; e = x_t - mu[:d]
            if t >= 1:  quad += e^T Sinv e;  ld += log det S
            FS = F_t Sigma;  P = FS[:, :d];  J = P Sinv
            mu    <- F_t mu + J e
            Sigma <- sym(FS F_t^T + Q_t - J P^T)
        final: S = Sigma_T[:d,:d]; e = x_T - mu_T[:d]; accumulate score
        ll = -0.5 (quad + ld + T d log 2pi)
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        # Sigma_0 = Q_0
        _write_scr(Sig_scr, _read_t(Q_ref, 0, j, j))
        # mu_0 = [x_0; 0]
        x0 = [X_ref[0, i] for i in range(d)]
        for i in range(j):
            mu_scr[i] = x0[i] if i < d else _zeros_like_tile(x0[0])
        acc_scr[0] = _zeros_like_tile(x0[0])  # quad
        acc_scr[1] = _zeros_like_tile(x0[0])  # logdet
        acc_scr[2] = _zeros_like_tile(x0[0])  # quad compensation
        acc_scr[3] = _zeros_like_tile(x0[0])  # logdet compensation

    # carries ride the fori_loop VALUE (registers); scratch only bridges
    # chunks of the time grid
    def step(i, carry):
        sig_rows, mu_rows, quad_acc, ld_acc, quad_c, ld_c = carry
        t_global = c * tc + i
        Sigma = _mat(list(sig_rows), j, j)
        mu = _mat(list(mu_rows), j, 1)

        # store carries for the backward pass
        _write_t(SigS_ref, i, Sigma)
        _write_t(muS_ref, i, mu)

        F = _read_t(F_ref, i, j, j)
        Q = _read_t(Q_ref, i, j, j)

        S = _block(Sigma, d, d)
        Sinv, det = _sym_inv_det(S, eps)
        x_t = _mat([X_ref[i, k] for k in range(d)], d, 1)
        e = _sub(x_t, _block(mu, d, 1))

        # score x_t | x_{<t} for t >= 1
        mask = jnp.where(t_global >= 1, 1.0, 0.0)
        Se = _matmul(Sinv, e)
        quad = _idx(e, 0, 0) * _idx(Se, 0, 0)
        for r in range(1, d):
            quad = quad + _idx(e, r, 0) * _idx(Se, r, 0)
        quad_acc, quad_c = _neumaier_add(quad_acc, quad_c, mask * quad)
        ld_acc, ld_c = _neumaier_add(ld_acc, ld_c, mask * jnp.log(det))

        FS = _matmul(F, Sigma)
        P = _mat([_idx(FS, r, k) for r in range(j) for k in range(d)], j, d)
        J = _matmul(P, Sinv)

        mu_new = _add(_matmul(F, mu), _matmul(J, e))
        Sigma_new = _sym(_sub(_add(_matmul(FS, _transpose(F)), Q),
                              _matmul(J, _transpose(P))))

        return (tuple(Sigma_new[0]), tuple(mu_new[0]),
                quad_acc, ld_acc, quad_c, ld_c)

    carry0 = (tuple(_read_scr(Sig_scr, j, j)[0]),
              tuple(_read_scr(mu_scr, j, 1)[0]),
              acc_scr[0], acc_scr[1], acc_scr[2], acc_scr[3])
    sig_f, mu_f, quad_f, ld_f, quad_cf, ld_cf = jax.lax.fori_loop(
        0, tc, step, carry0)
    _write_scr(Sig_scr, _mat(list(sig_f), j, j))
    _write_scr(mu_scr, _mat(list(mu_f), j, 1))
    acc_scr[0] = quad_f
    acc_scr[1] = ld_f
    acc_scr[2] = quad_cf
    acc_scr[3] = ld_cf

    @pl.when(c == n_chunks - 1)
    def _():
        Sigma = _read_scr(Sig_scr, j, j)
        mu = _read_scr(mu_scr, j, 1)
        _write_t(SigT_ref, 0, Sigma)   # final state for the backward pass
        _write_t(muT_ref, 0, mu)

        S = _block(Sigma, d, d)
        Sinv, det = _sym_inv_det(S, eps)
        xT = _mat([xT_ref[0, k] for k in range(d)], d, 1)
        e = _sub(xT, _block(mu, d, 1))
        Se = _matmul(Sinv, e)
        quad = _idx(e, 0, 0) * _idx(Se, 0, 0)
        for r in range(1, d):
            quad = quad + _idx(e, r, 0) * _idx(Se, r, 0)
        # fold the compensation terms (small) before the large partials
        total = (acc_scr[2] + acc_scr[3] + quad + jnp.log(det)) \
            + acc_scr[0] + acc_scr[1] + T * d * _LOG_2PI
        ll_ref[0] = -0.5 * total


# --- backward (adjoint) kernel ---


def _ll_bwd_kernel(F_ref, Q_ref, X_ref, xT_ref, w_ref, SigS_ref, muS_ref,
                   SigT_ref, muT_ref, Fbar_ref, Qbar_ref, Xbar_ref, xTbar_ref,
                   Sbar_scr, mbar_scr, *, j, d, T, tc, eps):
    """Reverse-mode recursion of :func:`_ll_fwd_kernel`.

    Also emits the DATA cotangent ``Xbar`` (``e = x_t - mu[:d]`` routes
    ``ebar`` into ``x_t``; the init ``mu_0 = [x_0; 0]`` additionally routes
    the final ``mubar[:d]`` into ``x_0``; the terminal score routes
    ``-w S^{-1} e`` into ``x_T``) - so differentiating the likelihood
    through trajectories (amortized inference, adversarial probes) is exact
    on the fused path too.

    Hand-derived adjoints; notation as in the forward docstring, with
    ``w`` the per-lane output cotangent (d ll).  For each step t (reverse):

        Sbar' <- sym(Sbar')                       [Sigma' was symmetrized]
        Qbar_t = Sbar'
        FSbar  = Sbar' F;   Fbar_t = Sbar' FS + mubar' mu^T
        Jbar   = -Sbar' P + mubar' e^T
        Pbar   = -Sbar' J + Jbar Sinv
        Sinvbar= P^T Jbar  [- (w/2) e e^T  if t>=1]
        ebar   = J^T mubar'  [- w Sinv e   if t>=1]
        Sbar   = -Sinv Sinvbar Sinv  [- (w/2) Sinv  if t>=1]
        mubar  = F^T mubar';  mubar[:d] -= ebar
        FSbar[:, :d] += Pbar
        Fbar_t += FSbar Sigma;   Sigmabar = F^T FSbar
        Sigmabar[:d,:d] += sym(Sbar)
        carry (Sigmabar, mubar)

    The final-score adjoint seeds the carry at t = T; at t = 0 the carry's
    Sigma-cotangent is folded into ``Qbar_0`` (Sigma_0 = Q_0).
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        # seed: adjoint of the final score on (Sigma_T, mu_T)
        w = w_ref[0]
        Sigma = _read_t(SigT_ref, 0, j, j)
        mu = _read_t(muT_ref, 0, j, 1)
        S = _block(Sigma, d, d)
        Sinv, _ = _sym_inv_det(S, eps)
        xT = _mat([xT_ref[0, k] for k in range(d)], d, 1)
        e = _sub(xT, _block(mu, d, 1))
        Se = _matmul(Sinv, e)

        # ebar = -w Sinv e ; mubar[:d] = -ebar = w Sinv e ; xTbar = ebar
        for i in range(j):
            mbar_scr[i] = w * _idx(Se, i, 0) if i < d \
                else _zeros_like_tile(w)
        for i in range(d):
            xTbar_ref[0, i] = -w * _idx(Se, i, 0)
        # Sinvbar = -(w/2) e e^T ; Sbar = -(w/2) Sinv - Sinv Sinvbar Sinv
        #         = -(w/2) Sinv + (w/2) (Sinv e)(Sinv e)^T
        Sbar = [0.5 * w * (_idx(Se, r, 0) * _idx(Se, k, 0)
                           - _idx(Sinv, r, k))
                for r in range(d) for k in range(d)]
        for r in range(j):
            for k in range(j):
                Sbar_scr[r * j + k] = Sbar[r * d + k] if (r < d and k < d) \
                    else _zeros_like_tile(w)

    def step(i, carry):
        sbar_rows, mbar_rows = carry
        tt = tc - 1 - i
        t_global = (n_chunks - 1 - c) * tc + tt
        w = w_ref[0]

        Sigma = _read_t(SigS_ref, tt, j, j)
        mu = _read_t(muS_ref, tt, j, 1)
        F = _read_t(F_ref, tt, j, j)

        # recompute forward intermediates
        S = _block(Sigma, d, d)
        Sinv, _ = _sym_inv_det(S, eps)
        x_t = _mat([X_ref[tt, k] for k in range(d)], d, 1)
        e = _sub(x_t, _block(mu, d, 1))
        FS = _matmul(F, Sigma)
        P = _mat([_idx(FS, r, k) for r in range(j) for k in range(d)], j, d)
        J = _matmul(P, Sinv)

        Sbar_n = _sym(_mat(list(sbar_rows), j, j))   # sym(Sigmabar')
        mbar_n = _mat(list(mbar_rows), j, 1)          # mubar'

        Qbar = Sbar_n
        FSbar = _matmul(Sbar_n, F)
        Fbar = _add(_matmul(Sbar_n, FS),
                    _matmul(mbar_n, _transpose(mu)))
        Jbar = _add(_neg(_matmul(Sbar_n, P)),
                    _matmul(mbar_n, _transpose(e)))
        Pbar = _add(_neg(_matmul(Sbar_n, J)), _matmul(Jbar, Sinv))
        Sinvbar = _matmul(_transpose(P), Jbar)
        ebar = _matmul(_transpose(J), mbar_n)

        mask = jnp.where(t_global >= 1, 1.0, 0.0)
        Se = _matmul(Sinv, e)
        # score adjoints (t >= 1): ebar -= w Sinv e;
        # Sinvbar -= (w/2) e e^T;  Sbar gets -(w/2) Sinv (logdet term)
        ebar = _sub(ebar, _scale(Se, mask * w))
        Sinvbar = _sub(Sinvbar, _scale(_matmul(e, _transpose(e)),
                                       mask * 0.5 * w))
        Sbar = _neg(_matmul(Sinv, _matmul(Sinvbar, Sinv)))
        Sbar = _sub(Sbar, _scale(Sinv, mask * 0.5 * w))

        # mubar = F^T mubar'; mubar[:d] -= ebar
        mubar = _matmul(_transpose(F), mbar_n)
        mu_rows = list(mubar[0])
        for r in range(d):
            mu_rows[r] = mu_rows[r] - _idx(ebar, r, 0)
        mubar = _mat(mu_rows, j, 1)

        # data cotangent: xbar_t = ebar (+ mubar_0[:d] at t = 0 via the
        # init mu_0 = [x_0; 0])
        is_t0 = jnp.where(t_global == 0, 1.0, 0.0)
        xrows = [(_idx(ebar, r, 0) + is_t0 * mu_rows[r]) for r in range(d)]
        _write_t(Xbar_ref, tt, _mat(xrows, d, 1))

        # FSbar[:, :d] += Pbar
        fs_rows = list(FSbar[0])
        for r in range(j):
            for k in range(d):
                fs_rows[r * j + k] = fs_rows[r * j + k] + _idx(Pbar, r, k)
        FSbar = _mat(fs_rows, j, j)

        Fbar = _add(Fbar, _matmul(FSbar, Sigma))  # Sigma symmetric
        Sigmabar = _matmul(_transpose(F), FSbar)

        # Sigmabar[:d,:d] += sym(Sbar)
        Sbar_s = _sym(Sbar)
        sg_rows = list(Sigmabar[0])
        for r in range(d):
            for k in range(d):
                sg_rows[r * j + k] = sg_rows[r * j + k] + _idx(Sbar_s, r, k)
        Sigmabar = _mat(sg_rows, j, j)

        # t = 0: Sigma_0 = Q_0, so the carry cotangent folds into Qbar_0
        Qbar = _add(Qbar, _scale(_sym(Sigmabar), is_t0))

        _write_t(Fbar_ref, tt, Fbar)
        _write_t(Qbar_ref, tt, Qbar)
        return (tuple(Sigmabar[0]), tuple(mubar[0]))

    carry0 = (tuple(_read_scr(Sbar_scr, j, j)[0]),
              tuple(_read_scr(mbar_scr, j, 1)[0]))
    sbar_f, mbar_f = jax.lax.fori_loop(0, tc, step, carry0)
    _write_scr(Sbar_scr, _mat(list(sbar_f), j, j))
    _write_scr(mbar_scr, _mat(list(mbar_f), j, 1))


# --- host-side wrappers ---


def _pick_chunk(T: int, per_step_tiles: int, budget_bytes: int = 2 << 20):
    """Largest divisor of T whose chunk fits the VMEM streaming budget."""
    tile_bytes = SUB * LANE * 4
    tc = max(1, min(T, budget_bytes // (per_step_tiles * tile_bytes)))
    while T % tc:
        tc -= 1
    return tc


def _lanes_layout(P: int, n: int):
    lanes = P * n
    n_pblocks = -(-lanes // BLOCK)
    return lanes, n_pblocks, n_pblocks * BLOCK


def _rows_t(x, T, r, lanes, Lp):
    """(P, T, a, b)->(T, a*b, Lp/LANE, LANE) or (lanes, T, a, b) likewise."""
    flat = x.reshape(-1, T, r)          # (lanes, T, r)
    flat = jnp.moveaxis(flat, 0, -1)    # (T, r, lanes)
    if Lp != flat.shape[-1]:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, Lp - flat.shape[-1])),
                       mode="edge")
    return flat.reshape(T, r, Lp // LANE, LANE)


def _rows_c(x, r, Lp):
    """(lanes, r) -> (1, r, Lp/LANE, LANE) constant-in-time input."""
    flat = jnp.moveaxis(x.reshape(-1, r), 0, -1)
    if Lp != flat.shape[-1]:
        flat = jnp.pad(flat, ((0, 0), (0, Lp - flat.shape[-1])), mode="edge")
    return flat.reshape(1, r, Lp // LANE, LANE)


def fused_ll_available(j: int, d: int, dtype) -> bool:
    """Kernel scope: covers every dim=1 tracking model (j <= 5, d <= 2) and
    the dim=2 family (SubjectiveActor dim=2: j = 10, d = 4); the deep
    delay-register models (j ~ 26-65) fall back to the XLA scan."""
    return j <= 12 and d <= 4 and dtype == jnp.float32


@functools.partial(jax.jit, static_argnames=())
def _ll_fwd_call(F, Q, X):
    """Run the forward kernel.

    Args:
        F, Q: ``(P, T, j, j)`` joint transition / noise covariance.
        X: ``(P, n, T+1, d)`` observed trajectories.

    Returns:
        ``(ll (P, n), stores)`` where stores feed the backward kernel.
    """
    P, T, j, _ = F.shape
    n = X.shape[1]
    d = X.shape[-1]
    lanes, n_pblocks, Lp = _lanes_layout(P, n)
    dtype = F.dtype

    # duplicate the theta-indexed schedules across each theta's trials
    Fl = jnp.broadcast_to(F[:, None], (P, n, T, j, j))
    Ql = jnp.broadcast_to(Q[:, None], (P, n, T, j, j))
    F_in = _rows_t(Fl, T, j * j, lanes, Lp)
    Q_in = _rows_t(Ql, T, j * j, lanes, Lp)
    X_in = _rows_t(X[..., :T, :].reshape(P * n, T, d), T, d, lanes, Lp)
    xT_in = _rows_c(X[..., T, :].reshape(P * n, d), d, Lp)

    tc = _pick_chunk(T, per_step_tiles=2 * j * j + d + (j * j + j))
    n_chunks = T // tc

    grid = (n_pblocks, n_chunks)
    interpret = jax.default_backend() != "tpu"
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))

    def in_spec_t(r):
        return pl.BlockSpec((tc, r, SUB, LANE), lambda pb, c: (c, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    def in_spec_const(r):
        return pl.BlockSpec((1, r, SUB, LANE), lambda pb, c: (0, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    out_ll = pl.BlockSpec((1, SUB, LANE), lambda pb, c: (0, pb, 0),
                          memory_space=pltpu.VMEM)

    def out_spec_t(r):
        return pl.BlockSpec((tc, r, SUB, LANE), lambda pb, c: (c, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    def out_spec_const(r):
        return pl.BlockSpec((1, r, SUB, LANE), lambda pb, c: (0, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    ll, SigS, muS, SigT, muT = pl.pallas_call(
        functools.partial(_ll_fwd_kernel, j=j, d=d, T=T, tc=tc, eps=1e-12),
        grid=grid,
        in_specs=[in_spec_t(j * j), in_spec_t(j * j), in_spec_t(d),
                  in_spec_const(d)],
        out_specs=(out_ll, out_spec_t(j * j), out_spec_t(j),
                   out_spec_const(j * j), out_spec_const(j)),
        out_shape=(
            jax.ShapeDtypeStruct((1, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((T, j * j, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((T, j, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((1, j * j, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((1, j, Lp // LANE, LANE), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((j * j, SUB, LANE), dtype),
            pltpu.VMEM((j, SUB, LANE), dtype),
            pltpu.VMEM((4, SUB, LANE), dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(F_in, Q_in, X_in, xT_in)

    ll_out = ll.reshape(Lp)[:lanes].reshape(P, n)
    return ll_out, (SigS, muS, SigT, muT, F_in, Q_in, X_in, xT_in)


def _ll_bwd_call(stores, llbar):
    """Run the adjoint kernel; returns ``(Fbar, Qbar)`` shaped like F."""
    SigS, muS, SigT, muT, F_in, Q_in, X_in, xT_in = stores
    P, n = llbar.shape
    T = F_in.shape[0]
    j = int(round(math.sqrt(F_in.shape[1])))
    d = X_in.shape[1]
    lanes, n_pblocks, Lp = _lanes_layout(P, n)
    dtype = F_in.dtype

    w_in = _rows_c(llbar.reshape(lanes, 1), 1, Lp)[:, 0]  # (1, Lp/LANE, LANE)

    # 2*d: the X input stream plus the per-step Xbar output stream
    tc = _pick_chunk(T, per_step_tiles=5 * (j * j) + 2 * j + 2 * d)
    n_chunks = T // tc

    grid = (n_pblocks, n_chunks)
    interpret = jax.default_backend() != "tpu"
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))

    def spec_rev(r):
        # chunk c covers time block n_chunks-1-c (reverse streaming)
        return pl.BlockSpec(
            (tc, r, SUB, LANE),
            lambda pb, c, n_chunks=n_chunks: (n_chunks - 1 - c, 0, pb, 0),
            memory_space=pltpu.VMEM)

    def spec_const(r):
        return pl.BlockSpec((1, r, SUB, LANE), lambda pb, c: (0, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec((1, SUB, LANE), lambda pb, c: (0, pb, 0),
                          memory_space=pltpu.VMEM)

    Fbar, Qbar, Xbar, xTbar = pl.pallas_call(
        functools.partial(_ll_bwd_kernel, j=j, d=d, T=T, tc=tc, eps=1e-12),
        grid=grid,
        in_specs=[spec_rev(j * j), spec_rev(j * j), spec_rev(d),
                  spec_const(d), w_spec, spec_rev(j * j), spec_rev(j),
                  spec_const(j * j), spec_const(j)],
        out_specs=(spec_rev(j * j), spec_rev(j * j), spec_rev(d),
                   spec_const(d)),
        out_shape=(
            jax.ShapeDtypeStruct((T, j * j, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((T, j * j, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((T, d, Lp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((1, d, Lp // LANE, LANE), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((j * j, SUB, LANE), dtype),
            pltpu.VMEM((j, SUB, LANE), dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(F_in, Q_in, X_in, xT_in, w_in, SigS, muS, SigT, muT)

    def unrows(x):
        flat = x.reshape(T, j * j, Lp)[..., :lanes]   # (T, j*j, lanes)
        out = jnp.moveaxis(flat, -1, 0).reshape(P, n, T, j, j)
        return out.sum(axis=1)  # sum trial adjoints per parameter set

    def unrows_x(x):
        # (t, d, Lp/LANE, LANE) -> (P, n, t, d); per-trial, NOT summed
        t = x.shape[0]
        flat = x.reshape(t, d, Lp)[..., :lanes]
        return jnp.moveaxis(flat, -1, 0).reshape(P, n, t, d)

    # (P, n, T+1, d): per-step cotangents for x_0..x_{T-1} then x_T
    Xbar_full = jnp.concatenate([unrows_x(Xbar), unrows_x(xTbar)], axis=2)
    return unrows(Fbar), unrows(Qbar), Xbar_full


# --- custom vmap: fold mapped axes into the kernel's P (lane) axis ---
#
# Under NUTS, chains arrive via jax.vmap over the model potential.  The
# default pallas batching rule prepends a grid dimension - one serialized
# kernel instance per chain, each paying the full T-loop latency.  These
# rules instead fold the vmap axis into the particle axis, so all chains
# ride the (8, 128) lanes of ONE kernel instance (measured 16 chains:
# 3.7 ms vs 75 ms per value+grad at T=1000).
#
# custom_vmap cannot be differentiated through, so it sits INSIDE
# custom_vjp: autodiff splits into fwd/bwd first, then vmap maps each
# through its folding rule.  Residuals are the honest primal inputs
# (F, Q, X) - the backward pass re-runs the forward kernel to regenerate
# the per-step stores (cheap next to an XLA scan chain) rather than
# threading lane-packed residuals through the batcher.


def _fold(axis_size, batched, *args):
    """Collapse a leading vmap axis into the kernel's P axis."""
    out = []
    for a, b in zip(args, batched):
        if not b:
            a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        out.append(a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]))
    return out


def _ll_fwd_ll_only(F, Q, X):
    return _ll_fwd_call(F, Q, X)[0]


_fwd_cv = jax.custom_batching.custom_vmap(_ll_fwd_ll_only)


@_fwd_cv.def_vmap
def _fwd_cv_rule(axis_size, in_batched, F, Q, X):
    Ff, Qf, Xf = _fold(axis_size, in_batched, F, Q, X)
    ll = _fwd_cv(Ff, Qf, Xf)
    return ll.reshape((axis_size, -1) + ll.shape[1:]), True


def _ll_grads(F, Q, X, llbar):
    _, stores = _ll_fwd_call(F, Q, X)
    return _ll_bwd_call(stores, llbar)


_bwd_cv = jax.custom_batching.custom_vmap(_ll_grads)


@_bwd_cv.def_vmap
def _bwd_cv_rule(axis_size, in_batched, F, Q, X, llbar):
    Ff, Qf, Xf, lf = _fold(axis_size, in_batched, F, Q, X, llbar)
    Fbar, Qbar, Xbar = _bwd_cv(Ff, Qf, Xf, lf)
    unfold = lambda a: a.reshape((axis_size, -1) + a.shape[1:])
    return (unfold(Fbar), unfold(Qbar), unfold(Xbar)), (True, True, True)


@jax.custom_vjp
def conditioned_log_likelihood_fused(F, Q, X):
    """Marginalized trajectory log likelihood, fully fused on TPU.

    Args:
        F: ``(P, T, j, j)`` joint (state, belief) transition schedules.
        Q: ``(P, T, j, j)`` joint noise covariances ``G G^T``.
        X: ``(P, n, T+1, d)`` observed trajectories (first ``d`` joint dims).

    Returns:
        ``(P, n)`` per-trial log likelihoods of ``X[..., 1:, :]`` - identical
        to :func:`lqg_tpu.ops.gaussian.trial_log_likelihood` on the same
        joint system.  Differentiable (fused analytic adjoint kernel) and
        vmap-aware (mapped axes fold into the lane batch).
    """
    return _fwd_cv(F, Q, X)


def _clf_fwd(F, Q, X):
    return _fwd_cv(F, Q, X), (F, Q, X)


def _clf_bwd(res, llbar):
    F, Q, X = res
    return _bwd_cv(F, Q, X, llbar)


conditioned_log_likelihood_fused.defvjp(_clf_fwd, _clf_bwd)
