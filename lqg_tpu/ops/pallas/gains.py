"""Fused Pallas TPU kernels: Riccati backward + Kalman forward gains.

The hot solve of the framework (SURVEY.md section 6: the solves/s
north-star) is thousands of *tiny* (n <= 8) LQG problems batched per chip.
The XLA path scans over T with batched einsums - every step round-trips the
carry and the per-step outputs through HBM and pays per-step launch
overhead.  These kernels keep the recursion resident on-chip:

* **Layout**: parameter particles fill a full VPU tile - 8 sublanes x 128
  lanes = 1024 particles per block; the n x n matrix elements are unrolled
  as separate tiles.  Every matrix product is a handful of elementwise FMAs
  on (8, 128) tiles, at full vector-unit utilization.
* **Time-chunked grid**: the horizon is processed in chunks with the
  Riccati/covariance carry living in VMEM scratch across grid steps, so
  VMEM holds only one chunk of the output schedule at a time.
* **Closed-form small inverses**: control dims m <= 2 and observation dims
  p <= 3 use explicit symmetric inverses (no Cholesky/LAPACK inside the
  kernel).

Both recursions (Riccati backward for L, Kalman forward for K) run in ONE
kernel - they are independent, so both carries share the fori_loop, with
L/H streaming to the reverse-time block of each grid chunk and K forward.

Scope: stationary (time-invariant) specs with zero affine cost terms -
exactly the shape of every model in the zoo.  The general/stacked path
falls back to :mod:`lqg_tpu.ops.riccati` / :mod:`lqg_tpu.ops.kalman`.
Gradients: :func:`gains_fused` wraps the kernel in a custom VJP that
differentiates the associative-scan twin (O(log T) backward depth).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lqg_tpu.spec import LQGSpec

SUB = 8     # sublanes per block
LANE = 128  # lanes per block
BLOCK = SUB * LANE  # particles per grid block

# --- tiny-matrix algebra on lists of (SUB, LANE)-tile elements ---


def _mat(rows: Sequence, n: int, m: int):
    assert len(rows) == n * m, (len(rows), n, m)
    return (list(rows), n, m)


def _idx(M, i, j):
    rows, n, m = M
    return rows[i * m + j]


def _matmul(A, B):
    ra, n, k = A
    rb, k2, m = B
    assert k == k2
    out = []
    for i in range(n):
        for j in range(m):
            acc = _idx(A, i, 0) * _idx(B, 0, j)
            for t in range(1, k):
                acc = acc + _idx(A, i, t) * _idx(B, t, j)
            out.append(acc)
    return _mat(out, n, m)


def _transpose(A):
    rows, n, m = A
    return _mat([rows[i * m + j] for j in range(m) for i in range(n)], m, n)


def _add(A, B):
    ra, n, m = A
    rb, n2, m2 = B
    assert (n, m) == (n2, m2)
    return _mat([a + b for a, b in zip(ra, rb)], n, m)


def _sub(A, B):
    ra, n, m = A
    rb, _, _ = B
    return _mat([a - b for a, b in zip(ra, rb)], n, m)


def _neg(A):
    rows, n, m = A
    return _mat([-a for a in rows], n, m)


def _sym_inv(A, eps):
    """Closed-form inverse of a symmetric PD matrix, n <= 3."""
    rows, n, m = A
    assert n == m <= 3
    if n == 1:
        return _mat([pl.reciprocal(rows[0] + eps, approx=False)], 1, 1)
    if n == 2:
        a, b, _, d = rows
        det = a * d - b * b
        inv = pl.reciprocal(det + eps, approx=False)
        return _mat([d * inv, -b * inv, -b * inv, a * inv], 2, 2)
    a, b, c, _, e, f, _, _, i = rows  # symmetric: use upper triangle
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
                 A13 * inv, A23 * inv, A33 * inv], 3, 3)


def _read(ref, n: int, m: int):
    return _mat([ref[i] for i in range(n * m)], n, m)


def _read_scratch(ref, n: int, m: int):
    return _mat([ref[i] for i in range(n * m)], n, m)


def _write_scratch(ref, M):
    rows, n, m = M
    for i in range(n * m):
        ref[i] = rows[i]


def _write_t(ref, t, M):
    rows, n, m = M
    for i in range(n * m):
        ref[t, i] = rows[i]


# --- kernels ---


def _gains_merged_kernel(A_ref, B_ref, Q_ref, R_ref, Qf_ref, F_ref, VV_ref,
                         WW_ref, Sigma0_ref, L_ref, H_ref, K_ref,
                         S_scr, P_scr, *, n, m, p, T, tc, eps, unroll=1):
    """Riccati backward AND Kalman forward in ONE kernel.

    The two recursions are independent (control gains come from the
    backward cost-to-go pass, estimator gains from the forward covariance
    pass), so both carries ride the same fori_loop: the Riccati carry
    writes its outputs at the reverse-time slot of the chunk while the
    Kalman carry writes forward.  One launch + one T-loop instead of two -
    at small batch the gains are LATENCY-bound (measured 7.2 ms as two
    kernels at T=1000; the op mix per step is unchanged, the second
    traversal of the time axis is eliminated).
    """
    c = pl.program_id(1)

    A = _read(A_ref, n, n)
    Bm = _read(B_ref, n, m)
    Q = _read(Q_ref, n, n)
    R = _read(R_ref, m, m)
    F = _read(F_ref, p, n)
    VVt = _read(VV_ref, n, n)
    WWt = _read(WW_ref, p, p)
    At = _transpose(A)
    Bt = _transpose(Bm)
    Ft = _transpose(F)

    @pl.when(c == 0)
    def _():
        _write_scratch(S_scr, _read(Qf_ref, n, n))
        _write_scratch(P_scr, _read(Sigma0_ref, n, n))

    def step(i, carry):
        S_rows, P_rows = carry

        # --- Riccati backward (chunk-local reverse slot tt) ---
        S = _mat(list(S_rows), n, n)
        SB = _matmul(S, Bm)
        SA = _matmul(S, A)
        H = _add(R, _matmul(Bt, SB))
        G = _matmul(Bt, SA)
        Hinv = _sym_inv(H, eps)
        L = _neg(_matmul(Hinv, G))
        Lt_ = _transpose(L)
        HL = _matmul(H, L)
        S_new = _add(_add(Q, _matmul(At, SA)),
                     _add(_matmul(Lt_, HL),
                          _add(_matmul(Lt_, G), _matmul(_transpose(G), L))))
        tt = tc - 1 - i
        _write_t(L_ref, tt, L)
        _write_t(H_ref, tt, H)

        # --- Kalman forward (chunk-local forward slot i) ---
        P = _mat(list(P_rows), n, n)
        P = _add(_matmul(A, _matmul(P, At)), VVt)
        PFt = _matmul(P, Ft)
        Gk = _add(_matmul(F, PFt), WWt)
        Gkinv = _sym_inv(Gk, eps)
        K = _matmul(PFt, Gkinv)
        P_new = _sub(P, _matmul(K, _transpose(PFt)))
        _write_t(K_ref, i, K)

        return (tuple(S_new[0]), tuple(P_new[0]))

    carry0 = (tuple(_read_scratch(S_scr, n, n)[0]),
              tuple(_read_scratch(P_scr, n, n)[0]))
    S_fin, P_fin = jax.lax.fori_loop(0, tc, step, carry0, unroll=unroll)
    _write_scratch(S_scr, _mat(list(S_fin), n, n))
    _write_scratch(P_scr, _mat(list(P_fin), n, n))


def _scan_gains(spec: LQGSpec, Sigma0: jnp.ndarray, horizon: int):
    """XLA-scan gains (batched), the differentiable twin of the kernel."""
    from lqg_tpu.ops import riccati, kalman

    g = riccati.backward(spec, horizon=horizon, regularize="none")
    K = kalman.forward(spec, Sigma0=Sigma0, horizon=horizon)
    return g.L, g.H, K


def _assoc_gains(spec: LQGSpec, Sigma0: jnp.ndarray, horizon: int):
    """Associative-scan gains - the O(log T)-depth differentiable twin.

    Same math as :func:`_scan_gains` (parity-tested in
    ``tests/test_parallel.py``) but expressed via
    ``lax.associative_scan`` (:mod:`lqg_tpu.parallel.pscan`), so BOTH the
    primal replay and its VJP run as ~log2(T) batched stages instead of T
    sequential dependent steps.  Under NUTS, every leapfrog differentiates
    the gains w.r.t. the spec; with the sequential scan that backward chain
    pays the ~25 us/step TPU dispatch floor (~50 ms at T=1000) regardless
    of arithmetic - this is the remaining hot-path asymmetry VERDICT round
    2 flags.  Requires what the fused kernel already guarantees
    (stationary spec, zero affine/cross cost terms, invertible R and WW^T).
    """
    from lqg_tpu.parallel.pscan import (lqr_backward_assoc,
                                        kalman_forward_assoc)

    g = lqr_backward_assoc(spec, horizon=horizon)
    K = kalman_forward_assoc(spec, Sigma0=Sigma0, horizon=horizon)
    return g.L, g.H, K


# VJP implementation for gains_fused: "assoc" (default; parallel-in-time)
# or "scan" (sequential; debugging / exact-scan-parity escape hatch)
GAINS_VJP_METHOD = "assoc"


@functools.lru_cache(maxsize=None)
def _gains_fwd_cv(horizon: int):
    """custom_vmap wrapper folding mapped axes into the particle axis.

    Without this, vmap over ``gains_fused`` (e.g. NUTS chains vmapped over
    the model potential) hits the default pallas batching rule - one
    serialized kernel instance per chain, each paying the full T-loop
    latency.  Folding rides all chains on the kernel's lane batch instead.
    """
    import jax.custom_batching

    def call(spec, Sigma0):
        return fused_gains(spec, Sigma0, horizon=horizon)

    cv = jax.custom_batching.custom_vmap(call)

    @cv.def_vmap
    def _rule(axis_size, in_batched, spec, Sigma0):
        B = axis_size

        def fold(x, b):
            if not b:
                x = jnp.broadcast_to(x[None], (B,) + x.shape)
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        spec_f = jax.tree.map(fold, spec, in_batched[0])
        S0_f = fold(Sigma0, in_batched[1])
        L, H, K = cv(spec_f, S0_f)          # (T, B*P, ...)

        def unfold(a):
            a = a.reshape((a.shape[0], B, -1) + a.shape[2:])
            return jnp.moveaxis(a, 1, 0)    # (B, T, P, ...)

        return (unfold(L), unfold(H), unfold(K)), (True, True, True)

    return cv


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gains_fused(spec: LQGSpec, Sigma0: jnp.ndarray, horizon: int):
    """Differentiable fused gains: Pallas kernel forward, parallel backward.

    The Pallas kernel computes the primal only; inference needs gradients of the
    gains w.r.t. the spec (the NUTS/MLE chain rules through
    parameters -> matrices -> gains -> likelihood).  This wrapper runs the
    fused kernel as the primal and computes the VJP through the
    associative-scan twin (:func:`_assoc_gains` - same math as the scan
    path with ``regularize="none"``, O(log T) depth), so ``jax.grad``
    through a fused-gains likelihood matches the scan path to O(eps)
    WITHOUT paying T sequential dispatch steps in the backward pass.
    The primal is vmap-aware: mapped axes fold into the particle batch.

    Same contract as :func:`fused_gains` (batched stationary spec).
    """
    return _gains_fwd_cv(horizon)(spec, Sigma0)


def _gains_fused_fwd(spec, Sigma0, horizon):
    return _gains_fwd_cv(horizon)(spec, Sigma0), (spec, Sigma0)


def _gains_fused_bwd(horizon, res, cotangents):
    spec, Sigma0 = res
    twin = _assoc_gains if GAINS_VJP_METHOD == "assoc" else _scan_gains
    _, vjp = jax.vjp(lambda s, S0: twin(s, S0, horizon), spec, Sigma0)
    return vjp(cotangents)


gains_fused.defvjp(_gains_fused_fwd, _gains_fused_bwd)


def fused_gains_available(spec: LQGSpec) -> bool:
    """Kernel scope check: stationary spec, small dims, square noise mats."""
    if spec.A.ndim != spec.Qf.ndim:  # stacked
        return False
    n = spec.A.shape[-1]
    m = spec.B.shape[-1]
    p = spec.F.shape[-2]
    return (n <= 8 and m <= 2 and p <= 3
            and spec.V.shape[-1] == n and spec.W.shape[-1] == p)


@functools.partial(jax.jit,
                   static_argnames=("horizon", "time_chunk", "unroll"))
def fused_gains(spec: LQGSpec, Sigma0: jnp.ndarray, horizon: int,
                time_chunk: int = 250, eps: float = 1e-12, block=None,
                unroll: int = 1):
    """Fused gain schedules for a batch of stationary specs.

    Args:
        spec: batched stationary spec; leading axis B (particles).
        Sigma0: (B, n, n) initial covariance.
        horizon: T (must divide by ``time_chunk``).
        time_chunk: horizon steps per grid step (bounds VMEM).

    Returns:
        ``(L, H, K)`` with shapes ``(T, B, m, n)``, ``(T, B, m, m)``,
        ``(T, B, n, p)`` - matching :func:`lqg_tpu.ops.riccati.backward` /
        :func:`lqg_tpu.ops.kalman.forward` (with ``regularize="none"``).
    """
    del block  # legacy arg
    Bn = spec.A.shape[0]
    n = spec.A.shape[-1]
    m = spec.B.shape[-1]
    p = spec.F.shape[-2]
    T = horizon
    tc = time_chunk
    while T % tc:
        tc -= 1
    n_chunks = T // tc
    dtype = spec.A.dtype

    # pad particles to a multiple of the (8, 128) tile
    n_pblocks = -(-Bn // BLOCK)
    Bp = n_pblocks * BLOCK

    def rows(x, r, c):
        # (B, r, c) -> (r*c, Bp/LANE, LANE), edge-padded particles
        flat = jnp.moveaxis(x.reshape(Bn, r * c), 0, -1)
        if Bp != Bn:
            flat = jnp.pad(flat, ((0, 0), (0, Bp - Bn)), mode="edge")
        return flat.reshape(r * c, Bp // LANE, LANE)

    mT_ = lambda M: jnp.swapaxes(M, -1, -2)
    VV = spec.V @ mT_(spec.V)
    WW = spec.W @ mT_(spec.W)

    def pspec(r):
        # input block: all rows, one particle block; same for every t-chunk
        return pl.BlockSpec((r, SUB, LANE), lambda pb, c: (0, pb, 0),
                            memory_space=pltpu.VMEM)

    def out_spec_rev(r):
        # reverse-time output: chunk c covers time block n_chunks-1-c
        return pl.BlockSpec((tc, r, SUB, LANE),
                            lambda pb, c, n_chunks=n_chunks:
                            (n_chunks - 1 - c, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    def out_spec_fwd(r):
        return pl.BlockSpec((tc, r, SUB, LANE),
                            lambda pb, c: (c, 0, pb, 0),
                            memory_space=pltpu.VMEM)

    grid = (n_pblocks, n_chunks)
    interpret = jax.default_backend() != "tpu"
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))

    # ONE launch: both recursions share the fori_loop (independent carries;
    # L/H stream to the reverse-time block of each chunk, K forward)
    L, H, K = pl.pallas_call(
        functools.partial(_gains_merged_kernel, n=n, m=m, p=p, T=T, tc=tc,
                          eps=eps, unroll=unroll),
        grid=grid,
        in_specs=[pspec(n * n), pspec(n * m), pspec(n * n), pspec(m * m),
                  pspec(n * n), pspec(p * n), pspec(n * n), pspec(p * p),
                  pspec(n * n)],
        out_specs=(out_spec_rev(m * n), out_spec_rev(m * m),
                   out_spec_fwd(n * p)),
        out_shape=(
            jax.ShapeDtypeStruct((T, m * n, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((T, m * m, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((T, n * p, Bp // LANE, LANE), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n * n, SUB, LANE), dtype),
                        pltpu.VMEM((n * n, SUB, LANE), dtype)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(rows(spec.A, n, n), rows(spec.B, n, m), rows(spec.Q, n, n),
      rows(spec.R, m, m), rows(spec.Qf, n, n), rows(spec.F, p, n),
      rows(VV, n, n), rows(WW, p, p), rows(Sigma0, n, n))

    def unrows(x, r, c):
        # (T, r*c, Bp/LANE, LANE) -> (T, B, r, c)
        flat = x.reshape(T, r * c, Bp)[..., :Bn]
        return jnp.moveaxis(flat, -1, 1).reshape(T, Bn, r, c)

    return unrows(L, m, n), unrows(H, m, m), unrows(K, n, p)
