"""Blocked (MXU-tile) Pallas kernels for the large-j marginalized likelihood.

The per-element-lane kernel in :mod:`lqg_tpu.ops.pallas.likelihood` unrolls
``j x j`` matrices as separate (8, 128) tiles - straight-line FMA code that
is unbeatable for ``j <= 12`` but fundamentally cannot scale past that (the
delay-register models sit at ``j ~ 26-65``, reference
``lqg/tracking/delay.py:9-33``).  This module takes the opposite layout:
each joint-state matrix is ONE zero-padded (128, 128) VMEM tile and every
recursion step is a handful of real MXU matmuls, with trials riding the
128 lanes of the mean tile.

Design notes (round 5 rewrite):

* **Conditioned-form recursion.**  The update is computed as
  condition-then-propagate (``Sig_c = Sig - Kc Sig[:d, :]``;
  ``Sig' = F Sig_c F^T + Q``) instead of propagate-then-correct - same
  math as the scan twin, but transpose-free: contractions against
  ``F^T`` ride transposed-operand ``dot_general`` dims (no separate
  ``F^T`` stream - at 8 chains x 6 conditions x T=1008 that stream
  plus XLA's pad/transpose copies cost ~6 GB of HBM) and every other
  operand is symmetric by construction (``Sig_c`` is explicitly
  symmetrized once per step).
* **Scalar-sync-free small inverse** (d <= 2, the data-fit case): the
  trace/sum-of-squares reductions feeding the closed-form 2x2 inverse are
  computed as ones-matrix MXU matmuls that broadcast the result across the
  whole tile, so the hot loop contains NO vector->scalar transfers (the
  measured per-step bottleneck of the round-4 kernel).  d = 3, 4 keep the
  cofactor-expansion scalar path.
* **Analytic adjoint kernel** (:func:`_ll_blocked_bwd_kernel`): the
  forward stores per-step carries ``(Sigma_t, MU_t)`` to HBM and a second
  kernel runs the hand-derived reverse recursion, emitting cotangents for
  ``F``, ``Q`` and the data - so ``jax.value_and_grad`` of a delay-model
  likelihood is two fused kernels instead of an XLA scan chain (the
  round-4 version differentiated a scan twin and LOST to the plain scan
  on the NUTS-relevant value+grad quantity).

Scope: ``12 < j <= 128``, ``d <= 4``, trials ``n <= 128``, float32.
Value/grad consistency: both passes run the same fused recursion; the
remaining kernel-vs-scan-twin f32 discrepancy (tested at rtol 2e-3) is
rounding, not method.  The f32 drift grows with horizon (measured rel.
NLL vs the scan: ~1e-3 at T=500-1000, ~3e-2 at T=10^4 where scan and the
associative scan still agree to 1e-7 - BENCH_notes_r5.json); at the
data-fit horizons this kernel serves (T ~ 1e3) it is well below the
posterior's energy scale, but prefer ``method="scan"`` for very long
horizons.
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


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_bt(a, b):
    """``a @ b.T`` as one MXU contraction (no transposed operand tile)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_at(a, b):
    """``a.T @ b`` as one MXU contraction (no transposed operand tile)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


class _Masks:
    """Loop-invariant mask tiles shared by both kernels."""

    def __init__(self, d):
        row2 = jax.lax.broadcasted_iota(jnp.int32, (BJ, BJ), 0)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (BJ, BJ), 1)
        self.row2, self.col2, self.d = row2, col2, d
        self.rowd = jnp.where(row2 < d, 1.0, 0.0)
        self.cold = jnp.where(col2 < d, 1.0, 0.0)
        self.tl = self.rowd * self.cold
        self.eyed = jnp.where((row2 == col2) & (row2 < d), 1.0, 0.0)
        self.ones = jnp.ones((BJ, BJ), jnp.float32)

    def embed_rows(self, Xblk):
        """(BD, 128) data block -> (BJ, BJ) with rows >= d zeroed."""
        full = jnp.pad(Xblk, ((0, BJ - BD), (0, 0)))
        return jnp.where(self.row2 < self.d, full, 0.0)


def _sym_inv(Sig, mk, eps):
    """(Sinv_tile, logdet_row) of the top-left (d, d) block of ``Sig``.

    ``Sinv_tile`` is the inverse embedded in the top-left block (zeros
    elsewhere); ``logdet_row`` is a (128,) lane broadcast.  d <= 2 is
    scalar-free: the reductions ride ones-matmuls on the MXU and stay
    lane-broadcast tiles end to end.
    """
    d = mk.d
    if d == 1:
        M1 = Sig * mk.eyed
        s00 = _dot(_dot(mk.ones, M1), mk.ones)     # S[0,0] everywhere
        Sinv = mk.eyed * (1.0 / (s00 + eps))
        return Sinv, jnp.log(s00)[0]
    if d == 2:
        # Cayley-Hamilton: S^-1 = (tr I - S)/det, det = (tr^2 - sum S*S)/2
        M1 = Sig * mk.eyed
        S2 = Sig * mk.tl
        tr = _dot(_dot(mk.ones, M1), mk.ones)
        s2 = _dot(_dot(mk.ones, S2 * S2), mk.ones)
        det = 0.5 * (tr * tr - s2)
        Sinv = (tr * mk.eyed - S2) * (1.0 / (det + eps))
        return Sinv, jnp.log(det)[0]
    # d = 3, 4: cofactor expansion on extracted scalars
    s_el = [Sig[r, k] for r in range(d) for k in range(d)]
    inv_rows, det = _small_inv_det(s_el, d, eps)
    Sinv = jnp.zeros((BJ, BJ), jnp.float32)
    for r in range(d):
        for k in range(d):
            Sinv = Sinv + inv_rows[r * d + k] * jnp.where(
                (mk.row2 == r) & (mk.col2 == k), 1.0, 0.0)
    return Sinv, jnp.full((BJ,), jnp.log(det), jnp.float32)


def _ll_blocked_kernel(F_ref, Q_ref, X_ref, xT_ref, ll_ref,
                       *rest, j, d, n, T, tc, eps, with_stores):
    """Forward conditioned recursion on (128, 128) tiles.

    Same math as the scan twin (``gaussian.conditional_kernel`` +
    ``trial_log_likelihood``): one parameter set per grid row, trials on
    the 128 lanes of the mean tile.  Per step (see module doc):

        Sinv   = inv(Sig[:d, :d]);  E = [x_t; 0] - MU[:d]
        score += e^T Sinv e + log det            (t >= 1)
        Kc     = Sig @ Sinv_embedded             (cols < d)
        Sig_c  = sym(Sig - Kc @ Sig[:d, :])      (conditioned covariance)
        MU'    = F (MU + Kc E)
        Sig'   = F Sig_c F^T + Q

    With ``with_stores`` the per-step carries stream to HBM for the
    analytic adjoint kernel.
    """
    if with_stores:
        (SigS_ref, MUS_ref, SigT_ref, MUT_ref,
         Sig_scr, MU_scr, acc_scr) = rest
    else:
        Sig_scr, MU_scr, acc_scr = rest

    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    mk = _Masks(d)

    @pl.when(c == 0)
    def _():
        # Sigma_0 = Q_0 ; MU_0 = [X_0 ; 0]
        Sig_scr[...] = Q_ref[0]
        MU_scr[...] = mk.embed_rows(X_ref[0])
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def score(Sig, MU, Xblk):
        Sinv, ld = _sym_inv(Sig, mk, eps)
        E = mk.embed_rows(Xblk) - mk.rowd * MU
        SE = _dot(Sinv, E)
        quad = jnp.sum(E * SE, axis=0)          # (128,) per-lane
        return quad, ld, Sinv, E, SE

    def step(i, carry):
        Sig, MU, qacc, ldacc = carry
        if with_stores:
            SigS_ref[i] = Sig
            MUS_ref[i] = MU
        F = F_ref[i]
        Q = Q_ref[i]

        quad, ld, Sinv, E, _ = score(Sig, MU, X_ref[i])
        t_global = c * tc + i
        mask = jnp.where(t_global >= 1, 1.0, 0.0)
        qacc = qacc + mask * quad
        ldacc = ldacc + mask * ld

        Kc = _dot(Sig, Sinv)                     # cols < d
        Sc = Sig - _dot(Kc, mk.rowd * Sig)
        Sc = 0.5 * (Sc + Sc.T)
        MU = _dot(F, MU + _dot(Kc, E))
        Sig = _dot(F, _dot_bt(Sc, F)) + Q
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
        if with_stores:
            SigT_ref[0] = Sig_scr[...]
            MUT_ref[0] = MU_scr[...]
        quad, ld, _, _, _ = score(Sig_scr[...], MU_scr[...], xT_ref[0])
        total = (acc_scr[0, :] + quad + acc_scr[1, :] + ld
                 + T * d * _LOG_2PI)
        ll_ref[...] = jnp.broadcast_to((-0.5 * total)[None], (BD, 128))


def _ll_blocked_bwd_kernel(F_ref, X_ref, xT_ref, W_ref,
                           SigS_ref, MUS_ref, SigT_ref, MUT_ref,
                           Fbar_ref, Qbar_ref, Xbar_ref, xTbar_ref,
                           Sfin_ref, mfin_ref,
                           Sbar_scr, mbar_scr, *, j, d, n, T, tc, eps):
    """Analytic reverse-mode recursion of :func:`_ll_blocked_kernel`.

    Hand-derived adjoint of the conditioned-form step; ``B``/``m`` carry
    the cotangents of ``(Sigma_{t+1}, MU_{t+1})``.  Per reverse step
    (recomputing ``Sinv, E, SE, Kc, Sc, MUc`` from the stored carries):

        Bs      = sym(B)
        Qbar_t  = Bs                             [symmetric gauge]
        Fbar_t  = 2 Bs F Sc + m MUc^T
        Scrb    = F^T Bs F                       [cotangent of Sig - Kc Sig_r]
        Kcbar   = -Scrb Sigd + MUc_bar E^T       [Sigd = Sig[:, :d]]
        Sigbar  = Scrb - Kc^T Scrb + Kcbar Sinv + Sbar
        MUc_bar = F^T m
        Ebar    = Kc^T MUc_bar - w Sinv e        [score, t >= 1]
        Sinvbar = sym(Sig Kcbar|_tl - (w/2) E E^T)
        Sbar    = -Sinv Sinvbar Sinv - (sum_n w_n / 2) Sinv
        MUbar   = MUc_bar - Ebar|_{rows<d}
        Xbar_t  = Ebar|_{rows<d}

    The seed (t = T) is the final-score adjoint; the t = 0 boundary
    (``Sigma_0 = Q_0``, ``MU_0 = [x_0; 0]``) is folded on the HOST from
    the emitted final carries ``(Sfin, mfin)``.  Lane (trial) reductions
    ride the matmul contractions; invalid lanes carry ``w = 0``.
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    mk = _Masks(d)

    w = W_ref[0][0:1, :]                          # (1, 128) lane weights
    wsum = _dot(jnp.broadcast_to(w, (BJ, BJ)), mk.ones)   # sum_n w_n

    @pl.when(c == 0)
    def _():
        # seed: adjoint of the final score on (Sigma_T, MU_T)
        Sig = SigT_ref[0]
        MU = MUT_ref[0]
        Sinv, _ = _sym_inv(Sig, mk, eps)
        E = mk.embed_rows(xT_ref[0]) - mk.rowd * MU
        SE = _dot(Sinv, E)
        mbar_scr[...] = mk.rowd * (SE * w)
        xTbar_ref[0] = (-(SE * w))[:BD]
        Sbar_scr[...] = 0.5 * (_dot(SE * w, SE.T) - wsum * Sinv)

    def step(ii, carry):
        B, m = carry
        tt = tc - 1 - ii
        t_global = (n_chunks - 1 - c) * tc + tt

        Sig = SigS_ref[tt]
        MU = MUS_ref[tt]
        F = F_ref[tt]

        # recompute forward intermediates from the stored carry
        Sinv, _ = _sym_inv(Sig, mk, eps)
        E = mk.embed_rows(X_ref[tt]) - mk.rowd * MU
        SE = _dot(Sinv, E)
        Kc = _dot(Sig, Sinv)
        KcT = _dot(Sinv, Sig)                    # Kc^T (rows < d)
        Sc = Sig - _dot(Kc, mk.rowd * Sig)
        Sc = 0.5 * (Sc + Sc.T)
        MUc = MU + _dot(Kc, E)
        FSc = _dot(F, Sc)

        mask = jnp.where(t_global >= 1, 1.0, 0.0)

        Bs = 0.5 * (B + B.T)
        # symmetric-gauge representative (Q is G G^T; the twin's
        # symmetrize() projects its Q cotangent the same way)
        Qbar_ref[tt] = Bs
        Fbar = 2.0 * _dot(Bs, FSc) + _dot(m, MUc.T)
        Scrb = _dot(_dot_at(F, Bs), F)
        MUc_bar = _dot_at(F, m)
        Et = E.T
        Kcbar = -_dot(Scrb, mk.cold * Sig) + _dot(MUc_bar, Et)
        Ebar = _dot(KcT, MUc_bar) - mask * (SE * w)
        Sinvbar = (mk.tl * _dot(Sig, Kcbar)
                   - (mask * 0.5) * _dot(E * w, Et))
        Sinvbar = 0.5 * (Sinvbar + Sinvbar.T)
        Sbar = (-_dot(Sinv, _dot(Sinvbar, Sinv))
                - (mask * 0.5) * (wsum * Sinv))
        Sigbar = Scrb - _dot(KcT, Scrb) + _dot(Kcbar, Sinv) + Sbar
        MUbar = MUc_bar - mk.rowd * Ebar

        Xbar_ref[tt] = Ebar[:BD]
        Fbar_ref[tt] = Fbar
        return (Sigbar, MUbar)

    Sbar_f, mbar_f = jax.lax.fori_loop(
        0, tc, step, (Sbar_scr[...], mbar_scr[...]))
    Sbar_scr[...] = Sbar_f
    mbar_scr[...] = mbar_f

    @pl.when(c == n_chunks - 1)
    def _():
        # final carries = cotangents of (Sigma_0, MU_0); host folds them
        # into Qbar_0 and Xbar_0
        Sfin_ref[0] = Sbar_scr[...]
        mfin_ref[0] = mbar_scr[...]


def blocked_ll_available(j: int, d: int, n: int, dtype) -> bool:
    return 12 < j <= BJ and d <= 4 and n <= 128 and dtype == jnp.float32


def _squeeze_lead(kernel, n_in):
    """Adapt refs carrying the size-1 parameter-set block dim."""
    def wrapped(*refs, **kw):
        ins = tuple(r.at[0] for r in refs[:n_in])
        return kernel(*ins, *refs[n_in:], **kw)
    return wrapped


def _pack(F, Q, X):
    P, T, j, _ = F.shape
    n = X.shape[1]
    d = X.shape[-1]
    Fp = jnp.pad(F, ((0, 0), (0, 0), (0, BJ - j), (0, BJ - j)))
    Qp = jnp.pad(Q, ((0, 0), (0, 0), (0, BJ - j), (0, BJ - j)))
    # X: (P, n, T+1, d) -> per-step (d, n) blocks padded to (BD, 128)
    Xt = jnp.moveaxis(X, 1, -1)                      # (P, T+1, d, n)
    Xt = jnp.pad(Xt, ((0, 0), (0, 0), (0, BD - d), (0, 128 - n)))
    return Fp, Qp, Xt[:, :T], Xt[:, T:T + 1]


def _chunk(T, per_step_tiles, budget_bytes=2 << 20):
    tc = max(1, min(T, budget_bytes // (per_step_tiles * BJ * BJ * 4)))
    while T % tc:
        tc -= 1
    return tc


def _grid_setup(P, n_chunks):
    interpret = jax.default_backend() != "tpu"
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))
    return (P, n_chunks), interpret, compiler_params


def _mk_spec(tc, r, rev, n_chunks=None):
    if rev:
        return pl.BlockSpec(
            (1, tc, r, BJ),
            lambda p, c, n_chunks=n_chunks: (p, n_chunks - 1 - c, 0, 0),
            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, tc, r, BJ), lambda p, c: (p, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _mk_const(r):
    return pl.BlockSpec((1, 1, r, 128), lambda p, c: (p, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("eps", "with_stores"))
def _blocked_ll_call(F, Q, X, eps: float = 1e-12, with_stores: bool = False):
    """Run the blocked forward kernel.

    Args:
        F, Q: ``(P, T, j, j)`` joint transition / noise covariance.
        X: ``(P, n, T+1, d)`` observed trajectories.
        with_stores: additionally stream the per-step carries
            ``(Sigma_t, MU_t)`` to HBM (residues of the adjoint kernel).

    Returns:
        ``(P, n)`` per-trial log likelihoods (and the store arrays when
        ``with_stores``).
    """
    P, T, j, _ = F.shape
    n = X.shape[1]
    d = X.shape[-1]
    dtype = F.dtype

    Fp, Qp, X_in, xT_in = _pack(F, Q, X)

    tc = _chunk(T, 5 if with_stores else 3)
    n_chunks = T // tc
    grid, interpret, compiler_params = _grid_setup(P, n_chunks)

    out_shape = [jax.ShapeDtypeStruct((P, BD, 128), dtype)]
    out_specs = [pl.BlockSpec((1, BD, 128), lambda p, c: (p, 0, 0),
                              memory_space=pltpu.VMEM)]
    if with_stores:
        out_shape += [
            jax.ShapeDtypeStruct((P, T, BJ, BJ), dtype),   # SigS
            jax.ShapeDtypeStruct((P, T, BJ, BJ), dtype),   # MUS
            jax.ShapeDtypeStruct((P, 1, BJ, BJ), dtype),   # SigT
            jax.ShapeDtypeStruct((P, 1, BJ, BJ), dtype),   # MUT
        ]
        out_specs += [_mk_spec(tc, BJ, False), _mk_spec(tc, BJ, False),
                      _mk_const(BJ), _mk_const(BJ)]

    outs = pl.pallas_call(
        functools.partial(
            _squeeze_lead(_ll_blocked_kernel, 4 + 1 + (4 if with_stores
                                                       else 0)),
            j=j, d=d, n=n, T=T, tc=tc, eps=eps, with_stores=with_stores),
        grid=grid,
        in_specs=[_mk_spec(tc, BJ, False), _mk_spec(tc, BJ, False),
                  _mk_spec(tc, BD, False), _mk_const(BD)],
        out_specs=tuple(out_specs) if with_stores else out_specs[0],
        out_shape=tuple(out_shape) if with_stores else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((BJ, BJ), dtype),   # Sigma
            pltpu.VMEM((BJ, BJ), dtype),   # MU
            pltpu.VMEM((BD, 128), dtype),  # rows 0/1: quad / logdet lanes
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(Fp, Qp, X_in, xT_in)

    if with_stores:
        ll = outs[0]
        return ll[:, 0, :n], outs[1:]
    return outs[:, 0, :n]


@functools.partial(jax.jit, static_argnames=("eps",))
def _blocked_bwd_call(F, Q, X, stores, llbar, eps: float = 1e-12):
    """Run the adjoint kernel; returns ``(Fbar, Qbar, Xbar)``."""
    P, T, j, _ = F.shape
    n = X.shape[1]
    d = X.shape[-1]
    dtype = F.dtype
    SigS, MUS, SigT, MUT = stores

    Fp, _, X_in, xT_in = _pack(F, Q, X)
    w_in = jnp.zeros((P, 1, BD, 128), dtype).at[:, 0, 0, :n].set(llbar)

    # streams/chunk: F, SigS, MUS (BJ) + X, Xbar (BD) + Fbar, Qbar (BJ)
    tc = _chunk(T, 5 + 1)
    n_chunks = T // tc
    grid, interpret, compiler_params = _grid_setup(P, n_chunks)

    def rev(r):
        return _mk_spec(tc, r, True, n_chunks=n_chunks)

    Fbar, Qbar, Xbar, xTbar, Sfin, mfin = pl.pallas_call(
        functools.partial(_squeeze_lead(_ll_blocked_bwd_kernel, 8 + 6),
                          j=j, d=d, n=n, T=T, tc=tc, eps=eps),
        grid=grid,
        in_specs=[rev(BJ),
                  rev(BD), _mk_const(BD), _mk_const(BD),
                  rev(BJ), rev(BJ),
                  _mk_const(BJ), _mk_const(BJ)],
        out_specs=(rev(BJ), rev(BJ),
                   rev(BD), _mk_const(BD),
                   _mk_const(BJ), _mk_const(BJ)),
        out_shape=(
            jax.ShapeDtypeStruct((P, T, BJ, BJ), dtype),
            jax.ShapeDtypeStruct((P, T, BJ, BJ), dtype),
            jax.ShapeDtypeStruct((P, T, BD, 128), dtype),
            jax.ShapeDtypeStruct((P, 1, BD, 128), dtype),
            jax.ShapeDtypeStruct((P, 1, BJ, BJ), dtype),
            jax.ShapeDtypeStruct((P, 1, BJ, BJ), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((BJ, BJ), dtype),   # Sigma-bar carry
            pltpu.VMEM((BJ, BJ), dtype),   # MU-bar carry
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(Fp, X_in, xT_in, w_in, SigS, MUS, SigT, MUT)

    Fbar = Fbar[:, :, :j, :j]
    Qbar = Qbar[:, :, :j, :j]

    # host-side t = 0 fold: Sigma_0 = Q_0 and MU_0 = [x_0; 0]
    Sfin = Sfin[:, 0, :j, :j]
    Qbar = Qbar.at[:, 0].add(0.5 * (Sfin + jnp.swapaxes(Sfin, -1, -2)))

    def unpack_x(xb):
        # (P, t, BD, 128) -> (P, n, t, d)
        return jnp.moveaxis(xb[:, :, :d, :n], 3, 1)

    Xbar = unpack_x(Xbar)
    Xbar = Xbar.at[:, :, 0, :].add(
        jnp.moveaxis(mfin[:, 0, :d, :n], 2, 1))
    Xbar_full = jnp.concatenate([Xbar, unpack_x(xTbar)], axis=2)
    return Fbar, Qbar, Xbar_full


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
    for ``12 < j <= 128``.  Gradient: fused analytic adjoint kernel
    (:func:`_ll_blocked_bwd_kernel`).
    """
    return _blocked_ll_call(F, Q, X)


def _blk_fwd(F, Q, X):
    ll, stores = _blocked_ll_call(F, Q, X, with_stores=True)
    return ll, (F, Q, X, stores)


def _blk_bwd(res, llbar):
    F, Q, X, stores = res
    return _blocked_bwd_call(F, Q, X, stores, llbar)


conditioned_log_likelihood_blocked.defvjp(_blk_fwd, _blk_bwd)
