"""Oracle parity tests for the solver kernels (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqg_tpu.ops import riccati, kalman, gaussian
from lqg_tpu.utils import time_stack_spec, stationary_spec

import oracle


def _random_spec(rng, n=3, m=2, p=3, T=50):
    A = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    B = 0.1 * rng.standard_normal((n, m))
    F = np.eye(p, n)
    V = np.diag(0.5 + rng.random(n))
    W = np.diag(0.5 + rng.random(p))
    Qh = rng.standard_normal((n, n)) * 0.3
    Q = Qh @ Qh.T + 0.1 * np.eye(n)
    R = np.diag(0.2 + rng.random(m))
    return A, B, F, V, W, Q, R, T


@pytest.mark.parametrize("layout", ["stacked", "stationary"])
def test_riccati_vs_oracle(layout, x64):
    rng = np.random.default_rng(0)
    A, B, F, V, W, Q, R, T = _random_spec(rng)
    n, m = A.shape[0], B.shape[1]

    st = lambda M: np.broadcast_to(M, (T,) + M.shape)
    L_ref, l_ref = oracle.lqr_backward(
        st(Q), np.zeros((T, n)), Q, np.zeros(n), np.zeros((T, m, n)),
        st(R), np.zeros((T, m)), st(A), st(B))

    if layout == "stacked":
        spec = time_stack_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R, T=T)
        gains = riccati.backward(spec, regularize="eigh")
    else:
        spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
        gains = riccati.backward(spec, horizon=T, regularize="eigh")

    np.testing.assert_allclose(np.asarray(gains.L), L_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gains.l), l_ref, rtol=1e-9, atol=1e-11)


def test_riccati_regularization_modes_agree_when_pd(x64):
    """With R > 0 the Hessian is PD, so all guard modes coincide."""
    rng = np.random.default_rng(1)
    A, B, F, V, W, Q, R, T = _random_spec(rng)
    spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
    g_none = riccati.backward(spec, horizon=T, regularize="none")
    g_jit = riccati.backward(spec, horizon=T, regularize="jitter")
    g_eigh = riccati.backward(spec, horizon=T, regularize="eigh")
    np.testing.assert_allclose(g_none.L, g_eigh.L, rtol=1e-7)
    np.testing.assert_allclose(g_jit.L, g_eigh.L, rtol=1e-7)


@pytest.mark.parametrize("layout", ["stacked", "stationary"])
def test_kalman_vs_oracle(layout, x64):
    rng = np.random.default_rng(2)
    A, B, F, V, W, Q, R, T = _random_spec(rng)
    Sigma0 = V @ V.T

    st = lambda M: np.broadcast_to(M, (T,) + M.shape)
    K_ref = oracle.kf_forward(st(A), st(F), st(V), st(W), Sigma0)

    if layout == "stacked":
        spec = time_stack_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R, T=T)
        K = kalman.forward(spec, Sigma0=jnp.asarray(Sigma0))
    else:
        spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
        K = kalman.forward(spec, Sigma0=jnp.asarray(Sigma0), horizon=T)

    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-9, atol=1e-12)


def test_riccati_batched_matches_loop(x64):
    """Batch axes on the spec give the same results as separate solves."""
    rng = np.random.default_rng(3)
    specs = []
    for _ in range(4):
        A, B, F, V, W, Q, R, T = _random_spec(rng)
        specs.append(stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *specs)
    g_b = riccati.backward(batched, horizon=50)
    for i, spec in enumerate(specs):
        g_i = riccati.backward(spec, horizon=50)
        np.testing.assert_allclose(g_b.L[:, i], g_i.L, rtol=1e-9, atol=1e-12)


def test_likelihood_vs_oracle(x64):
    """End-to-end joint-system likelihood parity on a small system."""
    rng = np.random.default_rng(4)
    A, B, F, V, W, Q, R, T = _random_spec(rng, n=2, m=1, p=2, T=40)

    spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
    gains = riccati.backward(spec, horizon=T, regularize="eigh")
    K = kalman.forward(spec, Sigma0=jnp.asarray(V @ V.T), horizon=T)

    joint = gaussian.joint_system(spec, spec, gains.L, K, T)

    # oracle joint system from the same gains
    st = lambda M: np.broadcast_to(M, (T,) + M.shape)
    Fj_ref, Gj_ref = oracle.joint_system(
        st(A), st(B), st(F), st(V), st(W), st(A), st(B), st(F),
        np.asarray(gains.L), np.asarray(K))
    np.testing.assert_allclose(np.asarray(joint.F), Fj_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(joint.G), Gj_ref, rtol=1e-9, atol=1e-12)

    # simulate simple data
    x = rng.standard_normal((5, T + 1, 2)).cumsum(axis=1)

    kernel = gaussian.conditional_kernel(joint, 2)
    ll = gaussian.trial_log_likelihood(kernel, jnp.asarray(x))

    ll_ref = np.array([oracle.log_likelihood(Fj_ref, Gj_ref, x[i])
                       for i in range(x.shape[0])])
    np.testing.assert_allclose(np.asarray(ll), ll_ref, rtol=1e-8)

    # full-moments path agrees with the oracle too
    mu_ref, Sigma_ref = oracle.conditional_moments(Fj_ref, Gj_ref, x[0])
    mu = gaussian.conditional_mean(kernel, jnp.asarray(x[:1]))[0]
    Sigma = gaussian.conditional_sigma(joint, 2)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Sigma), Sigma_ref, rtol=1e-8,
                               atol=1e-10)


def test_reference_lqr_kf_parity(x64):
    """Parity against the actual reference kernels, if present.

    Imports only ``lqg.control.lqr`` / ``lqg.belief.kf`` (pure JAX modules -
    the rest of the reference needs NumPyro, which this environment lacks).
    """
    import importlib.util
    import sys
    import types

    def _load(name, path):
        spec_ = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec_)
        sys.modules[name] = mod
        spec_.loader.exec_module(mod)
        return mod

    base = "/root/reference/lqg"
    try:
        # build a synthetic 'lqg' package so the kernel modules import
        # without touching lqg/__init__ (which needs NumPyro)
        for pkg_name in ("lqg", "lqg.control", "lqg.belief"):
            if pkg_name not in sys.modules:
                pkg = types.ModuleType(pkg_name)
                pkg.__path__ = []
                sys.modules[pkg_name] = pkg
        _load("lqg.spec", f"{base}/spec.py")
        _load("lqg.utils", f"{base}/utils.py")
        ref_lqr = _load("lqg.control.lqr", f"{base}/control/lqr.py")
        ref_kf = _load("lqg.belief.kf", f"{base}/belief/kf.py")
        ref_stack = sys.modules["lqg.utils"].time_stack_spec
    except Exception:
        pytest.skip("reference not importable")

    rng = np.random.default_rng(5)
    A, B, F, V, W, Q, R, T = _random_spec(rng)

    ref_spec = ref_stack(A=jnp.asarray(A), B=jnp.asarray(B), F=jnp.asarray(F),
                         V=jnp.asarray(V), W=jnp.asarray(W),
                         Q=jnp.asarray(Q), R=jnp.asarray(R), T=T)
    gains_ref = ref_lqr.backward(ref_spec)
    K_ref = ref_kf.forward(ref_spec, Sigma0=jnp.asarray(V @ V.T))

    spec = stationary_spec(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
    gains = riccati.backward(spec, horizon=T, regularize="eigh")
    K = kalman.forward(spec, Sigma0=jnp.asarray(V @ V.T), horizon=T)

    np.testing.assert_allclose(np.asarray(gains.L), np.asarray(gains_ref.L),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=1e-8, atol=1e-10)
