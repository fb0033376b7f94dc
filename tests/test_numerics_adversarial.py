"""Adversarial numerics: near-degenerate regimes vs the float64 oracle.

SURVEY.md section 7 hard part (1): Riccati/KF stability in f32 at long T
inside NUTS gradients.  These tests fuzz the corners users actually hit -
vanishing control cost (the OptimalActor limit and the data.mat fit's
action-cost ridge), extreme sensory-noise ratios, near-deterministic
observations, and T = 10^4 horizons - and pin both the plain-scan and the
square-root (QR array-form) paths to the float64 oracle.

Measured finding (recorded in docs/numerics.md): at the model zoo's state
dims the plain f32 recursions already track the oracle to ~1e-6 across the
whole grid - the contraction of the tracking dynamics washes out roundoff -
and covariances touch singular (min eigenvalue -> 0) without ever going
indefinite.  The sqrt path's value at these dims is its *guarantee*
(factors propagate PSD by construction), not a measured accuracy win; these
tests quantify exactly that, so any future regression in either claim
fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqg_tpu.models import BoundedActor
from lqg_tpu.ops import riccati, kalman
from lqg_tpu.ops.sqrt import riccati_backward_sqrt, kalman_forward_sqrt
from tests.oracle import lqr_backward, kf_forward

# (action_cost, sigma_target, sigma_cursor, action_variability, T)
ADVERSARIAL_GRID = [
    (1e-6, 6.0, 6.0, 0.5, 1000),      # vanishing control cost
    (10.0, 6.0, 6.0, 0.5, 1000),      # control-dominated
    (1.0, 600.0, 0.006, 0.5, 1000),   # 1e5 sensory-noise ratio
    (1.0, 0.006, 600.0, 0.5, 1000),   # inverted ratio
    (1e-6, 1e4, 1e-3, 1e-3, 1000),    # compounded extremes
    (1e-4, 1e3, 1e-2, 2.0, 2000),     # long + extreme
]


def _oracle_gains(spec, T):
    st = lambda M: np.broadcast_to(np.asarray(M, np.float64),
                                   (T,) + np.asarray(M).shape)
    n = spec.A.shape[0]
    m = spec.B.shape[1]
    S0 = np.asarray(spec.V @ spec.V.T, np.float64)
    L64, _ = lqr_backward(st(spec.Q), np.zeros((T, n)),
                          np.asarray(spec.Qf, np.float64), np.zeros(n),
                          st(np.zeros((m, n))), st(spec.R),
                          np.zeros((T, m)), st(spec.A), st(spec.B), eps=0.0)
    K64 = kf_forward(st(spec.A), st(spec.F), st(spec.V), st(spec.W), S0)
    return L64, K64, S0


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-300)


@pytest.mark.parametrize("ac,st,sc,av,T", ADVERSARIAL_GRID)
def test_degenerate_regimes_track_f64_oracle(ac, st, sc, av, T):
    """f32 scan AND f32 sqrt both stay within 5e-5 of the f64 oracle
    across the degenerate-parameter grid (measured headroom ~50x: actual
    errors are ~1e-6)."""
    m = BoundedActor(T=T, action_cost=ac, sigma_target=st, sigma_cursor=sc,
                     action_variability=av)
    spec = m.actor
    L64, K64, S0 = _oracle_gains(spec, T)
    S0_32 = jnp.asarray(S0, jnp.float32)

    g = riccati.backward(spec, horizon=T, regularize="none")
    K = kalman.forward(spec, Sigma0=S0_32, horizon=T)
    gs = riccati_backward_sqrt(spec, horizon=T)
    Ks = kalman_forward_sqrt(spec, Sigma0=S0_32, horizon=T)

    for name, got in [("L scan", g.L), ("L sqrt", gs.L),
                      ("K scan", K), ("K sqrt", Ks)]:
        arr = np.asarray(got)
        assert np.isfinite(arr).all(), f"{name} non-finite at {ac,st,sc,av}"
    assert _rel(L64, g.L) < 5e-5
    assert _rel(L64, gs.L) < 5e-5
    assert _rel(K64, K) < 5e-5
    assert _rel(K64, Ks) < 5e-5


@pytest.mark.parametrize("ac,st,sc,av,T", ADVERSARIAL_GRID[:3])
def test_degenerate_regimes_likelihood_and_grad_finite(ac, st, sc, av, T):
    """The marginalized likelihood and its parameter gradient stay finite
    in the degenerate regimes (what a NUTS leapfrog needs)."""
    T = min(T, 400)
    m = BoundedActor(T=T, action_cost=ac, sigma_target=st, sigma_cursor=sc,
                     action_variability=av)
    x = m.simulate(jax.random.PRNGKey(0), n=3)
    ll = m.log_likelihood(x)
    assert np.isfinite(np.asarray(ll)).all()

    g = jax.grad(lambda c: jnp.sum(
        BoundedActor(T=T, action_cost=c, sigma_target=st, sigma_cursor=sc,
                     action_variability=av).log_likelihood(x)))(
                         jnp.asarray(ac, jnp.float32))
    assert np.isfinite(float(g)), f"non-finite grad at {ac,st,sc,av}"


def test_near_deterministic_observations_stay_psd():
    """With sigma -> 1e-6 the innovation update cancels the covariance
    almost exactly; the plain f32 recursion's covariance touches singular
    but must never go indefinite, and the sqrt factors are PSD by
    construction."""
    m = BoundedActor(T=300, sigma_target=1e-6, sigma_cursor=1e-6,
                     process_noise=10.0, action_variability=10.0)
    spec = m.actor
    VV = np.asarray(spec.V @ spec.V.T, np.float32)
    WW = np.asarray(spec.W @ spec.W.T, np.float32)
    A = np.asarray(spec.A, np.float32)
    F = np.asarray(spec.F, np.float32)
    P = VV.copy()
    min_eig = np.inf
    for _ in range(300):
        P = A @ P @ A.T + VV
        G = F @ P @ F.T + WW
        K = P @ F.T @ np.linalg.inv(G)
        P = P - K @ (P @ F.T).T
        min_eig = min(min_eig, float(np.linalg.eigvalsh(0.5 * (P + P.T)).min()))
    assert min_eig >= -1e-6, f"plain covariance went indefinite: {min_eig}"

    # sqrt path: reconstruction U^T U is PSD by construction; factors finite
    S0 = jnp.asarray(VV)
    Ks = kalman_forward_sqrt(spec, Sigma0=S0, horizon=300)
    assert np.isfinite(np.asarray(Ks)).all()


@pytest.mark.slow
def test_horizon_1e4_matches_oracle_and_steady_state():
    """T = 10^4: the f32 scans neither drift nor blow up over 10k steps -
    interior gains match the f64 oracle AND the infinite-horizon DARE
    solution."""
    from lqg_tpu.ops.dare import steady_state

    T = 10_000
    m = BoundedActor(T=T, action_cost=0.3, sigma_target=20.0,
                     sigma_cursor=2.0, action_variability=1.5)
    spec = m.actor
    L64, K64, S0 = _oracle_gains(spec, T)
    g = riccati.backward(spec, horizon=T, regularize="none")
    K = kalman.forward(spec, Sigma0=jnp.asarray(S0, jnp.float32), horizon=T)

    assert _rel(L64, g.L) < 5e-5
    assert _rel(K64, K) < 5e-5

    ss = steady_state(spec)
    # interior of the schedule sits at the fixed point
    np.testing.assert_allclose(np.asarray(g.L[T // 2]), np.asarray(ss.L),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(K[T // 2]), np.asarray(ss.K),
                               rtol=1e-4, atol=1e-6)
