"""Steady-state (doubling) ARE solvers vs long finite-horizon recursions.

The finite-horizon schedules converge to the ARE fixed points away from the
boundaries: backward Riccati gains at early times, Kalman gains at late
times.  Those recursions are golden-tested against the reference, so
agreement here chains back to reference parity.
"""

import jax
import jax.numpy as jnp
import pytest

from lqg_tpu.models import BoundedActor, SubjectiveActor
from lqg_tpu.ops import kalman, riccati
from lqg_tpu.ops.dare import solve_dare, steady_state


@pytest.mark.parametrize("model_cls", [BoundedActor, SubjectiveActor])
def test_steady_matches_finite_horizon_tails(x64, model_cls):
    sys = model_cls(T=800)
    actor = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), sys.actor)

    ss = steady_state(actor)

    # T=800 recursions carry ~1e-6 of their own unconverged transient
    # (SubjectiveActor mixes slowly); the solver itself is exact to ~4e-15
    # against a T=20000 recursion.
    gains = riccati.backward(actor, horizon=sys.horizon, regularize="none")
    # backward recursion: early-time gains are the infinite-horizon limit
    assert jnp.max(jnp.abs(gains.L[0] - ss.L)) < 1e-5

    K = kalman.forward(actor, Sigma0=sys._default_Sigma0().astype(jnp.float64),
                       horizon=sys.horizon)
    # forward recursion: late-time gains are the infinite-horizon limit
    assert jnp.max(jnp.abs(K[-1] - ss.K)) < 1e-6


def test_solve_dare_fixed_point(x64):
    """The returned S satisfies its own DARE residual."""
    sys = BoundedActor(T=10)
    a = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), sys.actor)
    A, B, Q, R = a.A, a.B, a.Q, a.R
    G = B @ jnp.linalg.solve(R, B.T)
    S = solve_dare(A, G, Q)
    n = A.shape[-1]
    rhs = Q + A.T @ S @ jnp.linalg.solve(jnp.eye(n) + G @ S, A)
    assert jnp.max(jnp.abs(S - rhs)) < 1e-10


def test_steady_batched():
    sys = BoundedActor(T=10)
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (3,) + x.shape)
        if jnp.ndim(x) >= 2 else x, sys.actor)
    ss = steady_state(batch)
    assert ss.L.shape == (3, 1, 2)
    assert ss.K.shape == (3, 2, 2)
    ss0 = steady_state(sys.actor)
    assert jnp.allclose(ss.L[0], ss0.L, atol=1e-6)


def test_steady_differentiable():
    def loss(ac):
        sys = BoundedActor(T=10, action_cost=ac)
        ss = steady_state(sys.actor)
        return jnp.sum(ss.L ** 2) + jnp.sum(ss.K ** 2)

    g = jax.grad(loss)(0.5)
    assert bool(jnp.isfinite(g)) and abs(float(g)) > 0.0


def test_system_gains_steady_method():
    from lqg_tpu.models import BoundedActor

    sys = BoundedActor(T=400)
    g, K = sys.gains(method="steady")
    assert g.L.shape == (400, 1, 2) and K.shape == (400, 2, 2)
    gs, Ks = sys.gains(method="scan")
    # exact in the long-horizon interior (away from the terminal boundary)
    assert jnp.max(jnp.abs(g.L[100] - gs.L[100])) < 1e-2
    assert jnp.max(jnp.abs(K[-1] - Ks[-1])) < 1e-4
