"""System-layer tests: reference semantics (SURVEY.md section 4) plus
fast-path/naive-path consistency."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import random
import pytest

from lqg_tpu.system import LQG
from lqg_tpu.models import BoundedActor, SubjectiveActor
from lqg_tpu.ops import riccati, kalman, gaussian

import oracle


def test_lqg_simulate():
    """Reference ``test_lqg_simulate`` (tests/lqg_test.py:16-43)."""
    dt = 1.0 / 60.0
    T = 1000

    A = jnp.eye(2)
    B = jnp.array([[0.0], [dt]])
    V = jnp.diag(jnp.array([1.0, 0.5]))
    F = jnp.eye(2)
    W = jnp.diag(jnp.array([6.0, 3.0]))
    Q = jnp.array([[1.0, -1.0], [-1.0, 1.0]])
    R = jnp.eye(1) * 0.5

    lqg = LQG(A=A, B=B, F=F, V=V, W=W, Q=Q, R=R)
    x = lqg.simulate(random.PRNGKey(0), x0=jnp.zeros(2), n=10)

    assert x.shape == (10, T + 1, 2)
    assert not jnp.isnan(x).any()


def test_simulate_subjective_equivalence():
    """Subjective actor without subjective structure == bounded actor
    (the reference's strongest oracle, tests/lqg_test.py:69-93)."""
    kwargs = dict(process_noise=1.0, sigma_target=6.0, action_cost=0.1,
                  action_variability=0.5, sigma_cursor=3.0, T=500)
    x_b = BoundedActor(**kwargs).simulate(rng_key=random.PRNGKey(0), n=20)
    x_s = SubjectiveActor(subj_noise=1.0, subj_vel_noise=0.0,
                          **kwargs).simulate(rng_key=random.PRNGKey(0), n=20)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_s), atol=1e-4)


def test_likelihood_finite_and_reasonable():
    model = BoundedActor(T=500)
    x = model.simulate(random.PRNGKey(123), n=20)
    ll = model.log_likelihood(x)
    assert ll.shape == (20,)
    assert jnp.isfinite(ll).all()


def test_conditional_distribution_shapes():
    """Reference ``test_lqg_infer_shapes`` (tests/infer_test.py:10-16)."""
    model = SubjectiveActor(T=500)
    x = model.simulate(random.PRNGKey(113), n=20)
    d = model.conditional_distribution(x)
    assert d.shape()[1] == x.shape[1] - 1


def test_conditional_distribution_consistent_with_log_likelihood():
    """The fast likelihood path equals scoring the conditional
    distribution."""
    model = BoundedActor(T=300)
    x = model.simulate(random.PRNGKey(7), n=5)
    ll_fast = model.log_likelihood(x)
    ll_dist = model.conditional_distribution(x).log_prob(x[:, 1:])
    np.testing.assert_allclose(np.asarray(ll_fast), np.asarray(ll_dist),
                               rtol=2e-4)


def test_belief_tracking_distribution_shape():
    """Reference ``test_belief_tracking_distribution``
    (tests/lqg_test.py:96-106)."""
    T = 500
    actor = BoundedActor(T=T)
    x = actor.simulate(rng_key=random.PRNGKey(0), n=20)
    assert actor.belief_tracking_distribution(x).shape() == (20, T, actor.bdim)


def test_distribution_adapter():
    """Reference ``test_numpyro_distribution`` shape checks
    (tests/infer_test.py:29-45)."""
    T = 500
    model = BoundedActor(T=T)
    d = model.to_distribution()
    assert d is not None

    x = d.sample(random.PRNGKey(0), sample_shape=(10,))
    assert x.shape == (10, T + 1, 2)
    assert jnp.isfinite(d.log_prob(x)).all()
    assert d.sample(random.PRNGKey(2)).shape == (T + 1, 2)


def test_subjective_likelihood_vs_oracle(x64):
    """End-to-end likelihood parity for a model with actor != dynamics and
    permuted belief dims."""
    model = SubjectiveActor(T=60, subj_vel_noise=0.7)
    x = model.simulate(random.PRNGKey(3), n=3)

    ll = model.log_likelihood(x)

    gains, K = model.gains()
    T = model.horizon
    st = lambda M: np.broadcast_to(np.asarray(M), (T,) + np.asarray(M).shape)
    Fj, Gj = oracle.joint_system(
        st(model.dynamics.A), st(model.dynamics.B), st(model.dynamics.F),
        st(model.dynamics.V), st(model.dynamics.W),
        st(model.actor.A), st(model.actor.B), st(model.actor.F),
        np.asarray(gains.L), np.asarray(K))
    ll_ref = np.array([oracle.log_likelihood(Fj, Gj, np.asarray(x[i]))
                       for i in range(x.shape[0])])
    np.testing.assert_allclose(np.asarray(ll), ll_ref, rtol=1e-6)


def test_likelihood_grad_finite():
    """Gradients of the likelihood wrt model parameters are finite (the
    NUTS hot path: params -> matrices -> gains -> likelihood)."""
    x = BoundedActor(T=200).simulate(random.PRNGKey(5), n=4)

    def loss(c):
        m = BoundedActor(action_cost=c, T=200)
        return -jnp.sum(m.log_likelihood(x))

    g = jax.grad(loss)(jnp.asarray(0.7))
    assert jnp.isfinite(g)
