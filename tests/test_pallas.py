"""Pallas fused-gains kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqg_tpu.models import (BoundedActor, SubjectiveActor,
                            PointMassBoundedActor)
from lqg_tpu.models.basic import tracking_spec
from lqg_tpu.ops import riccati, kalman
from lqg_tpu.ops.pallas.gains import fused_gains, fused_gains_available
from lqg_tpu.ops.linalg import mT


def _assert_parity(spec, T, time_chunk=25, atol=2e-5):
    Sigma0 = spec.V @ mT(spec.V)
    L, H, K = fused_gains(spec, Sigma0, horizon=T, time_chunk=time_chunk)
    g = riccati.backward(spec, horizon=T, regularize="none")
    K_ref = kalman.forward(spec, Sigma0=Sigma0, horizon=T)
    np.testing.assert_allclose(np.asarray(L), np.asarray(g.L), atol=atol)
    np.testing.assert_allclose(np.asarray(H), np.asarray(g.H), atol=atol)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=atol)


def test_bounded_actor_batch():
    B, T = 1100, 50  # exercises particle padding (1100 < 2*1024)
    cost = jnp.linspace(0.2, 2.0, B)
    spec = jax.vmap(
        lambda c: tracking_spec(1, 1.0, 0.5, 6.0, 3.0, c, 1 / 60))(cost)
    assert fused_gains_available(jax.tree.map(lambda a: a[0], spec))
    _assert_parity(spec, T)


def test_uneven_time_chunk():
    """time_chunk not dividing T falls back to the next divisor."""
    B, T = 64, 30
    cost = jnp.linspace(0.5, 1.5, B)
    spec = jax.vmap(
        lambda c: tracking_spec(1, 1.0, 0.5, 6.0, 3.0, c, 1 / 60))(cost)
    _assert_parity(spec, T, time_chunk=7)  # falls back to 6


@pytest.mark.parametrize("model_cls", [SubjectiveActor,
                                       PointMassBoundedActor])
def test_model_actor_specs(model_cls):
    """Larger state dims (n=3 with p=2, n=4 with p=3)."""
    m = model_cls(T=40)
    spec = jax.tree.map(lambda a: jnp.stack([a] * 16), m.actor)
    assert fused_gains_available(m.actor)
    _assert_parity(spec, 40, time_chunk=10, atol=5e-4)


def test_availability_gate():
    m = BoundedActor(T=10)
    assert fused_gains_available(m.actor)
    from lqg_tpu.models import DelayedSubjectiveActor

    big = DelayedSubjectiveActor(T=10)
    assert not fused_gains_available(big.actor)  # n = 39 exceeds scope
