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


def test_gains_fused_custom_vjp():
    """gains_fused: Pallas primal matches the scan, and grads flow (via the
    scan-math VJP) identically to differentiating the scan directly."""
    T = 30

    def build(c):
        return tracking_spec(1, 1.0, 0.5, 6.0, 3.0, c, 1 / 60)

    from lqg_tpu.ops.pallas.gains import gains_fused, _scan_gains

    def loss_fused(c):
        spec = jax.tree.map(lambda a: a[None], build(c))
        Sigma0 = spec.V @ mT(spec.V)
        L, H, K = gains_fused(spec, Sigma0, T)
        return jnp.sum(L**2) + jnp.sum(K**2)

    def loss_scan(c):
        spec = jax.tree.map(lambda a: a[None], build(c))
        Sigma0 = spec.V @ mT(spec.V)
        L, H, K = _scan_gains(spec, Sigma0, T)
        return jnp.sum(L**2) + jnp.sum(K**2)

    np.testing.assert_allclose(float(loss_fused(0.7)), float(loss_scan(0.7)),
                               rtol=1e-5)
    gf = float(jax.grad(loss_fused)(0.7))
    gs = float(jax.grad(loss_scan)(0.7))
    np.testing.assert_allclose(gf, gs, rtol=1e-5)


def test_system_gains_method_fused():
    """System.gains(method="fused") matches the scan path end to end."""
    m = BoundedActor(T=40)
    g_scan, K_scan = m.gains(method="scan")
    g_fused, K_fused = m.gains(method="fused")
    np.testing.assert_allclose(np.asarray(g_fused.L), np.asarray(g_scan.L),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(K_fused), np.asarray(K_scan),
                               atol=2e-5)
    assert g_fused.l.shape == g_scan.l.shape
    # off-TPU (CPU test backend) auto must choose the scan path
    assert not m._fused_ok()
