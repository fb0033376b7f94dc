"""Square-root (QR array-form) recursions vs the plain covariance scans.

Oracle: the plain recursions in float64 (themselves golden-tested against the
reference in test_reference_goldens.py), so agreement here chains back to
reference parity.
"""

import jax
import jax.numpy as jnp
import pytest

from lqg_tpu.models import BoundedActor, DelayedSubjectiveActor, SubjectiveActor
from lqg_tpu.ops import riccati, kalman
from lqg_tpu.ops.sqrt import (
    kalman_forward_sqrt,
    psd_sqrt,
    riccati_backward_sqrt,
)


def _cast_spec(spec, dtype):
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), spec)


def test_psd_sqrt_singular():
    # the tracking error cost [[1,-1],[-1,1]] is PSD but singular
    Q = jnp.array([[1.0, -1.0], [-1.0, 1.0]])
    S = psd_sqrt(Q)
    assert jnp.allclose(S @ S.T, Q, atol=1e-6)


@pytest.mark.parametrize("model_cls,kwargs", [
    (BoundedActor, dict(T=300)),
    (SubjectiveActor, dict(T=300)),
    (DelayedSubjectiveActor, dict(T=200)),  # singular V (delay registers)
])
def test_sqrt_matches_plain_f64(x64, model_cls, kwargs):
    sys = model_cls(**kwargs)
    actor = _cast_spec(sys.actor, jnp.float64)
    Sigma0 = sys._default_Sigma0().astype(jnp.float64)

    g_ref = riccati.backward(actor, horizon=sys.horizon, regularize="none")
    g_sqrt = riccati_backward_sqrt(actor, horizon=sys.horizon)
    assert jnp.max(jnp.abs(g_ref.L - g_sqrt.L)) < 1e-9
    assert jnp.max(jnp.abs(g_ref.H - g_sqrt.H)) < 1e-9

    K_ref = kalman.forward(actor, Sigma0=Sigma0, horizon=sys.horizon)
    K_sqrt = kalman_forward_sqrt(actor, Sigma0=Sigma0, horizon=sys.horizon)
    assert jnp.max(jnp.abs(K_ref - K_sqrt)) < 1e-9


def test_sqrt_batched():
    """Leading batch axes broadcast (parameter particles)."""
    sys = BoundedActor(T=100)
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape)
        if jnp.ndim(x) >= 2 else x, sys.actor)
    g = riccati_backward_sqrt(batch, horizon=sys.horizon)
    assert g.L.shape == (100, 4, 1, 2)
    K = kalman_forward_sqrt(batch, Sigma0=sys._default_Sigma0(),
                            horizon=sys.horizon)
    assert K.shape == (100, 4, 2, 2)

    # batched result equals the unbatched one
    g0 = riccati_backward_sqrt(sys.actor, horizon=sys.horizon)
    assert jnp.allclose(g.L[:, 0], g0.L, atol=1e-6)


def test_system_gains_sqrt_method():
    sys = BoundedActor(T=200)
    g_s, K_s = sys.gains(method="sqrt")
    g_p, K_p = sys.gains(method="scan")
    assert jnp.max(jnp.abs(g_s.L - g_p.L)) < 1e-4
    assert jnp.max(jnp.abs(K_s - K_p)) < 1e-4
    assert jnp.all(g_s.l == 0.0)


def test_sqrt_factors_stay_finite_f32():
    """Extreme noise-scale ratios: the sqrt form must stay finite in f32."""
    sys = BoundedActor(T=1000, action_cost=1e-6, sigma_target=1e4,
                       sigma_cursor=1e-4, action_variability=1e-3)
    actor = _cast_spec(sys.actor, jnp.float32)
    g = riccati_backward_sqrt(actor, horizon=sys.horizon)
    K = kalman_forward_sqrt(actor, Sigma0=sys._default_Sigma0(),
                            horizon=sys.horizon)
    assert bool(jnp.isfinite(g.L).all())
    assert bool(jnp.isfinite(K).all())


def test_sqrt_gradients_flow():
    """The QR-based recursions must be differentiable end to end."""
    def loss(ac):
        sys = BoundedActor(T=50, action_cost=ac)
        g, K = sys.gains(method="sqrt")
        return jnp.sum(g.L ** 2) + jnp.sum(K ** 2)

    grad = jax.grad(loss)(0.5)
    assert bool(jnp.isfinite(grad))
    assert abs(float(grad)) > 0.0
