"""On-chip (real TPU) kernel lane.

Run with::

    LQG_TPU_TEST_PLATFORM=tpu LQG_TPU_TEST_CACHE=1 python -m pytest \
        tests/test_tpu.py tests/test_pallas.py -q -n 0

(``-n 0`` disables the default xdist workers - there is one chip; the
persistent cache is safe here and saves the slow remote-relay recompiles.)

Under ``LQG_TPU_TEST_PLATFORM=tpu`` the conftest leaves the ambient TPU
platform selected, so every Pallas kernel in ``test_pallas.py`` compiles for
the chip instead of running in interpret mode.  The tests here are
additionally ``tpu``-marked (auto-skipped off-chip): they assert the
``auto`` dispatch policy actually engages the fused kernels on TPU and that
on-chip numerics match the XLA scan path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import random

from lqg_tpu.models import BoundedActor, SubjectiveActor

pytestmark = pytest.mark.tpu


def test_auto_dispatch_uses_fused_paths():
    """On TPU, auto gains/likelihood must take the fused kernel paths."""
    m = BoundedActor(T=100)
    assert m._fused_ok()
    from lqg_tpu.ops.pallas.likelihood import fused_ll_available

    j = m.xdim + m.bdim
    assert fused_ll_available(j, m.xdim, jnp.float32)


def test_gains_on_chip_parity():
    """Fused gains compiled for the chip == XLA scan gains."""
    m = BoundedActor(T=200)
    g_f, K_f = m.gains(method="fused")
    g_s, K_s = m.gains(method="scan")
    np.testing.assert_allclose(np.asarray(g_f.L), np.asarray(g_s.L),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_s), atol=3e-5)


def test_likelihood_on_chip_parity_and_grads():
    """Fused likelihood (value, param-grad, data-grad) compiled for the
    chip == the scan path."""
    T = 200
    m = SubjectiveActor(T=T)
    x = m.simulate(random.PRNGKey(0), n=8)

    ll_f = m.log_likelihood(x, method="fused")
    ll_s = m.log_likelihood(x, method="scan")
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_s),
                               rtol=2e-4, atol=5e-3)

    def nll(p, method):
        return -SubjectiveActor(T=T, subj_noise=p).log_likelihood(
            x, method=method).sum()

    g_f = jax.grad(lambda p: nll(p, "fused"))(jnp.float32(0.8))
    g_s = jax.grad(lambda p: nll(p, "scan"))(jnp.float32(0.8))
    np.testing.assert_allclose(float(g_f), float(g_s), rtol=5e-3)

    gx_f = jax.grad(
        lambda x_: m.log_likelihood(x_, method="fused").sum())(x)
    gx_s = jax.grad(
        lambda x_: m.log_likelihood(x_, method="scan").sum())(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_s),
                               rtol=5e-3, atol=5e-3)


def test_delay_model_pscan_on_chip_parity():
    """Large-j delay model: the associative path compiled for the chip
    matches the sequential scan (auto keeps scan - measured faster at
    j=65, docs/perf.md - but pscan must stay correct for horizon
    sharding)."""
    from lqg_tpu.models import DelayedSubjectiveActor

    m = DelayedSubjectiveActor(T=100)
    x = m.simulate(random.PRNGKey(1), n=2)[..., :2]
    ll_pscan = m.log_likelihood(x, method="pscan")
    ll_scan = m.log_likelihood(x, method="scan")
    np.testing.assert_allclose(np.asarray(ll_pscan), np.asarray(ll_scan),
                               rtol=2e-3, atol=5e-2)
