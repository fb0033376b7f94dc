"""Parity against golden values generated from the ACTUAL reference code.

``tests/goldens/*.npz`` are produced by ``scripts/gen_goldens.py``, which runs
the reference implementation (/root/reference) in float64 on CPU and records
control gains, Kalman gains, fixed-seed trajectories, per-trial log
likelihoods, and belief-posterior means per model class (the generated parity
baseline SURVEY.md §6 calls for).  Here the same quantities are computed with
lqg_tpu and compared.

Trajectory parity is NOT asserted trajectory-by-trajectory — the rollout
architecture differs deliberately (one batched scan vs the reference's
per-trial vmap at ``lqg/system.py:133``), so PRNG consumption differs.  The
reference's trajectories are instead fed through OUR likelihood, which is the
quantity inference actually consumes.

Tolerances: with ``regularize="eigh"`` (the reference-parity mode,
``lqg/control/lqr.py:26-28``) gains agree to machine precision; the default
``"jitter"`` mode and the likelihood (Cholesky vs ``linalg.solve``/``inv``)
differ by deliberate O(eps)=1e-8 regularization choices, hence the looser
1e-5 bounds there.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lqg_tpu import models
from lqg_tpu.ops import riccati, kalman
from lqg_tpu.ops.linalg import mT

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
CASES = sorted(f[:-4] for f in os.listdir(GOLDEN_DIR) if f.endswith(".npz"))


def build_model(meta):
    params = {k: v for k, v in meta.items() if k not in ("class", "n")}
    cls_name = meta["class"]
    if cls_name == "TemporalDelayModel":
        inner = models.SubjectiveActor(**params)
        return models.TemporalDelayModel(inner, delay=12)
    return getattr(models, cls_name)(**params)


def obs_dim(meta, x):
    # delay models carry deterministic shift registers; only the (target,
    # cursor) dims are scored, as the reference's cpp_data_fit.py does
    return 2 if meta["class"] == "TemporalDelayModel" else x.shape[-1]


@pytest.fixture(params=CASES)
def golden(request):
    data = np.load(os.path.join(GOLDEN_DIR, f"{request.param}.npz"))
    meta = json.loads(str(data["params"]))
    return meta, data


def test_gains_parity_exact(golden, x64):
    """With the reference's eigh regularization, control gains L, l and
    Kalman gains K match to machine precision (``lqg/control/lqr.py:16``,
    ``lqg/belief/kf.py:6``)."""
    meta, data = golden
    model = build_model(meta)
    gains = riccati.backward(model.actor, horizon=model.horizon,
                             regularize="eigh")
    V0 = model.actor.V if model.actor.V.ndim == 2 else model.actor.V[0]
    K = kalman.forward(model.actor, Sigma0=V0 @ mT(V0), horizon=model.horizon)
    np.testing.assert_allclose(np.asarray(gains.L), data["L"],
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(gains.l), data["l"],
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(K), data["K"],
                               rtol=1e-12, atol=1e-13)


def test_gains_parity_default(golden, x64):
    """The default jitter regularization stays within O(eps) of the
    reference gains."""
    meta, data = golden
    model = build_model(meta)
    gains, K = model.gains()
    np.testing.assert_allclose(np.asarray(gains.L), data["L"],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(K), data["K"],
                               rtol=1e-6, atol=1e-9)


def test_log_likelihood_parity(golden, x64):
    """Per-trial marginalized log likelihood of the reference's own simulated
    trajectories matches (reference ``lqg/system.py:246-248``)."""
    meta, data = golden
    model = build_model(meta)
    x = jnp.asarray(data["x"])
    ll = model.log_likelihood(x[..., :obs_dim(meta, x)])
    np.testing.assert_allclose(np.asarray(ll), data["log_likelihood"],
                               rtol=1e-5)


def test_belief_posterior_parity(golden, x64):
    """Belief-tracking posterior mean matches (reference
    ``lqg/system.py:250-257``)."""
    meta, data = golden
    model = build_model(meta)
    x = jnp.asarray(data["x"])
    mu = model.belief_tracking_distribution(x[..., :obs_dim(meta, x)]).loc
    np.testing.assert_allclose(np.asarray(mu), data["belief_mu"],
                               rtol=1e-4, atol=1e-6)
