"""Generate reference golden values for parity tests.

Runs the ACTUAL reference implementation (/root/reference, read-only) on CPU
in float64 and records, per model class: control gains ``L, l``, Kalman gains
``K``, simulated trajectories at a fixed seed, per-trial log likelihoods, and
the belief-tracking posterior mean — the parity artifacts SURVEY.md §6 says
must be generated (the reference snapshot ships none).

The reference imports ``numpyro.distributions`` (``lqg/system.py:2``), which
is not installed in this environment; since it only uses
``MultivariateNormal(...).to_event(1).log_prob`` and the ``Distribution`` base
class, a minimal stub is installed before import.  Outputs go to
``tests/goldens/*.npz`` and are loaded by ``tests/test_reference_goldens.py``.

Usage: JAX_PLATFORMS=cpu python scripts/gen_goldens.py
"""

import json
import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import random


# --- minimal numpyro.distributions stub (only what lqg/system.py touches) ---
def _install_numpyro_stub():
    class Distribution:
        def __init__(self, event_shape=(), batch_shape=()):
            self.event_shape = event_shape
            self.batch_shape = batch_shape

    class MultivariateNormal:
        def __init__(self, loc, covariance_matrix):
            self.loc = loc
            self.cov = covariance_matrix
            self.event_dims = 0

        def to_event(self, n):
            self.event_dims = n
            return self

        def log_prob(self, x):
            diff = x - self.loc
            chol = jnp.linalg.cholesky(self.cov)
            z = jax.scipy.linalg.solve_triangular(chol, diff[..., None],
                                                  lower=True)[..., 0]
            d = x.shape[-1]
            logdet = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)),
                             axis=-1)
            lp = (-0.5 * jnp.sum(z * z, axis=-1) - logdet
                  - 0.5 * d * jnp.log(2 * jnp.pi))
            if self.event_dims:
                lp = jnp.sum(lp, axis=tuple(range(-self.event_dims, 0)))
            return lp

    dist_mod = types.ModuleType("numpyro.distributions")
    dist_mod.Distribution = Distribution
    dist_mod.MultivariateNormal = MultivariateNormal
    numpyro_mod = types.ModuleType("numpyro")
    numpyro_mod.distributions = dist_mod
    sys.modules["numpyro"] = numpyro_mod
    sys.modules["numpyro.distributions"] = dist_mod


def _install_reference():
    _install_numpyro_stub()
    # lqg/__init__.py reads package metadata that a path import doesn't have
    import importlib.metadata as md
    orig = md.version
    md.version = lambda name: "0.0.0" if name == "lqg" else orig(name)
    sys.path.insert(0, "/root/reference")


CASES = {
    # name -> (tracking class name, params, T, n_trials)
    "bounded_actor": ("BoundedActor",
                      dict(action_cost=0.5, action_variability=0.4,
                           sigma_target=5.0, sigma_cursor=3.0), 120, 4),
    "optimal_actor": ("OptimalActor",
                      dict(action_variability=0.3, sigma_target=7.0,
                           sigma_cursor=2.0), 120, 4),
    "relative_observation": ("RelativeObservationBoundedActor",
                             dict(action_cost=0.8, action_variability=0.5,
                                  sigma=4.0), 120, 4),
    "subjective_actor": ("SubjectiveActor",
                         dict(action_cost=0.7, action_variability=0.5,
                              subj_noise=0.8, subj_vel_noise=1.5,
                              sigma_target=6.0, sigma_cursor=4.0), 120, 4),
    # reference DelayedSubjectiveActor takes no T (delay.py:44-51); build the
    # equivalent TemporalDelayModel(SubjectiveActor(T), delay=12) directly
    "delayed_subjective": ("TemporalDelayModel",
                           dict(action_cost=0.5, action_variability=0.5,
                                subj_noise=0.9, subj_vel_noise=8.0,
                                sigma_target=6.0, sigma_cursor=3.0), 120, 2),
    "point_mass": ("PointMassBoundedActor",
                   dict(action_variability=2e-3, sigma_target=5.0,
                        sigma_cursor=4.0, action_cost=0.02), 120, 4),
    "tracking_2d": ("BoundedActor",
                    dict(dim=2, action_cost=0.3, action_variability=0.6,
                         sigma_target=8.0, sigma_cursor=5.0), 80, 2),
}


# --- real-data (data.mat) hierarchical-fit parity goldens ---
#
# The flagship scientific workflow (reference ``cpp_data_fit.py:42-55``)
# scores the Bonnen et al. dataset under ``shared_params_lqg_model``
# (``lqg/infer/models.py:67-130``): shared params across the 6 blob-width
# conditions, per-condition ``sigma_target``.  NumPyro is not installed
# here, so the posterior itself cannot be regenerated - instead we record
# the model's per-condition log likelihoods at fixed parameter points and
# on a parameter grid.  Identical likelihood surface + identical priors
# (tested separately) => identical posterior.
#
# NOTE on the T convention: the reference's ``shared_params_lqg_model``
# passes ``T=T`` (``models.py:127``) where T is the data length - with
# T-length matrix stacks that makes ``conditional_moments``'s scan crash
# (``scan got values with different leading axis sizes``, verified against
# the actual reference code).  The only working convention - the one its
# own ``lqg_model`` uses (``models.py:32``) - is ``T = data_len - 1``;
# these goldens use it, as does ``lqg_tpu.infer.models``.

DATA_FIT_CASES = {
    # case -> (model class, shared params, per-condition sigma_target)
    "bounded_data": (
        "BoundedActor",
        dict(action_variability=0.5, action_cost=0.3, sigma_cursor=6.0),
        [2.0, 5.0, 12.0, 22.0, 40.0, 75.0]),
    "bounded_data_alt": (
        "BoundedActor",
        dict(action_variability=0.2, action_cost=1.5, sigma_cursor=2.5),
        [4.0, 8.0, 15.0, 30.0, 55.0, 90.0]),
    "subjective_data": (
        "SubjectiveActor",
        dict(action_variability=0.5, action_cost=0.3, sigma_cursor=6.0,
             subj_noise=0.8, subj_vel_noise=1.5),
        [2.0, 5.0, 12.0, 22.0, 40.0, 75.0]),
}

# posterior-surface slice: total hierarchical log likelihood on a grid of
# the shared action_cost (all else at the bounded_data point)
ACTION_COST_GRID = [0.02, 0.05, 0.1, 0.3, 0.7, 1.5, 3.0, 8.0]


def gen_data_fit_goldens(tracking, outdir):
    from lqg.io import load_tracking_data

    data, bws = load_tracking_data(delay=12, clip=180, subtract_mean=False,
                                   data_path="/root/reference/data/")
    Nc, N, T, d = data.shape
    x = jnp.asarray(data)

    def cond_ll(cls_name, shared, sigma_target_n):
        cls = getattr(tracking, cls_name)
        lls = []
        for c in range(Nc):
            model = cls(process_noise=1.0, dt=1.0 / 60.0, T=T - 1,
                        sigma_target=sigma_target_n[c], **shared)
            lls.append(np.asarray(model.log_likelihood(x[c])))
        return np.stack(lls)  # (Nc, N)

    payload = {
        "data_shape": np.array(data.shape),
        "bws": np.asarray(bws),
        "data_checksum": np.array([float(np.sum(data)),
                                   float(np.sum(np.abs(data))),
                                   float(data[0, 0, 5, 0]),
                                   float(data[3, 7, 100, 1])]),
    }
    for name, (cls_name, shared, st) in DATA_FIT_CASES.items():
        ll = cond_ll(cls_name, shared, st)
        payload[f"{name}_ll"] = ll
        payload[f"{name}_params"] = json.dumps(
            {"class": cls_name, "shared": shared, "sigma_target": st})
        print(f"{name}: per-condition ll sums = {ll.sum(axis=1)}")

    _, shared0, st0 = DATA_FIT_CASES["bounded_data"]
    grid_ll = []
    for ac in ACTION_COST_GRID:
        sh = dict(shared0, action_cost=ac)
        grid_ll.append(cond_ll("BoundedActor", sh, st0).sum())
    payload["action_cost_grid"] = np.asarray(ACTION_COST_GRID)
    payload["action_cost_grid_ll"] = np.asarray(grid_ll)
    print("action_cost grid ll:", np.asarray(grid_ll))

    np.savez(os.path.join(outdir, "data_fit.npz"), **payload)


def main():
    _install_reference()
    from lqg import tracking
    from lqg.tracking import delay as ref_delay

    tracking.DelayedSubjectiveActor = ref_delay.DelayedSubjectiveActor

    outdir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(outdir, exist_ok=True)

    for name, (cls_name, params, T, n) in CASES.items():
        if cls_name == "TemporalDelayModel":
            inner = tracking.SubjectiveActor(T=T, **params)
            model = ref_delay.TemporalDelayModel(inner, delay=12)
        else:
            cls = getattr(tracking, cls_name)
            model = cls(T=T, **params)

        from lqg.control import lqr
        from lqg.belief import kf

        gains = lqr.backward(model.actor)
        Sigma0 = model.actor.V[0] @ model.actor.V[0].T
        K = kf.forward(model.actor, Sigma0)

        x = model.simulate(random.PRNGKey(0), n=n)
        # delay models carry deterministic shift-register states: score only
        # the observed (target, cursor) dims as cpp_data_fit.py does
        obs_d = 2 if cls_name == "TemporalDelayModel" else x.shape[-1]
        ll = model.log_likelihood(x[..., :obs_d])
        belief_mu = model.belief_tracking_distribution(x[..., :obs_d]).loc

        np.savez(
            os.path.join(outdir, f"{name}.npz"),
            params=json.dumps({"class": cls_name, **params, "T": T, "n": n}),
            L=np.asarray(gains.L), l=np.asarray(gains.l),
            K=np.asarray(K), x=np.asarray(x), log_likelihood=np.asarray(ll),
            belief_mu=np.asarray(belief_mu),
        )
        print(f"{name}: T={model.T} xdim={model.xdim} bdim={model.bdim} "
              f"ll={np.asarray(ll)}")

    gen_data_fit_goldens(tracking, outdir)


if __name__ == "__main__":
    main()
