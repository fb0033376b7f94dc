"""Build and execute ``notebooks/2D-Visualization.ipynb`` and
``notebooks/DataAnalysis.ipynb``.

Notebook-count parity with the reference (``2D-Visualization.ipynb``,
``Data.ipynb`` under ``/root/reference/notebooks/``, rendered into its docs
site) - here as executed artifacts built from the same content as
``examples/visualization_2d.py`` / ``examples/data_analysis.py``.

Usage: python scripts/make_extra_notebooks.py  (CPU; ~5 min)
"""

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

SETUP = """import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
if os.environ.get("TUTORIAL_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt
from jax import random"""

VIZ2D = [
    md("""# 2D tracking models

Two-dimensional variants of the tracking agents (reference
`2D-Visualization.ipynb`): per dimension the state holds target and cursor,
and the cost/noise structure is block-diagonal, so one model tracks in x
and y simultaneously. Four agents span the behavioral range:

* **IdealObserver** - near-zero noise and negligible action cost: the
  belief (plotted as the "cursor") shadows the target.
* **OptimalActor** - cheap actions: tight tracking.
* **BoundedActor** - expensive actions: smoothed, lagging pursuit.
* **SubjectiveActor** - believes the target has velocity: overshoots."""),
    code(SETUP),
    code("""from lqg_tpu.models import BoundedActor, OptimalActor, SubjectiveActor

sigma_target, T = 20.0, 500
models = {
    "IdealObserver": OptimalActor(sigma_target=sigma_target,
                                  action_variability=1e-6, sigma_cursor=1e-4,
                                  dim=2, T=T),
    "OptimalActor": BoundedActor(action_variability=0.5,
                                 sigma_target=sigma_target, action_cost=0.1,
                                 sigma_cursor=0.1, dim=2, T=T),
    "BoundedActor": BoundedActor(action_variability=0.5,
                                 sigma_target=sigma_target, action_cost=10.0,
                                 sigma_cursor=0.1, dim=2, T=T),
    "SubjectiveActor": SubjectiveActor(action_variability=0.5,
                                       sigma_target=sigma_target,
                                       action_cost=10.0, sigma_cursor=0.1,
                                       dim=2, subj_vel_noise=2.0, T=T),
}

trajs = {}
for name, model in models.items():
    if name == "IdealObserver":
        x, x_hat, y, u = model.simulate(rng_key=random.PRNGKey(0), n=20,
                                        return_all=True)
        x = jnp.stack([x[..., 0], x_hat[..., 0], x[..., 2], x_hat[..., 2]],
                      axis=-1)
    else:
        x = model.simulate(rng_key=random.PRNGKey(0), n=20)
    trajs[name] = x
    err = float(jnp.sqrt(jnp.mean((x[..., 0] - x[..., 1]) ** 2)))
    print(f"{name:18s} rms tracking error: {err:6.2f}")"""),
    code("""fig, axes = plt.subplots(2, 4, figsize=(13, 5), sharex=True,
                         sharey="row")
t = np.arange(T + 1) / 60
for col, (name, x) in enumerate(trajs.items()):
    for row, (ti, ci, lab) in enumerate([(0, 1, "x"), (2, 3, "y")]):
        ax = axes[row, col]
        ax.plot(t, x[0, :, ti], lw=1, label="target")
        ax.plot(t, x[0, :, ci], lw=1, label="cursor")
        if row == 0:
            ax.set_title(name, fontsize=10)
        if col == 0:
            ax.set_ylabel(f"{lab} [arcmin]")
axes[0, 0].legend(frameon=False, fontsize=8)
axes[1, 0].set_xlabel("time [s]")
fig.tight_layout()"""),
    md("""The 2D paths make the agent differences visible at a glance: the
ideal observer's cursor is indistinguishable from the target, the bounded
actor trades lag for effort, and the subjective actor's velocity prior
produces characteristic overshoot."""),
]

DATA = [
    md("""# Real-data analysis: Bonnen et al. (2015)

The continuous-psychophysics dataset behind the reference's `Data.ipynb`
and `cpp_data_fit.py`: 120 tracking trials, 6 target blob widths (stimulus
uncertainty conditions) x 20 trials. This notebook reproduces the analysis
arc: cross-correlograms per condition, the hierarchical shared-parameter
fit, and the key scientific result - perceptual noise tracks stimulus
uncertainty."""),
    code(SETUP),
    code("""from lqg_tpu.io import load_tracking_data

data, blob_widths = load_tracking_data(delay=12, clip=180)
data.shape, blob_widths"""),
    md("""## Tracking lags by condition

Cross-correlograms of target vs cursor velocity: wider blobs (more
stimulus uncertainty) produce later, flatter CCG peaks."""),
    code("""from lqg_tpu.ccg import xcorr, fit_dog

vel = np.diff(np.asarray(data), axis=2)
fig, ax = plt.subplots(figsize=(6.5, 3.5))
for c, width in enumerate(blob_widths):
    lags, ccg = xcorr(vel[c, ..., 1], vel[c, ..., 0], maxlags=90)
    mean_ccg = np.asarray(ccg).mean(0)
    ax.plot(lags / 60, mean_ccg, lw=1, label=f"blob {width:.0f}")
    peak = int(lags[int(mean_ccg.argmax())])
    print(f"blob {width:5.1f}: CCG peak lag {peak:3d} frames")
ax.set(xlabel="lag [s]", ylabel="velocity correlation")
ax.legend(frameon=False, fontsize=8)
fig.tight_layout()"""),
    md("""## Hierarchical model fit

Shared motor parameters (`action_cost`, `action_variability`,
`sigma_cursor`) across conditions, per-condition perceptual noise
`sigma_target_c`. MAP here for speed; `scripts/fit_data.py` runs the full
NUTS posterior (all conditions evaluate in ONE vmapped graph - the
reference loops over conditions in Python)."""),
    code("""from lqg_tpu.models import BoundedActor
from lqg_tpu.infer.models import shared_params_lqg_model
from lqg_tpu.infer.svi import optimize

x = jnp.asarray(data)
model = shared_params_lqg_model(
    x, BoundedActor,
    shared_params=["action_cost", "action_variability", "sigma_cursor"])
params, losses = optimize(model, steps=1500, step_size=0.02)
print(f"loss {float(losses[0]):.1f} -> {float(losses[-1]):.1f}")
{k: round(float(v), 3) for k, v in params.items()}"""),
    md("""## Perceptual noise tracks stimulus uncertainty

The eLife paper's key panel: the fitted per-condition `sigma_target`
increases with the stimulus blob width."""),
    code("""sig = [float(params[f"sigma_target_{c}"])
       for c in range(len(blob_widths))]
fig, ax = plt.subplots(figsize=(4.5, 3.5))
ax.plot(blob_widths, sig, "o-")
ax.set(xlabel="target blob width [arcmin]",
       ylabel="fitted sigma_target [arcmin]")
fig.tight_layout()
rank_corr = np.corrcoef(np.argsort(np.argsort(blob_widths)),
                        np.argsort(np.argsort(sig)))[0, 1]
print(f"rank correlation (blob width vs fitted noise): {rank_corr:.2f}")"""),
]


def build(name, cells):
    from nbconvert.preprocessors import ExecutePreprocessor

    nb = nbf.v4.new_notebook()
    nb.cells = cells
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    ep = ExecutePreprocessor(timeout=1800, kernel_name="python3")
    ep.preprocess(nb, {"metadata": {"path": ROOT}})
    path = os.path.join(ROOT, "notebooks", name)
    with open(path, "w") as f:
        nbf.write(nb, f)
    print("wrote executed notebook:", path)


def main():
    os.makedirs(os.path.join(ROOT, "notebooks"), exist_ok=True)
    build("2D-Visualization.ipynb", VIZ2D)
    build("DataAnalysis.ipynb", DATA)


if __name__ == "__main__":
    main()
