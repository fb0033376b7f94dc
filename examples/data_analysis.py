"""Real-data analysis: the Bonnen et al. (2015) tracking dataset.

Runnable equivalent of the reference's ``Data.ipynb``: load the continuous
psychophysics dataset, look at per-condition cross-correlograms, fit the
hierarchical shared-parameter model across blob-width conditions (MAP for
speed here; ``scripts/fit_data.py`` runs the full NUTS fit), and inspect the
per-condition perceptual noise estimates against the blob widths.

    python examples/data_analysis.py [--platform cpu] [--quick]
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--quick", action="store_true",
                    help="subsample trials/time for a fast smoke run")
args = parser.parse_args()

import jax
if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

from lqg_tpu.io import load_tracking_data
from lqg_tpu.ccg import xcorr, fit_dog
from lqg_tpu.models import BoundedActor
from lqg_tpu.infer.models import shared_params_lqg_model
from lqg_tpu.infer.svi import optimize

# --- 1. load + preprocess (6 blob-width conditions x 20 trials) ---
data, blob_widths = load_tracking_data(delay=12, clip=180)
print("data:", data.shape, "blob widths:", blob_widths)

if args.quick:
    data = data[:, :6, :301]

# --- 2. tracking lag per condition via cross-correlograms of velocities ---
vel = np.diff(np.asarray(data), axis=2)
for c, width in enumerate(blob_widths):
    lags, ccg = xcorr(vel[c, ..., 1], vel[c, ..., 0], maxlags=90)
    mean_ccg = np.asarray(ccg).mean(0)
    peak = int(lags[int(mean_ccg.argmax())])
    try:
        p = fit_dog(lags, mean_ccg)
        mu1 = f"{p['mu1']:.1f}"
    except RuntimeError:
        mu1 = "n/a"
    print(f"condition {c} (blob {width:5.1f}): CCG peak lag {peak:3d} "
          f"frames, DoG center {mu1}")

# --- 3. hierarchical model: shared motor parameters, per-condition
# perceptual noise (the reference's cpp_data_fit.py workflow) ---
x = jnp.asarray(data)
model = shared_params_lqg_model(
    x, BoundedActor,
    shared_params=["action_cost", "action_variability", "sigma_cursor"])
print("free parameters:", model.names)

params, losses = optimize(model, steps=200 if args.quick else 1500,
                          step_size=0.02)
print(f"MAP optimization: loss {float(losses[0]):.1f} -> "
      f"{float(losses[-1]):.1f}")

# --- 4. perceptual noise should grow with blob width ---
sig = [float(params[f"sigma_target_{c}"]) for c in range(len(blob_widths))]
print("\nblob width -> fitted sigma_target:")
for width, s in zip(blob_widths, sig):
    print(f"  {width:5.1f} -> {s:6.2f}")
rank_corr = np.corrcoef(np.argsort(np.argsort(blob_widths)),
                        np.argsort(np.argsort(sig)))[0, 1]
print(f"rank correlation: {rank_corr:.2f} (the eLife result: perceptual "
      f"uncertainty tracks stimulus uncertainty)")
