"""2D tracking model visualization (reference ``2D-Visualization.ipynb``).

Simulates dim=2 variants - ideal observer, optimal actor, bounded actor,
subjective actor - and plots horizontal/vertical cursor vs target paths.

    python examples/visualization_2d.py [--platform cpu] [--no-plot]
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--plot", action=argparse.BooleanOptionalAction,
                    default=True)
args = parser.parse_args()

import jax
if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
from jax import random

from lqg_tpu.models import BoundedActor, OptimalActor, SubjectiveActor

sigma_target = 20.0
T = 500

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
    print(f"{name:18s} rms tracking error: {err:.2f}")

if args.plot:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(trajs), figsize=(4 * len(trajs), 4))
    for ax, (name, x) in zip(axes, trajs.items()):
        ax.plot(x[2, :, 0], x[2, :, 2], color="k", label="target")
        ax.plot(x[2, :, 1], x[2, :, 3], label="cursor")
        ax.set_title(name)
        ax.legend()
    fig.savefig("2d_models.png", dpi=100)
    print("saved 2d_models.png")
