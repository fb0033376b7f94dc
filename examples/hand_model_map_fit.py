"""Hand-motion model with a full MAP cost-parameter fit.

Covers BASELINE config 4: the hand-model variant fitted by MAP using both
the optax path (``max_likelihood``) and the scipy bridge
(``lqg_tpu.optim.minimize``), the reference's ``lqg/optim.py`` workflow.

    python examples/hand_model_map_fit.py [--platform cpu]
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
args = parser.parse_args()

import jax
if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
from jax import random

from lqg_tpu.models import HandMotionModelTrackingTask
from lqg_tpu.infer.models import lqg_model
from lqg_tpu.infer.mle import max_likelihood
from lqg_tpu.infer.priors import DEFAULT_PRIOR
from lqg_tpu.optim import minimize

true = dict(action_cost=0.8, sigma_target=8.0)
model = HandMotionModelTrackingTask(T=500, **true)
x = model.simulate(random.PRNGKey(0), n=10)[..., :2]
print("data:", x.shape)

# physical constants (m, tau) and nuisance noises are fixed; the MAP fit
# estimates the cost and target-noise parameters
FIXED = dict(action_variability=0.5, sigma_cursor=6.0, m=1.0, tau=0.04)

# --- MAP via optax (gradient ascent on log prior + log likelihood) ---
params, losses = max_likelihood(
    x, model=HandMotionModelTrackingTask,
    model_fn=lambda *a, **k: lqg_model(*a, priors=DEFAULT_PRIOR, **k),
    steps=600, step_size=0.02, **FIXED)
print("MAP (optax):", {k: round(float(v), 3) for k, v in params.items()},
      "| true:", true)

# --- MAP via the scipy bridge on the same objective ---
prob = lqg_model(x, HandMotionModelTrackingTask, priors=DEFAULT_PRIOR,
                 **FIXED)
res = minimize(lambda u: prob.potential(u), prob.init_unconstrained(),
               method="BFGS", options=dict(maxiter=100))
print("MAP (scipy BFGS):",
      {k: round(float(v), 3) for k, v in prob.constrain(res.x).items()},
      f"| converged: {res.success}")
