"""Build and execute ``notebooks/HandModel.ipynb``.

Completes notebook-count parity with the reference's four notebooks
(``/root/reference/notebooks/HandModel.ipynb`` defines this model inline
and never ships it in the package; here it IS a package model,
``lqg_tpu/models/hand.py``).  Content mirrors
``examples/hand_model_map_fit.py``: simulate the 5-state hand-motion
tracking model and fit its cost parameters by MAP, via both the optax path
and the scipy bridge.

Usage: python scripts/make_hand_notebook.py  (CPU; ~3 min)
"""

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

CELLS = [
    md("""# Hand-motion tracking model

A physically richer cursor: per tracked dimension, five states - target
position, hand position, hand velocity, and a second-order muscle
activation pair - with the control acting through the muscle dynamics
(the reference defines this model inline in its `HandModel.ipynb`; here it
ships in the package as `HandMotionModelTrackingTask`). The system is
discretized exactly (zero-order-hold matrix exponential) with van-Loan
process noise."""),
    code("""import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
if os.environ.get("TUTORIAL_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt
from jax import random

from lqg_tpu.models import HandMotionModelTrackingTask

true = dict(action_cost=0.8, sigma_target=8.0)
model = HandMotionModelTrackingTask(T=500, **true)
model"""),
    code("""x = model.simulate(random.PRNGKey(0), n=10)
fig, ax = plt.subplots(figsize=(7, 3))
t = np.arange(x.shape[1]) / 60
ax.plot(t, x[0, :, 0], lw=1, label="target")
ax.plot(t, x[0, :, 1], lw=1, label="hand")
ax.set(xlabel="time [s]", ylabel="position [arcmin]")
ax.legend(frameon=False); fig.tight_layout()
x.shape"""),
    md("""## MAP parameter fit

Only target and hand position are scored (the muscle states are latent).
The physical constants (mass, muscle time constant) and nuisance noises
are fixed; the fit recovers the cost and target-noise parameters. Two
optimizers on the same `ProbModel` objective: optax Adam
(`max_likelihood`) and the scipy bridge (`lqg_tpu.optim.minimize`, the
reference's `lqg/optim.py` workflow) with autodiff Jacobians."""),
    code("""from lqg_tpu.infer.models import lqg_model
from lqg_tpu.infer.mle import max_likelihood
from lqg_tpu.infer.priors import DEFAULT_PRIOR
from lqg_tpu.optim import minimize

xs = x[..., :2]
FIXED = dict(action_variability=0.5, sigma_cursor=6.0, m=1.0, tau=0.04)

params, losses = max_likelihood(
    xs, model=HandMotionModelTrackingTask,
    model_fn=lambda *a, **k: lqg_model(*a, priors=DEFAULT_PRIOR, **k),
    steps=600, step_size=0.02, **FIXED)
print("true:", true)
{k: round(float(v), 3) for k, v in params.items()}"""),
    code("""prob = lqg_model(xs, HandMotionModelTrackingTask, priors=DEFAULT_PRIOR,
                 **FIXED)
res = minimize(lambda u: prob.potential(u), prob.init_unconstrained(),
               method="BFGS", options=dict(maxiter=100))
print("converged:", bool(res.success))
{k: round(float(v), 3) for k, v in prob.constrain(res.x).items()}"""),
    md("""Both optimizers land on the same MAP point, recovering the
generating parameters - the whole chain (physical constants -> exact
discretization -> gains -> marginalized likelihood) is one differentiable
XLA graph, so either first-order (Adam) or quasi-Newton (BFGS with
autodiff gradients) applies."""),
]


def main():
    from nbconvert.preprocessors import ExecutePreprocessor

    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    ep = ExecutePreprocessor(timeout=1800, kernel_name="python3")
    ep.preprocess(nb, {"metadata": {"path": ROOT}})
    path = os.path.join(ROOT, "notebooks", "HandModel.ipynb")
    with open(path, "w") as f:
        nbf.write(nb, f)
    print("wrote executed notebook:", path)


if __name__ == "__main__":
    main()
