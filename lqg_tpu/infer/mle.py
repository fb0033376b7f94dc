"""Maximum-likelihood estimation of LQG model parameters.

API parity with reference ``lqg/infer/mle.py``: Adam for ``steps`` steps on
the trajectory likelihood, returning ``(params, losses)``.
"""

from __future__ import annotations

from lqg_tpu.infer.models import lqg_model
from lqg_tpu.infer.svi import optimize


def max_likelihood(x, model=None, model_fn=lqg_model, process_noise=1.0,
                   dt=1.0 / 60, steps=2000, step_size=0.01, **fixed):
    """MLE via gradient ascent (reference ``mle.py:14-25``).

    Args:
        x: observed trajectories ``(n, T+1, d)``.
        model: model class (defaults to ``BoundedActor``).
        model_fn: model builder (``lqg_model`` or compatible).
        **fixed: parameters to fix instead of estimating.

    Returns:
        ``(params, losses)`` - constrained parameter estimates and the loss
        trace.
    """
    if model is None:
        from lqg_tpu.models import BoundedActor as model

    prob_model = model_fn(x, model, process_noise=process_noise, dt=dt,
                          **fixed)
    return optimize(prob_model, steps=steps, step_size=step_size)
