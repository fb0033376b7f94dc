"""Signal-dependent (control-multiplicative) noise tracking model.

The bounded actor with Harris & Wolpert (1998)-style motor noise: the
cursor's motor variability scales with the magnitude of the control signal,
``noise = action_variability * eps + signal_dep_noise * eps' * u``.

The optimal controller under multiplicative noise (Todorov 2005) is more
conservative than plain LQR - large controls are penalized for the extra
noise they inject (see :func:`lqg_tpu.ops.riccati.backward_multiplicative`).

This is a greenfield capability: the reference reserves the
``signal_dep_noise`` prior (``lqg/infer/prior.py:11``) but ships no model
that uses it.

Likelihood note: the marginalized trajectory likelihood treats the noise
covariance at its baseline (additive) level while the *gains* reflect the
signal-dependent penalty - i.e. the behavioral signature of signal-dependent
noise (conservative control) enters the likelihood exactly, while the
state-dependent noise inflation is approximated as constant.  The rollout
(``simulate``) carries the exact multiplicative noise.
"""

from __future__ import annotations

import jax.numpy as jnp

from lqg_tpu.system import System
from lqg_tpu.models.basic import tracking_spec, _per_dim_blockdiag


class SignalDependentNoiseActor(System):
    def __init__(self, dim=1, process_noise=1.0, action_variability=0.5,
                 signal_dep_noise=0.5, sigma_target=6.0, sigma_cursor=6.0,
                 action_cost=1.0, dt=1.0 / 60.0, T=1000):
        self.dim = dim
        self.process_noise = process_noise
        spec = tracking_spec(dim, process_noise, action_variability,
                             sigma_target, sigma_cursor, action_cost, dt)
        # one noise channel: control-proportional noise along the cursor
        # axis, scaled like the control input itself (dt * u)
        C = (jnp.asarray(signal_dep_noise, jnp.result_type(float))
             * dt * _per_dim_blockdiag(jnp.array([[0.0], [1.0]]), dim))[None]
        super().__init__(actor=spec, dynamics=spec, horizon=T,
                         control_noise=C)
