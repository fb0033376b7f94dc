"""Bijective transforms between constrained and unconstrained spaces.

NUTS and SVI operate on unconstrained vectors; model parameters live in
constrained spaces (positivity, intervals).  Each transform maps
unconstrained -> constrained and supplies the log|det Jacobian| needed for
the change of variables (the role NumPyro's ``biject_to`` plays in the
reference stack).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import softplus


class Transform:
    def forward(self, u):
        raise NotImplementedError

    def inverse(self, x):
        raise NotImplementedError

    def log_abs_det_jacobian(self, u):
        """log |d forward(u) / du| evaluated at unconstrained u."""
        raise NotImplementedError


class Identity(Transform):
    def forward(self, u):
        return u

    def inverse(self, x):
        return x

    def log_abs_det_jacobian(self, u):
        return jnp.zeros_like(u)


class Exp(Transform):
    """u -> exp(u): the canonical positivity transform."""

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def log_abs_det_jacobian(self, u):
        return u


class Softplus(Transform):
    """u -> log(1 + exp(u)): positivity with linear tails (less prone to
    overflow in long NUTS trajectories than Exp)."""

    def forward(self, u):
        return softplus(u)

    def inverse(self, x):
        # stable inverse-softplus
        return x + jnp.log(-jnp.expm1(-x))

    def log_abs_det_jacobian(self, u):
        # d softplus(u)/du = sigmoid(u); log sigmoid(u) = -softplus(-u)
        return -softplus(-u)


class Sigmoid(Transform):
    """u -> low + (high - low) * sigmoid(u): interval transform."""

    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high

    def forward(self, u):
        return self.low + (self.high - self.low) * jnp.reciprocal(
            1.0 + jnp.exp(-u))

    def inverse(self, x):
        p = (x - self.low) / (self.high - self.low)
        return jnp.log(p) - jnp.log1p(-p)

    def log_abs_det_jacobian(self, u):
        return (jnp.log(self.high - self.low)
                - softplus(-u) - softplus(u))


positive = Exp()
identity = Identity()
