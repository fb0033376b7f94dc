"""Native JAX probability distributions.

The reference delegates distributions to NumPyro; this framework ships its own
minimal, fully jittable distribution objects (NumPyro is not a dependency).
The API mirrors the familiar surface: ``log_prob``, ``sample``, ``mean``,
plus ``shape()`` for the sequence distributions used by the likelihood layer
(parity with reference usage at ``lqg/system.py:237-257`` and
``lqg/infer/prior.py:7-24``).

All distributions are pytrees (register via NamedTuple-style dataclasses), so
they flow through ``jit``/``vmap`` unharmed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
from jax import random

_LOG_2PI = math.log(2.0 * math.pi)
_LOG_SQRT_2_OVER_PI = 0.5 * math.log(2.0 / math.pi)


def _register(cls):
    """Register a dataclass distribution as a JAX pytree."""
    names = [f.name for f in fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: ([getattr(obj, n) for n in names], None),
        lambda aux, children: cls(*children),
    )
    return cls


class Distribution:
    """Minimal distribution interface."""

    def log_prob(self, value):
        raise NotImplementedError

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def sample_with_shape(self, key, shape):
        return self.sample(key, shape)

    @property
    def median(self):
        """Closed-form median; NUTS/SVI initialize here (robustness parity
        with the reference's ``init_to_median``,
        ``lqg/infer/utils.py:18``)."""
        raise NotImplementedError


@_register
@dataclass(frozen=True)
class Normal(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale))
        return self.loc + self.scale * random.normal(key, shape)

    @property
    def mean(self):
        return self.loc

    @property
    def median(self):
        return self.loc


@_register
@dataclass(frozen=True)
class HalfNormal(Distribution):
    """|N(0, scale^2)| - matches numpyro.distributions.HalfNormal."""

    scale: jnp.ndarray = 1.0

    def log_prob(self, value):
        z = value / self.scale
        lp = -0.5 * z * z + _LOG_SQRT_2_OVER_PI - jnp.log(self.scale)
        return jnp.where(value >= 0, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.shape(self.scale)
        return jnp.abs(random.normal(key, shape)) * self.scale

    @property
    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi)

    @property
    def median(self):
        # sqrt(2) * erfinv(1/2)
        return self.scale * 0.6744897501960817


@_register
@dataclass(frozen=True)
class LogNormal(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, value):
        logv = jnp.log(value)
        z = (logv - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale) - logv

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale))
        return jnp.exp(self.loc + self.scale * random.normal(key, shape))

    @property
    def mean(self):
        return jnp.exp(self.loc + 0.5 * self.scale**2)

    @property
    def median(self):
        return jnp.exp(self.loc)


@_register
@dataclass(frozen=True)
class Uniform(Distribution):
    low: jnp.ndarray = 0.0
    high: jnp.ndarray = 1.0

    def log_prob(self, value):
        lp = -jnp.log(self.high - self.low)
        inside = (value >= self.low) & (value <= self.high)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.low), jnp.shape(self.high))
        return random.uniform(key, shape, minval=self.low, maxval=self.high)

    @property
    def mean(self):
        return 0.5 * (self.low + self.high)

    @property
    def median(self):
        return 0.5 * (self.low + self.high)


@_register
@dataclass(frozen=True)
class MultivariateNormal(Distribution):
    """Dense multivariate normal parameterized by covariance."""

    loc: jnp.ndarray
    covariance_matrix: jnp.ndarray

    @property
    def scale_tril(self):
        return jnp.linalg.cholesky(self.covariance_matrix)

    def log_prob(self, value):
        chol = self.scale_tril
        diff = value - self.loc
        w = jax.lax.linalg.triangular_solve(
            chol, diff[..., None], left_side=True, lower=True)[..., 0]
        d = self.loc.shape[-1]
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * (jnp.sum(w * w, axis=-1) + logdet + d * _LOG_2PI)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.loc.shape
        eps = random.normal(key, shape)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    @property
    def mean(self):
        return self.loc

    @property
    def median(self):
        # symmetric: median == mean (keeps `init at prior.median` working
        # for models whose priors dict contains an MVN site)
        return self.loc

    def shape(self):
        return self.loc.shape


@_register
@dataclass(frozen=True)
class GaussianSequence(Distribution):
    """A sequence of multivariate normals with the time axis as an event axis.

    Equivalent to the reference's
    ``MultivariateNormal(mu, Sigma).to_event(1)`` (``lqg/system.py:244``):
    ``log_prob`` sums over the trailing time axis of per-step MVN log
    densities.  ``loc``: ``(..., T, d)``; ``covariance``: ``(..., T, d, d)``.
    """

    loc: jnp.ndarray
    covariance_matrix: jnp.ndarray

    def _mvn(self):
        return MultivariateNormal(self.loc, self.covariance_matrix)

    def log_prob(self, value):
        return jnp.sum(self._mvn().log_prob(value), axis=-1)

    def sample(self, key, sample_shape=()):
        return self._mvn().sample(key, sample_shape)

    @property
    def mean(self):
        return self.loc

    @property
    def median(self):
        return self.loc

    def shape(self):
        return self.loc.shape
