"""scipy.optimize bridge for JAX objectives.

Capability parity with reference ``lqg/optim.py``: wrap
``scipy.optimize.minimize`` for pytree-structured JAX objectives -
``ravel_pytree`` flattens arguments, ``jit(grad(fun))`` supplies the
Jacobian, and callbacks receive re-pytree'd iterates.

Unlike the reference (which globally forces ``jax_enable_x64`` via a stale
import, ``optim.py:9-11``), precision is left to the caller's policy; scipy
receives float64 copies either way.
"""

from __future__ import annotations

import numpy as onp
import scipy.optimize

from jax import grad, jit
from jax.flatten_util import ravel_pytree


def minimize(fun, x0, method=None, args=(), bounds=None, constraints=(),
             tol=None, callback=None, options=None):
    """Minimize a scalar JAX function of a pytree argument.

    Args:
        fun: objective ``fun(x, *args) -> float`` written in JAX.
        x0: initial guess as a pytree.
        method/bounds/constraints/tol/options: forwarded to
            ``scipy.optimize.minimize`` (bounds/constraints must be given in
            the flattened coordinate order).
        callback: receives the pytree-structured iterate.

    Returns:
        ``scipy.optimize.OptimizeResult`` with ``res.x`` re-pytree'd.
    """
    x0_flat, unravel = ravel_pytree(x0)

    def fun_wrapper(x_flat, *args):
        x = unravel(x_flat)
        return float(fun(x, *args))

    grad_fun = jit(grad(fun))

    def jac_wrapper(x_flat, *args):
        x = unravel(x_flat)
        g_flat, _ = ravel_pytree(grad_fun(x, *args))
        return onp.asarray(g_flat, dtype=onp.float64)

    def callback_wrapper(x_flat, *cb_args):
        if callback is not None:
            return callback(unravel(x_flat), *cb_args)

    results = scipy.optimize.minimize(
        fun_wrapper, onp.asarray(x0_flat, dtype=onp.float64),
        args=args, method=method, jac=jac_wrapper, bounds=bounds,
        constraints=constraints, tol=tol,
        callback=None if callback is None else callback_wrapper,
        options=options)

    results["x"] = unravel(results["x"])
    return results
