"""Native No-U-Turn Sampler (NUTS), fully jittable.

The reference delegates NUTS to NumPyro (``lqg/infer/utils.py:14-39``); this
module implements the sampler natively so the whole inference loop - model
construction, likelihood, gradients, tree building - compiles into one XLA
program and runs on-device.

Algorithm: iterative NUTS with multinomial (biased progressive) sampling and
the generalized no-U-turn criterion, equivalent to the scheme used by
Stan/NumPyro:

* trajectory doubling with a ``lax.while_loop`` over tree depth,
* each new half-tree built leaf-by-leaf with a ``fori_loop``,
* internal (balanced-subtree) U-turn checks via the checkpoint-stack
  algorithm: even leaves store (momentum, running momentum sum) in one of
  ``max_depth`` slots keyed by the leaf index's bit pattern; odd leaves close
  all subtrees ending at them and test each for a U-turn,
* divergence check at ``delta_energy > max_delta_energy`` (1000).

Everything is shaped for ``vmap`` over chains; there is no data-dependent
Python control flow.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random


class IntegratorState(NamedTuple):
    z: jnp.ndarray        # position
    r: jnp.ndarray        # momentum
    pe: jnp.ndarray       # potential energy at z
    grad: jnp.ndarray     # d pe / d z


def velocity(inv_mass, r):
    """dz/dt = M^-1 r.  ``inv_mass`` is either the DIAGONAL of M^-1
    (shape ``(zdim,)``) or, for a dense metric, the lower-Cholesky factor
    ``L`` of M^-1 = Sigma = L L^T (shape ``(zdim, zdim)``)."""
    if inv_mass.ndim == 1:
        return inv_mass * r
    return inv_mass @ (inv_mass.T @ r)


def kinetic(inv_mass, r):
    """0.5 r^T M^-1 r for either mass representation."""
    if inv_mass.ndim == 1:
        return 0.5 * jnp.sum(inv_mass * r * r)
    w = inv_mass.T @ r
    return 0.5 * jnp.sum(w * w)


def sample_momentum(rng_key, inv_mass, shape):
    """r ~ N(0, M).  Dense: M = (L L^T)^-1, so r = L^-T eps."""
    eps = random.normal(rng_key, shape)
    if inv_mass.ndim == 1:
        return eps / jnp.sqrt(inv_mass)
    return jax.scipy.linalg.solve_triangular(inv_mass.T, eps, lower=False)


def leapfrog(potential_fn: Callable, inv_mass: jnp.ndarray, step_size,
             state: IntegratorState) -> IntegratorState:
    """One velocity-Verlet step (diagonal or dense inverse mass)."""
    r = state.r - 0.5 * step_size * state.grad
    z = state.z + step_size * velocity(inv_mass, r)
    pe, grad = jax.value_and_grad(potential_fn)(z)
    r = r - 0.5 * step_size * grad
    return IntegratorState(z=z, r=r, pe=pe, grad=grad)


def _uturn(inv_mass, r_left, r_right, rho):
    """Generalized U-turn criterion on a trajectory span."""
    v_left = velocity(inv_mass, r_left)
    v_right = velocity(inv_mass, r_right)
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


class _TreeState(NamedTuple):
    # trajectory edges (left = backward end, right = forward end)
    left: IntegratorState
    right: IntegratorState
    # proposal
    z_prop: jnp.ndarray
    pe_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    # multinomial weight of the whole tree: logsumexp(-energy + energy0)
    log_weight: jnp.ndarray
    rho: jnp.ndarray          # sum of momenta over all leaves
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray   # sum of min(1, exp(-delta_energy)) over leaves
    num_leaves: jnp.ndarray


def _build_subtree(potential_fn, inv_mass, step_size, direction, depth,
                   max_depth, edge: IntegratorState, energy0, rng_key,
                   max_delta_energy):
    """Extend the trajectory by ``2**depth`` leapfrog steps from ``edge``.

    ``depth`` may be a traced integer: the leaf loop has a dynamic trip
    count, so the (large) leapfrog graph is instantiated exactly once in the
    compiled program regardless of ``max_depth``.

    Returns a :class:`_TreeState` for the new half-tree (its ``left`` is the
    leaf nearest the old tree, ``right`` the far end, regardless of
    direction; callers re-orient).
    """
    n_leaf = jnp.asarray(1, jnp.int32) << depth
    zdim = edge.z.shape[0]

    # checkpoint stacks for the internal U-turn checks
    r_ckpts = jnp.zeros((max_depth + 1, zdim))
    rho_ckpts = jnp.zeros((max_depth + 1, zdim))

    eps = jnp.where(direction > 0, step_size, -step_size)

    def leaf_step(i, carry):
        (state, tree, r_ckpts, rho_ckpts, key) = carry
        key, sub = random.split(key)

        state = leapfrog(potential_fn, inv_mass, eps, state)
        energy = state.pe + kinetic(inv_mass, state.r)
        delta = energy - energy0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        diverging = delta > max_delta_energy
        log_w = -delta

        # --- multinomial progressive sampling within the subtree ---
        new_log_weight = jnp.logaddexp(tree.log_weight, log_w)
        accept_prob = jnp.exp(log_w - new_log_weight)
        take = random.uniform(sub) < accept_prob
        z_prop = jnp.where(take, state.z, tree.z_prop)
        pe_prop = jnp.where(take, state.pe, tree.pe_prop)
        grad_prop = jnp.where(take, state.grad, tree.grad_prop)

        rho_before = tree.rho
        rho_after = rho_before + state.r

        # --- checkpoint store (even leaves) ---
        def popcount(n):
            def body(c):
                n, acc = c
                return (n >> 1, acc + (n & 1))
            _, acc = lax.while_loop(lambda c: c[0] > 0, body,
                                    (n, jnp.zeros_like(n)))
            return acc

        is_even = (i & 1) == 0
        ckpt_idx = popcount(i)

        r_ckpts = jnp.where(is_even,
                            r_ckpts.at[ckpt_idx].set(state.r), r_ckpts)
        rho_ckpts = jnp.where(is_even,
                              rho_ckpts.at[ckpt_idx].set(rho_before),
                              rho_ckpts)

        # --- internal U-turn checks (odd leaves) ---
        def trailing_ones(n):
            def body(c):
                n, acc = c
                return (n >> 1, acc + 1)
            _, acc = lax.while_loop(lambda c: (c[0] & 1) != 0, body,
                                    (n, jnp.zeros_like(n)))
            return acc

        idx_max = popcount(i >> 1)
        idx_min = idx_max - trailing_ones(i) + 1

        def check_slot(k, turning):
            in_range = (k >= idx_min) & (k <= idx_max)
            rho_span = rho_after - rho_ckpts[k]
            t = _uturn(inv_mass, r_ckpts[k], state.r, rho_span)
            return turning | (in_range & t)

        subturn = lax.fori_loop(0, max_depth + 1, check_slot,
                                jnp.asarray(False))
        turning = tree.turning | jnp.where(is_even, False, subturn)

        new_tree = _TreeState(
            left=jax.tree.map(lambda a, b: jnp.where(i == 0, b, a),
                              tree.left, state),
            right=state,
            z_prop=z_prop, pe_prop=pe_prop, grad_prop=grad_prop,
            log_weight=new_log_weight,
            rho=rho_after,
            turning=turning,
            diverging=tree.diverging | diverging,
            sum_accept=tree.sum_accept + jnp.minimum(1.0, jnp.exp(-delta)),
            num_leaves=tree.num_leaves + 1,
        )

        # freeze the tree once turning/diverging (later leaves are discarded)
        stop = tree.turning | tree.diverging
        out_tree = jax.tree.map(
            lambda old, new: jnp.where(stop, old, new), tree, new_tree)
        out_state = jax.tree.map(
            lambda old, new: jnp.where(stop, old, new),
            carry[0], state)

        return (out_state, out_tree, r_ckpts, rho_ckpts, key)

    init_tree = _TreeState(
        left=edge, right=edge,
        z_prop=edge.z, pe_prop=edge.pe, grad_prop=edge.grad,
        log_weight=jnp.asarray(-jnp.inf),
        rho=jnp.zeros_like(edge.r),
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0), num_leaves=jnp.asarray(0.0),
    )

    (_, tree, _, _, _) = lax.fori_loop(
        0, n_leaf, leaf_step, (edge, init_tree, r_ckpts, rho_ckpts, rng_key))
    return tree


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray
    num_steps: jnp.ndarray
    diverging: jnp.ndarray
    energy: jnp.ndarray
    tree_depth: jnp.ndarray


def nuts_step(potential_fn: Callable, rng_key, z, pe, grad, step_size,
              inv_mass, max_depth: int = 10,
              max_delta_energy: float = 1000.0, depth_cap=None):
    """One NUTS transition.  Returns ``(z', pe', grad', NUTSInfo)``.

    ``depth_cap`` may be a *traced* integer <= ``max_depth``: the tree stops
    doubling at that depth while the compiled program (checkpoint-stack
    sizes, loop structure) stays fixed by the static ``max_depth``.  The
    MCMC driver uses this to cap early-warmup trees cheaply (a per-step
    schedule) without recompiling.
    """
    if depth_cap is None:
        depth_cap = max_depth
    depth_cap = jnp.minimum(jnp.asarray(depth_cap, jnp.int32), max_depth)
    key_mom, key_tree = random.split(rng_key)

    r0 = sample_momentum(key_mom, inv_mass, z.shape)
    energy0 = pe + kinetic(inv_mass, r0)
    state0 = IntegratorState(z=z, r=r0, pe=pe, grad=grad)

    init = dict(
        left=state0, right=state0,
        z_prop=z, pe_prop=pe, grad_prop=grad,
        log_weight=jnp.asarray(0.0),
        rho=r0,
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0), num_leaves=jnp.asarray(0.0),
        depth=jnp.asarray(0, dtype=jnp.int32),
        key=key_tree,
    )

    def cond(c):
        return ((c["depth"] < depth_cap)
                & ~c["turning"] & ~c["diverging"])

    def body(c):
        key, key_dir, key_sub, key_accept = random.split(c["key"], 4)
        direction = jnp.where(random.bernoulli(key_dir), 1, -1)

        edge = jax.tree.map(
            lambda l, r: jnp.where(direction > 0, r, l),
            c["left"], c["right"])
        # the subtree is built with depth = current tree depth (same size)
        sub = _build_subtree(
            potential_fn, inv_mass, step_size, direction, c["depth"],
            max_depth, edge, energy0, key_sub, max_delta_energy)

        ok = ~(sub.turning | sub.diverging)

        # biased progressive sampling: move to the new half with
        # prob min(1, W_new / W_old)
        accept_prob = jnp.exp(jnp.minimum(
            0.0, sub.log_weight - c["log_weight"]))
        take = (random.uniform(key_accept) < accept_prob) & ok

        z_prop = jnp.where(take, sub.z_prop, c["z_prop"])
        pe_prop = jnp.where(take, sub.pe_prop, c["pe_prop"])
        grad_prop = jnp.where(take, sub.grad_prop, c["grad_prop"])

        # merge edges / rho only when the subtree is valid
        new_left = jax.tree.map(
            lambda old, new: jnp.where(ok & (direction < 0), new, old),
            c["left"], sub.right)
        new_right = jax.tree.map(
            lambda old, new: jnp.where(ok & (direction > 0), new, old),
            c["right"], sub.right)
        rho = jnp.where(ok, c["rho"] + sub.rho, c["rho"])

        turning_total = _uturn(inv_mass, new_left.r, new_right.r, rho)

        return dict(
            left=new_left, right=new_right,
            z_prop=z_prop, pe_prop=pe_prop, grad_prop=grad_prop,
            log_weight=jnp.where(ok, jnp.logaddexp(c["log_weight"],
                                                   sub.log_weight),
                                 c["log_weight"]),
            rho=rho,
            turning=sub.turning | (ok & turning_total),
            diverging=sub.diverging,
            sum_accept=c["sum_accept"] + sub.sum_accept,
            num_leaves=c["num_leaves"] + sub.num_leaves,
            depth=c["depth"] + 1,
            key=key,
        )

    final = lax.while_loop(cond, body, init)

    accept_prob = final["sum_accept"] / jnp.maximum(1.0, final["num_leaves"])
    info = NUTSInfo(accept_prob=accept_prob,
                    num_steps=final["num_leaves"],
                    diverging=final["diverging"],
                    energy=final["pe_prop"],
                    tree_depth=final["depth"])
    return final["z_prop"], final["pe_prop"], final["grad_prop"], info
