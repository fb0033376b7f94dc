"""A/B the likelihood implementations on the NUTS-shaped workload.

Measures value+grad of the negative log likelihood (the quantity NUTS
evaluates per leapfrog step) for the fused Pallas kernel vs the XLA scan,
single-chain and 16-chain-vmapped, on the current default backend.

Result on one TPU chip (2026-08-20, BoundedActor T=1000, n=20 trials):

    16-chain vmap parity: rel 3.9e-4 (f32 kernel vs scan)
    16-chain vmap grad [fused]: 40.5 ms/iter
    16-chain vmap grad [scan]:  67.8 ms/iter     -> fused 1.67x faster
    1-chain grad [fused]:       28.4 ms/iter

which is why ``System.log_likelihood(method="auto")`` picks the fused kernel
on TPU.

Usage: python scripts/profiling/ab_likelihood.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import jax

_cache = os.path.expanduser(f"~/.cache/jax_lqg-{jax.__version__}")
os.makedirs(_cache, exist_ok=True)

jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax, random

from lqg_tpu.models import BoundedActor

T, N_TRIALS, N_CHAINS, REPS = 1000, 20, 16, 10


def timed_loop(make_step, name, *args, reps=REPS):
    """Time ``make_step`` inside a device-side scan (hides dispatch)."""

    @jax.jit
    def run(*args):
        def body(c, _):
            return make_step(c, *args), None

        acc, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    run(*args).block_until_ready()  # compile
    t0 = time.perf_counter()
    n_outer = 3
    for _ in range(n_outer):
        run(*args).block_until_ready()
    per_iter_ms = (time.perf_counter() - t0) / (n_outer * reps) * 1e3
    print(f"{name}: {per_iter_ms:.3f} ms/iter")


def nll(params, x, method):
    model = BoundedActor(T=T, **params)
    return -model.log_likelihood(x, method=method).sum()


def main():
    model = BoundedActor(T=T)
    x = model.simulate(random.PRNGKey(0), n=N_TRIALS)

    p1 = dict(action_cost=jnp.float32(0.5),
              action_variability=jnp.float32(0.5),
              sigma_target=jnp.float32(6.0), sigma_cursor=jnp.float32(2.0))
    chains = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (N_CHAINS,))
        * jnp.linspace(0.8, 1.2, N_CHAINS), p1)

    v_fused = jax.vmap(lambda p: nll(p, x, "fused"))(chains)
    v_scan = jax.vmap(lambda p: nll(p, x, "scan"))(chains)
    rel = float(jnp.abs((v_fused - v_scan) / v_scan).max())
    print(f"{N_CHAINS}-chain vmap parity: "
          f"abs {float(jnp.abs(v_fused - v_scan).max()):.4g} rel {rel:.4g}")

    for method in ("fused", "scan"):
        def step(c, ps, xx, method=method):
            # data-dependent perturbation defeats CSE across scan iterations
            pp = jax.tree.map(lambda a: a + c * 1e-20, ps)
            v, g = jax.vmap(
                jax.value_and_grad(lambda p: nll(p, xx, method)))(pp)
            return jnp.sum(v) + sum(jnp.sum(w) for w in g.values())

        timed_loop(step, f"{N_CHAINS}-chain vmap grad [{method}]", chains, x)

    def step1(c, xx):
        p = jax.tree.map(lambda a: a + c * 1e-20, p1)
        v, g = jax.value_and_grad(lambda p: nll(p, xx, "fused"))(p)
        return v + sum(jnp.sum(w) for w in g.values())

    timed_loop(step1, "1-chain grad [fused]", x)


if __name__ == "__main__":
    main()
