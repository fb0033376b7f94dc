"""Break down the fused-likelihood leapfrog cost on TPU.

Measures, for the BoundedActor T=1000 workload: the fused forward kernel
alone, the backward path alone (which re-runs the forward to regenerate
stores, then runs the adjoint kernel), full value+grad, the fused gains
primal, and the XLA joint-assembly overhead - to locate the 17.6 ms/leapfrog
(BENCH_notes_r3.json) and test whether XLA CSE merges the duplicated
forward kernel inside value_and_grad.

Usage: python scripts/profiling/ll_breakdown.py
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
from lqg_tpu.ops.linalg import mT
from lqg_tpu.ops.pallas import likelihood as pll

T, N, REPS = 1000, 20, 10


def timed(fn, name, *args, reps=REPS):
    @jax.jit
    def run(*a):
        def body(c, _):
            return c + fn(a[0] + 0.0 * c, *a[1:]), None

        acc, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    run(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        run(*args).block_until_ready()
    ms = (time.perf_counter() - t0) / (3 * reps) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = BoundedActor(T=T)
    x = m.simulate(random.PRNGKey(0), n=N)
    g, K = m.gains()
    from lqg_tpu.ops import gaussian

    joint = gaussian.joint_system(m.dynamics, m.actor, g.L, K, T)
    F, Q = joint.F, joint.G @ mT(joint.G)

    # kernel-level pieces (fixed joint system)
    timed(lambda c: pll._fwd_cv(F[None] + 0.0 * c, Q[None], x[None]).sum(),
          "ll fwd kernel (value only)      ", jnp.float32(0.0))
    timed(lambda c: sum(jnp.sum(o) for o in pll._bwd_cv(
        F[None] + 0.0 * c, Q[None], x[None],
        jnp.ones((1, N), jnp.float32))),
          "ll bwd path (re-fwd + adjoint)  ", jnp.float32(0.0))
    timed(lambda c: sum(map(jnp.sum, jax.value_and_grad(
        lambda F_: pll.conditioned_log_likelihood_fused(
            F_[None], Q[None], x[None]).sum())(F + 0.0 * c),
    )) if False else jax.value_and_grad(
        lambda F_: pll.conditioned_log_likelihood_fused(
            F_[None], Q[None], x[None]).sum())(F + 0.0 * c)[1].sum(),
          "ll value+grad wrt F (fixed Q)   ", jnp.float32(0.0))

    # gains primal
    def gains_only(c):
        mm = BoundedActor(T=T, action_cost=c)
        gg, KK = mm.gains()
        return jnp.sum(gg.L[-1]) + jnp.sum(KK[-1])

    timed(gains_only, "gains primal (fused)            ", jnp.float32(0.5))

    # full production quantities
    timed(lambda c: BoundedActor(T=T, action_cost=c).log_likelihood(x).sum(),
          "full likelihood value (auto)    ", jnp.float32(0.5))
    timed(lambda c: jax.value_and_grad(
        lambda cc: -BoundedActor(T=T, action_cost=cc)
        .log_likelihood(x).sum())(c)[1],
          "full value+grad (the leapfrog)  ", jnp.float32(0.5))


if __name__ == "__main__":
    main()
