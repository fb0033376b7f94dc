"""A/B the likelihood paths for the LARGE-joint-dim models on TPU.

The fused Pallas likelihood kernel covers joint dims j <= 12
(``fused_ll_available``); the deep delay-register models
(``DelayedSubjectiveActor``: xdim 26, bdim 39 -> j = 65) fall outside it and
run either as the sequential XLA scan (O(T) tiny steps - dispatch-bound on
TPU) or as the associative scan (O(log T) depth batched matmuls - MXU-bound).
This script measures value+grad of the summed negative log likelihood (the
NUTS leapfrog quantity) for both, to set the ``method="auto"`` policy.

Usage: python scripts/profiling/ab_delay_likelihood.py
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

from lqg_tpu.models import DelayedSubjectiveActor

T, N_TRIALS, REPS = 500, 20, 5


def timed(fn, name, *args, reps=REPS):
    @jax.jit
    def run(*a):
        def body(c, _):
            # perturb the input with the carry so XLA cannot hoist the
            # loop-invariant computation out of the reps loop
            return c + fn(a[0] + 0.0 * c, *a[1:]), None

        acc, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    run(*args).block_until_ready()
    t0 = time.perf_counter()
    n_outer = 3
    for _ in range(n_outer):
        run(*args).block_until_ready()
    ms = (time.perf_counter() - t0) / (n_outer * reps) * 1e3
    print(f"{name}: {ms:.2f} ms/iter", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = DelayedSubjectiveActor(T=T)
    x = model.simulate(random.PRNGKey(0), n=N_TRIALS)[..., :2]

    def nll(c, method):
        m = DelayedSubjectiveActor(T=T, c=c)
        return -m.log_likelihood(x, method=method).sum()

    v_scan = nll(jnp.float32(0.5), "scan")
    v_pscan = nll(jnp.float32(0.5), "pscan")
    v_blk = nll(jnp.float32(0.5), "blocked")
    print(f"parity: scan {float(v_scan):.4f} pscan {float(v_pscan):.4f} "
          f"blocked {float(v_blk):.4f} "
          f"rel(blk) {abs(float((v_scan - v_blk) / v_scan)):.3g}", flush=True)

    g_scan = jax.grad(nll)
    timed(lambda c: nll(c, "scan"), "value [scan]   ", jnp.float32(0.5))
    timed(lambda c: nll(c, "pscan"), "value [pscan]  ", jnp.float32(0.5))
    timed(lambda c: nll(c, "blocked"), "value [blocked]", jnp.float32(0.5))
    timed(lambda c: g_scan(c, "scan"), "grad  [scan]   ", jnp.float32(0.5))
    timed(lambda c: g_scan(c, "pscan"), "grad  [pscan]  ", jnp.float32(0.5))
    timed(lambda c: g_scan(c, "blocked"), "grad  [blocked]",
          jnp.float32(0.5))


if __name__ == "__main__":
    main()
