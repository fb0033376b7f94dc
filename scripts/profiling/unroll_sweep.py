"""Sweep the fused-gains kernel's time-loop unroll factor on TPU.

The kernel's recursion is a strict sequential dependence chain; per-step
cost is ~4.4 us at T=1000 regardless of batch (latency-bound).  Unrolling
the fori_loop amortizes loop control and lets the compiler software-pipeline
independent tile ops across adjacent steps.  This measures the effect to
pick bench.py's setting.

Usage: python scripts/profiling/unroll_sweep.py
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
from jax import lax

from lqg_tpu.models.basic import tracking_spec
from lqg_tpu.ops.pallas.gains import fused_gains
from lqg_tpu.ops.linalg import mT

T, BATCH, REPS = 1000, 16384, 20


def build(batch):
    cost = jnp.logspace(-2, 1, batch)
    av = jnp.linspace(0.1, 1.0, batch)
    st = jnp.linspace(2.0, 40.0, batch)
    sc = jnp.linspace(0.5, 10.0, batch)
    return jax.vmap(lambda c, a, s, q: tracking_spec(
        1, 1.0, a, s, q, c, 1.0 / 60.0))(cost, av, st, sc)


def main():
    print("backend:", jax.default_backend(), flush=True)
    spec = jax.tree.map(lambda a: a.astype(jnp.float32), build(BATCH))
    Sigma0 = spec.V @ mT(spec.V)

    # Mosaic supports only unroll=1 or FULL unroll of the inner loop, so
    # the sweep trades grid granularity (more, smaller time chunks) for a
    # fully-unrolled straight-line chunk body.
    for tc, unroll in ((250, 1), (125, 125), (50, 50), (25, 25), (10, 10)):
        @jax.jit
        def solve_many(spec, Sigma0, tc=tc, unroll=unroll):
            def body(carry, _):
                s = spec._replace(R=spec.R + carry * 1e-20)
                L, H, K = fused_gains(s, Sigma0, horizon=T, time_chunk=tc,
                                      unroll=unroll)
                return jnp.sum(L[-1]) + jnp.sum(H[-1]) + jnp.sum(K[-1]), None

            acc, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return acc

        t0 = time.perf_counter()
        float(solve_many(spec, Sigma0))  # compile + warm
        print(f"  (compile {time.perf_counter() - t0:.0f}s)", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            float(solve_many(spec, Sigma0))
        dt = (time.perf_counter() - t0) / (3 * REPS)
        print(f"time_chunk={tc} unroll={unroll}: {BATCH / dt / 1e6:.2f} "
              f"M solves/s ({dt * 1e3:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
