"""North-star benchmark: full LQG forward-backward solves/s/chip at T=1000.

One "solve" = the Riccati backward pass (control gains L) plus the Kalman
covariance forward pass (gains K) for the canonical bounded-actor tracking
model at horizon T=1000 - the gains computation at the heart of every
simulate/likelihood call (reference ``lqg/control/lqr.py`` +
``lqg/belief/kf.py``).

Measurement methodology: the solve runs on the fused Pallas kernel
(``lqg_tpu.ops.pallas.gains`` - the whole recursion VMEM-resident, particles
on vector lanes), repeated REPS times *inside one jitted scan* with the
carry perturbing the inputs (defeats loop-invariant hoisting), so host
dispatch and transfer latency are excluded and every repetition genuinely
executes.  Prints ONE JSON line; ``vs_baseline`` is against the 1e4
solves/s target in BASELINE.json.
"""

import json
import os
import time

import jax

# persistent compilation cache: kernel compiles on this stack go through a
# slow remote relay (minutes); cache them across processes.  Keyed by the
# jax version - entries from an older jaxlib can hard-abort on load.
_cache = os.path.expanduser(f"~/.cache/jax_lqg-{jax.__version__}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from lqg_tpu.models.basic import tracking_spec
from lqg_tpu.ops.pallas.gains import fused_gains
from lqg_tpu.ops.linalg import mT

T = 1000
BATCH = 16384
REPS = 20
TARGET = 1.0e4


def build_batched_spec(batch):
    """Batch of bounded-actor specs with varying parameters."""
    action_cost = jnp.logspace(-2, 1, batch)
    action_var = jnp.linspace(0.1, 1.0, batch)
    sigma_target = jnp.linspace(2.0, 40.0, batch)
    sigma_cursor = jnp.linspace(0.5, 10.0, batch)

    def one(c, av, st, sc):
        return tracking_spec(dim=1, process_noise=1.0, action_variability=av,
                             sigma_target=st, sigma_cursor=sc,
                             action_cost=c, dt=1.0 / 60.0)

    return jax.vmap(one)(action_cost, action_var, sigma_target, sigma_cursor)


@jax.jit
def solve_many(spec, Sigma0):
    """REPS full solves; each iteration's input depends on the carry so no
    repetition can be optimized away."""

    def body(carry, _):
        s = spec._replace(R=spec.R + carry * 1e-20)
        L, H, K = fused_gains(s, Sigma0, horizon=T)
        return jnp.sum(L[-1]) + jnp.sum(H[-1]) + jnp.sum(K[-1]), None

    acc, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
    return acc


def main():
    spec = build_batched_spec(BATCH)
    spec = jax.tree.map(lambda a: a.astype(jnp.float32), spec)
    Sigma0 = spec.V @ mT(spec.V)

    # compile + warm
    float(solve_many(spec, Sigma0))

    # Median of N_TIMED independent timed repetitions with recorded spread:
    # the chip is tunnel-attached and a single measurement can swing ~15%
    # minute to minute, so the reported value is a median, not one draw.
    n_timed = 7
    rates = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        float(solve_many(spec, Sigma0))
        dt = (time.perf_counter() - t0) / REPS
        rates.append(BATCH / dt)
    rates.sort()
    median = rates[n_timed // 2]
    print(json.dumps({
        "metric": "lqg_forward_backward_solves_per_s_chip_T1000",
        "value": round(median, 1),
        "unit": "solves/s",
        "vs_baseline": round(median / TARGET, 3),
        "n_reps": n_timed,
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
        "spread_pct": round(100.0 * (rates[-1] - rates[0]) / median, 1),
    }))


if __name__ == "__main__":
    main()
