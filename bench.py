"""North-star benchmark: full LQG forward-backward solves/s/chip at T=1000.

One "solve" = the Riccati backward pass (control gains L) plus the Kalman
covariance forward pass (gains K) for the canonical bounded-actor tracking
model at horizon T=1000 - the gains computation at the heart of every
simulate/likelihood call (reference ``lqg/control/lqr.py`` +
``lqg/belief/kf.py``).

Thousands of parameter particles are batched per chip: the scans run once
over T with all particles riding the batch dimensions of each einsum.

Prints ONE JSON line; ``vs_baseline`` is measured against the 1e4 solves/s
target in BASELINE.json.
"""

import json
import time

import jax
import jax.numpy as jnp

from lqg_tpu.models.basic import tracking_spec
from lqg_tpu.ops import riccati, kalman
from lqg_tpu.ops.linalg import mT

T = 1000
BATCH = 4096
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
def solve(spec):
    gains = riccati.backward(spec, horizon=T, regularize="none")
    Sigma0 = spec.V @ mT(spec.V)
    K = kalman.forward(spec, Sigma0=Sigma0, horizon=T)
    # consume the full gain schedules (the actual solve deliverable)
    return (jnp.sum(gains.L), jnp.sum(gains.H), jnp.sum(K))


def main():
    spec = build_batched_spec(BATCH)
    spec = jax.tree.map(lambda a: a.astype(jnp.float32), spec)

    # warmup/compile
    out = solve(spec)
    jax.block_until_ready(out)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve(spec)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    solves_per_s = BATCH / dt
    print(json.dumps({
        "metric": "lqg_forward_backward_solves_per_s_chip_T1000",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
