"""A/B the gains VJP paths under the likelihood hot loop on TPU.

Under NUTS every leapfrog evaluates value+grad of the marginalized
likelihood; the chain rules through parameters -> spec -> gains ->
likelihood, so the Riccati/Kalman backward pass sits on the critical path.
Round 2 left it as a T-step sequential scan VJP (~25 us/step dispatch floor
on TPU).  This measures value+grad of a BoundedActor total NLL at T=1000
with the gains VJP on (a) the sequential scan twin and (b) the
associative-scan twin (O(log T) depth), plus the pure-scan gains baseline.

Usage: python scripts/profiling/ab_gains_grad.py  [--json out.json]
"""

import argparse
import json
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
from lqg_tpu.ops.pallas import gains as pg

T, N_TRIALS, REPS = 1000, 20, 10


def timed(fn, name, *args, reps=REPS):
    @jax.jit
    def run(*a):
        def body(c, _):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    model = BoundedActor(T=T)
    x = model.simulate(random.PRNGKey(0), n=N_TRIALS)

    def nll(c, gains_method):
        m = BoundedActor(T=T, action_cost=c)
        m.gains = lambda Sigma0=None, method=gains_method: (
            BoundedActor.gains(m, Sigma0, method=gains_method))
        return -m.log_likelihood(x).sum()

    def vg(method):
        def f(c):
            return jax.value_and_grad(lambda cc: nll(cc, method))(c)[1]
        return f

    # parity first
    g_scan = float(jax.grad(lambda c: nll(c, "scan"))(jnp.float32(0.5)))
    pg.GAINS_VJP_METHOD = "assoc"
    g_assoc = float(jax.grad(lambda c: nll(c, "auto"))(jnp.float32(0.5)))
    pg.GAINS_VJP_METHOD = "scan"
    g_svjp = float(jax.grad(lambda c: nll(c, "auto"))(jnp.float32(0.5)))
    print(f"grad parity: scan-gains {g_scan:.4f}  fused+assocVJP "
          f"{g_assoc:.4f}  fused+scanVJP {g_svjp:.4f}", flush=True)

    results = {}
    results["vg_scan_gains_ms"] = timed(
        vg("scan"), "value+grad [scan gains]      ", jnp.float32(0.5))
    pg.GAINS_VJP_METHOD = "scan"
    results["vg_fused_scanvjp_ms"] = timed(
        vg("auto"), "value+grad [fused, scan VJP] ", jnp.float32(0.5))
    pg.GAINS_VJP_METHOD = "assoc"
    results["vg_fused_assocvjp_ms"] = timed(
        vg("auto"), "value+grad [fused, assoc VJP]", jnp.float32(0.5))
    results["grad_scan"] = g_scan
    results["grad_assoc"] = g_assoc
    results["backend"] = jax.default_backend()
    results["T"] = T
    results["n_trials"] = N_TRIALS

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.json, flush=True)


if __name__ == "__main__":
    main()
