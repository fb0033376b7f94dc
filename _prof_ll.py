import os
os.makedirs("/root/.cache/jax_lqg", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_lqg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import random
from lqg_tpu.models import BoundedActor
from lqg_tpu.ops import gaussian, riccati, kalman
from lqg_tpu.ops.linalg import mT
from lqg_tpu.utils.profiling import timeit

T, n = 1000, 20
model = BoundedActor(T=T)
x = model.simulate(random.PRNGKey(0), n=n)
spec = model.actor
Sigma0 = spec.V @ mT(spec.V)

def gains_scan(s):
    g = riccati.backward(s, horizon=T)
    K = kalman.forward(s, Sigma0=Sigma0, horizon=T)
    return g.L, K

gains_j = jax.jit(gains_scan)
L, K = gains_j(spec)
print("gains scan:", timeit(lambda: gains_j(spec), iters=10))

joint = gaussian.joint_system(model.dynamics, model.actor, L, K, T)
kern_j = jax.jit(lambda j: gaussian.conditional_kernel(j, 2))
kern = kern_j(joint)
print("cond kernel:", timeit(lambda: kern_j(joint), iters=10))

trial_j = jax.jit(gaussian.trial_log_likelihood)
trial_j(kern, x)
print("trial ll:", timeit(lambda: trial_j(kern, x), iters=10))

full_j = jax.jit(lambda xx: model.log_likelihood(xx))
full_j(x)
print("full ll:", timeit(lambda: full_j(x), iters=10))
