"""Worker for the 2-process ``jax.distributed`` bring-up test.

Launched by ``tests/test_distributed.py`` as
``python tests/_dist_worker.py <process_id> <num_processes> <port> <outfile>``.

Each process owns one CPU device; together they form a global ``dp=2`` mesh
over DCN (the gRPC coordination service), and the trial-sharded likelihood's
``psum`` total must equal the single-process value (SURVEY.md section 5.8:
the ``jax.distributed`` runtime is a first-class capability).
"""

import os
import sys


def main():
    proc_id, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                     sys.argv[3], sys.argv[4])
    # one CPU device per process (drop any inherited multi-device flags)
    os.environ.pop("XLA_FLAGS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from lqg_tpu.parallel.mesh import distributed_init, make_mesh
    from lqg_tpu.parallel.sharding import sharded_log_likelihood

    distributed_init(coordinator=f"localhost:{port}", num_processes=nproc,
                     process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc, jax.devices()

    import jax.numpy as jnp
    from jax import random
    from lqg_tpu.models import BoundedActor

    T, n = 60, 4
    # same seed on every process -> identical full data array per host
    x = BoundedActor(T=T).simulate(random.PRNGKey(0), n=n)

    mesh = make_mesh([("dp", nproc)], jax.devices())

    def builder(params):
        return BoundedActor(T=T, action_cost=params["action_cost"])

    total_ll = sharded_log_likelihood(builder, x, mesh)
    total = total_ll({"action_cost": jnp.float32(0.7)})

    with open(f"{outfile}.{proc_id}", "w") as f:
        f.write(repr(float(total)))

    # --- phase 2: SPMD chain-sharded NUTS across the 2 processes, with a
    # mid-run checkpoint written by process 0 and resumed by both ---
    import numpy as np

    from lqg_tpu.infer.mcmc import MCMC
    from lqg_tpu.infer.models import lifted_model
    from lqg_tpu.parallel.sharding import sharded_chains_run

    chains_mesh = make_mesh([("chains", nproc)], jax.devices())
    x_mc = BoundedActor(T=30).simulate(random.PRNGKey(3), n=3)
    prob = lifted_model(x_mc, BoundedActor)
    kwargs = dict(num_warmup=8, num_samples=8, num_chains=nproc,
                  max_depth=4, chunk_steps=4, checkpoint_every=1)
    key = random.PRNGKey(5)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(chains_mesh, P())
    host = lambda a: np.asarray(jax.device_put(a, rep))

    # uninterrupted reference (no checkpoint)
    ref = MCMC(prob, **kwargs)
    sharded_chains_run(ref, key, chains_mesh)
    ref_u = host(ref._samples_u)

    # interrupted + resumed run must reproduce it exactly
    ck = f"{outfile}.mcmc.npz"
    part = MCMC(prob, **kwargs)
    out = sharded_chains_run(part, key, chains_mesh, checkpoint_path=ck,
                             _stop_after_launches=1)
    assert out is None
    res = MCMC(prob, **kwargs)
    sharded_chains_run(res, key, chains_mesh, checkpoint_path=ck)
    res_u = host(res._samples_u)
    assert np.allclose(res_u, ref_u, atol=1e-6), "resume mismatch"
    assert np.isfinite(res_u).all()

    with open(f"{outfile}.mcmc.{proc_id}", "w") as f:
        f.write(repr(float(res_u.sum())))


if __name__ == "__main__":
    main()
