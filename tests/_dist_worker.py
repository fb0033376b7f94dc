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


if __name__ == "__main__":
    main()
