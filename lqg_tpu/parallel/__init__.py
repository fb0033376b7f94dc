from lqg_tpu.parallel.mesh import make_mesh, local_mesh, distributed_init
from lqg_tpu.parallel import pscan, sharding

__all__ = ["make_mesh", "local_mesh", "distributed_init", "pscan",
           "sharding"]
