"""SPMD parallelism: device mesh, sharding rules, distributed train steps."""

from cinema_tpu.parallel.mesh import (
    batch_shardings,
    make_mesh,
    param_shardings,
    replicated,
)

__all__ = ["make_mesh", "param_shardings", "batch_shardings", "replicated"]
