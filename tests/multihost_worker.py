"""Worker for the 2-process multi-host smoke test (test_multihost_2proc.py).

Runs the repo's REAL multi-host plumbing end-to-end on CPU devices:
``maybe_initialize_distributed`` (gloo collectives, env-var rendezvous) ->
global ('data','model') mesh spanning both processes -> ``shard_manifest``
per-process data loading -> ``make_global_batch`` assembly -> FSDP-sharded
``make_train_state`` + ``make_supervised_train_step``. Prints one RESULT
line the parent test parses; rank parity and single-process equivalence are
asserted by the parent.

Launched as: python multihost_worker.py <process_id> <num_processes> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=<local_devices>.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# env alone is not enough under site plugins that prepend their platform to
# jax_platforms at import; pin the config explicitly (backend inits lazily)
jax.config.update("jax_platforms", "cpu")

pid, world, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if world > 1:
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(world)
    os.environ["JAX_PROCESS_ID"] = str(pid)

from cinema_tpu.parallel.multihost import (  # noqa: E402
    local_data_shard_count,
    make_global_batch,
    maybe_initialize_distributed,
    shard_manifest,
)

maybe_initialize_distributed(multiprocess=world > 1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from flax import linen as nn  # noqa: E402

from cinema_tpu.parallel.mesh import batch_shardings, make_mesh  # noqa: E402
from cinema_tpu.train.state import make_supervised_train_step, make_train_state  # noqa: E402

N_GLOBAL = 4  # global batch rows == global devices (one row per 'data' shard)
DIM = 256  # (256, 256) kernel = 65536 elems >= _FSDP_MIN_SIZE -> genuinely sharded


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, image_dict, deterministic=True):
        return nn.Dense(DIM, kernel_init=nn.initializers.lecun_normal(), name="big")(
            image_dict["x"]
        )


def loss_fn(model, variables, batch, rng):
    pred = model.apply(variables, {"x": batch["x"]})
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, ({"loss": loss}, {})


assert jax.process_count() == world and jax.process_index() == pid
mesh = make_mesh()  # (data=N_GLOBAL, model=1) over the global devices
assert mesh.shape["data"] == N_GLOBAL

model = TinyModel()
init_fn = lambda: model.init(jax.random.PRNGKey(0), {"x": jnp.zeros((1, DIM))})  # noqa: E731
tx = optax.sgd(0.1)
state, shardings = make_train_state(init_fn, tx, mesh, fsdp=True)
kernel = state.params["params"]["big"]["kernel"]
spec = kernel.sharding.spec
assert "data" in (spec + (None,))[:2], f"FSDP did not shard the big kernel: {spec}"
step = make_supervised_train_step(model, tx, loss_fn, mesh=mesh, state_shardings=shardings)

# deterministic synthetic dataset, identical on every process
rng = np.random.default_rng(42)
data = {i: (rng.normal(size=DIM).astype(np.float32), rng.normal(size=DIM).astype(np.float32)) for i in range(2 * N_GLOBAL)}

# shuffle once up front (identically on every process) so the per-step
# global item sets match between world sizes; shard_manifest then just
# strides — world=1 would otherwise skip the seeded shuffle entirely
ids = [int(i) for i in np.random.default_rng(7).permutation(2 * N_GLOBAL)]
manifest = shard_manifest(ids)
rows_per_step = local_data_shard_count(mesh)
assert rows_per_step == N_GLOBAL // world

for s in range(2):
    local_ids = manifest[s * rows_per_step : (s + 1) * rows_per_step]
    local = {
        "x": np.stack([data[i][0] for i in local_ids]),
        "y": np.stack([data[i][1] for i in local_ids]),
    }
    batch = make_global_batch(local, batch_shardings(local, mesh))
    assert batch["x"].shape == (N_GLOBAL, DIM)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])

psum = float(
    jax.jit(lambda p: sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(p)))(
        state.params
    )
)
print(f"RESULT pid={pid} loss={loss:.6f} psum={psum:.4f}", flush=True)
