"""Test configuration: simulate an 8-device TPU mesh on CPU.

The jaxtyping pytest plugin imports jax before this conftest runs, so env
vars like JAX_PLATFORMS are read too late — but the backend is not yet
initialized, so jax.config.update still takes effect here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # read at backend init (lazily, later than this), so env is still in time
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# train loops consult the AOT executable cache on their first step; tests
# must not read or pollute the user-level cache (tests that WANT the cache
# pass an explicit cache_dir)
os.environ.setdefault("CINEMA_TPU_AOT", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch float32; XLA's default matmul/conv
# precision is bf16-grade on TPU-like backends, so pin full f32 for tests.
# Production keeps the fast default (MXU bf16 passes).
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8, jax.devices()
