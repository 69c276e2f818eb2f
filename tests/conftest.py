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
# XLA:CPU compile time dominates the suite on small hosts (each whole-model
# init is a 20-50 s compile on one core). Disabling the optimization passes
# does not change semantics (no fast-math), only codegen quality — fine for
# tests, which assert numerics, not speed. Opt out with
# CINEMA_TPU_TEST_FULLOPT=1 (e.g. before benchmarking inside a test).
if os.environ.get("CINEMA_TPU_TEST_FULLOPT", "0") != "1":
    jax.config.update("jax_disable_most_optimizations", True)

# Dedupe compiles across tests (many files init the same tiny models) and
# across runs. Keyed on HLO + compile flags, so the disable-optimizations
# flag above gets its own namespace; safe on CPU (the axon-relay caveat in
# cinema_tpu/compile_cache.py is TPU-only).
_cache_dir = os.environ.get(
    "CINEMA_TPU_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "cinema_tpu", "test_jax_cache"),
)
if _cache_dir != "0":
    # Fresh sandbox: seed the cache from the committed fixture tarball so the
    # first run pays cache loads, not compiles (regenerate with
    # scripts/bake_test_compile_cache.py; stale entries are simply unread).
    _fixture_tar = os.path.join(os.path.dirname(__file__), "fixtures", "test_jax_cache.tar.gz")
    if not os.path.isdir(_cache_dir) and os.path.exists(_fixture_tar):
        import subprocess
        import tempfile

        os.makedirs(os.path.dirname(_cache_dir) or ".", exist_ok=True)
        _tmp = tempfile.mkdtemp(dir=os.path.dirname(_cache_dir) or ".")
        try:
            subprocess.run(
                ["tar", "xzf", _fixture_tar, "-C", _tmp, "--strip-components=1"], check=True
            )
            os.rename(_tmp, _cache_dir)  # atomic: concurrent runs see empty-or-full
        except (OSError, subprocess.CalledProcessError):
            import shutil

            shutil.rmtree(_tmp, ignore_errors=True)  # lost the rename race / bad tar
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8, jax.devices()
