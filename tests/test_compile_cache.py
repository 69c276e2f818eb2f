"""Persistent compilation cache: cross-process reuse on CPU.

Two subprocesses compile the same jitted function against the same cache
dir. The first populates the cache; the second must neither add entries nor
rewrite them (with min_compile_time=0 every MISS writes, so unchanged
mtimes prove a HIT). The axon relay backend is excluded inside
enable_persistent_cache (its fingerprint never matches across processes).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent

_PROG = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS env is unreliable here
from cinema_tpu.compile_cache import enable_persistent_cache
assert enable_persistent_cache({cache!r}) is not None
import jax.numpy as jnp

@jax.jit
def f(x):
    return jnp.tanh(x @ x.T).sum() * 3

print(float(f(jnp.ones((64, 64)))))
"""


def _run(cache_dir: Path) -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu", CINEMA_TPU_COMPILE_CACHE="")
    prog = _PROG.format(repo=str(REPO), cache=str(cache_dir))
    subprocess.run([sys.executable, "-c", prog], check=True, env=env, capture_output=True)


def _snapshot(cache_dir: Path):
    return sorted((p.name, p.stat().st_mtime_ns) for p in cache_dir.iterdir())


def test_second_process_hits_cache(tmp_path):
    cache = tmp_path / "jax_cache"
    _run(cache)
    entries = _snapshot(cache)
    assert entries, "first process must write cache entries"
    _run(cache)
    assert _snapshot(cache) == entries, "second process must hit, not rewrite"
