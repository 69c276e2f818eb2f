"""Persistent XLA compilation cache.

The reference pays zero compile time (eager torch); our jitted ViT-base
train step costs ~105 s to compile cold. Enabling JAX's persistent
compilation cache amortises that to a disk read (~1-5 s) for every process
after the first — pretrain relaunches, fine-tune sweeps, bench reruns.

Called by ``bench.py``, ``train/loop.py`` and ``tasks/pretrain.py`` before
the first jit. Idempotent; disable with ``CINEMA_TPU_COMPILE_CACHE=0``.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> Path | None:
    """Point JAX's compilation cache at a persistent directory.

    Args:
        cache_dir: cache location; defaults to ``$CINEMA_TPU_COMPILE_CACHE``
            or ``~/.cache/cinema_tpu/jax_cache``. The env value ``0``
            disables caching entirely.

    Returns:
        the cache directory, or None when disabled.
    """
    global _ENABLED
    env = os.environ.get("CINEMA_TPU_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = Path(cache_dir or env or "~/.cache/cinema_tpu/jax_cache").expanduser()
    if _ENABLED:
        return path

    import jax

    # the axon relay backend never produces a cross-process cache HIT (its
    # compile env fingerprint is per-session) while still paying the entry
    # serialization + write (~70-110 s for a ViT-base train step, measured
    # 2026-08-19: compile 144 s cache-off vs 213-263 s cache-on, second
    # process still a miss). Skip it there; CPU and standard TPU keep the
    # cache (CPU hit verified by test_compile_cache.py).
    try:
        from jax._src import xla_bridge

        version = getattr(xla_bridge.get_backend(), "platform_version", "") or ""
        if "axon" in version:
            return None
    except Exception:
        pass
    path.mkdir(parents=True, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache everything: the default 1s/min-size thresholds would skip the
    # many small eval/init executables that also add up on relaunch
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = True
    return path
