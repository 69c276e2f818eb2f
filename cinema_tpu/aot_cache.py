"""AOT-serialized executable cache: fresh-process warm starts.

The reference pays zero compile (eager torch); our jitted ViT-base train
step costs 2+ minutes of XLA+Mosaic compile per process. JAX's persistent
compilation cache cannot help on the axon relay backend (its compile-env
fingerprint is per-session, so a fresh process NEVER hits —
``compile_cache.py``/KERNEL_NOTES), so this module sidesteps the
fingerprint entirely: it serializes the compiled executable itself
(``jax.experimental.serialize_executable``) keyed on a hash of the lowered
StableHLO + jax version + device kind, and loads it back in any later
process with the same program.

The StableHLO hash makes staleness structural rather than heuristic: any
code/shape/dtype/flag change that alters the lowered program changes the
key. Lowering (tracing) costs seconds; compiling costs minutes — the cache
trades the former for the latter.

Usage:
    compiled = cached_compile(jax.jit(step), state, batch, key)
    out = compiled(state, batch, key)
"""

from __future__ import annotations

import hashlib
import os
import pickle
import re
from pathlib import Path
from typing import Any, Optional

from cinema_tpu.log import get_logger

logger = get_logger(__name__)


def _cache_dir(cache_dir: Optional[str] = None) -> Optional[Path]:
    env = os.environ.get("CINEMA_TPU_AOT_CACHE", "")
    if env == "0":
        return None
    return Path(cache_dir or env or "~/.cache/cinema_tpu/aot").expanduser()


def _env_tag() -> str:
    """Compile-environment components of the key (device + software)."""
    import jax

    dev = jax.devices()[0]
    return f"{jax.__version__}|{dev.platform}|{getattr(dev, 'device_kind', '')}"


# MLIR symbol uniquification (jax mlir.merge_mlir_modules) suffixes private
# function names with collision counters (@sort_43, @_uniform_52) whose
# values depend on process-global lowering-cache state — i.e. on what was
# traced EARLIER in the process. The full bench traces serving models before
# the pretrain step while a fresh process traces only the step, so an
# identical program hashes differently — exactly the fresh-process case this
# cache exists for. Canonicalize by renumbering every @symbol per base name
# (counter suffix stripped) in order of first appearance.
_SYM_RE = re.compile(r"@[A-Za-z_][\w.$]*")
_SUFFIX_RE = re.compile(r"_\d+$")

# The serialized Mosaic kernel module (custom_call backend_config "body":
# base64 MLIR *bytecode*) is not process-invariant either: its string table
# embeds trace-context-dependent location/name entries (~160 bytes of noise
# for an identical kernel, observed on axon 2026-08-20 — four distinct keys
# for one program across process histories), and bytecode defeats textual
# canonicalization. Strip the body from the hashed text; kernel staleness
# stays structural because the key mixes in _kernel_salt() — a hash of the
# Pallas kernel sources plus the CINEMA_TPU_* env knobs that select kernel
# configs — while operand shapes/dtypes stay visible in the surrounding
# StableHLO and the rest of the custom_call_config (cost estimate, flags)
# stays hashed.
_MOSAIC_BODY_RE = re.compile(r'(body(?:\\22|"): ?(?:\\22|"))[A-Za-z0-9+/=]+')


def _canonical_text(text: str) -> str:
    """Renumber @symbols by first appearance per base name."""
    mapping: dict = {}
    counts: dict = {}

    def sub(m: "re.Match[str]") -> str:
        sym = m.group(0)
        new = mapping.get(sym)
        if new is None:
            base = _SUFFIX_RE.sub("", sym)
            i = counts.get(base, 0)
            counts[base] = i + 1
            new = f"{base}_c{i}"  # '_c' cannot collide with a counter suffix
            mapping[sym] = new
        return new

    return _SYM_RE.sub(sub, _MOSAIC_BODY_RE.sub(r"\1<mosaic-body>", text))


_KERNEL_SALT: Optional[str] = None


def _kernel_salt() -> str:
    """Hash of the Pallas kernel sources + kernel-selecting env knobs.

    Stands in for the stripped Mosaic payloads in the cache key: editing a
    kernel or flipping a block-size/budget env var must mint a new key even
    though the change may only be visible inside the (unhashable) bytecode.
    """
    global _KERNEL_SALT
    if _KERNEL_SALT is None:
        h = hashlib.sha256()
        for p in sorted((Path(__file__).parent / "ops" / "pallas").glob("*.py")):
            h.update(p.name.encode())
            h.update(p.read_bytes())
        for k in sorted(os.environ):
            if k.startswith("CINEMA_TPU_") and not k.startswith("CINEMA_TPU_AOT"):
                h.update(f"{k}={os.environ[k]}".encode())
        _KERNEL_SALT = h.hexdigest()
    return _KERNEL_SALT


def lowered_key(lowered: Any) -> str:
    """Cache key: sha256 of the canonicalized lowered StableHLO (symbols
    renumbered, Mosaic payloads stripped) + env tag + kernel salt."""
    h = hashlib.sha256(_env_tag().encode())
    h.update(_kernel_salt().encode())
    h.update(_canonical_text(lowered.as_text()).encode())
    return h.hexdigest()[:24]


def load_compiled(key: str, cache_dir: Optional[str] = None) -> Optional[Any]:
    """Deserialize a cached executable, or None (miss / disabled / error)."""
    base = _cache_dir(cache_dir)
    if base is None:
        return None
    path = base / f"{key}.aot"
    if not path.exists():
        return None
    try:
        import jax
        from jax.experimental import serialize_executable

        payload, in_tree, out_tree, device_ids = pickle.loads(path.read_bytes())
        # pin the execution devices the executable was compiled for —
        # deserialize otherwise binds ALL local devices and a single-device
        # program then rejects its unsharded args
        by_id = {d.id: d for d in jax.local_devices()}
        devices = [by_id[i] for i in device_ids]
        compiled = serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree, execution_devices=devices
        )
        logger.info(f"AOT cache hit: {path} ({path.stat().st_size >> 20} MB).")
        try:
            os.utime(path)  # refresh mtime: eviction below is LRU by mtime
        except OSError:
            pass
        return compiled
    except Exception as e:  # stale jax/runtime: recompile, don't crash
        logger.warning(f"AOT cache load failed ({e}); recompiling.")
        try:
            path.unlink()
        except OSError:
            pass
        return None


def _prune(base: Path, keep: Path) -> None:
    """Size-capped LRU eviction (by mtime; loads touch their entry).

    ViT-base step executables are ~630 MB each and every program / shape /
    flag change mints a new key, so an unbounded cache grows by gigabytes
    per experiment week. Default cap 8 GB (CINEMA_TPU_AOT_CACHE_MAX_GB;
    <=0 disables). The just-written entry is never evicted.
    """
    try:
        max_bytes = float(os.environ.get("CINEMA_TPU_AOT_CACHE_MAX_GB", "8")) * 1e9
    except ValueError:
        max_bytes = 8e9
    if max_bytes <= 0:
        return
    entries = []
    total = 0
    for p in base.glob("*.aot"):
        try:
            st = p.stat()
        except OSError:
            continue
        entries.append((st.st_mtime, st.st_size, p))
        total += st.st_size
    entries.sort(key=lambda e: e[0])
    for _, size, p in entries:
        if total <= max_bytes:
            break
        if p == keep:
            continue
        try:
            p.unlink()
            total -= size
            sidecar = p.with_suffix(".flops")  # bench's cost-analysis sidecar
            if sidecar.exists():
                sidecar.unlink()
            logger.info(f"AOT cache evict: {p} ({size >> 20} MB).")
        except OSError:
            pass


def store_compiled(key: str, compiled: Any, cache_dir: Optional[str] = None) -> Optional[Path]:
    """Serialize an executable into the cache; returns the path or None."""
    base = _cache_dir(cache_dir)
    if base is None:
        return None
    try:
        from jax.experimental import serialize_executable

        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        device_ids = [
            d.id for d in compiled._executable.xla_extension_executable().local_devices()
        ]
        base.mkdir(parents=True, exist_ok=True)
        path = base / f"{key}.aot"
        tmp = base / f"{key}.{os.getpid()}.tmp"
        tmp.write_bytes(pickle.dumps((payload, in_tree, out_tree, device_ids)))
        os.replace(tmp, path)  # atomic: concurrent readers never see partials
        logger.info(f"AOT cache store: {path} ({path.stat().st_size >> 20} MB).")
        _prune(base, keep=path)
        return path
    except Exception as e:  # serialization unsupported on this backend
        logger.warning(f"AOT cache store failed ({e}).")
        return None


def aot_or_jit(jitted: Any, *args: Any) -> Any:
    """``cached_compile`` with a fall-through: returns the plain jitted
    callable when the cache is disabled (``CINEMA_TPU_AOT=0``), on non-TPU
    backends (XLA:CPU's AOT loader is unreliable inside long-lived
    processes — deserialized executables can fail at buffer-materialization
    time, past any fallback; set ``CINEMA_TPU_AOT=force`` to override), in
    multi-process runs (device-id remapping across hosts is not supported),
    or on any serialization error — training loops call this once with the
    first batch and use the result for every step.
    """
    import jax

    mode = os.environ.get("CINEMA_TPU_AOT", "1")
    if mode == "0" or jax.process_count() > 1:
        return jitted
    if mode != "force" and jax.default_backend() != "tpu":
        return jitted
    try:
        return cached_compile(jitted, *args)
    except Exception as e:
        logger.warning(f"AOT compile-or-load failed ({e}); using plain jit.")
        return jitted


def cached_compile(
    jitted: Any,
    *args: Any,
    cache_dir: Optional[str] = None,
    _stats: Optional[dict] = None,
) -> Any:
    """``jitted.lower(*args).compile()`` with the executable cache around it.

    ``_stats`` (if given) receives {"key", "hit": bool} for benchmarking.
    """
    lowered = jitted.lower(*args)
    key = lowered_key(lowered)
    compiled = load_compiled(key, cache_dir)
    hit = compiled is not None
    if compiled is None:
        compiled = lowered.compile()
        store_compiled(key, compiled, cache_dir)
    if _stats is not None:
        _stats.update(key=key, hit=hit)
    return compiled
