"""AOT executable cache: serialize a compiled step, reload it in a FRESH
process, and get identical outputs without recompiling.

This is the fresh-process warm-start path for the axon relay backend,
where JAX's persistent compilation cache can never hit (per-session
compile-env fingerprint — see cinema_tpu/compile_cache.py). Keys are
hashes of the lowered StableHLO, so any program change invalidates
structurally.
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
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cinema_tpu.aot_cache import cached_compile

@jax.jit
def f(x, y):
    return jnp.tanh(x @ y) * 2.0, {{"s": jnp.sum(x) + jnp.sum(y)}}

x = jnp.full((64, 64), 0.25)
y = jnp.full((64, 64), 0.5)
stats = {{}}
compiled = cached_compile(f, x, y, cache_dir={cache!r}, _stats=stats)
out, aux = compiled(x, y)
print("HIT" if stats["hit"] else "MISS", float(out[0, 0]), float(aux["s"]))
"""


def _run(cache_dir: Path) -> str:
    env = dict(os.environ, JAX_PLATFORMS="cpu", CINEMA_TPU_AOT_CACHE="")
    prog = _PROG.format(repo=str(REPO), cache=str(cache_dir))
    res = subprocess.run(
        [sys.executable, "-c", prog], check=True, env=env, capture_output=True, text=True
    )
    return res.stdout.strip().splitlines()[-1]

def test_fresh_process_loads_serialized_executable(tmp_path):
    cache = tmp_path / "aot"
    first = _run(cache)
    assert first.startswith("MISS"), first
    assert list(cache.glob("*.aot")), "first process must store the executable"
    second = _run(cache)
    assert second.startswith("HIT"), second
    # identical numerics through the deserialized executable
    assert first.split()[1:] == second.split()[1:]


def test_key_changes_with_program(tmp_path):
    from cinema_tpu.aot_cache import lowered_key

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x * 2

    @jax.jit
    def g(x):
        return x * 3

    x = jnp.ones((8, 8))
    assert lowered_key(f.lower(x)) != lowered_key(g.lower(x))
    assert lowered_key(f.lower(x)) != lowered_key(f.lower(jnp.ones((4, 4))))
    assert lowered_key(f.lower(x)) == lowered_key(f.lower(x))


def test_key_invariant_to_symbol_counter_shift():
    """MLIR symbol uniquification suffixes private function names with
    collision counters whose values depend on what was traced earlier in
    the process (@sort_43 in the full bench vs @sort_30 in the fresh
    warm-probe process, observed on axon 2026-08-20) — the canonicalized
    key must be invariant to a uniform suffix shift and to bare-vs-suffixed
    first occurrences, while still separating genuinely different programs."""
    from cinema_tpu.aot_cache import _canonical_text

    a = (
        "module @jit_step {\n"
        "  func.func public @main() { call @sort_30, @_uniform_39, @sort_31 }\n"
        "  func.func private @sort_30()\n"
        "  func.func private @sort_31()\n"
        "  func.func private @_uniform_39()\n"
        "}\n"
    )
    # same program, counters shifted by prior in-process tracing
    b = a.replace("sort_30", "sort_43").replace("sort_31", "sort_44").replace(
        "_uniform_39", "_uniform_52"
    )
    # same program, first symbol minted without a collision suffix
    c = a.replace("sort_30", "sort")
    assert _canonical_text(a) == _canonical_text(b) == _canonical_text(c)
    # different call structure must stay distinct
    d = a.replace("@sort_30, @_uniform_39", "@_uniform_39, @sort_30")
    assert _canonical_text(a) != _canonical_text(d)


def test_key_invariant_to_mosaic_body_noise(monkeypatch):
    """The serialized Mosaic kernel payload (backend_config "body": base64
    MLIR bytecode) embeds trace-context-dependent string-table entries, so
    two processes lowering the SAME program emit different bytes there
    (observed on axon 2026-08-20: four distinct keys for one program).
    _canonical_text must strip the payload; kernel staleness is carried by
    _kernel_salt (Pallas sources + CINEMA_TPU_* env knobs) instead."""
    import cinema_tpu.aot_cache as ac

    tpl = (
        'stablehlo.custom_call @tpu_custom_call(%0) {backend_config = '
        '"{\\22custom_call_config\\22: {\\22body\\22: \\22B64\\22, '
        '\\22cost\\22: 7}}"} : (tensor<8xf32>) -> tensor<8xf32>'
    )
    a, b = tpl.replace("B64", "AAAAbodyNOISE1"), tpl.replace("B64", "AAAAbodyNOISE2Longer")
    assert ac._canonical_text(a) == ac._canonical_text(b)
    assert "<mosaic-body>" in ac._canonical_text(a)
    # unescaped-quote form too
    c = '{"custom_call_config": {"body": "QUJD", "cost": 7}}'
    assert "QUJD" not in ac._canonical_text(c)
    # everything outside the body stays load-bearing
    d = tpl.replace("B64", "AAAA")
    assert ac._canonical_text(d.replace('cost\\22: 7', 'cost\\22: 9')) != ac._canonical_text(d)

    # the salt covers what the stripped payload encoded: kernel env knobs...
    monkeypatch.setattr(ac, "_KERNEL_SALT", None)
    s0 = ac._kernel_salt()
    monkeypatch.setattr(ac, "_KERNEL_SALT", None)
    monkeypatch.setenv("CINEMA_TPU_PACKED_BWD_BUDGET", "7340032")
    s1 = ac._kernel_salt()
    assert s0 != s1
    # ...but not the AOT cache's own control vars (they don't change programs)
    monkeypatch.setattr(ac, "_KERNEL_SALT", None)
    monkeypatch.setenv("CINEMA_TPU_AOT_CACHE_MAX_GB", "99")
    assert ac._kernel_salt() == s1
    monkeypatch.setattr(ac, "_KERNEL_SALT", None)  # drop the test env from the memo


_TRAIN_PROG = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from flax import linen as nn
from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.train.loop import run_train


class _Data:
    def __len__(self):
        return 4

    def __getitem__(self, i):
        return {{"sax_image": np.full((4, 4, 1), float(i), np.float32)}}


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, images, deterministic=True):
        return nn.Dense(2)(images["sax"].reshape(images["sax"].shape[0], -1))


def loss_fn(model, params, batch, rng):
    out = model.apply(params, {{"sax": jnp.asarray(batch["sax_image"])}})
    return jnp.mean(out**2), ({{"loss": jnp.mean(out**2)}}, {{}})


out = run_train(
    apply_overrides(
        load_config({repo!r} + "/cinema_tpu/configs/segmentation/acdc.yaml"),
        [
            "train.batch_size=2",
            "train.batch_size_per_device=2",
            "train.n_epochs=1",
            "train.n_warmup_epochs=0",
            "train.eval_interval=1",
            "train.n_workers=1",
            "logging.dir={log_dir}",
        ],
    ),
    load_dataset=lambda c: (_Data(), _Data()),
    get_model_fn=lambda c: _Tiny(),
    loss_fn=loss_fn,
    eval_dataloader_fn=lambda m, p, l, c: {{"mean_dice_score": 0.5}},
)
lines = (out / "metrics.jsonl").read_text().splitlines()
assert any("train_loss" in line for line in lines), "run must train"
print("TRAINED")
"""


def test_run_train_uses_aot_cache(tmp_path):
    """run_train's first step goes through aot_or_jit and STORES the
    compiled step (CINEMA_TPU_AOT=force: the default engages only on TPU).

    The reload/HIT side is pinned by
    test_fresh_process_loads_serialized_executable on a small program:
    XLA:CPU's AOT loader is flaky for LARGE deserialized programs
    ("Buffer Definition Event ... not found" at materialization time,
    observed 2026-08-19) — exactly why aot_or_jit trusts deserialized
    executables on TPU backends only. A second run with the cache disabled
    must train identically and leave the stored entry untouched."""
    import subprocess

    cache = tmp_path / "aot"

    def run(log_dir: str, mode: str) -> None:
        env = dict(
            os.environ, CINEMA_TPU_AOT=mode, CINEMA_TPU_AOT_CACHE=str(cache),
            JAX_PLATFORMS="cpu",
        )
        prog = _TRAIN_PROG.format(repo=str(REPO), log_dir=log_dir)
        res = subprocess.run(
            [sys.executable, "-c", prog], env=env, capture_output=True, text=True
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "TRAINED" in res.stdout

    run(str(tmp_path / "runs1"), "force")
    entries = sorted((p.name, p.stat().st_mtime_ns) for p in cache.glob("*.aot"))
    assert entries, "first run must store the train-step executable"
    run(str(tmp_path / "runs2"), "0")
    after = sorted((p.name, p.stat().st_mtime_ns) for p in cache.glob("*.aot"))
    assert after == entries, "disabled mode must not touch the cache"


def test_prune_lru_over_size_cap(tmp_path, monkeypatch):
    """Entries are ~630 MB for ViT-base steps; _prune evicts the
    least-recently-used entries (mtime; loads touch) past the size cap,
    never the protected entry, and drops bench's .flops sidecars."""
    from cinema_tpu.aot_cache import _prune

    def entry(name: str, mtime: int, size: int = 2000) -> "Path":
        p = tmp_path / f"{name}.aot"
        p.write_bytes(b"x" * size)
        os.utime(p, (mtime, mtime))
        return p

    a, b, c = entry("a", 1), entry("b", 2), entry("c", 3)
    (tmp_path / "a.flops").write_text("1.0")
    monkeypatch.setenv("CINEMA_TPU_AOT_CACHE_MAX_GB", str(5000 / 1e9))  # 5000 bytes
    _prune(tmp_path, keep=c)
    # 6000 > 5000: evict oldest (a, with its sidecar), then under cap
    assert not a.exists() and not (tmp_path / "a.flops").exists()
    assert b.exists() and c.exists()

    # the protected entry survives even a cap it alone exceeds
    monkeypatch.setenv("CINEMA_TPU_AOT_CACHE_MAX_GB", str(1000 / 1e9))
    _prune(tmp_path, keep=c)
    assert c.exists() and not b.exists()

    # cap <= 0 disables pruning entirely
    monkeypatch.setenv("CINEMA_TPU_AOT_CACHE_MAX_GB", "0")
    d = entry("d", 4, size=10000)
    _prune(tmp_path, keep=d)
    assert c.exists() and d.exists()


def test_store_compiled_triggers_prune(tmp_path, monkeypatch):
    """store_compiled prunes after writing: with a 1-byte cap, stale
    entries are evicted while the just-written entry survives."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cinema_tpu.aot_cache import cached_compile

    stale = tmp_path / "stale.aot"
    stale.write_bytes(b"x" * 2000)
    os.utime(stale, (1, 1))
    monkeypatch.setenv("CINEMA_TPU_AOT_CACHE_MAX_GB", str(1 / 1e9))  # 1 byte

    @jax.jit
    def f(x):
        return x + 1

    stats = {}
    cached_compile(f, jnp.ones((4, 4)), cache_dir=str(tmp_path), _stats=stats)
    assert not stale.exists()
    assert (tmp_path / f"{stats['key']}.aot").exists()


def test_corrupt_cache_entry_recompiles(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cinema_tpu.aot_cache import cached_compile, lowered_key

    @jax.jit
    def f(x):
        return jnp.sum(x * 1.5)

    x = jnp.ones((16, 16))
    key = lowered_key(f.lower(x))
    (tmp_path / f"{key}.aot").write_bytes(b"not a pickle")
    stats = {}
    compiled = cached_compile(f, x, cache_dir=str(tmp_path), _stats=stats)
    assert not stats["hit"]
    assert float(compiled(x)) == 16 * 16 * 1.5
