"""On-device A/B of the 3x3x3 conv variants at the serving decoder shapes.

Variants: dense 3D conv (CINEMA_TPU_ZFOLD=0) vs whole-Z banded fold
(default). This tool adjudicated the round-3 segmented-band lever on v5e
(2026-08-19): dense 19.06 / band 14.08 / zseg4 14.79 / zseg8 14.80 ms at
(8,192,192,16,32) — the segmented grouped conv ran at ~1/3 the band's MXU
rate despite 2.7x fewer FLOPs, so it was PRUNED (docs/KERNEL_NOTES.md).

Usage: python tools/zfold_microbench.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

# serving decoder hot convs (per 8-frame chunk): blocks_4 full-res C=32 and
# the image-level block C=16
SHAPES = (
    ("dec_c32", (8, 192, 192, 16, 32), 32),
    ("dec_c16", (8, 192, 192, 16, 16), 16),
)
CONFIGS = (
    ("dense3d", {"CINEMA_TPU_ZFOLD": "0"}),
    ("band", {"CINEMA_TPU_ZFOLD": "1"}),
)


def _sync(x):
    return float(np.asarray(jax.device_get(x)).reshape(-1)[0])


def main() -> None:
    from cinema_tpu.models.layers import Conv

    n_inner = 10
    for sname, shape, feats in SHAPES:
        x = jnp.asarray(np.random.default_rng(0).normal(size=shape).astype(np.float32), jnp.bfloat16)
        results = {}
        for cname, env in CONFIGS:
            os.environ.update(env)
            conv = Conv(features=feats, kernel_size=(3, 3, 3), dtype=jnp.bfloat16)
            params = conv.init(jax.random.PRNGKey(0), x)

            @jax.jit
            def fn(p, x):
                def body(_, h):
                    return conv.apply(p, h)

                return jax.lax.fori_loop(0, n_inner, body, x)

            try:
                _sync(fn(params, x)[0, 0, 0, 0, 0])
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    _sync(fn(params, x)[0, 0, 0, 0, 0])
                    times.append(time.perf_counter() - t0)
                results[cname] = sorted(times)[len(times) // 2] * 1000 / n_inner
            except Exception as e:  # noqa: BLE001
                results[cname] = float("nan")
                print(f"{sname}/{cname}: FAILED {str(e)[:120]}")
        print(f"{sname}: " + "  ".join(f"{k}={v:.2f}ms" for k, v in results.items()))


if __name__ == "__main__":
    main()
