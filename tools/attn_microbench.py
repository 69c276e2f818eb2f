"""On-device microbenchmark for the packed flash attention kernels.

Times fwd (and optionally fwd+bwd) at the model shapes on the real TPU:
- serving/fine-tune encoder self-attn: B8  Tq=Tk=2305, E768 H12 (pad 2432)
- pretrain encoder self-attn:          B16 Tq=Tk=769,  E768 H12 (pad 896)
- pretrain decoder cross-attn:         B16 Tq2305 Tk769, E512 H16

Usage: python tools/attn_microbench.py [--bwd] [--stream]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = (
    ("serving_enc", 8, 2305, 2305, 768, 12),
    ("pretrain_enc", 16, 769, 769, 768, 12),
    ("pretrain_dec", 16, 2305, 769, 512, 16),
)


def _sync(x):
    return float(np.asarray(jax.device_get(x)).reshape(-1)[0])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--bwd", action="store_true")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--inner", type=int, default=20)
    args = parser.parse_args()

    from cinema_tpu.ops.pallas.flash_attention import flash_attention_packed

    for name, b, tq, tk, e, h in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, tq, e)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, tk, e)).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, tk, e)).astype(np.float32), jnp.bfloat16)

        n_inner = args.inner  # amortize per-dispatch overhead (axon tunnel)

        if args.bwd:

            def loss(q, k, v):
                return jnp.sum(flash_attention_packed(q, k, v, h).astype(jnp.float32) ** 2)

            grad_fn = jax.grad(loss, argnums=(0, 1, 2))

            @jax.jit
            def fn(q, k, v):
                def body(_, carry):
                    q, k, v = carry
                    dq, dk, dv = grad_fn(q, k, v)
                    # data dependency so no iteration is DCE'd
                    return q + 1e-6 * dq.astype(q.dtype), k + 1e-6 * dk.astype(k.dtype), v
                return jax.lax.fori_loop(0, n_inner, body, (q, k, v))[0]

        else:

            @jax.jit
            def fn(q, k, v):
                def body(_, carry):
                    q, k, v = carry
                    return flash_attention_packed(q, k, v, h), k, v
                return jax.lax.fori_loop(0, n_inner, body, (q, k, v))[0]

        _sync(fn(q, k, v)[0, 0, 0])  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _sync(fn(q, k, v)[0, 0, 0])
            times.append(time.perf_counter() - t0)
        times.sort()
        p50 = times[len(times) // 2] * 1000 / n_inner
        print(
            f"{name}: p50 {p50:.3f} ms/call  min {times[0]*1000/n_inner:.3f} ms "
            f"({'fwd+bwd' if args.bwd else 'fwd'}, x{n_inner} inner)"
        )


if __name__ == "__main__":
    main()
