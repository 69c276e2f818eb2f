#!/usr/bin/env python
"""Bake the test-suite XLA compile cache into a committed fixture tarball.

The test suite's cost on a small host is dominated by XLA:CPU compiles
(~7,900 distinct programs, ~24 min cold on one core even with
jax_disable_most_optimizations). tests/conftest.py points the JAX persistent
compilation cache at ~/.cache/cinema_tpu/test_jax_cache and, when that
directory is empty, seeds it from tests/fixtures/test_jax_cache.tar.gz — so
a fresh sandbox pays cache *loads* (~ms) instead of compiles (~0.3-50 s).

Regenerate after changing test shapes/models:

    rm -rf ~/.cache/cinema_tpu/test_jax_cache
    python -m pytest tests/ -q          # repopulates the cache
    python scripts/bake_test_compile_cache.py

Staleness is harmless: cache keys include the jax version, backend, and
compile options, so entries that no longer match are simply never read and
new programs compile + append as usual.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

DEFAULT_CACHE = Path.home() / ".cache" / "cinema_tpu" / "test_jax_cache"
FIXTURE = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "test_jax_cache.tar.gz"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cache-dir", type=Path, default=DEFAULT_CACHE)
    ap.add_argument("--out", type=Path, default=FIXTURE)
    args = ap.parse_args()

    if not args.cache_dir.is_dir() or not any(args.cache_dir.iterdir()):
        print(f"error: {args.cache_dir} is missing or empty — run the suite first", file=sys.stderr)
        return 1
    n = sum(1 for _ in args.cache_dir.iterdir())
    args.out.parent.mkdir(parents=True, exist_ok=True)
    tmp = args.out.with_suffix(".tmp")
    subprocess.run(
        ["tar", "czf", str(tmp), "-C", str(args.cache_dir.parent), args.cache_dir.name],
        check=True,
    )
    os.replace(tmp, args.out)
    print(f"baked {n} cache entries ({args.out.stat().st_size / 1e6:.1f} MB) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
