"""Shared test helpers: torch<->flax weight conversion conventions.

These conventions are the contract the checkpoint bridge
(cinema_tpu/bridge) is built on, so they are exercised by parity tests.
"""

import numpy as np


def t2j_dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def t2j_conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv weight (out, in/g, *k) -> flax kernel (*k, in/g, out)."""
    nd = w.ndim - 2
    return np.ascontiguousarray(np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0)))


def t2j_conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight (in, out, *k) -> flax kernel (*k, out, in).

    With flax transpose_kernel=True this is the same transpose as Conv.
    """
    nd = w.ndim - 2
    return np.ascontiguousarray(np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0)))
