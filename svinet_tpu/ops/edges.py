"""Edge-array utilities: padding and blocking for static-shape kernels."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pad_edges(edges: np.ndarray, block: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad an (E,2) edge array to a multiple of `block`.

    Pad rows point at node 0 and are masked out; every kernel multiplies by
    the mask before accumulating, so pad rows contribute exactly zero.
    Returns (padded_edges (Ep,2) int32, mask (Ep,) float32).
    """
    e = np.asarray(edges, np.int32)
    n_edges = e.shape[0]
    padded_len = max(block, ((n_edges + block - 1) // block) * block)
    out = np.zeros((padded_len, 2), np.int32)
    out[:n_edges] = e
    mask = np.zeros(padded_len, np.float32)
    mask[:n_edges] = 1.0
    return out, mask
