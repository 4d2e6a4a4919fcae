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


def choose_edge_block(n_edges: int, k: int,
                      vmem_budget_bytes: int = 1024 * 1024 * 1024) -> int:
    """Pick the edge-block size for the sweep scan.

    Measured on TPU v5e (ca-AstroPh, K=20): one flat gather-softmax-scatter
    beats an 8192-edge scan by ~25% — lax.scan serializes blocks the
    compiler could overlap. So: run FLAT whenever the per-block phi
    intermediate (block * K * 4 bytes) fits the budget, and fall back to
    the largest power-of-two block that does for huge edge sets.

    Budget: measured on the n=1M/K=500/E=20M stretch config (v5e, 16G HBM),
    bigger blocks keep winning until HBM runs out — 131072-edge blocks
    (256M budget) sweep at 4.1 Me/s, 524288 (1G) at 6.1, 1048576 (2G) at
    6.5, and 2097152 OOMs next to the 3 * n * K state arrays. 1G is the
    sweet spot with headroom for the fused multi-sweep path.
    """
    limit = max(8192, vmem_budget_bytes // max(k * 4, 4))
    if n_edges <= limit:
        block = 1 << max(int(np.ceil(np.log2(max(n_edges, 1)))), 6)
        return min(block, limit)
    return 1 << int(np.floor(np.log2(limit)))
