"""Link-community extraction.

The reference assigns each training link to its argmax-phi community when
the max exceeds link_thresh, counts per-node assignments (fmap), and emits
each community as the nodes with count > lt_min_deg
(reference: src/linksampling.cc:668-681 and write_communities).
Here: one jitted pass returns per-edge (argmax, max); the tiny counting
step runs host-side in numpy.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from svinet_tpu.ops.expectations import dirichlet_expectation


@jax.jit
def edge_assignments(gamma, lam, edges, mask):
    """Per-edge argmax_k phi and max phi for the closed-form phi
    (phi_k proportional to exp(Elogpi_p + Elogpi_q + Elogbeta_k0))."""
    elogpi = dirichlet_expectation(gamma)
    elogbeta = dirichlet_expectation(lam)
    logits = elogpi[edges[:, 0]] + elogpi[edges[:, 1]] + elogbeta[:, 0]
    phi = jax.nn.softmax(logits, axis=-1)
    return jnp.argmax(phi, axis=-1).astype(jnp.int32), jnp.max(phi, axis=-1)


def extract_communities(argmax: np.ndarray, maxval: np.ndarray,
                        edges: np.ndarray, mask: np.ndarray, n: int, k: int,
                        link_thresh: float, lt_min_deg: int
                        ) -> Dict[int, List[int]]:
    """Host-side counting: node joins community c when its fmap count
    exceeds lt_min_deg."""
    sel = (maxval > link_thresh) & (mask > 0)
    arg = argmax[sel]
    p = edges[sel, 0]
    q = edges[sel, 1]
    fmap = np.zeros((n, k), np.int32)
    np.add.at(fmap, (p, arg), 1)
    np.add.at(fmap, (q, arg), 1)
    comms: Dict[int, List[int]] = {}
    nodes, cs = np.nonzero(fmap > lt_min_deg)
    for node, c in zip(nodes, cs):
        comms.setdefault(int(c), []).append(int(node))
    return comms
