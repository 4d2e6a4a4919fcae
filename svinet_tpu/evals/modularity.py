"""Soft modularity of the mixed-membership assignment.

Reference: MMSBInfer::compute_modularity (src/mmsbinfer.cc:2372-2397):
  q_raw = sum_ij (y_ij - d_i d_j / 2E) pi_i . pi_j   (ordered pairs)
  q     = q_raw / 2E
  assor = q_raw / (2E - sum_ij (d_i d_j / 2E) pi_i . pi_j)

The reference's O(n^2) double loop reduces to two closed forms:
  sum_ij y_ij pi_i.pi_j          = 2 sum_edges pi_p.pi_q
  sum_ij d_i d_j/(2E) pi_i.pi_j  = ||sum_i d_i pi_i||^2 / 2E
(the diagonal i==j is included, as in the reference loop).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def modularity(gamma, edges, mask, deg):
    """Returns (q, assortativity). deg: (n,) float training degrees;
    edges/mask: padded canonical links."""
    pi = gamma / gamma.sum(axis=1, keepdims=True)
    two_e = jnp.maximum(deg.sum(), 1.0)
    link_term = 2.0 * ((pi[edges[:, 0]] * pi[edges[:, 1]]).sum(-1)
                       * mask).sum()
    dpi = (deg[:, None] * pi).sum(0)
    null_term = (dpi * dpi).sum() / two_e
    q_raw = link_term - null_term
    q = q_raw / two_e
    assor = q_raw / jnp.maximum(two_e - null_term, 1e-30)
    return q, assor
