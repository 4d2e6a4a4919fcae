"""Approximate ELBO (-logl).

Reference: MMSBInfer::approx_log_likelihood (src/mmsbinfer.cc:1947-2083):
global Beta/Dirichlet KL-style terms plus, per training pair, the local
phi fixed-point's expected log-likelihood and entropy:

  s += sum_k phi1_k phi2_k Elogf_k
     + [y=1] sum_{g != h} phi1_g phi2_h log(eps)
     + sum_k phi1_k Elogpi_pk + phi2_k Elogpi_qk
     - sum_k phi1_k log phi1_k + phi2_k log phi2_k

Computed in one jitted scan over padded pair blocks, solving the same
coupled phi fixed point as the training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svinet_tpu.ops.expectations import dirichlet_expectation
from svinet_tpu.ops.phicomp import phi_fixed_point

lngamma = jax.scipy.special.gammaln


@functools.partial(jax.jit, static_argnames=("num_blocks", "max_iters"))
def approx_elbo(gamma, lam, pairs, y, w, alpha, eta, log_eps,
                num_blocks: int, max_iters: int = 50,
                thresh: float = 1e-5):
    """pairs: ALL non-heldout training pairs (links and nonlinks), padded;
    w is the validity mask."""
    n, k = gamma.shape
    elogpi = dirichlet_expectation(gamma)
    elogbeta = dirichlet_expectation(lam)

    # ---- global Beta terms (lambda vs eta prior) -----------------------
    s = (lngamma(eta.sum(1)) - lngamma(eta).sum(1)
         + ((eta - 1.0) * elogbeta).sum(1)).sum()
    s -= (lngamma(lam.sum(1)) - lngamma(lam).sum(1)
          + ((lam - 1.0) * elogbeta).sum(1)).sum()

    # ---- per-pair local terms ------------------------------------------
    p_blocks = pairs.reshape(num_blocks, -1, 2)
    y_blocks = y.reshape(num_blocks, -1)
    w_blocks = w.reshape(num_blocks, -1)

    def block(acc, blk):
        e, yy, ww = blk
        p, q = e[:, 0], e[:, 1]
        phi1, phi2 = phi_fixed_point(elogpi[p], elogpi[q], elogbeta, yy,
                                     log_eps, max_iters, thresh)
        yf = (yy == 1)[:, None]
        elogf = jnp.where(yf, elogbeta[:, 0], elogbeta[:, 1])
        t = (phi1 * phi2 * elogf).sum(-1)
        # y=1 cross terms: sum_{g!=h} phi1_g phi2_h log eps
        cross = (1.0 - (phi1 * phi2).sum(-1)) * log_eps
        t = t + jnp.where(yy == 1, cross, 0.0)
        t = t + (phi1 * elogpi[p]).sum(-1) + (phi2 * elogpi[q]).sum(-1)
        ent = -(phi1 * jnp.log(jnp.maximum(phi1, 1e-30))).sum(-1) \
              - (phi2 * jnp.log(jnp.maximum(phi2, 1e-30))).sum(-1)
        return acc + ((t + ent) * ww).sum(), None

    pair_s, _ = jax.lax.scan(block, jnp.float32(0.0),
                             (p_blocks, y_blocks, w_blocks))
    s = s + pair_s

    # ---- per-node Dirichlet terms (gamma vs alpha prior) ----------------
    alpha_row = jnp.full((k,), alpha)
    s = s + n * (lngamma(alpha_row.sum()) - lngamma(alpha_row).sum())
    s = s + ((alpha - 1.0) * elogpi).sum()
    gsafe = jnp.maximum(gamma, 1e-30)
    s = s - (lngamma(gamma.sum(1)) - lngamma(gsafe).sum(1)).sum()
    s = s - ((gamma - 1.0) * elogpi).sum()
    return s
