"""Roofline analysis of the fused link-sampling sweep (round-2 VERDICT #3).

Measures ACHIEVED HBM bytes/s for the n=1M/k=500 stretch sweep and its
components, against the v5e's ~819 GB/s peak. Traffic model (f32, per
edge, K=500):

  phi_pass   gather elogpi[p], elogpi[q]          2*K*4 = 4 KB
             scatter-add phi into gacc[p], gacc[q] (read-modify-write)
                                                  2*2*K*4 = 8 KB
  s3_pass    gather mphi[p], mphi[q]              2*K*4 = 4 KB

plus O(nK) per sweep (digamma of gamma, the mean-indicator update, gacc
init) ~ 6 * nK * 4 bytes. Run ON THE TPU (one process at a time; host
read-back barrier per CLAUDE.md).

Usage: python tools/roofline.py [n k edges]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

V5E_PEAK_GBPS = 819.0   # HBM bandwidth, TPU v5e (public spec)


def main(n: int = 1_000_000, k: int = 500, n_edges: int = 20_000_000):
    import jax
    import jax.numpy as jnp
    from svinet_tpu.ops.edges import pad_edges, choose_edge_block
    from svinet_tpu.svi.linksampling import linksampling_sweep
    from svinet_tpu.svi.sweep_math import (
        LSConsts, phi_pass, s3_pass, mean_indicator_update)
    from svinet_tpu.ops.expectations import dirichlet_expectation

    rng = np.random.default_rng(0)
    p = rng.integers(0, n - 1, size=n_edges).astype(np.int32)
    q = rng.integers(1, n, size=n_edges).astype(np.int32)
    q = np.where(q <= p, p + 1, q).astype(np.int32)
    edges = np.stack([p, q], 1)
    deg = np.zeros(n, np.float32)
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    block = choose_edge_block(n_edges, k)
    edges_p, mask = pad_edges(edges, block)
    nb = edges_p.shape[0] // block
    # device-side init: Gamma(1,1) == Exponential(1); a host-generated
    # 2 GB gamma upload through the axon tunnel takes minutes
    gamma = jax.jit(lambda key: jax.random.exponential(
        key, (n, k), jnp.float32))(jax.random.PRNGKey(0))
    lam = jnp.asarray(np.tile([1.0, 1.0], (k, 1)), jnp.float32)
    consts = LSConsts(alpha=jnp.float32(1.0 / k),
                      eta=jnp.asarray([1.0, 1.0], jnp.float32),
                      ones=jnp.float32(n_edges), n_nodes=jnp.float32(n))
    e_d, m_d, d_d = (jnp.asarray(edges_p), jnp.asarray(mask),
                     jnp.asarray(deg))

    elogpi = dirichlet_expectation(gamma)
    elb0 = dirichlet_expectation(lam)[:, 0]

    import functools

    @functools.partial(jax.jit, static_argnames=("nblocks",))
    def phi_only(elogpi, elb0, e, m, nblocks):
        return phi_pass(elogpi, elb0, e, m, nblocks)

    @functools.partial(jax.jit, static_argnames=("nblocks",))
    def gather_softmax_only(elogpi, elb0, e, m, nblocks):
        """phi_pass WITHOUT the gacc scatter: isolates gather+softmax."""
        eb = e.reshape(nblocks, -1, 2)
        mb = m.reshape(nblocks, -1)

        def blk(sumk, xs):
            ee, mm = xs
            logits = elogpi[ee[:, 0]] + elogpi[ee[:, 1]] + elb0
            phi = jax.nn.softmax(logits, axis=-1) * mm[:, None]
            return sumk + 2.0 * phi.sum(0), None
        sumk, _ = jax.lax.scan(blk, jnp.zeros((k,), jnp.float32), (eb, mb))
        return sumk

    @functools.partial(jax.jit, static_argnames=("nblocks",))
    def s3_only(mphi, e, m, nblocks):
        return s3_pass(mphi, e, m, nblocks)

    @jax.jit
    def digamma_only(gamma):
        return dirichlet_expectation(gamma)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        jax.tree.map(lambda x: None, out)
        first = out[0] if isinstance(out, tuple) else out
        _ = float(first.reshape(-1)[0])     # completion barrier
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        _ = float(first.reshape(-1)[0])
        return (time.perf_counter() - t0) / reps

    gb = 1e9
    ek4 = n_edges * k * 4
    nk4 = n * k * 4
    rows = []

    t = timeit(digamma_only, gamma)
    rows.append(("digamma (n,K)", t, 2 * nk4 / gb))

    t = timeit(gather_softmax_only, elogpi, elb0, e_d, m_d, nb)
    rows.append(("phi gather+softmax (no scatter)", t, 2 * ek4 / gb))

    t = timeit(phi_only, elogpi, elb0, e_d, m_d, nb)
    rows.append(("phi_pass (gather+softmax+scatter)", t,
                 (2 + 4) * ek4 / gb))

    mphi = jnp.asarray(rng.random((n, k), np.float32) / k)
    t = timeit(s3_only, mphi, e_d, m_d, nb)
    rows.append(("s3_pass (gather+reduce)", t, 2 * ek4 / gb))

    def full(g, l):
        return linksampling_sweep(g, l, e_d, m_d, d_d, consts,
                                  jnp.float32(1.0), nb)
    # donation: pass fresh copies
    g2, l2 = full(gamma + 0, lam + 0)
    _ = float(g2[0, 0])
    t0 = time.perf_counter()
    g3, l3 = full(g2, l2)
    _ = float(g3[0, 0])
    t_full = time.perf_counter() - t0
    full_bytes = ((2 + 4 + 2) * ek4 + 8 * nk4) / gb
    rows.append(("FULL sweep", t_full, full_bytes))

    print(f"{'component':38s} {'secs':>8s} {'model GB':>9s} "
          f"{'GB/s':>7s} {'% peak':>7s}")
    out = {}
    for name, t, gbytes in rows:
        bw = gbytes / t
        print(f"{name:38s} {t:8.3f} {gbytes:9.1f} {bw:7.1f} "
              f"{100 * bw / V5E_PEAK_GBPS:6.1f}%")
        out[name] = {"secs": round(t, 4), "model_gb": round(gbytes, 1),
                     "gbps": round(bw, 1),
                     "pct_peak": round(100 * gbytes / t / V5E_PEAK_GBPS, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
