"""Measure -fuse-s3 vs the default sweep at the stretch shape
(n=1M, K=500) on the TPU.

Device-side state init (a 2 GB host->device gamma upload through the
axon tunnel takes minutes); host read-back as the completion barrier
per CLAUDE.md. Run one TPU process at a time:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/fuse_s3_bench.py

Measured 2026-08-20 (v5e, n=1M, K=500, E=20M, 3-sweep programs):

    default sweep: 3.270 s/sweep  6.12 Me/s
    -fuse-s3 sweep: 2.996 s/sweep  6.68 Me/s
    speedup: 1.091x

matching the roofline prediction (the s3 pass's two row gathers per
edge carry ~12.3 ns fixed cost each; folding them into the phi gather
keeps only their marginal bytes).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(n: int = 1_000_000, k: int = 500, ne: int = 20_000_000,
         sweeps: int = 3) -> None:
    import jax
    import jax.numpy as jnp
    from svinet_tpu.ops.edges import pad_edges, choose_edge_block
    from svinet_tpu.svi.linksampling import (
        linksampling_multi_sweep, linksampling_fused_multi_sweep)
    from svinet_tpu.svi.sweep_math import LSConsts

    rng = np.random.default_rng(0)
    p = rng.integers(0, n - 1, size=ne).astype(np.int32)
    q = rng.integers(1, n, size=ne).astype(np.int32)
    q = np.where(q <= p, p + 1, q).astype(np.int32)
    edges = np.stack([p, q], 1)
    deg = np.zeros(n, np.float32)
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    block = choose_edge_block(ne, k)
    ep, m = pad_edges(edges, block)
    nb = ep.shape[0] // block
    e_d, m_d, d_d = jnp.asarray(ep), jnp.asarray(m), jnp.asarray(deg)
    consts = LSConsts(jnp.float32(1.0 / k),
                      jnp.asarray([1.0, 1.0], jnp.float32),
                      jnp.float32(ne), jnp.float32(n))

    @jax.jit
    def init_state(key):
        # Gamma(1,1) == Exponential(1); jax.random.gamma's rejection
        # sampler needs ~30 GB of temps at (1M, 500)
        g = jax.random.exponential(key, (n, k), jnp.float32)
        l = jnp.ones((k, 2), jnp.float32)
        return g, l

    def timed(fn, nstate, label):
        st = list(init_state(jax.random.PRNGKey(0)))
        if nstate == 3:
            st.append(jnp.zeros((n, k), jnp.float32))
        # warm up with the SAME n_sweeps (fori_loop trip count is baked
        # into the program; a different count would recompile in the
        # timed region)
        out = fn(*st, e_d, m_d, d_d, consts, jnp.float32(1.0), nb,
                 sweeps)
        _ = float(out[0][0, 0])        # compile + claim + barrier
        t0 = time.perf_counter()
        out = fn(*out, e_d, m_d, d_d, consts, jnp.float32(1.0), nb,
                 sweeps)
        _ = float(out[0][0, 0])
        dt = (time.perf_counter() - t0) / sweeps
        print(f"{label}: {dt:.3f} s/sweep  {ne / dt / 1e6:.2f} Me/s")
        return dt

    t_u = timed(linksampling_multi_sweep, 2, "default sweep")
    t_f = timed(linksampling_fused_multi_sweep, 3, "-fuse-s3 sweep")
    print(f"speedup: {t_u / t_f:.3f}x")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
