"""Scaling-efficiency harness for the sharded link-sampling sweep.

Measures sweep throughput at 1, 2, 4, ... devices on whatever mesh is
available (real TPU slice, or the virtual CPU mesh via
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_bench.py)
and prints one JSON line per mesh size with the efficiency relative to
one device. The BASELINE target is >=0.8 efficiency on a 2-host slice.

NOTE: on the virtual CPU mesh every "device" shares the same physical
cores, so the efficiency numbers there only validate mechanics (the
collective layout compiles and runs); real scaling must be measured on
an actual multi-chip slice.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from svinet_tpu.parallel.mesh import (
    make_mesh, make_sharded_sweep, shard_edges, device_put_sharded_edges,
    device_put_replicated)
from svinet_tpu.svi.sweep_math import LSConsts


def run(n: int = 100_000, k: int = 32, n_edges: int = 2_000_000,
        iters: int = 20, block: int = 8192) -> None:
    rng = np.random.default_rng(0)
    p = rng.integers(0, n - 1, size=n_edges).astype(np.int32)
    q = rng.integers(1, n, size=n_edges).astype(np.int32)
    q = np.where(q <= p, p + 1, q).astype(np.int32)
    edges = np.stack([p, q], 1)
    deg = np.zeros(n, np.float32)
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    gamma0 = rng.gamma(1.0, 1.0, (n, k)).astype(np.float32)
    lam0 = np.tile([1.0, 1.0], (k, 1)).astype(np.float32)

    n_avail = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    base_tp = None
    for nd in sizes:
        mesh = make_mesh(nd)
        es, ms = shard_edges(edges, nd, block)
        per_shard = es.shape[0] // nd
        sweep = make_sharded_sweep(mesh, per_shard // block)
        e_d, m_d = device_put_sharded_edges(mesh, es, ms)
        g_d, l_d, d_d = device_put_replicated(
            mesh, jnp.asarray(gamma0), jnp.asarray(lam0), jnp.asarray(deg))
        consts = LSConsts(*device_put_replicated(
            mesh, jnp.float32(1.0 / k), jnp.asarray([1.0, 1.0], jnp.float32),
            jnp.float32(n_edges), jnp.float32(n)))
        ann, = device_put_replicated(mesh, jnp.float32(1.0))
        g_d, l_d = sweep(g_d, l_d, e_d, m_d, d_d, consts, ann)
        jax.block_until_ready((g_d, l_d))
        t0 = time.perf_counter()
        for _ in range(iters):
            g_d, l_d = sweep(g_d, l_d, e_d, m_d, d_d, consts, ann)
        jax.block_until_ready((g_d, l_d))
        dt = time.perf_counter() - t0
        tp = iters * n_edges / dt
        if base_tp is None:
            base_tp = tp
        eff = tp / (base_tp * nd)
        print(json.dumps({
            "metric": "sharded_sweep_scaling", "devices": nd,
            "value": round(tp, 1), "unit": "edges/sec",
            "efficiency_vs_1dev": round(eff, 3)}))





def run_collective_share(n: int = 100_000, k: int = 32,
                         n_edges: int = 2_000_000, iters: int = 10,
                         block: int = 8192) -> None:
    """Empirical collective-vs-compute split per sharded sweep (round-3
    review item 9: cross-check tools/collective_budget.py's analytic
    model with at least one measured ratio).

    Method: time the real sharded sweep (psum'd gacc/sumk/s1/s2/s3)
    against an ablated shard_map sweep with the collectives REMOVED
    (results numerically wrong, timing-only). The difference is the
    collective cost actually paid on this mesh. On the virtual CPU mesh
    collectives are shared-memory copies, so the ratio is a lower bound
    on a DCN-separated slice and an upper bound on same-host ICI."""
    import functools
    from jax.sharding import PartitionSpec as P
    from svinet_tpu.svi.sweep_math import (
        phi_pass, mean_indicator_update, s3_pass, finish_lambda)
    from svinet_tpu.ops.expectations import dirichlet_expectation

    rng = np.random.default_rng(0)
    p = rng.integers(0, n - 1, size=n_edges).astype(np.int32)
    q = rng.integers(1, n, size=n_edges).astype(np.int32)
    q = np.where(q <= p, p + 1, q).astype(np.int32)
    edges = np.stack([p, q], 1)
    deg = np.zeros(n, np.float32)
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    gamma0 = rng.gamma(1.0, 1.0, (n, k)).astype(np.float32)
    lam0 = np.tile([1.0, 1.0], (k, 1)).astype(np.float32)

    n_avail = len(jax.devices())
    for nd in [d for d in (2, 4, 8) if d <= n_avail]:
        mesh = make_mesh(nd)
        es, ms = shard_edges(edges, nd, block)
        per_shard = es.shape[0] // nd
        nb = per_shard // block
        e_d, m_d = device_put_sharded_edges(mesh, es, ms)
        g_d, l_d, d_d = device_put_replicated(
            mesh, jnp.asarray(gamma0), jnp.asarray(lam0), jnp.asarray(deg))
        consts = LSConsts(*device_put_replicated(
            mesh, jnp.float32(1.0 / k),
            jnp.asarray([1.0, 1.0], jnp.float32),
            jnp.float32(n_edges), jnp.float32(n)))
        ann, = device_put_replicated(mesh, jnp.float32(1.0))

        def local(with_psum):
            def _local(gamma, lam, edges, mask, deg, consts, annealing):
                elogpi = dirichlet_expectation(gamma)
                elogbeta = dirichlet_expectation(lam)
                gacc, sumk = phi_pass(elogpi, elogbeta[:, 0], edges,
                                      mask, nb)
                if with_psum:
                    gacc = jax.lax.psum(gacc, "edges")
                    sumk = jax.lax.psum(sumk, "edges")
                gnext, mphi, s1, s2, lam0_ = mean_indicator_update(
                    gacc, sumk, deg, consts, annealing)
                s3 = s3_pass(mphi, edges, mask, nb)
                if with_psum:
                    s3 = jax.lax.psum(s3, "edges")
                return gnext, finish_lambda(s1, s2, s3, lam0_, consts)
            sharded = jax.shard_map(
                _local, mesh=mesh,
                in_specs=(P(), P(), P("edges"), P("edges"), P(),
                          LSConsts(P(), P(), P(), P()), P()),
                out_specs=(P(), P()), check_vma=False)
            return jax.jit(sharded)

        times = {}
        for name, fn in (("full", local(True)), ("nocoll", local(False))):
            g, l = fn(g_d, l_d, e_d, m_d, d_d, consts, ann)
            jax.block_until_ready((g, l))
            t0 = time.perf_counter()
            g, l = g_d, l_d
            for _ in range(iters):
                g, l = fn(g, l, e_d, m_d, d_d, consts, ann)
            jax.block_until_ready((g, l))
            times[name] = (time.perf_counter() - t0) / iters
        share = max(0.0, 1.0 - times["nocoll"] / times["full"])
        print(json.dumps({
            "metric": "collective_share_per_sweep", "devices": nd,
            "t_full_s": round(times["full"], 4),
            "t_nocollective_s": round(times["nocoll"], 4),
            "collective_share": round(share, 4)}))


if __name__ == "__main__":
    import sys
    if "--collectives" in sys.argv:
        run_collective_share()
    else:
        kwargs = {}
        if len(sys.argv) > 1:
            kwargs["n"] = int(sys.argv[1])
        run(**kwargs)
