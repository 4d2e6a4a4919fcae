"""Multi-chip data parallelism over edge shards.

The reference's only parallelism is a pthread map-reduce over minibatch
pairs with thread-local sufficient statistics and a serial reduce
(reference: PhiRunner, src/mmsbinfer.cc:2400-2550, reduce at
src/mmsbinfer.cc:1770-1827). The TPU-native design: a 1-D device mesh,
training links sharded across chips with shard_map, gamma/lambda
replicated, and the per-shard sufficient statistics (gacc (n,K),
sumk (K,), s3 (K,)) psum-reduced over ICI. Step-size/iteration state is
derived from the step index, so replicas stay consistent with zero extra
communication.

For n*K too large to replicate, gamma rows can additionally be sharded
(parameter sharding) — see ROADMAP; this module implements the
edge-data-parallel path, which covers the reference's entire scale range.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svinet_tpu.ops.edges import pad_edges
from svinet_tpu.svi.sweep_math import (
    LSConsts, phi_pass, mean_indicator_update, s3_pass, finish_lambda,
)


def make_mesh(n_devices: int = 0, axis: str = "edges") -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_edges(edges: np.ndarray, n_shards: int, block: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Split an (E,2) edge list into n_shards equal padded shards.

    Returns (edges (n_shards*Es, 2), mask (n_shards*Es,)) laid out so a
    PartitionSpec('edges') split gives each device a contiguous shard.
    """
    per = -(-len(edges) // n_shards)  # ceil
    per = max(block, ((per + block - 1) // block) * block)
    out = np.zeros((n_shards * per, 2), np.int32)
    mask = np.zeros(n_shards * per, np.float32)
    idx = np.array_split(np.arange(len(edges)), n_shards)
    for s, ids in enumerate(idx):
        out[s * per: s * per + len(ids)] = edges[ids]
        mask[s * per: s * per + len(ids)] = 1.0
    return out, mask


def make_sharded_sweep(mesh: Mesh, num_blocks_per_shard: int,
                       axis: str = "edges") -> Callable:
    """Build the jitted multi-chip link-sampling sweep.

    Signature matches the single-chip sweep: (gamma, lam, edges, mask, deg,
    consts, annealing) -> (gamma', lam'). gamma/lam/deg replicated; edges and
    mask sharded on the leading axis.
    """

    def _local(gamma, lam, edges, mask, deg, consts, annealing):
        from svinet_tpu.ops.expectations import dirichlet_expectation
        elogpi = dirichlet_expectation(gamma)
        elogbeta = dirichlet_expectation(lam)
        gacc, sumk = phi_pass(elogpi, elogbeta[:, 0], edges, mask,
                              num_blocks_per_shard)
        # the ONLY cross-chip traffic: psum of the sufficient statistics
        gacc = jax.lax.psum(gacc, axis)
        sumk = jax.lax.psum(sumk, axis)
        gnext, mphi, s1, s2, lam0 = mean_indicator_update(
            gacc, sumk, deg, consts, annealing)
        s3 = jax.lax.psum(s3_pass(mphi, edges, mask, num_blocks_per_shard),
                          axis)
        return gnext, finish_lambda(s1, s2, s3, lam0, consts)

    sharded = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(),
                  LSConsts(P(), P(), P(), P()), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0, 1))


def device_put_sharded_edges(mesh: Mesh, edges: np.ndarray, mask: np.ndarray,
                             axis: str = "edges"):
    spec = NamedSharding(mesh, P(axis))
    return (jax.device_put(edges, spec), jax.device_put(mask, spec))


def device_put_replicated(mesh: Mesh, *arrays):
    spec = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, spec) for a in arrays)
