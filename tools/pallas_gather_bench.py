"""Pallas fused edge-block gather prototype vs XLA's gather (VERDICT r2 #3).

The roofline study (tools/roofline.py) fits every sweep component to
t_row = 12.3 ns + bytes / 176 GB/s — the sweep is bound by the
per-ROW gather/scatter rate, not by HBM bytes. The remaining question:
can a hand-written Pallas kernel beat XLA's gather at the same access
pattern? This prototype answers it for the gather+softmax half of the
sweep (if the Pallas gather pipeline cannot beat XLA's gather, a fused
full kernel built on it cannot win either).

Hard architectural constraints found while building this (each one a
Mosaic compile error on the naive design):

1. **No single-row HBM DMA.** Dim-0 slices of an (n, K) f32 HBM array
   must be aligned to the (8, 128) tiling — every logical 2 KB row
   gather is forced to copy an aligned 8-row 16 KB panel: a built-in
   8x read amplification. Even at 100% of the v5e's 819 GB/s HBM peak,
   the useful-byte ceiling of a Pallas row gather is 819/8 ~= 102 GB/s
   — the same rate XLA's native gather already achieves (85-106 GB/s
   across the sweep components, tools/roofline.py).
2. **No dynamic sublane indexing in VMEM either** ("cannot statically
   prove index is a multiple of 8/1024"), so selecting each edge's
   logical row out of its landed 8-row panel cannot be a dynamic
   slice; here it is a one-hot select matmul (host-precomputed slot
   ids in a (GROUP, 1) sublane layout, iota-compare, MXU dot), which
   costs ~1 MFLOP/edge on top of the DMA traffic.

Design: grid over edge blocks; elogpi stays in HBM (pl.ANY); per group
of G=128 edges, 2G async 8-row-panel DMAs (elogpi[p//8*8:+8],
elogpi[q//8*8:+8]) into double-buffered VMEM scratch; one-hot MXU
row-select + softmax on the (G, K) tile while the next group's DMAs
are in flight.

Run ON THE TPU: python tools/pallas_gather_bench.py [n k edges]
(one TPU process at a time; host read-back as the completion barrier).

Measured 2026-08-20 (v5e via axon tunnel, n=1M, K=512, E=2,097,152;
logical gather bytes 8.6 GB, physical bytes moved 8x = 68.7 GB):

    XLA gather+softmax   : 0.063s  136.0 GB/s logical   30.1 ns/edge
    Pallas row-DMA gather: 0.166s   51.8 GB/s logical   79.1 ns/edge
                                   414.3 GB/s physical (51% of peak)
    max rel err: 1.3e-04   (f32 one-hot-matmul row select)

Verdict: the Pallas pipeline reaches ~51% of HBM peak in *physical*
bytes — a healthy DMA rate — but the mandatory 8x amplification caps
its useful-byte ceiling at 819/8 ~= 102 GB/s even at 100% of peak,
BELOW the 136 GB/s XLA's native gather achieves on the same access
pattern (XLA's gather is emitted below Mosaic's tiling constraints).
A fused Pallas sweep kernel built on row DMAs cannot win; XLA's
gather/scatter is the right primitive, and the sweep is at the
architectural bound for row-gather access at K=500 row width.
See README "Roofline" for the full accounting.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

GROUP = 128          # edges per DMA group (DMAs in flight = 2*GROUP)
BLOCK = 1 << 11      # edges per grid step
ALIGN = 8            # Mosaic (8,128) f32 tiling: minimum dim-0 HBM slice


def pallas_gather_softmax(elogpi, elb0, p_idx, q_idx, psel, qsel):
    """sumk = 2 * sum_e softmax(elogpi[p_e] + elogpi[q_e] + elb0).

    p_idx/q_idx: (E,) int32 node ids (scalar reads -> DMA base).
    psel/qsel:   (E//GROUP, GROUP, 1) int32, sel[e] = 8*(e%GROUP) + id%8
                 (one-hot column of the flattened (GROUP*8, K) panels).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = elogpi.shape
    e = p_idx.shape[0]
    assert e % BLOCK == 0 and BLOCK % GROUP == 0
    ngroups = BLOCK // GROUP

    def kernel(p_sref, q_sref, psel_ref, qsel_ref, elogpi_hbm, elb0_ref,
               out_ref, prows, qrows, sems, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        def issue(g, buf):
            base = g * GROUP

            def one(i, _):
                p = p_sref[base + i]
                q = q_sref[base + i]
                pa = (p // ALIGN) * ALIGN
                qa = (q // ALIGN) * ALIGN
                pltpu.make_async_copy(
                    elogpi_hbm.at[pl.ds(pa, ALIGN)], prows.at[buf, i],
                    sems.at[buf, 0]).start()
                pltpu.make_async_copy(
                    elogpi_hbm.at[pl.ds(qa, ALIGN)], qrows.at[buf, i],
                    sems.at[buf, 1]).start()
                return 0
            jax.lax.fori_loop(0, GROUP, one, 0)

        def wait(g, buf):
            def one(i, _):
                # reconstruct the copy objects to wait on their sems
                p = p_sref[g * GROUP + i]
                q = q_sref[g * GROUP + i]
                pa = (p // ALIGN) * ALIGN
                qa = (q // ALIGN) * ALIGN
                pltpu.make_async_copy(
                    elogpi_hbm.at[pl.ds(pa, ALIGN)], prows.at[buf, i],
                    sems.at[buf, 0]).wait()
                pltpu.make_async_copy(
                    elogpi_hbm.at[pl.ds(qa, ALIGN)], qrows.at[buf, i],
                    sems.at[buf, 1]).wait()
                return 0
            jax.lax.fori_loop(0, GROUP, one, 0)

        issue(0, 0)
        slot = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, GROUP * ALIGN), 1)

        def group_body(g, _):
            buf = jax.lax.rem(g, 2)

            @pl.when(g + 1 < ngroups)
            def _():
                issue(g + 1, 1 - buf)
            wait(g, buf)
            # one-hot select row (id % 8) of each edge's 8-row panel:
            # S (GROUP, GROUP*8) one-hot @ panels (GROUP*8, K) on the MXU
            # (dynamic sublane slicing is not expressible in Mosaic)
            sel_p = psel_ref[g]              # (GROUP, 1), leading-dim idx
            sel_q = qsel_ref[g]
            sp = jnp.where(slot == sel_p, 1.0, 0.0)
            sq = jnp.where(slot == sel_q, 1.0, 0.0)
            pflat = prows[buf].reshape(GROUP * ALIGN, k)
            qflat = qrows[buf].reshape(GROUP * ALIGN, k)
            gp = jnp.dot(sp, pflat, preferred_element_type=jnp.float32)
            gq = jnp.dot(sq, qflat, preferred_element_type=jnp.float32)
            logits = gp + gq + elb0_ref[:][None, :]
            phi = jax.nn.softmax(logits, axis=-1)
            acc[:] = acc[:] + 2.0 * phi.sum(axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, ngroups, group_body, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        grid=(e // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),   # p: scalar reads
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),   # q: scalar reads
            pl.BlockSpec((ngroups, GROUP, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # psel
            pl.BlockSpec((ngroups, GROUP, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # qsel
            pl.BlockSpec(memory_space=pl.ANY),    # elogpi stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # elb0
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, ALIGN, k), jnp.float32),
            pltpu.VMEM((2, GROUP, ALIGN, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(p_idx, q_idx, psel, qsel, elogpi, elb0)


def main(n: int = 1_000_000, k: int = 512, n_edges: int = 2_097_152):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    p = rng.integers(0, n - 1, size=n_edges).astype(np.int32)
    q = rng.integers(1, n, size=n_edges).astype(np.int32)
    q = np.where(q <= p, p + 1, q).astype(np.int32)
    elogpi = jnp.asarray(rng.random((n, k), np.float32) - 10.0)
    elb0 = jnp.asarray(rng.random((k,), np.float32))
    p_d, q_d = jnp.asarray(p), jnp.asarray(q)
    within = (8 * (np.arange(n_edges, dtype=np.int32) % GROUP))
    psel = (within + p % ALIGN).reshape(-1, GROUP, 1)
    qsel = (within + q % ALIGN).reshape(-1, GROUP, 1)
    psel_d, qsel_d = jnp.asarray(psel), jnp.asarray(qsel)

    @functools.partial(jax.jit, static_argnames=("nblocks",))
    def xla_gather_softmax(elogpi, elb0, p, q, nblocks):
        pb = p.reshape(nblocks, -1)
        qb = q.reshape(nblocks, -1)

        def blk(sumk, pq):
            pp, qq = pq
            logits = elogpi[pp] + elogpi[qq] + elb0
            return sumk + 2.0 * jax.nn.softmax(logits, -1).sum(0), None
        sumk, _ = jax.lax.scan(blk, jnp.zeros((k,), jnp.float32),
                               (pb, qb))
        return sumk

    jitted = jax.jit(pallas_gather_softmax)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        _ = float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(out.reshape(-1)[0])
        return (time.perf_counter() - t0) / reps

    gbytes = 2 * n_edges * k * 4 / 1e9           # logical bytes
    phys = ALIGN * gbytes                        # bytes actually moved
    t_x = timeit(xla_gather_softmax, elogpi, elb0, p_d, q_d,
                 n_edges // BLOCK)
    print(f"XLA gather+softmax   : {t_x:.3f}s  {gbytes / t_x:6.1f} GB/s "
          f"logical  {t_x / n_edges * 1e9:5.1f} ns/edge")
    t_p = timeit(jitted, elogpi, elb0, p_d, q_d, psel_d, qsel_d)
    print(f"Pallas row-DMA gather: {t_p:.3f}s  {gbytes / t_p:6.1f} GB/s "
          f"logical  {t_p / n_edges * 1e9:5.1f} ns/edge  "
          f"({phys / t_p:5.1f} GB/s physical, 8x panels)")
    a = np.asarray(xla_gather_softmax(elogpi, elb0, p_d, q_d,
                                      n_edges // BLOCK))
    b = np.asarray(jitted(elogpi, elb0, p_d, q_d, psel_d,
                          qsel_d)).reshape(-1)
    err = np.abs(a - b).max() / np.abs(a).max()
    print(f"max rel err: {err:.2e}")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
