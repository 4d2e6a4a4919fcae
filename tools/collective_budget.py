"""Analytic per-sweep collective budget for the sharded link-sampling
sweep (round-2 VERDICT #6).

Real multi-chip hardware is not reachable from this environment (one
tunneled v5e chip), so the BASELINE ">=0.8 scaling efficiency on a
2-host slice" target is bounded analytically from (a) the MEASURED
single-chip sweep time (tools/roofline.py: 4.63 s per 28.9M-edge sweep
at n=1M/K=500, gather-row-op bound) and (b) the exact collective bytes
the sharded sweep moves (svinet_tpu/parallel/mesh.py).

Traffic per sweep and device (f32):
  replicated gamma : ring all-reduce of gacc (n,K)   2*(d-1)/d * nK*4
                     + lambda-hat (K,2), sumk (K,), s1/s2/s3 scalars
                     (negligible next to nK)
  row-sharded gamma: all-gather of elogpi (n,K) + psum_scatter of gacc
                     (n,K) = the same 2*(d-1)/d * nK*4 total, but HBM
                     per device drops from nK to nK/d.

Per-device compute: t1/d with t1 the measured one-chip sweep (the
(n,K) digamma/mean-indicator terms are < 3% of t1 at stretch shape and
are row-sharded in the rowshard path anyway).

Link-speed assumptions (public specs, stated in the output): v5e ICI
~4.5e10 B/s per direction per axis; DCN ~2.5e10 B/s per host. The
all-reduce runs hierarchically across 2 hosts: intra-host
reduce-scatter + DCN all-reduce of the 1/d_host shard + intra-host
all-gather.

Usage: python tools/collective_budget.py  (pure arithmetic, no jax)
"""

from __future__ import annotations

import json

# Measured (tools/roofline.py / STRETCH.md, v5e, 2026-08-20)
T1_SWEEP_S = 4.63          # one full sweep, 28.9M edges, n=1M, K=500
N, K, E = 1_000_000, 500, 28_900_000

ICI_BPS = 4.5e10           # v5e ICI, per direction per axis
DCN_BPS = 2.5e10           # per host
CHIPS_PER_HOST = 8         # v5e host (4x2 tray)


def allreduce_time(vol_bytes: float, d: int, bw: float) -> float:
    """Ring all-reduce: 2*(d-1)/d * V through each device's link."""
    if d <= 1:
        return 0.0
    return 2.0 * (d - 1) / d * vol_bytes / bw


# -mesh-locality: measured boundary-table fraction on the REAL stretch
# graph (label-prop reorder + edge-balanced pack, graph.py
# reorder_locality; measured 2026-08-21 in this repo):
#   d=8  -> table = 0.221 n   (internal edges 96.3%, load max/mean 1.003)
#   d=16 -> table = 0.248 n   (internal edges 96.9%, load max/mean 1.016)
# The fused sweep's collectives all scale by this factor: the all_gather
# moves (d*Xmax, 2K) packed rows instead of (n, 2K) and the psum_scatter
# moves the (d*Xmax, K) boundary contributions instead of (n, K).
LOCALITY_TABLE_FRAC = {8: 0.221, 16: 0.248}


def sweep_model(d: int, hosts: int = 1, locality: bool = False) -> dict:
    vol = N * K * 4.0
    if locality:
        vol *= LOCALITY_TABLE_FRAC[d]
    comp = T1_SWEEP_S / d
    if hosts == 1:
        comm = allreduce_time(vol, d, ICI_BPS)
    else:
        d_local = d // hosts
        # reduce-scatter + all-gather intra-host (= all-reduce cost)
        comm = allreduce_time(vol, d_local, ICI_BPS)
        # + DCN all-reduce of each 1/d_local shard across hosts
        comm += allreduce_time(vol / d_local, hosts, DCN_BPS)
    return {"devices": d, "hosts": hosts, "locality": locality,
            "compute_s": round(comp, 3), "collective_s": round(comm, 3),
            "collective_gb_per_dev": round(
                2 * (d - 1) / d * vol / 1e9, 2),
            "eff_vs_1chip": round(comp / (comp + comm), 3)}


def main() -> None:
    rows = [sweep_model(d) for d in (1, 2, 4, 8)]
    rows.append(sweep_model(16, hosts=2))
    rows.append(sweep_model(8, locality=True))
    rows.append(sweep_model(16, hosts=2, locality=True))
    print(f"stretch sweep n={N} K={K} E={E}: t1={T1_SWEEP_S}s measured; "
          f"gacc all-reduce volume = {N * K * 4 / 1e9:.1f} GB "
          f"(ICI {ICI_BPS / 1e9:.0f} GB/s/dir, DCN {DCN_BPS / 1e9:.0f} "
          f"GB/s/host assumed)")
    for r in rows:
        print(json.dumps(r))
    # the BASELINE 2-host number: throughput(2 hosts) / (2 x throughput(1 host))
    for loc in (False, True):
        t8 = sweep_model(8, locality=loc)
        t16 = sweep_model(16, hosts=2, locality=loc)
        tput8 = 1.0 / (t8["compute_s"] + t8["collective_s"])
        tput16 = 1.0 / (t16["compute_s"] + t16["collective_s"])
        print(json.dumps({
            "metric": "two_host_scaling_efficiency_analytic",
            "locality": loc,
            "value": round(tput16 / (2 * tput8), 3),
            "note": "throughput(2 hosts x 8 chips) / 2*throughput(1 "
                    "host), n=1M/K=500 stretch sweep"}))


if __name__ == "__main__":
    main()
