"""Vectorized ring/random nonlink samplers (svi/sampling.py) — semantics
pinned against a scalar reference walk, plus the engines' sampler entry
points (reference: src/fastamm.cc:1051-1126, src/fastamm2.cc:1101,
src/sbm.cc:700-760)."""

import numpy as np
import pytest

from svinet_tpu.config import Config
from svinet_tpu.graph import Network
from svinet_tpu.svi.sampling import (
    ring_nonlink_scan, nonlink_accept, random_nonlink_draws)


@pytest.fixture
def net(assort_path):
    cfg = Config(n=75, k=4, heldout_ratio=0.1, seed=7)
    cfg.resolve()
    n = Network(cfg)
    n.read(assort_path)
    n.sample_heldout_sets(np.random.default_rng(7))
    return n


def _scalar_ring_walk(shuffled, n, r, start, want, net, reject, edge_ok):
    """The reference's one-node-at-a-time scan, verbatim semantics."""
    picked = []
    q = start
    scanned = 0
    rej = set(int(x) for x in reject)
    while len(picked) < want and scanned < 4 * n:
        node = int(shuffled[q % n])
        q += 1
        scanned += 1
        if node == r or node in rej:
            continue
        lo, hi = min(r, node), max(r, node)
        if net.y(np.array([lo]), np.array([hi]))[0]:
            continue
        if edge_ok and not net.edge_ok_mask(np.array([lo]),
                                            np.array([hi]))[0]:
            continue
        picked.append(node)
    return np.asarray(picked, np.int64)


@pytest.mark.parametrize("edge_ok", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ring_scan_matches_scalar_walk(net, seed, edge_ok):
    rng = np.random.default_rng(seed)
    shuffled = rng.permutation(net.n)
    r = int(rng.integers(0, net.n))
    start = int(rng.integers(0, net.n))
    reject = np.sort(rng.choice(net.n, size=10, replace=False))
    want = 25
    batched = ring_nonlink_scan(
        shuffled, net.n, start, want,
        nonlink_accept(net, r, reject, require_edge_ok=edge_ok),
        batch=7)   # small batch: exercises wrapping + multi-chunk
    scalar = _scalar_ring_walk(shuffled, net.n, r, start, want, net,
                               reject, edge_ok)
    np.testing.assert_array_equal(batched, scalar)


def test_ring_scan_exhausts_at_max_scan(net):
    """A reject set covering every node: the scan must terminate at the
    4n bound with nothing picked, like the reference's scanned < 4n."""
    rng = np.random.default_rng(3)
    shuffled = rng.permutation(net.n)
    out = ring_nonlink_scan(
        shuffled, net.n, 0, 10,
        nonlink_accept(net, 0, np.arange(net.n), require_edge_ok=False))
    assert len(out) == 0


def test_random_draws_criteria(net):
    rng = np.random.default_rng(4)
    r = 5
    reject = np.sort(rng.choice(net.n, size=8, replace=False))
    out = random_nonlink_draws(rng, net, net.n, r, 30, reject,
                               max_tries=50 * 30)
    assert len(out) > 0
    assert not np.any(out == r)
    assert not np.any(np.isin(out, reject))
    lo = np.minimum(r, out)
    hi = np.maximum(r, out)
    assert not np.any(net.y(lo, hi))


def test_noninf_prep_fast_at_scale():
    """VERDICT r2 #2 done-criterion: FastAMM2's non-informative
    minibatch prep must be O(ms) at n=1M (it was a 100k-iteration
    Python loop of singleton y() probes). Build a synthetic n=1M
    sparse graph and time one full setsize=n/10 ring scan."""
    import time
    n, e = 1_000_000, 2_000_000
    rng = np.random.default_rng(0)
    edges = rng.integers(0, n, size=(e, 2), dtype=np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    cfg = Config(n=n, k=4, heldout_ratio=0.001, seed=1)
    cfg.resolve()
    net = Network(cfg)
    net.from_arrays(edges[:, 0], edges[:, 1])
    net.sample_heldout_sets(rng)
    shuffled = rng.permutation(n)
    t0 = time.time()
    out = ring_nonlink_scan(
        shuffled, n, 999, n // 10,
        nonlink_accept(net, 12345, None, require_edge_ok=False))
    dt = time.time() - t0
    assert len(out) == n // 10
    # generous CI bound; measured ~30-60 ms on this machine's 2 CPUs
    assert dt < 2.0, f"noninf prep took {dt:.3f}s at n=1M"
