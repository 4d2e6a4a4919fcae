"""Eval-suite tests: precision/hitcurve/AUC, modularity, ELBO."""

import numpy as np
import jax.numpy as jnp
import pytest

from svinet_tpu.evals.precision import (
    precision_counts, auc, adamic_adar_scores)
from svinet_tpu.evals.modularity import modularity


def test_precision_counts_perfect_ranking():
    scores = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    y = np.array([1, 1, 1, 0, 0])
    c10, c100, c1000, cum = precision_counts(scores, y)
    assert c10 == 3 and c100 == 3 and c1000 == 3
    assert list(cum) == [1, 2, 3, 3, 3]


def test_auc_extremes():
    y = np.array([1, 1, 0, 0])
    assert auc(np.array([0.9, 0.8, 0.2, 0.1]), y) == pytest.approx(1.0)
    assert auc(np.array([0.1, 0.2, 0.8, 0.9]), y) == pytest.approx(0.0)
    assert auc(np.array([0.5, 0.5, 0.5, 0.5]), y) == pytest.approx(0.5)


def test_adamic_adar_triangle():
    from svinet_tpu.config import Config
    from svinet_tpu.graph import Network
    cfg = Config(n=4, k=2)
    net = Network(cfg)
    net.from_arrays(np.array([0, 1, 0, 2]), np.array([1, 2, 2, 3]))
    # pair (0,3): common neighbor 2 (deg 3) -> 1/log(3)
    s = adamic_adar_scores(net, np.array([[0, 3]]))
    assert s[0] == pytest.approx(1.0 / np.log(3.0))


def test_modularity_two_cliques():
    """Two disjoint triangles with perfect assignments: high modularity."""
    edges = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5]],
                     np.int32)
    mask = np.ones(6, np.float32)
    deg = np.full(6, 2.0, np.float32)
    gamma = np.zeros((6, 2), np.float32) + 1e-6
    gamma[:3, 0] = 10.0
    gamma[3:, 1] = 10.0
    q, assor = modularity(jnp.asarray(gamma), jnp.asarray(edges),
                          jnp.asarray(mask), jnp.asarray(deg))
    assert float(q) == pytest.approx(0.5, abs=1e-3)
    assert 0.6 < float(assor) <= 1.01


def test_elbo_finite_and_improves():
    """ELBO must increase under batch coordinate ascent."""
    from svinet_tpu.config import Config
    from svinet_tpu.graph import Network
    from svinet_tpu.svi.mmsb import MMSBInfer
    import tempfile
    rng = np.random.default_rng(0)
    # planted 2-block graph
    edges = []
    for b in range(2):
        nodes = np.arange(b * 10, (b + 1) * 10)
        for i in range(10):
            for j in range(i + 1, 10):
                if rng.uniform() < 0.8:
                    edges.append((nodes[i], nodes[j]))
    e = np.array(edges)
    cfg = Config(n=20, k=2, batch=True, logl=True, heldout_ratio=0.05,
                 outdir=tempfile.mkdtemp(), max_iterations=6,
                 use_validation_stop=False, reportfreq=2)
    cfg.resolve()
    net = Network(cfg)
    net.from_arrays(e[:, 0], e[:, 1])
    eng = MMSBInfer(cfg, net)
    eng.batch_infer()
    rows = [line.split() for line in open(cfg.file_str("logl.txt"))]
    vals = [float(r[2]) for r in rows]
    assert len(vals) >= 2
    assert all(np.isfinite(vals))
    assert vals[-1] >= vals[0]


def test_heldout_sums_blocked_matches_heldout_stats():
    """The fused sweep-tail heldout sums must equal the standalone
    blocked eval (the report-path round-trip fusion, round-3 item 5)."""
    import numpy as np
    import jax.numpy as jnp
    from svinet_tpu.evals.likelihood import (
        heldout_stats, heldout_sums_blocked, result_from_sums)
    rng = np.random.default_rng(0)
    n, k, m = 50, 7, 23
    gamma = jnp.asarray(rng.gamma(2.0, 1.0, (n, k)), jnp.float32)
    lam = jnp.asarray(rng.gamma(2.0, 1.0, (k, 2)), jnp.float32)
    pairs = rng.integers(0, n, (m, 2)).astype(np.int32)
    y = (rng.uniform(size=m) < 0.5).astype(np.int32)
    want = heldout_stats(gamma, lam, jnp.asarray(pairs), jnp.asarray(y),
                         1e-30)
    # pad to 2 blocks of 16
    tot = 32
    pp = np.zeros((tot, 2), np.int32); pp[:m] = pairs
    yy = np.zeros(tot, np.int32); yy[:m] = y
    ww = np.zeros(tot, np.float32); ww[:m] = 1.0
    got = result_from_sums(heldout_sums_blocked(
        gamma, lam, jnp.asarray(pp), jnp.asarray(yy), jnp.asarray(ww),
        jnp.float32(1e-30), 2))
    assert got.count == want.count == m
    assert got.count0 == want.count0 and got.count1 == want.count1
    np.testing.assert_allclose(got.avg, want.avg, rtol=1e-5)
    np.testing.assert_allclose(got.avg0, want.avg0, rtol=1e-5)
    np.testing.assert_allclose(got.avg1, want.avg1, rtol=1e-5)
