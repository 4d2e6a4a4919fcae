"""Sparse top-W gamma (-fastqueue) tests — the FastQueue equivalent
(reference: src/fastqueue.hh:22-307)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svinet_tpu.config import Config
from svinet_tpu.graph import Network
from svinet_tpu.ops.sparse_gamma import (
    topw_from_dense, densify, sparse_phi_fixed_point, sparse_pair_scores)


def test_topw_densify_roundtrip_full_width():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.gamma(2.0, 1.0, (10, 6)), jnp.float32)
    ids, vals, rest = topw_from_dense(g, 6)
    np.testing.assert_allclose(np.asarray(rest), 0.0, atol=1e-4)
    back = densify(ids, vals, rest, 6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g), rtol=1e-6)


def test_topw_tail_mass_conserved():
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.gamma(2.0, 1.0, (10, 16)), jnp.float32)
    ids, vals, rest = topw_from_dense(g, 4)
    back = densify(ids, vals, rest, 16)
    np.testing.assert_allclose(np.asarray(back.sum(1)),
                               np.asarray(g.sum(1)), rtol=1e-5)
    # top entries are exact
    np.testing.assert_allclose(
        np.asarray(jnp.take_along_axis(back, ids, 1)),
        np.asarray(vals), rtol=1e-6)


def test_sparse_phi_matches_dense_at_full_width():
    """With W=K the union slots cover every community, so the sparse
    fixed point must match ops/phicomp.py exactly."""
    from svinet_tpu.ops.phicomp import phi_fixed_point
    from svinet_tpu.ops.expectations import dirichlet_expectation
    rng = np.random.default_rng(2)
    n, k, b = 20, 5, 8
    gamma = jnp.asarray(rng.gamma(2.0, 1.0, (n, k)), jnp.float32)
    lam = jnp.asarray(rng.gamma(2.0, 1.0, (k, 2)), jnp.float32)
    pairs = jnp.asarray(rng.integers(0, n, (b, 2)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
    ids, vals, rest = topw_from_dense(gamma, k)
    elogbeta = dirichlet_expectation(lam)
    p, q = pairs[:, 0], pairs[:, 1]
    slots, first, s1, s2 = sparse_phi_fixed_point(
        ids[p], vals[p], rest[p], ids[q], vals[q], rest[q],
        elogbeta, y, float(np.log(1e-30)), k)
    elogpi = dirichlet_expectation(gamma)
    d1, d2 = phi_fixed_point(elogpi[p], elogpi[q], elogbeta, y,
                             float(np.log(1e-30)))
    # scatter sparse phi back to dense community order
    for bb in range(b):
        dense1 = np.zeros(k)
        dense2 = np.zeros(k)
        sl = np.asarray(slots[bb])
        f = np.asarray(first[bb])
        dense1[sl[f]] = np.asarray(s1[bb])[f]
        dense2[sl[f]] = np.asarray(s2[bb])[f]
        np.testing.assert_allclose(dense1, np.asarray(d1[bb]), atol=2e-5)
        np.testing.assert_allclose(dense2, np.asarray(d2[bb]), atol=2e-5)


def test_sparse_pair_scores_match_dense_at_full_width():
    from svinet_tpu.evals.likelihood import link_probs
    rng = np.random.default_rng(3)
    n, k, b = 30, 6, 12
    gamma = jnp.asarray(rng.gamma(2.0, 1.0, (n, k)), jnp.float32)
    lam = jnp.asarray(rng.gamma(2.0, 1.0, (k, 2)), jnp.float32)
    pairs = jnp.asarray(rng.integers(0, n, (b, 2)), jnp.int32)
    ids, vals, rest = topw_from_dense(gamma, k)
    s_one, inner = sparse_pair_scores(ids, vals, rest, lam, pairs, k=k)
    ref = link_probs(gamma, lam, pairs)
    np.testing.assert_allclose(np.asarray(s_one), np.asarray(ref),
                               rtol=1e-4)
    pi = np.asarray(gamma) / np.asarray(gamma.sum(1, keepdims=True))
    pr = np.asarray(pairs)
    np.testing.assert_allclose(
        np.asarray(inner), (pi[pr[:, 0]] * pi[pr[:, 1]]).sum(-1), rtol=1e-4)


def test_fastqueue_engine_converges(tmp_path, assort_path):
    """-infset -fastqueue 8 on assort-75-4: the sparse engine must reach
    a validation likelihood in the same band as the dense engine."""
    from svinet_tpu.svi.fastamm import FastAMM
    results = {}
    for label, width in (("dense", 0), ("sparse", 8)):
        cfg = Config(n=75, k=16, heldout_ratio=0.1, seed=3,
                     informative_sampling=True, fastqueue_width=width,
                     max_iterations=400, use_validation_stop=False,
                     reportfreq=200, outdir=str(tmp_path / label))
        cfg.resolve()
        net = Network(cfg)
        net.read(assort_path)
        eng = FastAMM(cfg, net)
        eng.infer()
        res = eng._heldout(eng.val_pairs, eng.val_y)
        results[label] = res
        assert np.isfinite(res.avg)
    # sparse tracks dense closely since the top-W-compressed dense init:
    # measured gap over seeds 3-10 is 0.015 +- 0.015 (worst 0.044)
    assert results["sparse"].avg > results["dense"].avg - 0.1
    assert results["sparse"].avg1 > -2.5


def test_fastqueue_cli_surface(tmp_path, monkeypatch, assort_path):
    from svinet_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    rc = main(["-file", assort_path, "-n", "75", "-k", "16", "-infset",
               "-fastqueue", "8", "-seed", "1", "-label", "fq",
               "-max-iterations", "60", "-no-stop", "-rfreq", "30"])
    assert rc == 0
    d = tmp_path / "n75-k16-fq-seed1-infset"
    assert (d / "gamma.txt").exists()       # densified interop dump
    assert (d / "communities.txt").exists()
    rows = [l.split() for l in open(d / "gamma.txt") if l.strip()]
    assert len(rows) == 75 and len(rows[0]) == 18
