"""Kernel unit tests: digamma expectations, NMI, likelihood vs numpy/scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import digamma as sp_digamma

from svinet_tpu.ops.expectations import dirichlet_expectation, dirichlet_mean
from svinet_tpu.evals.nmi import overlapping_nmi
from svinet_tpu.evals.likelihood import heldout_stats


def test_dirichlet_expectation_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.01, 10.0, size=(17, 5))
    got = np.asarray(dirichlet_expectation(jnp.asarray(x, jnp.float32)))
    want = sp_digamma(x) - sp_digamma(x.sum(1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dirichlet_mean():
    x = np.array([[1.0, 3.0], [2.0, 2.0]])
    got = np.asarray(dirichlet_mean(jnp.asarray(x)))
    np.testing.assert_allclose(got, [[0.25, 0.75], [0.5, 0.5]])


def test_nmi_identical_covers():
    cover = [[0, 1, 2], [3, 4, 5], [6, 7, 8, 9]]
    assert overlapping_nmi(cover, cover) == pytest.approx(1.0)


def test_nmi_disjoint_covers_low():
    a = [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
    b = [[0, 2, 4, 6, 8], [1, 3, 5, 7, 9]]
    v = overlapping_nmi(a, b)
    assert 0.0 <= v < 0.2


def test_nmi_permuted_labels():
    a = [[0, 1, 2], [3, 4, 5]]
    b = [[3, 4, 5], [0, 1, 2]]
    assert overlapping_nmi(a, b) == pytest.approx(1.0)


def test_nmi_symmetry():
    rng = np.random.default_rng(1)
    a = [list(rng.choice(50, size=12, replace=False)) for _ in range(4)]
    b = [list(rng.choice(50, size=9, replace=False)) for _ in range(5)]
    assert overlapping_nmi(a, b) == pytest.approx(overlapping_nmi(b, a))


def test_heldout_likelihood_reference_formula():
    """Check the mixture likelihood against a scalar reimplementation of
    LinkSampling::edge_likelihood (src/linksampling.hh:258-292)."""
    rng = np.random.default_rng(3)
    n, k = 12, 4
    eps = 1e-30
    gamma = rng.uniform(0.1, 5.0, size=(n, k))
    lam = rng.uniform(0.5, 8.0, size=(k, 2))
    pairs = np.array([[0, 1], [2, 3], [4, 5], [6, 7]], np.int32)
    ys = np.array([1, 0, 1, 0], np.int32)

    res = heldout_stats(jnp.asarray(gamma, jnp.float32),
                        jnp.asarray(lam, jnp.float32),
                        jnp.asarray(pairs), jnp.asarray(ys), eps)

    pi = gamma / gamma.sum(1, keepdims=True)
    beta = lam[:, 0] / lam.sum(1)
    lls = []
    for (p, q), y in zip(pairs, ys):
        if y == 1:
            s = float((pi[p] * pi[q] * beta).sum())
        else:
            s = 0.0
            for zp in range(k):
                for zq in range(k):
                    rate = beta[zp] if zp == zq else eps
                    s += pi[p][zp] * pi[q][zq] * (1 - rate)
        lls.append(np.log(max(s, 1e-30)))
    lls = np.array(lls)
    # float32 device math vs float64 host math
    assert res.avg == pytest.approx(lls.mean(), rel=1e-3)
    assert res.avg1 == pytest.approx(lls[ys == 1].mean(), rel=1e-3)
    assert res.avg0 == pytest.approx(lls[ys == 0].mean(), rel=1e-3)


def test_pallas_digamma_matches_scipy():
    from svinet_tpu.ops.pallas_digamma import pallas_digamma
    rng = np.random.default_rng(1)
    x = rng.uniform(0.005, 40.0, size=(300, 7)).astype(np.float32)
    got = np.asarray(pallas_digamma(jnp.asarray(x)))
    want = sp_digamma(x.astype(np.float64))
    assert np.abs(got - want).max() < 5e-5


def test_pallas_dirichlet_expectation_matches_dense():
    from svinet_tpu.ops.pallas_digamma import dirichlet_expectation_pallas
    rng = np.random.default_rng(2)
    x = rng.uniform(0.05, 10.0, size=(64, 20)).astype(np.float32)
    got = np.asarray(dirichlet_expectation_pallas(jnp.asarray(x)))
    want = np.asarray(dirichlet_expectation(jnp.asarray(x)))
    assert np.abs(got - want).max() < 3e-5


def test_converged_of_flags():
    """Exactly one community with gamma-alpha >= 1 freezes the node
    (reference: check_and_set_converged, src/linksampling.cc:456-475)."""
    from svinet_tpu.svi.sweep_math import converged_of
    alpha = 0.25
    gamma = jnp.asarray([
        [5.0, 0.3, 0.3],    # one active -> frozen to k=0
        [5.0, 4.0, 0.3],    # two active -> not frozen
        [0.3, 0.3, 0.3],    # none active -> not frozen
        [0.3, 0.3, 9.0],    # one active -> frozen to k=2
    ], jnp.float32)
    c = np.asarray(converged_of(gamma, jnp.float32(alpha)))
    assert c.tolist() == [1, 0, 0, 3]


def test_phi_pass_one_sided_freeze_hard_assigns():
    """A pair with exactly ONE frozen endpoint contributes a one-hot of
    weight 1 to both endpoints; both-frozen and both-free pairs use the
    soft phi (reference fast path, src/linksampling.cc:618-631)."""
    from svinet_tpu.svi.sweep_math import phi_pass, converged_of
    rng = np.random.default_rng(0)
    n, k = 6, 3
    alpha = 0.1
    gamma = np.full((n, k), 0.5, np.float32)
    gamma[0, 1] = 7.0                        # node 0 frozen to k=1
    elogpi = rng.normal(size=(n, k)).astype(np.float32)
    elb0 = rng.normal(size=(k,)).astype(np.float32)
    edges = np.array([[0, 3], [4, 5]], np.int32)   # frozen-free, free-free
    mask = np.ones(2, np.float32)
    conv = converged_of(jnp.asarray(gamma), jnp.float32(alpha))
    gacc, sumk = phi_pass(jnp.asarray(elogpi), jnp.asarray(elb0),
                          jnp.asarray(edges), jnp.asarray(mask), 1, conv)
    gacc = np.asarray(gacc)
    # edge (0,3): hard one-hot at k=1 on both endpoints
    np.testing.assert_allclose(gacc[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(gacc[3], [0, 1, 0], atol=1e-6)
    # edge (4,5): plain softmax
    want = np.exp(elogpi[4] + elogpi[5] + elb0)
    want /= want.sum()
    np.testing.assert_allclose(gacc[4], want, atol=1e-5)
    np.testing.assert_allclose(gacc[5], want, atol=1e-5)
    assert float(sumk.sum()) == pytest.approx(4.0, abs=1e-5)
