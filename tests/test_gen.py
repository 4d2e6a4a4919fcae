"""Generator / GML / PPC tests."""

import os

import numpy as np
import jax

from svinet_tpu.config import Config
from svinet_tpu.svi.gen import (
    draw_network, local_clustering_avg, bridgeness, _edge_colors)


def test_draw_network_statistics():
    """Generated density must track sum pi_p pi_q beta over pairs."""
    rng = np.random.default_rng(0)
    n, k = 120, 4
    pi = rng.dirichlet(np.full(k, 0.05), size=n)
    beta = np.full(k, 0.8)
    edges = draw_network(jax.random.PRNGKey(0), pi, beta, 1e-30)
    assert (edges[:, 0] < edges[:, 1]).all()
    # expected ones
    exp = 0.0
    ip = pi @ (pi * beta).T
    iu = np.triu_indices(n, 1)
    exp = ip[iu].sum()
    assert abs(len(edges) - exp) < 5 * np.sqrt(exp)


def test_local_clustering_triangle():
    # triangle (0,1,2) + pendant 3: cc = (1, 1, 1/3, 0) -> avg 7/12
    edges = np.array([[0, 1], [1, 2], [0, 2], [2, 3]], np.int32)
    cc = local_clustering_avg(4, edges)
    assert abs(cc - 7.0 / 12.0) < 1e-9


def test_bridgeness_range():
    pi = np.array([[1.0, 0.0], [0.5, 0.5]])
    deg = np.array([3, 4])
    b = bridgeness(pi, deg)
    assert abs(b[0]) < 1e-9          # pure membership -> 0 bridgeness
    assert abs(b[1] - 4.0) < 1e-9    # perfectly mixed -> full degree


def test_edge_colors_argmax():
    import jax.numpy as jnp
    pi = jnp.asarray([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]], jnp.float32)
    beta = jnp.asarray([0.5, 0.5], jnp.float32)
    edges = jnp.asarray([[0, 1], [1, 2]], jnp.int32)
    colors, mx, s = _edge_colors(pi, beta, edges)
    assert int(colors[0]) == 0
    assert 0.5 < float(mx[0]) <= 1.0
    # s = un-normalized pair link probability sum_k pi_p pi_q beta
    assert abs(float(s[0]) - (0.9 * 0.8 + 0.1 * 0.2) * 0.5) < 1e-6


def test_draw_network_sparse_matches_dense_statistics():
    """The Poisson-thinned sparse draw (draw_network_sparse) must track
    the same expected density as the dense per-pair draw, without ever
    enumerating the n^2 pairs, and must respect community structure."""
    from svinet_tpu.svi.gen import draw_network_sparse
    rng = np.random.default_rng(1)
    n, k = 600, 6
    pi = rng.dirichlet(np.full(k, 0.05), size=n)
    beta = np.full(k, 0.05)   # small rates: Poisson ~ Bernoulli regime
    edges = draw_network_sparse(rng, pi, beta, 1e-30)
    assert (edges[:, 0] < edges[:, 1]).all()
    keys = edges[:, 0].astype(np.int64) * n + edges[:, 1]
    assert len(np.unique(keys)) == len(edges)   # deduped
    ip = pi @ (pi * beta).T
    exp = ip[np.triu_indices(n, 1)].sum()
    assert abs(len(edges) - exp) < 5 * np.sqrt(exp)
    # assortativity: endpoints share a dominant community far more often
    # than random pairs would
    dom = pi.argmax(1)
    agree = (dom[edges[:, 0]] == dom[edges[:, 1]]).mean()
    assert agree > 0.6   # random pairing would give ~1/k ~ 0.17


def test_draw_network_sparse_rejects_fat_epsilon():
    from svinet_tpu.svi.gen import draw_network_sparse
    rng = np.random.default_rng(0)
    pi = rng.dirichlet(np.full(3, 0.1), size=50)
    try:
        draw_network_sparse(rng, pi, np.full(3, 0.1), 0.5)
        assert False, "expected ValueError"
    except ValueError:
        pass
