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
    colors, mx = _edge_colors(pi, beta, edges)
    assert int(colors[0]) == 0
    assert 0.5 < float(mx[0]) <= 1.0
