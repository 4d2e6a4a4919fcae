"""LinkSampling engine — the recommended inference mode.

TPU-native re-design of the reference's LinkSampling engine
(reference: src/linksampling.cc:557-790). One iteration = one full sweep
over the training links with a closed-form single-shot phi per link:

  phi_k  ~  exp( Elogpi[p,k] + Elogpi[q,k] + Elogbeta[k,0] )   (softmax)

Sufficient statistics (reference hot loop, src/linksampling.cc:605-725):
  gamma_hat[p] += phi,  gamma_hat[q] += phi
  lambda0_hat[k] += 2 phi_k,   sum_k += 2 phi_k

Nonlink contributions enter in expectation via per-node mean indicators
m_p = (gamma_hat_p - alpha) / deg_p scaled by (n - deg_p - 1)
(reference: compute_mean_indicators, src/linksampling.cc:526-545), and
lambda1_hat gets the cross-moment correction s1^2 - s2 - s3
(reference: src/linksampling.cc:731-749). An annealing phase scales each
community's column by ones/sum_k until the first validation plateau
(reference: src/linksampling.cc:541-542, 1036-1043).

The reference's per-link C++ loop becomes a single jitted XLA program per
sweep: a blocked lax.scan over padded edge blocks — gather of Elogpi rows,
row-softmax on the VPU, scatter-add of the block's statistics. The
data-dependent sparsity tricks (converged-node freezing, active-k pruning,
src/linksampling.cc:622-664) are accelerations of the same math and are
deliberately replaced by the dense vectorized path, which is faster on TPU.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svinet_tpu.config import Config
from svinet_tpu.graph import Network
from svinet_tpu.ops.expectations import dirichlet_expectation
from svinet_tpu.ops.edges import pad_edges
from svinet_tpu.evals.likelihood import heldout_stats
from svinet_tpu.evals.stopping import ValidationStop
from svinet_tpu.evals.nmi import overlapping_nmi, read_cover_file
from svinet_tpu.io.writers import (
    ReportFile, save_model, load_model, write_communities, write_groups,
    write_max, write_edgelist,
)
from svinet_tpu.svi.communities import edge_assignments, extract_communities


class LSConsts(NamedTuple):
    """Per-run constants living on device."""
    alpha: jax.Array       # scalar
    eta: jax.Array         # (2,)
    ones: jax.Array        # scalar: number of links in the network
    n_nodes: jax.Array     # scalar: n (float)


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("num_blocks",))
def linksampling_sweep(gamma, lam, edges, mask, deg, consts: LSConsts,
                       annealing, num_blocks: int):
    """One full sweep over the training links. Pure function of the state.

    edges: (Ep,2) int32 padded; mask: (Ep,) f32; deg: (n,) f32 training degree.
    annealing: f32 scalar in {0,1}.
    """
    n, k = gamma.shape
    elogpi = dirichlet_expectation(gamma)
    elogbeta = dirichlet_expectation(lam)
    elb0 = elogbeta[:, 0]

    e_blocks = edges.reshape(num_blocks, -1, 2)
    m_blocks = mask.reshape(num_blocks, -1)

    def phi_block(carry, blk):
        gacc, sumk = carry
        e, m = blk
        p, q = e[:, 0], e[:, 1]
        logits = elogpi[p] + elogpi[q] + elb0
        phi = jax.nn.softmax(logits, axis=-1) * m[:, None]
        gacc = gacc.at[p].add(phi)
        gacc = gacc.at[q].add(phi)
        sumk = sumk + 2.0 * phi.sum(axis=0)
        return (gacc, sumk), None

    (gacc, sumk), _ = jax.lax.scan(
        phi_block,
        (jnp.zeros((n, k), gamma.dtype), jnp.zeros((k,), gamma.dtype)),
        (e_blocks, m_blocks))

    gnext = consts.alpha + gacc
    lam0 = consts.eta[0] + sumk

    # nonlink expectation correction (compute_mean_indicators)
    degc = deg[:, None]
    has_links = degc > 0
    mphi = jnp.where(has_links, gacc / jnp.maximum(degc, 1.0), 0.0)
    s1 = mphi.sum(axis=0)
    s2 = (mphi * mphi).sum(axis=0)
    gnext = jnp.where(has_links,
                      gnext + (consts.n_nodes - degc - 1.0) * mphi, gnext)
    scale = consts.ones / jnp.maximum(sumk, 1e-30)
    gnext = jnp.where(has_links & (annealing > 0), gnext * scale, gnext)

    # second pass: s3 cross-moment for lambda1
    def s3_block(s3, blk):
        e, m = blk
        s3 = s3 + (mphi[e[:, 0]] * mphi[e[:, 1]] * m[:, None]).sum(axis=0)
        return s3, None

    s3, _ = jax.lax.scan(s3_block, jnp.zeros((k,), gamma.dtype),
                         (e_blocks, m_blocks))
    lam1 = consts.eta[1] + s1 * s1 - s2 - s3
    return gnext, jnp.stack([lam0, lam1], axis=1)


def init_gamma_from_links(rng: np.random.Generator, edges: np.ndarray,
                          n: int, k: int, alpha: float) -> np.ndarray:
    """Random per-link phi added to both endpoints
    (reference: LinkSampling::init_gamma2, src/linksampling.cc:374-401).
    Rows without any link fall back to alpha to keep digamma finite."""
    phi = rng.uniform(size=(len(edges), k))
    phi /= phi.sum(axis=1, keepdims=True)
    gamma = np.zeros((n, k), np.float64)
    np.add.at(gamma, edges[:, 0], phi)
    np.add.at(gamma, edges[:, 1], phi)
    empty = gamma.sum(axis=1) == 0
    gamma[empty] = alpha
    return gamma


class LinkSampling:
    """Host driver: owns the output files, the stopping controller, the
    annealing phase, and the device state."""

    def __init__(self, cfg: Config, network: Network,
                 rng: Optional[np.random.Generator] = None):
        self.cfg = cfg
        self.network = network
        self.rng = rng or np.random.default_rng(cfg.seed)
        cfg.make_outdir()

        if cfg.load_heldout and cfg.load_heldout_fname:
            network.validation_pairs, network.validation_y = \
                network.load_pairs_file(cfg.load_heldout_fname)
            network.assign_training_links()
        else:
            network.sample_heldout_sets(self.rng)
        if cfg.load_test and cfg.load_test_fname:
            network.test_pairs, network.test_y = \
                network.load_pairs_file(cfg.load_test_fname)
            network.assign_training_links()

        write_edgelist(cfg.file_str("validation-edges.txt"),
                       network.validation_pairs, network.validation_y,
                       network.seq2id)
        if len(network.test_pairs):
            write_edgelist(cfg.file_str("test-edges.txt"),
                           network.test_pairs, network.test_y, network.seq2id)

        n, k = network.n, cfg.k
        self.n, self.k = n, k
        edges_p, mask = pad_edges(network.training_links, cfg.edge_block)
        self.num_blocks = edges_p.shape[0] // cfg.edge_block
        self.edges = jnp.asarray(edges_p)
        self.mask = jnp.asarray(mask)
        self.deg = jnp.asarray(network.training_deg.astype(np.float32))

        if cfg.model_load and cfg.gamma_location:
            g0, l0 = load_model(cfg.gamma_location, n, k, cfg.t)
        else:
            g0 = init_gamma_from_links(self.rng, network.edges, n, k,
                                       cfg.alpha)
            l0 = np.tile([cfg.eta0, cfg.eta1], (k, 1))
        self.gamma = jnp.asarray(g0, jnp.float32)
        self.lam = jnp.asarray(l0, jnp.float32)

        self.consts = LSConsts(
            alpha=jnp.float32(cfg.alpha),
            eta=jnp.asarray([cfg.eta0, cfg.eta1], jnp.float32),
            ones=jnp.float32(network.ones),
            n_nodes=jnp.float32(n))

        self.val_pairs = jnp.asarray(network.validation_pairs)
        self.val_y = jnp.asarray(network.validation_y.astype(np.int32))
        self.test_pairs = (jnp.asarray(network.test_pairs)
                           if len(network.test_pairs) else None)
        self.test_y = (jnp.asarray(network.test_y.astype(np.int32))
                       if len(network.test_pairs) else None)

        self.iteration = 0
        self.annealing = True
        self.stopper = ValidationStop(stopthresh=cfg.stopthresh)
        self._start = time.time()
        self._vf = ReportFile(cfg.file_str("validation.txt"))
        self._hf = ReportFile(cfg.file_str("heldout.txt"))
        self._tf = (ReportFile(cfg.file_str("test.txt"))
                    if self.test_pairs is not None else None)
        self._mutual = None
        if cfg.nmi and network.ground_truth is not None:
            network.write_gt_communities(cfg.file_str("ground_truth.txt"))
            self._mutual = open(cfg.file_str("mutual.txt"), "w")
        self._communities = {}

        cfg.write_param_txt()
        cfg.plog("inference n", n)
        cfg.plog("total pairs", network.total_pairs)
        cfg.plog("network ones", network.ones)
        cfg.plog("heldout pairs (1s and 0s)", len(network.validation_pairs))

    # ------------------------------------------------------------------
    def duration(self) -> int:
        return int(time.time() - self._start)

    def step(self) -> None:
        """One sweep over all training links."""
        self.gamma, self.lam = linksampling_sweep(
            self.gamma, self.lam, self.edges, self.mask, self.deg,
            self.consts, jnp.float32(1.0 if self.annealing else 0.0),
            self.num_blocks)

    def report(self) -> bool:
        """Validation likelihood + stopping logic. Returns True to stop."""
        cfg = self.cfg
        res = heldout_stats(self.gamma, self.lam, self.val_pairs, self.val_y,
                            cfg.epsilon)
        nshol = self._vf.write(self.iteration, self.duration(), res,
                               cfg.zeros_prob, cfg.ones_prob)
        self._hf.write(self.iteration, self.duration(), res,
                       cfg.zeros_prob, cfg.ones_prob)
        if self._tf is not None:
            tres = heldout_stats(self.gamma, self.lam, self.test_pairs,
                                 self.test_y, cfg.epsilon)
            self._tf.write(self.iteration, self.duration(), tres,
                           cfg.zeros_prob, cfg.ones_prob)

        stop = self.stopper.update(self.iteration, nshol)
        write_max(cfg.file_str("max.txt"), self.iteration, self.duration(),
                  nshol, self.stopper.max_t, self.stopper.max_h,
                  self.stopper.why)
        self.log_communities()

        if self.annealing and stop:
            self.annealing = False
            self.stopper.reset_after_annealing()
            return False
        if stop and cfg.use_validation_stop:
            return True
        return False

    def log_communities(self) -> None:
        cfg = self.cfg
        argmax, maxval = edge_assignments(self.gamma, self.lam, self.edges,
                                          self.mask)
        self._communities = extract_communities(
            np.asarray(argmax), np.asarray(maxval),
            np.asarray(self.edges), np.asarray(self.mask),
            self.n, self.k, cfg.link_thresh, cfg.lt_min_deg)
        write_communities(cfg.file_str("communities.txt"),
                          self._communities, self.network.seq2id)
        if self._mutual is not None:
            ours = read_cover_file(cfg.file_str("communities.txt"))
            gt = read_cover_file(cfg.file_str("ground_truth.txt"))
            val = overlapping_nmi(gt, ours)
            self._mutual.write(f"mutual3:\t{val:g}\n")
            self._mutual.flush()

    def do_on_stop(self) -> None:
        """Checkpoint outputs (reference: LinkSampling::do_on_stop)."""
        self.log_communities()
        save_model(self.cfg.outdir, np.asarray(self.gamma),
                   np.asarray(self.lam), self.network.seq2id)
        write_groups(self.cfg.file_str("groups.txt"),
                     np.asarray(self.gamma), self.network.seq2id)

    # ------------------------------------------------------------------
    def infer(self, max_seconds: Optional[float] = None) -> None:
        cfg = self.cfg
        self.report()  # iteration-0 report (reference ctor does one)
        while True:
            if cfg.max_iterations and self.iteration >= cfg.max_iterations:
                self.do_on_stop()
                return
            self.step()
            if self.iteration % cfg.reportfreq == 0:
                if self.report():
                    self.do_on_stop()
                    return
            self.iteration += 1
            if max_seconds is not None and time.time() - self._start > max_seconds:
                self.do_on_stop()
                return
