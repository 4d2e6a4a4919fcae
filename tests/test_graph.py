"""Graph ingest tests against the bundled example datasets."""

import numpy as np
import pytest

from svinet_tpu.config import Config
from svinet_tpu.graph import Network


def test_read_lfr(lfr_paths):
    cfg = Config(n=1000, k=28).resolve()
    net = Network(cfg)
    net.read(lfr_paths["network"])
    # reference golden run: n=1000, ones=29871, avg degree 59.742
    assert net.n == 1000
    assert net.ones == 29871
    assert net.singles == 0
    mx, avg = net.deg_stats()
    assert mx == 61
    assert abs(avg - 59.742) < 1e-3
    # eta resolution, uniform default
    assert cfg.eta0 == 1.0 and cfg.eta1 == 1.0
    assert abs(cfg.ones_prob - 0.059801802) < 1e-6


def test_read_assort(assort_path):
    cfg = Config(n=75, k=4).resolve()
    net = Network(cfg)
    net.read(assort_path)
    assert net.n == 75
    # golden param.txt: network ones: 859 (dedup + self-loop drop)
    assert net.ones == 859


def test_dedup_and_selfloops(tmp_path):
    f = tmp_path / "net.txt"
    f.write_text("1\t2\n2\t1\n1\t1\n3\t1\n")
    cfg = Config(n=3, k=2).resolve()
    net = Network(cfg)
    net.read(str(f))
    assert net.ones == 2
    assert net.n == 3
    # first-seen-order compaction: 1->0, 2->1, 3->2
    assert net.id2seq[1] == 0 and net.id2seq[2] == 1 and net.id2seq[3] == 2
    assert net.y([0], [1])[0] == 1
    assert net.y([1], [2])[0] == 0


def test_heldout_sampling(lfr_paths):
    cfg = Config(n=1000, k=28, seed=42).resolve()
    net = Network(cfg)
    net.read(lfr_paths["network"])
    rng = np.random.default_rng(42)
    net.sample_heldout_sets(rng)
    # s1 = 0.01 * 29871 = 298 -> 149 links + 149 nonlinks
    assert len(net.validation_pairs) == 298
    assert net.validation_y.sum() == 149
    ys = net.y(net.validation_pairs[:, 0], net.validation_pairs[:, 1])
    assert (ys == net.validation_y).all()
    # training links exclude the heldout links
    assert len(net.training_links) == net.ones - 149
    # training degree is consistent
    assert net.training_deg.sum() == 2 * len(net.training_links)


def test_ground_truth_loader(lfr_paths):
    cfg = Config(n=1000, k=28, nmi=True,
                 ground_truth_fname=lfr_paths["ground_truth"]).resolve()
    net = Network(cfg)
    net.read(lfr_paths["network"])
    assert net.ground_truth is not None
    assert len(net.ground_truth) == 28
    total = sum(len(c) for c in net.ground_truth)
    assert total >= 1000  # overlapping cover


def test_native_parser_matches_python(tmp_path):
    """The native mmap parser and the numpy fallback must agree."""
    import numpy as np
    from svinet_tpu.io.native import parse_ints, have_native
    p = tmp_path / "edges.txt"
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 5000, size=(4096, 2))
    p.write_text("\n".join(f"{a}\t{b}" for a, b in edges) + "\n")
    if not have_native():
        import pytest
        pytest.skip("native library not built")
    got = parse_ints(str(p))
    assert got is not None
    np.testing.assert_array_equal(got.reshape(-1, 2), edges)


def test_native_parser_skips_comments(tmp_path):
    """SNAP-style '#' headers must not leak integers into the edge stream."""
    import numpy as np
    from svinet_tpu.io.native import parse_ints, have_native
    if not have_native():
        import pytest
        pytest.skip("native library not built")
    p = tmp_path / "snap.txt"
    p.write_text("# Nodes: 18772 Edges: 396160\n% another 777 header\n"
                 "1\t2\n3\t4\n")
    got = parse_ints(str(p))
    np.testing.assert_array_equal(got, [1, 2, 3, 4])


def test_drop_singles():
    import numpy as np
    from svinet_tpu.config import Config
    from svinet_tpu.graph import Network
    cfg = Config(n=10, k=2)
    net = Network(cfg)
    net.from_arrays(np.array([0, 1]), np.array([1, 2]))  # 3 observed nodes
    assert net.singles == 7
    net.drop_singles()
    assert net.n == 3 and cfg.n == 3
    assert len(net.seq2id) == 3 and len(net.deg) == 3


def test_strid_ingest(tmp_path):
    from svinet_tpu.config import Config
    from svinet_tpu.graph import Network
    p = tmp_path / "s.txt"
    p.write_text("alice\tbob\nbob\tcarol\nalice\tcarol\n")
    cfg = Config(n=3, k=2, strid=True)
    net = Network(cfg)
    net.read(str(p))
    assert net.n == 3 and net.ones == 3
    assert net.str_ids == ["alice", "bob", "carol"]


def test_native_preprocess_matches_python(tmp_path, assort_path):
    """The parallel C++ 2-hop preprocessor (native/ingest.cpp) writes
    byte-identical neighbors.bin to the Python walk
    (reference: Network::set_neighborhood_sets, src/network.cc:558-686)."""
    import svinet_tpu.io.native as nat
    if not nat.have_native():
        pytest.skip("native library unavailable")
    cfg = Config(n=75, k=4, outdir=str(tmp_path / "a"))
    cfg.resolve()
    net = Network(cfg)
    net.read(assort_path)
    p_native = str(tmp_path / "nb_native.bin")
    assert nat.preprocess_neighbors(p_native, net.row_ptr, net.col_idx)

    cfg2 = Config(n=75, k=4, outdir=str(tmp_path / "b"))
    cfg2.resolve()
    net2 = Network(cfg2)
    net2.read(assort_path)
    orig = nat.preprocess_neighbors
    nat.preprocess_neighbors = lambda *a, **k: False   # force Python path
    try:
        net2.set_neighborhood_sets(cfg2)
    finally:
        nat.preprocess_neighbors = orig
    a = open(p_native, "rb").read()
    b = open(cfg2.file_str("neighbors.bin"), "rb").read()
    assert a == b


def test_native_writers_match_python(tmp_path):
    """The parallel fixed-decimal TSV writers (native/ingest.cpp
    write_matrix_impl) produce the same rows as the Python fallbacks in
    io/writers.py — including the groups.txt trailing argmax column."""
    import svinet_tpu.io.native as nat
    if not nat.have_native():
        pytest.skip("native library unavailable")
    from svinet_tpu.io.writers import write_groups
    rng = np.random.default_rng(3)
    gamma = rng.gamma(2.0, 10.0, size=(37, 5)).astype(np.float32)
    # adversarial rows: exact binary half-boundaries (printf rounds the
    # exact value half-even; naive llround is half-away-from-zero) and
    # tiny negatives that round to "-0.00000"
    gamma[0] = [0.015625, 2.5e-5, 0.5e-5, 1.5e-5, 7.5e-5]
    gamma[1] = [-4e-6, -0.015625, 0.0, -0.0, 123.000005]
    seq2id = np.arange(100, 137, dtype=np.int64)

    p_nat = tmp_path / "g_native.txt"
    assert nat.write_matrix_tsv(str(p_nat), gamma, seq2id, decimals=5)
    lines = p_nat.read_text().splitlines()
    assert len(lines) == 37
    for i, line in enumerate(lines):
        toks = line.split("\t")
        assert toks[0] == str(i) and toks[1] == str(100 + i)
        for j, v in enumerate(toks[2:]):
            assert v == f"{gamma[i, j]:.5f}"

    p_g = tmp_path / "groups_native.txt"
    write_groups(str(p_g), gamma, seq2id)
    orig = nat.write_matrix_tsv_extra
    nat.write_matrix_tsv_extra = lambda *a, **k: False
    try:
        p_py = tmp_path / "groups_py.txt"
        write_groups(str(p_py), gamma, seq2id)
    finally:
        nat.write_matrix_tsv_extra = orig
    assert p_g.read_text() == p_py.read_text()


def test_drop_singles_rebuilds_pair_keys(assort_path):
    """Pair keys are lo*n + hi; drop_singles shrinks n, so every cached
    key set must be rebuilt or y()/edge_ok lookups compare keys from two
    different bases and mislabel real links as nonlinks (round-4 review
    finding: -n overshoot corrupted every subsequent split sample)."""
    cfg = Config(n=80, k=4).resolve()     # 5 padded singles
    net = Network(cfg)
    net.read(assort_path)
    assert net.singles == 5
    net.drop_singles()
    assert net.n == 75 and cfg.n == 75
    lo = net.edges[:, 0].astype(np.int64)
    hi = net.edges[:, 1].astype(np.int64)
    assert net.y(lo, hi).all(), "every real link must test as a link"
    # a known nonlink stays a nonlink
    deg0_partner = next(q for q in range(1, 75)
                        if q not in set(net.neighbors(0)))
    assert net.y(np.array([0]), np.array([deg0_partner]))[0] == 0


def test_strid_ground_truth_and_init_communities(tmp_path):
    """-strid graphs can load ground-truth/init-community files keyed by
    the same string ids (extension: the reference's loaders are %d-only,
    src/network.cc:276, and assert on unknown ids)."""
    p = tmp_path / "s.txt"
    p.write_text("alice\tbob\nbob\tcarol\nalice\tcarol\ndan\terin\n")
    cfg = Config(n=5, k=2, strid=True, nmi=True)
    net = Network(cfg)
    net.read(str(p))
    gt = tmp_path / "gt.txt"
    gt.write_text("alice\t0\nbob\t0\ncarol\t0\ndan\t1\nerin\t1\n")
    net.load_ground_truth(str(gt))
    assert len(net.ground_truth) == 2
    assert list(net.ground_truth[0]) == [0, 1, 2]   # alice, bob, carol
    assert list(net.ground_truth[1]) == [3, 4]
    ic = tmp_path / "ic.txt"
    ic.write_text("alice bob carol\ndan erin\n")
    net.load_init_communities(str(ic))
    assert net.init_communities_seq[0] == [0]
    assert net.init_communities_seq[4] == [1]
