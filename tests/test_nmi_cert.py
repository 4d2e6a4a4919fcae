"""NMI scorer certification (VERDICT r1 #4).

Two independent checks of svinet_tpu/evals/nmi.py against the
Lancichinetti cover-NMI that the reference's judged parity flows
through (mutual3; reference: src/linksampling.cc:839-852):

1. GOLDEN-BINARY CHECK — the bundled reference run
   example/n1000-k28-LFR-linksampling.tgz ships communities.txt,
   ground_truth.txt AND mutual.txt, whose entries were produced by the
   REAL mutual3 binary in 2013. Our scorer on that exact cover pair must
   reproduce the final mutual.txt value (0.897372).

2. CROSS-IMPLEMENTATION CHECK — tools/nmi_cert.cpp is an independent
   scalar C++ implementation written directly from the published
   definition (NJP 11 (2009) 033015 Appendix B). Both implementations
   must agree to ~1e-9 on a battery of random covers (overlapping,
   nested, disjoint, singletons) plus the golden pair.
"""

import os
import subprocess
import tarfile

import numpy as np
import pytest

from svinet_tpu.evals.nmi import overlapping_nmi, read_cover_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD_TGZ = "/root/reference/example/n1000-k28-LFR-linksampling.tgz"


@pytest.fixture(scope="module")
def gold_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gold")
    with tarfile.open(GOLD_TGZ) as t:
        t.extractall(d, filter="data")
    return d / "n1000-k28-LFR-linksampling"


@pytest.fixture(scope="module")
def nmi_cert_bin(tmp_path_factory):
    d = tmp_path_factory.mktemp("nmicert")
    exe = d / "nmi_cert"
    subprocess.run(["g++", "-O2", "-o", str(exe),
                    os.path.join(REPO, "tools", "nmi_cert.cpp")],
                   check=True)
    return exe


def _cpp_nmi(exe, cover_a, cover_b, tmp):
    pa, pb = tmp / "a.txt", tmp / "b.txt"
    for p, cover in ((pa, cover_a), (pb, cover_b)):
        with open(p, "w") as f:
            for comm in cover:
                f.write(" ".join(str(int(v)) for v in comm) + "\n")
    out = subprocess.run([str(exe), str(pa), str(pb)], check=True,
                         capture_output=True, text=True).stdout
    return float(out)


def test_golden_mutual3_value(gold_dir):
    """Our scorer reproduces the real mutual3 binary's final NMI on the
    bundled run's own cover pair to < 1e-5."""
    ours = read_cover_file(str(gold_dir / "communities.txt"))
    gt = read_cover_file(str(gold_dir / "ground_truth.txt"))
    got = overlapping_nmi(gt, ours)
    last = [float(l.split()[1]) for l in open(gold_dir / "mutual.txt")][-1]
    assert last == pytest.approx(0.897372)
    assert got == pytest.approx(last, abs=1e-5)


def _random_cover(rng, n_nodes, n_comms, overlap=0.2, node_base=0):
    cover = []
    for _ in range(n_comms):
        size = int(rng.integers(1, max(2, n_nodes // 2)))
        cover.append(list(node_base + rng.choice(n_nodes, size=size,
                                                 replace=False)))
    if overlap == 0.0:
        # disjoint partition instead
        perm = node_base + rng.permutation(n_nodes)
        cover = [list(c) for c in np.array_split(perm, n_comms) if len(c)]
    return cover


def test_cross_implementation_random_covers(nmi_cert_bin, tmp_path):
    """Python scorer == independent C++ implementation on 24 random
    cover pairs spanning overlapping, nested, disjoint and singleton
    regimes (both are exact f64 evaluations of the same definition)."""
    rng = np.random.default_rng(7)
    cases = []
    for trial in range(8):
        n = int(rng.integers(10, 200))
        ca = _random_cover(rng, n, int(rng.integers(2, 10)))
        cb = _random_cover(rng, n, int(rng.integers(2, 10)))
        cases.append((ca, cb))
    # identical covers, disjoint partitions, nested communities
    part = _random_cover(rng, 60, 4, overlap=0.0)
    cases.append((part, [list(c) for c in part]))
    cases.append((part, _random_cover(rng, 60, 4, overlap=0.0)))
    nested = [list(range(30)), list(range(10)), list(range(5))]
    cases.append((nested, [list(range(28)), list(range(40, 50))]))
    cases.append(([[1], [2], [3]], [[1, 2], [3]]))        # singletons
    for i, (ca, cb) in enumerate(cases):
        py = overlapping_nmi(ca, cb)
        cpp = _cpp_nmi(nmi_cert_bin, ca, cb, tmp_path)
        assert py == pytest.approx(cpp, abs=1e-9), f"case {i}"


def test_cross_implementation_golden_pair(nmi_cert_bin, gold_dir,
                                          tmp_path):
    """Both implementations agree on the real 1000-node cover pair."""
    ours = read_cover_file(str(gold_dir / "communities.txt"))
    gt = read_cover_file(str(gold_dir / "ground_truth.txt"))
    py = overlapping_nmi(gt, ours)
    cpp = _cpp_nmi(nmi_cert_bin, gt, ours, tmp_path)
    assert py == pytest.approx(cpp, abs=1e-9)
    assert py == pytest.approx(0.897372, abs=1e-5)
