// Independent scalar implementation of the Lancichinetti/Fortunato/
// Kertesz overlapping-cover NMI (New J. Phys. 11 (2009) 033015,
// Appendix B) — the definition computed by the `mutual3` binary that the
// reference shells out to (reference: src/linksampling.cc:839-852).
//
// This exists ONLY to certify svinet_tpu/evals/nmi.py: it is written
// directly from the published definition with per-pair scalar loops,
// structurally unlike the vectorized numpy scorer, so a bug in either
// implementation shows up as a disagreement (tests/test_nmi_cert.py).
//
// Usage: nmi_cert <cover_a> <cover_b>
//   cover file = one community per line, whitespace-separated node ids.
// Prints the NMI to stdout.

#include <cmath>
#include <cstdio>
#include <fstream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

using namespace std;

typedef vector<set<long> > Cover;

// -p log p with the 0 log 0 := 0 convention (counts w out of n)
static double h(double w, double n) {
  if (w <= 0.0) return 0.0;
  double p = w / n;
  return -p * log(p);
}

static Cover read_cover(const char *path, set<long> &universe) {
  Cover cover;
  ifstream f(path);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path);
    exit(2);
  }
  string line;
  while (getline(f, line)) {
    istringstream ss(line);
    set<long> comm;
    long v;
    while (ss >> v) {
      comm.insert(v);
      universe.insert(v);
    }
    if (!comm.empty()) cover.push_back(comm);
  }
  return cover;
}

// <H(Xi|Y)/H(Xi)> averaged over the communities Xi of X.
// For each pair (Xi, Yj) the 2x2 joint counts over the n-node universe
// are a (neither), b (Yj only), c (Xi only), d (both); the pair is
// admissible only when h(d)+h(a) >= h(b)+h(c) (Appendix B constraint),
// otherwise H(Xi|Yj) defaults to H(Xi).
static double cond_norm(const Cover &X, const Cover &Y, double n) {
  if (X.empty()) return 0.0;
  double total = 0.0;
  for (size_t i = 0; i < X.size(); ++i) {
    double cx = (double)X[i].size();
    double Hxi = h(cx, n) + h(n - cx, n);
    double best = Hxi;  // fallback: no admissible Yj
    for (size_t j = 0; j < Y.size(); ++j) {
      double d = 0.0;
      for (set<long>::const_iterator it = Y[j].begin(); it != Y[j].end();
           ++it)
        if (X[i].count(*it)) d += 1.0;
      double cy = (double)Y[j].size();
      double c = cx - d;
      double b = cy - d;
      double a = n - b - c - d;
      if (h(d, n) + h(a, n) < h(b, n) + h(c, n)) continue;  // inadmissible
      double Hyj = h(cy, n) + h(n - cy, n);
      double cond = h(a, n) + h(b, n) + h(c, n) + h(d, n) - Hyj;
      if (cond < best) best = cond;
    }
    total += (Hxi > 0.0) ? best / Hxi : 0.0;
  }
  return total / (double)X.size();
}

int main(int argc, char **argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s cover_a cover_b\n", argv[0]);
    return 2;
  }
  set<long> universe;
  Cover X = read_cover(argv[1], universe);
  Cover Y = read_cover(argv[2], universe);
  if (X.empty() || Y.empty()) {
    printf("0\n");
    return 0;
  }
  double n = (double)universe.size();
  double nmi = 1.0 - 0.5 * (cond_norm(X, Y, n) + cond_norm(Y, X, n));
  printf("%.10f\n", nmi);
  return 0;
}
