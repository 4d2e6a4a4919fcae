/* Minimal header-only GSL shim — distributions (see gsl_rng.h for why).
 *
 * Covers the reference's usage: gsl_ran_gamma (Marsaglia-Tsang, the same
 * algorithm real GSL uses), gsl_ran_beta, gsl_ran_bernoulli(_pdf),
 * gsl_ran_multinomial (conditional binomials), gsl_ran_dirichlet,
 * gsl_ran_shuffle (Fisher-Yates).
 */
#ifndef GSLSHIM_RANDIST_H
#define GSLSHIM_RANDIST_H

#include <cmath>
#include <cstring>
#include <random>
#include <gsl/gsl_rng.h>

static inline double gsl_ran_gaussian_shim_(gsl_rng *r) {
  return std::normal_distribution<double>(0.0, 1.0)(r->gen);
}

/* Marsaglia & Tsang (2000); a < 1 via the boost U^(1/a) trick. */
static inline double gsl_ran_gamma(gsl_rng *r, double a, double b) {
  if (a < 1.0) {
    double u = gsl_rng_uniform(r);
    while (u <= 0.0) u = gsl_rng_uniform(r);
    return gsl_ran_gamma(r, 1.0 + a, b) * std::pow(u, 1.0 / a);
  }
  const double d = a - 1.0 / 3.0;
  const double c = 1.0 / std::sqrt(9.0 * d);
  for (;;) {
    double x, v;
    do {
      x = gsl_ran_gaussian_shim_(r);
      v = 1.0 + c * x;
    } while (v <= 0.0);
    v = v * v * v;
    const double u = gsl_rng_uniform(r);
    if (u < 1.0 - 0.0331 * x * x * x * x) return b * d * v;
    if (u > 0.0 && std::log(u) < 0.5 * x * x + d * (1.0 - v + std::log(v)))
      return b * d * v;
  }
}

static inline double gsl_ran_beta(gsl_rng *r, double a, double b) {
  const double x = gsl_ran_gamma(r, a, 1.0);
  const double y = gsl_ran_gamma(r, b, 1.0);
  return x / (x + y);
}

static inline unsigned int gsl_ran_bernoulli(gsl_rng *r, double p) {
  return gsl_rng_uniform(r) < p ? 1u : 0u;
}

static inline double gsl_ran_bernoulli_pdf(unsigned int k, double p) {
  return k == 0 ? 1.0 - p : (k == 1 ? p : 0.0);
}

static inline void gsl_ran_multinomial(gsl_rng *r, size_t K, unsigned int N,
                                       const double p[], unsigned int n[]) {
  double norm = 0.0;
  for (size_t k = 0; k < K; ++k) norm += p[k];
  double sum_p = 0.0;
  unsigned int sum_n = 0;
  for (size_t k = 0; k < K; ++k) {
    if (p[k] > 0.0 && sum_p < norm) {
      std::binomial_distribution<unsigned int> bin(
          N - sum_n, p[k] / (norm - sum_p));
      n[k] = (N - sum_n) ? bin(r->gen) : 0;
    } else {
      n[k] = 0;
    }
    sum_p += p[k];
    sum_n += n[k];
  }
}

static inline void gsl_ran_dirichlet(gsl_rng *r, size_t K,
                                     const double alpha[], double theta[]) {
  double norm = 0.0;
  for (size_t k = 0; k < K; ++k) {
    theta[k] = gsl_ran_gamma(r, alpha[k], 1.0);
    norm += theta[k];
  }
  if (norm <= 0.0) norm = 1.0;
  for (size_t k = 0; k < K; ++k) theta[k] /= norm;
}

static inline void gsl_ran_shuffle(gsl_rng *r, void *base, size_t n,
                                   size_t size) {
  char *b = static_cast<char *>(base);
  for (size_t i = n - 1; i > 0; --i) {
    const size_t j = gsl_rng_uniform_int(r, i + 1);
    if (j != i)
      for (size_t t = 0; t < size; ++t) {
        const char c = b[i * size + t];
        b[i * size + t] = b[j * size + t];
        b[j * size + t] = c;
      }
  }
}

#endif /* GSLSHIM_RANDIST_H */
