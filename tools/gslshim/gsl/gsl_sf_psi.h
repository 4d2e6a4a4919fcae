/* Minimal header-only GSL shim — digamma (see gsl_rng.h for why).
 *
 * gsl_sf_psi is THE hot special function of the reference (set_dir_exp,
 * reference: src/linksampling.hh:170-201). Standard implementation:
 * upward recurrence to x >= 6, then the asymptotic (Bernoulli) series —
 * same approach as GSL/cephes, agreement to ~1e-12 on x > 0.
 */
#ifndef GSLSHIM_SF_PSI_H
#define GSLSHIM_SF_PSI_H

#include <cmath>

static inline double gsl_sf_psi(double x) {
  double result = 0.0;
  while (x < 6.0) {
    result -= 1.0 / x;
    x += 1.0;
  }
  const double inv = 1.0 / x, inv2 = inv * inv;
  result += std::log(x) - 0.5 * inv
      - inv2 * (1.0 / 12.0
                - inv2 * (1.0 / 120.0
                          - inv2 * (1.0 / 252.0
                                    - inv2 * (1.0 / 240.0
                                              - inv2 * (1.0 / 132.0)))));
  return result;
}

#endif /* GSLSHIM_SF_PSI_H */
