/* Minimal header-only GSL shim — random number generator core.
 *
 * Lets the reference implementation (premgopalan/svinet, which links
 * against real GSL) compile on this machine, where GSL is not installed,
 * so tools/parity_run.py can rebuild it and regenerate the BASELINE.md
 * numbers. std::mt19937_64 replaces gsl's default taus/mt generators:
 * statistically equivalent for the parity runs, NOT bit-compatible with
 * real GSL (bitwise parity is neither possible nor required —
 * SURVEY.md §7 "Reproducibility across replicas").
 *
 * Covers exactly the symbols the reference uses (see gsl_randist.h and
 * gsl_sf_psi.h for the rest): gsl_rng_env_setup, gsl_rng_default,
 * gsl_rng_alloc, gsl_rng_set, gsl_rng_uniform, gsl_rng_uniform_int.
 */
#ifndef GSLSHIM_RNG_H
#define GSLSHIM_RNG_H

#include <random>
#include <cstdlib>

typedef struct {
  const char *name;
} gsl_rng_type;

typedef struct {
  std::mt19937_64 gen;
} gsl_rng;

static const gsl_rng_type gslshim_mt_type = {"gslshim-mt19937_64"};
static const gsl_rng_type *gsl_rng_default = &gslshim_mt_type;

static inline const gsl_rng_type *gsl_rng_env_setup(void) {
  return gsl_rng_default;
}

static inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *) {
  return new gsl_rng();
}

static inline void gsl_rng_free(gsl_rng *r) { delete r; }

static inline void gsl_rng_set(gsl_rng *r, unsigned long int seed) {
  r->gen.seed(seed ? seed : 4357UL);  /* gsl maps seed 0 to a default */
}

/* double in [0, 1) */
static inline double gsl_rng_uniform(gsl_rng *r) {
  return std::uniform_real_distribution<double>(0.0, 1.0)(r->gen);
}

/* integer in [0, n) */
static inline unsigned long int gsl_rng_uniform_int(gsl_rng *r,
                                                    unsigned long int n) {
  return std::uniform_int_distribution<unsigned long int>(0, n - 1)(r->gen);
}

#endif /* GSLSHIM_RNG_H */
