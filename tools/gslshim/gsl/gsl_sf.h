/* Minimal header-only GSL shim — special functions (see gsl_rng.h). */
#ifndef GSLSHIM_SF_H
#define GSLSHIM_SF_H

#include <cmath>
#include <gsl/gsl_sf_psi.h>

static inline double gsl_sf_lngamma(double x) { return std::lgamma(x); }

#endif /* GSLSHIM_SF_H */
