/* In-situ C reference baseline: stage-3 sweep throughput of the
 * reference libautomix on the tutorial 3-model target.
 *
 * Built at bench time against the *reference's own* library source
 * (/root/reference/src/libautomix/automix.c, untouched) so the
 * `vs_baseline` figure in bench.py compares against a number measured on
 * the same host, same compiler, same -O3 — not a frozen constant (round-3
 * verdict: the previous hard-coded 906k sweeps/s was ~1.5x stale-low).
 *
 * The target is this engine's own transcription of the tutorial
 * model-choice problem (automix_tpu/models/tutorial.py; reference program
 * tutorial.c / docs/tutorial.rst): Normal vs Beta vs Gamma over ten
 * observations.  Timed section = burn + production sweeps of
 * rjmcmc_samples (reference hot loop 3, automix.c:90-125), self-timed the
 * way the reference times itself (clock(), logwrite.c:340-342).
 *
 * Usage: c_baseline [nsweep]   (default 200000; prints one JSON line)
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#include "automix.h"

#define NDATA 10
static const double DATA[NDATA] = {0.2,  0.13, 0.35, 0.17, 0.89,
                                   0.33, 0.78, 0.23, 0.54, 0.16};

/* Tutorial target densities (models/tutorial.py / builtin.py
 * _make_params_targets; formulas from reference tests/test_automix.c:283-321).
 * Out-of-support states return a large negative value the sampler always
 * rejects. */
static double logp(int model_k, double *theta) {
  double lp = 0.0;
  int i;
  if (model_k == 0) { /* Normal(x0, sigma); theta = (sigma, x0) */
    double sigma = theta[0], x0 = theta[1];
    if (sigma <= 0.0)
      return -1e30;
    for (i = 0; i < NDATA; i++) {
      double d = DATA[i] - x0;
      lp -= d * d;
    }
    return -NDATA * log(sigma) + lp / (2.0 * sigma * sigma);
  } else if (model_k == 1) { /* Beta(a, b) */
    double a = theta[0], b = theta[1];
    if (a <= 0.0 || b <= 0.0)
      return -1e30;
    for (i = 0; i < NDATA; i++)
      lp += (a - 1.0) * log(DATA[i]) + (b - 1.0) * log(1.0 - DATA[i]);
    return lp + NDATA * (lgamma(a + b) - lgamma(a) - lgamma(b));
  } else { /* Gamma(a, b) */
    double a = theta[0], b = theta[1];
    if (a <= 0.0 || b <= 0.0)
      return -1e30;
    for (i = 0; i < NDATA; i++)
      lp += (a - 1.0) * log(DATA[i]) - b * DATA[i];
    return lp + NDATA * (a * log(b) - lgamma(a));
  }
}

int main(int argc, char **argv) {
  int nsweep = (argc > 1) ? atoi(argv[1]) : 200000;
  int nburn = 10000;
  int dims[3] = {2, 2, 2};
  /* inits per tutorial.c:19 semantics (models/tutorial.py), flat layout
   * per initAMSampler (automix.c:218-228) */
  double init[6] = {0.5, 0.5, 2.0, 2.0, 9.0, 2.0};
  amSampler am;
  clock_t t0;
  double dt;

  if (initAMSampler(&am, 3, dims, logp, init) != 0) {
    fprintf(stderr, "initAMSampler failed\n");
    return 1;
  }
  estimate_conditional_probs(&am, 100000); /* untimed adaptation */

  t0 = clock();
  burn_samples(&am, nburn);
  rjmcmc_samples(&am, nsweep);
  dt = (double)(clock() - t0) / CLOCKS_PER_SEC;

  printf("{\"sweeps\": %d, \"seconds\": %.4f, \"sweeps_per_s\": %.1f}\n",
         nburn + nsweep, dt, (nburn + nsweep) / dt);
  freeAMSampler(&am);
  return 0;
}
