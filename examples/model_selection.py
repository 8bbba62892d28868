"""Minimal model-selection example: which of two models explains the data?

Run:  python examples/model_selection.py  (add --cpu to force CPU)
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from automix_tpu import AMSampler, EngineConfig, Model, ModelSet

# Synthetic data from a quadratic trend
rng = np.random.default_rng(0)
x = np.linspace(-1, 1, 40)
y = 1.0 + 0.5 * x + 1.5 * x ** 2 + rng.normal(0, 0.3, 40)
xj, yj = jnp.asarray(x), jnp.asarray(y)
n = 40
SIGMA = 0.3


def logp_linear(th):
    """y = a + b x, fixed noise; N(0,1) priors on (a, b)."""
    resid = yj - th[0] - th[1] * xj
    return (-0.5 * jnp.sum(resid ** 2) / SIGMA ** 2
            - 0.5 * jnp.sum(th[:2] ** 2))


def logp_quadratic(th):
    """y = a + b x + c x^2, same priors."""
    resid = yj - th[0] - th[1] * xj - th[2] * xj ** 2
    return (-0.5 * jnp.sum(resid ** 2) / SIGMA ** 2
            - 0.5 * jnp.sum(th[:3] ** 2))


def main():
    ms = ModelSet([
        Model("linear", 2, logp_linear, init=np.zeros(2)),
        Model("quadratic", 3, logp_quadratic, init=np.zeros(3)),
    ])
    am = AMSampler(ms, EngineConfig(n_chains=2048, seed=1,
                                    n_chains_stage1=1024, stage1_sweeps=2000))
    am.burn_samples(2000)
    stats = am.rjmcmc_samples(20_000)
    print("posterior model probabilities (RJ visit fractions):")
    for m, p in zip(ms.models, stats.model_probs):
        print(f"  {m.name:10s} {p:.4f}")
    means = stats.theta_mean()
    print("quadratic-model coefficient means:", np.round(means[1, :3], 3),
          "(true: [1.0, 0.5, 1.5])")

    out = am.smc_evidence(n_particles=2048, n_temps=15)
    print("SMC cross-check:", np.round(out["model_probs"], 4),
          "log-evidences:", np.round(out["log_evidence"], 2))


if __name__ == "__main__":
    main()
