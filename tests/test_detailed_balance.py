"""Stationarity-preservation property test of the full RJ sweep kernel.

SURVEY.md section 4 calls for a detailed-balance check the reference lacks.
The sharpest computable form: start the chain batch from EXACT iid samples
of the toy1 joint target (model ~ {0.3, 0.7}; conditionals are explicit
Normal mixtures, usertoy1.c:34-104) and run the production sweep kernel.
Every sub-move (block/single-site RWM, the trans-dimensional jump with its
Jacobian and allocation terms, pk adaptation — pk only parameterizes the
proposal and appears in the MH ratio, automix.c:1246) leaves the target
invariant, so visit fractions and per-model moments must stay at their
exact values to Monte-Carlo error.  A bug in the Jacobian, allocation
probabilities, or latent accounting shows up as an immediate systematic
drift away from exactness — no mixing-time wait, no burn-in confound.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.models.toy import toy1_set
from automix_tpu.sampler import AMSampler

S = 4096

# Exact toy1 moments.  Model 0: 0.2 N(-3, 4) + 0.8 N(2, 1).
M0_MEAN = 0.2 * -3.0 + 0.8 * 2.0                       # 1.0
M0_VAR = 0.2 * (9 + 4) + 0.8 * (4 + 1) - M0_MEAN ** 2  # 5.6
# Model 1: equal-weight mixture, means (0,3), (-4,1), (4,1),
# covs diag(4,.5), [[2,1.5],[1.5,2]], [[2,-1.5],[-1.5,2]].
M1_MEAN = np.array([0.0, 5.0 / 3.0])
M1_VAR = np.array([(4 + 2 + 16 + 2 + 16) / 3.0,
                   (9 + 0.5 + 1 + 2 + 1 + 2) / 3.0 - (5.0 / 3.0) ** 2])


def _exact_toy1_samples(rng, n):
    """iid draws of (k, theta) from the toy1 joint target."""
    k = (rng.random(n) < 0.7).astype(np.int32)
    theta = np.zeros((n, 2))
    # model 0
    n0 = int((k == 0).sum())
    c0 = rng.choice(2, size=n0, p=[0.2, 0.8])
    mu0 = np.array([-3.0, 2.0])[c0]
    sd0 = np.array([2.0, 1.0])[c0]
    theta[k == 0, 0] = mu0 + sd0 * rng.standard_normal(n0)
    # model 1
    n1 = n - n0
    mus = np.array([[0.0, 3.0], [-4.0, 1.0], [4.0, 1.0]])
    Bs = np.array([
        [[2.0, 0.0], [0.0, 0.7071068]],
        [[1.414214, 0.0], [1.060660, 0.9354143]],
        [[1.414214, 0.0], [-1.060660, 0.9354143]],
    ])
    c1 = rng.choice(3, size=n1)
    z = rng.standard_normal((n1, 2))
    theta[k == 1] = mus[c1] + np.einsum("nij,nj->ni", Bs[c1], z)
    return k, theta


def test_rj_sweep_kernel_preserves_stationarity():
    cfg = EngineConfig(n_chains=S, n_chains_stage1=256, stage1_sweeps=600,
                       sweep_chunk=100, max_em_iters=200, max_mix_comps=10,
                       seed=21)
    am = AMSampler(toy1_set(), cfg)
    am.estimate_conditional_probs()
    am.burn_samples(0)          # builds the chain batch
    rng = np.random.default_rng(17)
    k0, th0 = _exact_toy1_samples(rng, S)
    logp0 = am.modelset.logpost_batch(jnp.asarray(k0),
                                      jnp.asarray(th0, jnp.float32))
    am.chains = dataclasses.replace(
        am.chains,
        k=jnp.asarray(k0),
        theta=jnp.asarray(th0, jnp.float32),
        logp=logp0,
    )
    stats = am.rjmcmc_samples(200)

    # Visit fraction: across-chain per-sweep std is sqrt(.3*.7/S) ~ 0.0072;
    # 0.025 is >3 sigma yet far below the shift any ratio bug produces.
    np.testing.assert_allclose(stats.model_probs, [0.3, 0.7], atol=0.025)

    mean = stats.theta_mean()
    std = stats.theta_std()
    np.testing.assert_allclose(mean[0, 0], M0_MEAN, atol=0.15)
    np.testing.assert_allclose(std[0, 0], np.sqrt(M0_VAR), atol=0.15)
    np.testing.assert_allclose(mean[1], M1_MEAN, atol=0.2)
    np.testing.assert_allclose(std[1], np.sqrt(M1_VAR), atol=0.2)

    # The kernel must never move a chain's padded tail off zero for
    # model 0 (dim 1): theta_sum over padded coords is exactly 0 only if
    # masking is right everywhere in the sweep.
    assert abs(stats.theta_sum[0, 1]) / max(stats.theta_count[0], 1) < 1e-6
