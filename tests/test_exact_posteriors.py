"""Exact-answer end-to-end tests.

The toy model families have *normalized* per-model densities with explicit
prior weights folded into logp, so the true posterior model probabilities
are the weights exactly (no quadrature or oracle needed).  This is the
sharpest end-to-end correctness check of the trans-dimensional kernel —
any error in the Jacobian, allocation probabilities, or latent accounting
shows up as a systematic deviation far beyond Monte-Carlo error.

(For reference: the C implementation run on toy2 with 2e5 sweeps lands at
[0.523, 0.260, 0.131, 0.020, 0.065] against exact [0.5, 0.25, 0.125,
0.0625, 0.0625] — its single chain under-visits model 4.)
"""

import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.models.toy import (
    TOY1_MODEL_PROBS,
    TOY2_MODEL_PROBS,
    toy1_set,
    toy2_set,
)
from automix_tpu.sampler import AMSampler


def test_toy1_exact_model_probs():
    cfg = EngineConfig(n_chains=512, n_chains_stage1=256, stage1_sweeps=600,
                       sweep_chunk=400, max_em_iters=200, max_mix_comps=10,
                       seed=11)
    am = AMSampler(toy1_set(), cfg)
    am.burn_samples(400)
    stats = am.rjmcmc_samples(1600)
    probs = stats.model_probs
    np.testing.assert_allclose(probs, TOY1_MODEL_PROBS, atol=0.05)


def test_toy2_exact_model_probs():
    cfg = EngineConfig(n_chains=256, n_chains_stage1=256, stage1_sweeps=800,
                       sweep_chunk=400, max_em_iters=300, max_mix_comps=12,
                       seed=12)
    am = AMSampler(toy2_set(), cfg)
    am.burn_samples(500)
    stats = am.rjmcmc_samples(1700)
    probs = stats.model_probs
    # beat the reference's own single-chain accuracy (see docstring)
    np.testing.assert_allclose(probs, TOY2_MODEL_PROBS, atol=0.06)
