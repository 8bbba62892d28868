"""SMC evidence estimator: exact-answer and tutorial parity checks."""

import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.models.toy import TOY1_MODEL_PROBS, toy1_set
from automix_tpu.models.tutorial import TUTORIAL_MODEL_PROBS, tutorial_set
from automix_tpu.sampler import AMSampler


def _cfg(**kw):
    base = dict(n_chains=64, n_chains_stage1=256, stage1_sweeps=500,
                sweep_chunk=100, max_em_iters=150, max_mix_comps=10, seed=41)
    base.update(kw)
    return EngineConfig(**base)


def test_smc_toy1_exact_evidences():
    """toy1 densities are normalized with explicit weights: evidences must
    equal (0.3, 0.7) and their logs (log 0.3, log 0.7)."""
    am = AMSampler(toy1_set(), _cfg())
    out = am.smc_evidence(n_particles=1024, n_temps=10, n_moves=2)
    np.testing.assert_allclose(out["model_probs"], TOY1_MODEL_PROBS,
                               atol=0.04)
    np.testing.assert_allclose(out["log_evidence"],
                               np.log(TOY1_MODEL_PROBS), atol=0.1)


def test_smc_tutorial_matches_published():
    am = AMSampler(tutorial_set(), _cfg(seed=42))
    out = am.smc_evidence(n_particles=1024, n_temps=12, n_moves=2)
    np.testing.assert_allclose(out["model_probs"], TUTORIAL_MODEL_PROBS,
                               atol=0.05)
    # ESS should stay healthy along the short bridge from the fitted q
    assert np.min(out["ess"]) > 0.2 * 1024
