"""HMC within-model move: correctness of moments and trans-dim compatibility."""

import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.models import builtin
from automix_tpu.models.toy import TOY1_MODEL_PROBS, toy1_set
from automix_tpu.sampler import AMSampler


def _cfg(**kw):
    base = dict(n_chains=256, n_chains_stage1=128, stage1_sweeps=400,
                sweep_chunk=200, max_em_iters=100, max_mix_comps=8, seed=31,
                within_move="hmc", hmc_steps=5, hmc_step_scale=0.2)
    base.update(kw)
    return EngineConfig(**base)


def test_hmc_normal_sampler_moments():
    am = AMSampler(builtin.normal_sampler_set(), _cfg())
    am.burn_samples(200)
    stats = am.rjmcmc_samples(800)
    assert abs(stats.theta_mean()[0, 0] - 0.5) < 0.1
    assert abs(stats.theta_std()[0, 0] - 1.0) < 0.1
    # HMC acceptance should be high on a Gaussian target
    assert stats.naccrwmb / stats.ntryrwmb > 0.6


def test_hmc_with_trans_dimensional_jumps():
    """HMC within-model + RJ across models keeps exact model posteriors."""
    am = AMSampler(toy1_set(), _cfg(seed=32))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1500)
    np.testing.assert_allclose(stats.model_probs, TOY1_MODEL_PROBS, atol=0.06)


def test_hmc_retune_api():
    """retune_hmc re-runs the autotuner against the current proposal and
    rebuilds the runners; a proposal re-fit triggers it automatically."""
    from automix_tpu.models import builtin

    cfg = EngineConfig(n_chains=64, n_chains_stage1=64, stage1_sweeps=200,
                       sweep_chunk=50, seed=7, within_move="hmc",
                       max_mix_comps=6, max_em_iters=60,
                       trace_chain0=False)
    am = AMSampler(builtin.normal_params_set(), cfg)
    am.burn_samples(30)                       # triggers first autotune
    first = am.cfg.hmc_step_scale
    assert isinstance(first, tuple) and len(first) == 1
    assert am._runners
    scales = am.retune_hmc()                  # on-demand re-tune
    assert not am._runners                    # runners invalidated
    assert isinstance(am.cfg.hmc_step_scale, tuple)
    assert scales.shape == (1,)
    am.rjmcmc_samples(50)                     # runs fine post-retune
    # a re-fit auto-retunes (stale preconditioner)
    before = am.cfg.hmc_step_scale
    am.estimate_conditional_probs()
    assert isinstance(am.cfg.hmc_step_scale, tuple)
    # tuned against a fresh fit with a fresh key: almost surely different
    assert am.cfg.hmc_step_scale != before
