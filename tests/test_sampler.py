"""End-to-end pipeline tests: the reference test-suite scenarios, scaled to
CPU-friendly sizes (tolerance discipline follows tests/test_automix.c:166 —
abs tol 0.5 — tightened where the many-chain engine allows)."""

import jax
import numpy as np
import pytest

from automix_tpu.config import EngineConfig
from automix_tpu.models import builtin
from automix_tpu.sampler import AMSampler


def _small_cfg(**kw):
    base = dict(n_chains=256, n_chains_stage1=256, stage1_sweeps=500,
                sweep_chunk=200, max_em_iters=200, max_mix_comps=10, seed=7)
    base.update(kw)
    return EngineConfig(**base)


def test_normal_sampler_end_to_end():
    """Scenario 1 (tests/test_automix.c:49-53): N(0.5, 1.0)."""
    am = AMSampler(builtin.normal_sampler_set(), _small_cfg())
    am.estimate_conditional_probs()
    am.burn_samples(200)
    stats = am.rjmcmc_samples(800)
    mean = stats.theta_mean()[0, 0]
    std = stats.theta_std()[0, 0]
    assert abs(mean - 0.5) < 0.1
    assert abs(std - 1.0) < 0.1


def test_truncnormal_support_never_violated():
    """Scenario 2 (tests/test_automix.c:56-60,158-163)."""
    am = AMSampler(builtin.truncnormal_sampler_set(), _small_cfg())
    am.burn_samples(200)
    stats = am.rjmcmc_samples(600)
    mean = stats.theta_mean()[0, 0]
    assert abs(mean - 1.3) < 0.25
    # all live chains inside (0, 10)
    theta = np.asarray(am.chains.theta[:, 0])
    assert np.all((theta > 0.0) & (theta < 10.0))


def test_two_model_normal_beta():
    """Scenario 8 (tests/test_automix.c:105-114): p(M=Normal) ~ 0.95."""
    am = AMSampler(builtin.normal_beta_set(), _small_cfg())
    am.estimate_conditional_probs()
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1200)
    probs = stats.model_probs
    assert abs(probs[0] - 0.95) < 0.2, probs
    means = stats.theta_mean()
    # Normal model params (sigma, x0) ~ (0.2, 0.5)
    assert abs(means[0, 0] - 0.2) < 0.5
    assert abs(means[0, 1] - 0.5) < 0.5


def test_chain_continuity_across_calls():
    am = AMSampler(builtin.normal_sampler_set(), _small_cfg())
    am.burn_samples(100)
    sweep_after_burn = int(am.chains.sweep)
    am.rjmcmc_samples(100)
    assert int(am.chains.sweep) == sweep_after_burn + 100


def test_trace_capture_shapes():
    cfg = _small_cfg(n_trace_chains=4)
    am = AMSampler(builtin.normal_beta_set(), cfg)
    am.burn_samples(100)
    stats = am.rjmcmc_samples(300)
    assert stats.k_trace.shape == (300, 4)
    assert stats.pk_trace.shape == (300, 2)
    assert stats.logp_trace.shape == (300,)
    assert set(np.unique(stats.k_trace)) <= {0, 1}


def test_two_model_gamma_beta():
    """Scenario 7 (tests/test_automix.c:94-103): p(M=Gamma) ~ 0.37 — the
    closest-to-even split in the reference suite."""
    am = AMSampler(builtin.gamma_beta_set(), _small_cfg(seed=9))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1500)
    assert abs(stats.model_probs[0] - 0.37) < 0.15, stats.model_probs


def test_autorj_mode_runs():
    am = AMSampler(builtin.normal_sampler_set(),
                   _small_cfg(mix_fit="autorj"))
    am.burn_samples(100)
    stats = am.rjmcmc_samples(400)
    assert abs(stats.theta_mean()[0, 0] - 0.5) < 0.15


def test_beta_sampler_support_and_moments():
    """Scenario 3 (tests/test_automix.c:63-68): Beta(2,2), mean 0.5,
    support (0,1) never violated (the c test's bounds assertion,
    tests/test_automix.c:158-163)."""
    am = AMSampler(builtin.beta_sampler_set(), _small_cfg())
    am.burn_samples(200)
    stats = am.rjmcmc_samples(800)
    assert abs(stats.theta_mean()[0, 0] - 0.5) < 0.1
    # Beta(2,2) sd = sqrt(1/20) ~ 0.2236
    assert abs(stats.theta_std()[0, 0] - 0.2236) < 0.1
    theta = np.asarray(am.chains.theta[:, 0])
    assert np.all((theta > 0.0) & (theta < 1.0))


def test_normal_params_inference():
    """Scenario 4 (tests/test_automix.c:70-76): E[sigma]~0.2, E[x0]~0.5."""
    am = AMSampler(builtin.normal_params_set(), _small_cfg(seed=8))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1000)
    means = stats.theta_mean()[0]
    assert abs(means[0] - 0.2) < 0.2
    assert abs(means[1] - 0.5) < 0.2


def test_beta_params_inference():
    """Scenario 5 (tests/test_automix.c:78-84): E[alpha]~4.5, E[beta]~5.0."""
    am = AMSampler(builtin.beta_params_set(), _small_cfg(seed=9))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1200)
    means = stats.theta_mean()[0]
    assert abs(means[0] - 4.5) < 1.5
    assert abs(means[1] - 5.0) < 1.5


def test_gamma_params_inference():
    """Scenario 6 (tests/test_automix.c:86-92): E[alpha]~7.0, E[beta]~14.5."""
    am = AMSampler(builtin.gamma_params_set(), _small_cfg(seed=10))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1200)
    means = stats.theta_mean()[0]
    assert abs(means[0] - 7.0) < 2.5
    assert abs(means[1] - 14.5) < 5.0


def test_two_model_normal_gamma():
    """Scenario 9 (tests/test_automix.c:116-125): p(M=Normal)~0.97."""
    am = AMSampler(builtin.normal_gamma_set(), _small_cfg(seed=13))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1200)
    assert abs(stats.model_probs[0] - 0.97) < 0.15, stats.model_probs
