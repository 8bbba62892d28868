"""Checkpoint/resume: killed-and-restarted runs must continue exactly."""

import numpy as np
import pytest

from automix_tpu.config import EngineConfig
from automix_tpu.models import builtin
from automix_tpu.sampler import AMSampler


def _cfg(**kw):
    base = dict(n_chains=64, n_chains_stage1=64, stage1_sweeps=200,
                sweep_chunk=64, max_em_iters=60, max_mix_comps=6, seed=21)
    base.update(kw)
    return EngineConfig(**base)


def test_resume_produces_identical_trajectories(tmp_path):
    ms = builtin.normal_beta_set
    path = str(tmp_path / "ckpt.npz")

    # run A: 200 sweeps straight through
    am_a = AMSampler(ms(), _cfg())
    am_a.burn_samples(64)
    am_a.rjmcmc_samples(200)

    # run B: 100 sweeps, checkpoint, new process-equivalent sampler, resume
    am_b = AMSampler(ms(), _cfg())
    am_b.burn_samples(64)
    am_b.rjmcmc_samples(100)
    am_b.save(path)

    am_c = AMSampler(ms(), _cfg())
    am_c.load(path)
    am_c.rjmcmc_samples(100)

    np.testing.assert_array_equal(np.asarray(am_a.chains.k),
                                  np.asarray(am_c.chains.k))
    np.testing.assert_allclose(np.asarray(am_a.chains.theta),
                               np.asarray(am_c.chains.theta), rtol=1e-6)
    assert int(am_a.chains.sweep) == int(am_c.chains.sweep)
    # accumulated statistics also continue
    np.testing.assert_array_equal(am_a.stats.ksummary, am_c.stats.ksummary)


def test_checkpoint_validates_model_shape(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    am = AMSampler(builtin.normal_beta_set(), _cfg())
    am.burn_samples(32)
    am.save(path)
    other = AMSampler(builtin.normal_sampler_set(), _cfg())
    with pytest.raises(ValueError, match="nmodels"):
        other.load(path)


def test_checkpoint_before_chains(tmp_path):
    """Proposal-only checkpoint (the reference's _mix.data scope)."""
    path = str(tmp_path / "prop.npz")
    am = AMSampler(builtin.normal_sampler_set(), _cfg())
    am.estimate_conditional_probs()
    am.save(path)
    am2 = AMSampler(builtin.normal_sampler_set(), _cfg())
    am2.load(path)
    assert am2.proposal is not None
    np.testing.assert_allclose(np.asarray(am.proposal.lam),
                               np.asarray(am2.proposal.lam))
    st = am2.rjmcmc_samples(100)
    assert st.ksummary.sum() == 64 * 100
