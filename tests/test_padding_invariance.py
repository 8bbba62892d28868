"""Padding-invariance property tests (SURVEY.md section 4).

The engine's core invariant: growing the padded buffer beyond a model's
true dimension must not change any computed quantity.  The reference never
faces this (it tracks true dims in scalar control flow); here the padding
convention carries the correctness burden, so it gets its own tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.ops import linalg


def _spd(rng, d):
    a = rng.standard_normal((d, d))
    return a @ a.T + d * np.eye(d)


def _pad_cov(cov, dmax):
    d = cov.shape[0]
    out = np.eye(dmax)
    out[:d, :d] = cov
    return out


def test_lnormprob_invariant_under_padding():
    rng = np.random.default_rng(0)
    d = 3
    cov = _spd(rng, d)
    mu = rng.standard_normal(d)
    x = rng.standard_normal(d)
    vals = []
    for dmax in (3, 5, 9):
        B = linalg.chol(jnp.asarray(_pad_cov(cov, dmax), jnp.float32))
        xp = np.zeros(dmax, np.float32)
        xp[:d] = x
        mup = np.zeros(dmax, np.float32)
        mup[:d] = mu
        vals.append(float(linalg.lnormprob(
            jnp.asarray(xp), jnp.asarray(mup), B, d)))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-5)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-5)


def test_forward_substitute_padding_yields_zero_tail():
    rng = np.random.default_rng(1)
    d, dmax = 2, 6
    cov = _spd(rng, d)
    B = linalg.chol(jnp.asarray(_pad_cov(cov, dmax), jnp.float32))
    y = np.zeros(dmax, np.float32)
    y[:d] = rng.standard_normal(d)
    w = np.asarray(linalg.forward_substitute(B, jnp.asarray(y)))
    assert np.all(w[d:] == 0.0)


def test_sampler_results_invariant_under_extra_padding():
    """End-to-end: the same 1-D target sampled at dmax=1 and artificially
    padded to dmax=4 (via a never-visited high-dim companion model with
    ~zero posterior mass) produces the same moments."""
    from automix_tpu.config import EngineConfig
    from automix_tpu.model import Model, ModelSet
    from automix_tpu.sampler import AMSampler

    def logp_1d(th):
        return -0.5 * (th[0] - 0.5) ** 2

    def logp_4d_negligible(th):
        # astronomically small prior weight: never visited after burn-in
        return -0.5 * jnp.sum(th ** 2) - 500.0

    cfg = dict(n_chains=256, n_chains_stage1=128, stage1_sweeps=300,
               sweep_chunk=200, max_em_iters=80, max_mix_comps=6, seed=13)
    am1 = AMSampler(ModelSet([
        Model("m", 1, logp_1d, init=np.array([0.5]))]),
        EngineConfig(**cfg))
    am1.burn_samples(200)
    s1 = am1.rjmcmc_samples(800)

    am2 = AMSampler(ModelSet([
        Model("m", 1, logp_1d, init=np.array([0.5])),
        Model("pad", 4, logp_4d_negligible, init=np.zeros(4))]),
        EngineConfig(**cfg))
    am2.burn_samples(200)
    s2 = am2.rjmcmc_samples(800)

    assert s2.model_probs[1] < 1e-3          # companion never retained
    np.testing.assert_allclose(s1.theta_mean()[0, 0],
                               s2.theta_mean()[0, 0], atol=0.05)
    np.testing.assert_allclose(s1.theta_std()[0, 0],
                               s2.theta_std()[0, 0], atol=0.05)
