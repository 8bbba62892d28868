"""Reference option-surface coverage: doPerm, Student-t dof, pk re-init.

These exercise the configuration paths the reference exposes via
``doPerm``/``student_T_dof`` (automix.h:222-228) and the adaptation
re-init safeguard (automix.c:1268-1281).
"""

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.kernels import rjmcmc
from automix_tpu.models import builtin
from automix_tpu.models.toy import TOY1_MODEL_PROBS, toy1_set
from automix_tpu.ops import randoms
from automix_tpu.sampler import AMSampler


def _cfg(**kw):
    base = dict(n_chains=256, n_chains_stage1=128, stage1_sweeps=400,
                sweep_chunk=200, max_em_iters=100, max_mix_comps=8, seed=51)
    base.update(kw)
    return EngineConfig(**base)


def test_perm_mode_preserves_exact_posteriors():
    """doPerm permutes the RJ latent (automix.c:1184-1194); correctness of
    the exact toy1 posteriors must be unaffected."""
    am = AMSampler(toy1_set(), _cfg(perm=True))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1500)
    np.testing.assert_allclose(stats.model_probs, TOY1_MODEL_PROBS, atol=0.06)


def test_student_t_dof_preserves_posteriors():
    """student_T_dof > 0 switches RWM/RJ perturbations to Student-t
    (automix.c:1663-1680); the stationary distribution is unchanged."""
    am = AMSampler(toy1_set(), _cfg(student_t_dof=5, seed=52))
    am.burn_samples(300)
    stats = am.rjmcmc_samples(1500)
    np.testing.assert_allclose(stats.model_probs, TOY1_MODEL_PROBS, atol=0.07)


def test_rand_t_moments():
    key = jax.random.PRNGKey(0)
    z = np.asarray(randoms.rand_t(key, (200_000,), 5, jnp.float32))
    # t(5): var = 5/3
    assert abs(z.mean()) < 0.02
    assert abs(z.var() - 5.0 / 3.0) < 0.06
    z0 = np.asarray(randoms.rand_t(key, (200_000,), 0, jnp.float32))
    assert abs(z0.var() - 1.0) < 0.02


def test_masked_permutation_prefix_only():
    key = jax.random.PRNGKey(3)
    idx = np.asarray(randoms.masked_permutation(key, jnp.int32(4), 7))
    assert sorted(idx[:4]) == [0, 1, 2, 3]      # prefix permuted
    assert sorted(idx[4:]) == [4, 5, 6]         # tail stays in tail


def test_pk_reinit_safeguard():
    """Force a tiny pkllim breach: a chain whose pk drifts under the limit
    must reset to uniform and lower its limit (automix.c:1268-1281)."""
    ms = builtin.normal_beta_set()
    cfg = _cfg(n_chains=64)
    am = AMSampler(ms, cfg)
    am.estimate_conditional_probs()
    am._ensure_chains()
    # pin one chain's pk just above the threshold so adaptation breaches it
    pk = np.array(am.chains.pk)
    pk[0] = [0.1001, 0.8999]
    am.chains = am.chains.replace(pk=jnp.asarray(pk, cfg.dtype))
    am.rjmcmc_samples(200)
    nre = np.asarray(am.chains.nreinit)
    pk_after = np.asarray(am.chains.pk)
    assert nre.max() >= 2          # at least chain 0 re-inited
    # after a re-init the limit drops to 1/(10*nreinit)
    lim = np.asarray(am.chains.pkllim)
    np.testing.assert_allclose(lim, 1.0 / (10.0 * nre), rtol=1e-5)
    assert np.all(pk_after > 0)


def test_adapt_off_keeps_pk_fixed():
    ms = builtin.normal_beta_set()
    am = AMSampler(ms, _cfg(adapt=False, n_chains=32))
    am.estimate_conditional_probs()
    am._ensure_chains()
    pk0 = np.asarray(am.chains.pk).copy()
    am.rjmcmc_samples(100)
    np.testing.assert_array_equal(pk0, np.asarray(am.chains.pk))
