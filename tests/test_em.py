"""Figueiredo-Jain EM fit: component recovery and annihilation."""

import jax
import jax.numpy as jnp
import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.kernels import em
from automix_tpu.model import Model, ModelSet
from automix_tpu.ops import linalg


def _fit_single(samples_np, dim, lmax=10, max_iters=300, seed=0):
    samples = jnp.asarray(samples_np, jnp.float32)
    out = em.fit_figueiredo(samples, jnp.int32(dim),
                            jax.random.PRNGKey(seed), lmax, max_iters)
    return jax.device_get(out)


def test_em_single_gaussian_collapses_to_one_component():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 0.7, size=(1000, 1)).astype(np.float32)
    out = _fit_single(x, 1)
    assert int(out["nmix"]) == 1
    lam = out["lam"]
    live = lam > 0
    assert live.sum() == 1
    mu = out["mu"][live][0, 0]
    B = out["B"][live][0, 0, 0]
    assert abs(mu - 2.0) < 0.15
    assert abs(B - 0.7) < 0.15


def test_em_two_well_separated_modes():
    rng = np.random.default_rng(1)
    x = np.concatenate([
        rng.normal(-5.0, 1.0, size=(700,)),
        rng.normal(5.0, 1.0, size=(300,)),
    ])[:, None].astype(np.float32)
    out = _fit_single(x, 1, lmax=10, max_iters=500)
    lam = out["lam"]
    live = lam > 0
    assert int(out["nmix"]) == 2, f"found {out['nmix']} comps, lam={lam}"
    mus = np.sort(out["mu"][live][:, 0])
    assert abs(mus[0] + 5.0) < 0.5
    assert abs(mus[1] - 5.0) < 0.5
    lams = out["lam"][live]
    np.testing.assert_allclose(np.sort(lams), [0.3, 0.7], atol=0.08)


def test_em_padded_2d_in_3d_buffer():
    rng = np.random.default_rng(2)
    x2 = rng.multivariate_normal([1.0, -1.0], [[1.0, 0.5], [0.5, 2.0]],
                                 size=800)
    x = np.zeros((800, 3), np.float32)
    x[:, :2] = x2
    out = _fit_single(x, 2, lmax=8, max_iters=300)
    live = out["lam"] > 0
    # padded coordinate untouched
    assert np.all(out["mu"][:, 2] == 0.0)
    mu = (out["lam"][live][:, None] * out["mu"][live]).sum(0)
    np.testing.assert_allclose(mu[:2], [1.0, -1.0], atol=0.25)


def test_fit_proposal_assembles_padded_proposal():
    ms = ModelSet([
        Model("d1", 1, lambda th: -0.5 * th[0] ** 2),
        Model("d2", 2, lambda th: -0.5 * jnp.sum(th ** 2)),
    ])
    cfg = EngineConfig(max_mix_comps=6, max_em_iters=200)
    rng = np.random.default_rng(3)
    samples = np.zeros((2, 500, 2), np.float32)
    samples[0, :, 0] = rng.normal(0, 1, 500)
    samples[1] = rng.normal(0, 1, (500, 2))
    sig = jnp.full((2, 2), 1.0, jnp.float32)
    prop, tele = em.fit_proposal(ms, cfg, jnp.asarray(samples), sig,
                                 jax.random.PRNGKey(0))
    # the component axis is trimmed to the largest fitted mixture
    l_active = prop.lam.shape[1]
    assert l_active == int(np.asarray(prop.nmix).max())
    assert l_active <= 6
    np.testing.assert_allclose(np.asarray(prop.lam).sum(axis=1), 1.0, rtol=1e-5)
    # dead components are identity-padded so logdet == 0
    lam = np.asarray(prop.lam)
    logdet = np.asarray(prop.logdetB)
    assert np.all(logdet[lam == 0] == 0.0)
    # live logdets match recomputation
    B = np.asarray(prop.B)
    for k in range(2):
        dim = [1, 2][k]
        for l in range(6):
            if lam[k, l] > 0:
                want = np.log(np.abs(np.diag(B[k, l])[:dim])).sum()
                np.testing.assert_allclose(logdet[k, l], want, atol=1e-4)


def test_fit_autorj_mode():
    ms = ModelSet([Model("d2", 2, lambda th: -0.5 * jnp.sum(th ** 2))])
    cfg = EngineConfig(mix_fit="autorj", max_mix_comps=4)
    rng = np.random.default_rng(4)
    samples = rng.multivariate_normal([1.0, 2.0], [[2.0, 0.3], [0.3, 1.0]],
                                      size=(1, 2000)).astype(np.float32)
    sig = jnp.ones((1, 2), jnp.float32)
    prop, _ = em.fit_proposal(ms, cfg, jnp.asarray(samples), sig,
                              jax.random.PRNGKey(0))
    assert int(prop.nmix[0]) == 1
    assert prop.lam.shape == (1, 1)      # trimmed to the single component
    np.testing.assert_allclose(np.asarray(prop.lam[0]), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(prop.mu[0, 0]), [1.0, 2.0], atol=0.1)
    B = np.asarray(prop.B[0, 0])
    cov = B @ B.T
    np.testing.assert_allclose(cov, [[2.0, 0.3], [0.3, 1.0]], atol=0.2)
