"""Unit tests for the masked small-matrix linear algebra ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from automix_tpu.ops import linalg


def _rand_spd(rng, d):
    a = rng.standard_normal((d, d))
    return a @ a.T + d * np.eye(d)


def test_chol_matches_numpy_padded():
    rng = np.random.default_rng(0)
    dmax, dim = 6, 4
    cov = np.zeros((dmax, dmax))
    cov[:dim, :dim] = _rand_spd(rng, dim)
    B = np.asarray(linalg.chol(jnp.asarray(cov, jnp.float32), dim=dim))
    ref = np.linalg.cholesky(cov[:dim, :dim])
    np.testing.assert_allclose(B[:dim, :dim], ref, rtol=2e-4, atol=2e-4)
    # identity tail
    np.testing.assert_allclose(B[dim:, dim:], np.eye(dmax - dim), atol=1e-6)


def test_forward_substitute_roundtrip():
    rng = np.random.default_rng(1)
    d = 5
    L = np.tril(rng.standard_normal((d, d))) + 3 * np.eye(d)
    x = rng.standard_normal(d)
    w = np.asarray(linalg.forward_substitute(jnp.asarray(L, jnp.float32),
                                             jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(L @ w, x, rtol=1e-4, atol=1e-4)


def test_forward_substitute_batched():
    rng = np.random.default_rng(2)
    B = np.tril(rng.standard_normal((7, 3, 3))) + 2 * np.eye(3)
    x = rng.standard_normal((7, 3))
    w = np.asarray(linalg.forward_substitute(jnp.asarray(B, jnp.float32),
                                             jnp.asarray(x, jnp.float32)))
    for i in range(7):
        np.testing.assert_allclose(B[i] @ w[i], x[i], rtol=1e-4, atol=1e-4)


def test_lnormprob_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(3)
    dmax, dim = 5, 3
    cov = np.eye(dmax)
    cov[:dim, :dim] = _rand_spd(rng, dim)
    mu = np.zeros(dmax)
    mu[:dim] = rng.standard_normal(dim)
    x = np.zeros(dmax)
    x[:dim] = rng.standard_normal(dim)
    B = linalg.chol(jnp.asarray(cov, jnp.float32), dim=dim)
    got = float(linalg.lnormprob(jnp.asarray(x, jnp.float32),
                                 jnp.asarray(mu, jnp.float32), B, dim))
    want = scipy_stats.multivariate_normal(mu[:dim], cov[:dim, :dim]).logpdf(x[:dim])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_log_det_tri_masks_padding():
    B = jnp.asarray(np.diag([2.0, 3.0, 7.0, 1.0]), jnp.float32)
    got = float(linalg.log_det_tri(B, dim=3))
    np.testing.assert_allclose(got, np.log(2.0 * 3.0 * 7.0), rtol=1e-4)


def test_lower_matvec_ignores_upper_garbage():
    B = jnp.asarray([[2.0, 99.0], [1.0, 3.0]], jnp.float32)
    w = jnp.asarray([1.0, 1.0], jnp.float32)
    got = np.asarray(linalg.lower_matvec(B, w))
    np.testing.assert_allclose(got, [2.0, 4.0])


def test_weighted_mean_cov():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((100, 3))
    w = rng.uniform(0.1, 1.0, 100)
    mean, cov, sumw = linalg.weighted_mean_cov(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32))
    wm = (w[:, None] * x).sum(0) / w.sum()
    xc = x - wm
    wc = np.einsum("n,ni,nj->ij", w, xc, xc) / w.sum()
    np.testing.assert_allclose(np.asarray(mean), wm, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov), wc, rtol=1e-3, atol=1e-4)
