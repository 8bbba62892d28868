"""Tests for the pallas hardware-PRNG sweep-randomness kernel
(kernels/sweep_rng.py), run in interpreter mode on the CPU test mesh.

On real TPU the kernel uses the core PRNG; here the interpreter emulates
it.  The contract tested — shapes, uniform/normal marginals, determinism
in (seed, sweep), block-offset consistency — is platform-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automix_tpu.config import EngineConfig
from automix_tpu.kernels import sweep_rng


def _draw(seed, sweep, block0, s, mu, mz):
    scal = jnp.array([seed, sweep, block0], jnp.int32)
    u, z = sweep_rng.draw(scal, s, mu, mz, interpret=True)
    return np.asarray(u), np.asarray(z)


def test_shapes_and_ranges():
    u, z = _draw(1, 2, 0, 512, 25, 4)
    assert u.shape == (512, 25) and z.shape == (512, 4)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert np.all(np.isfinite(z))


def test_marginals():
    u, z = _draw(7, 3, 0, 2048, 25, 4)
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    assert abs(z.mean()) < 0.02
    assert abs(z.var() - 1.0) < 0.03


def test_deterministic_in_seed_and_sweep():
    u1, z1 = _draw(5, 11, 0, 256, 9, 2)
    u2, z2 = _draw(5, 11, 0, 256, 9, 2)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(z1, z2)
    u3, _ = _draw(5, 12, 0, 256, 9, 2)
    u4, _ = _draw(6, 11, 0, 256, 9, 2)
    assert not np.array_equal(u1, u3)
    assert not np.array_equal(u1, u4)


def test_block_offset_addresses_global_rows():
    """Rows [half:] of a full draw equal a half-size draw whose block0
    points at the same global blocks — the property that makes sharded
    generation layout-invariant."""
    s = 4 * sweep_rng.CHAIN_BLOCK if sweep_rng.CHAIN_BLOCK <= 256 else 512
    cb = sweep_rng.choose_block(s)
    u, z = _draw(3, 9, 0, s, 9, 2)
    uh, zh = _draw(3, 9, (s // 2) // cb, s // 2, 9, 2)
    # only equal when the half keeps the same block size
    if sweep_rng.choose_block(s // 2) == cb:
        np.testing.assert_array_equal(u[s // 2:], uh)
        np.testing.assert_array_equal(z[s // 2:], zh)


def test_resolve_rng():
    assert sweep_rng.resolve_rng(EngineConfig()) == "fast"
    assert sweep_rng.resolve_rng(EngineConfig(student_t_dof=4)) == "threefry"
    assert sweep_rng.resolve_rng(EngineConfig(rng="pallas")) == "pallas"
    assert sweep_rng.resolve_rng(EngineConfig(rng="threefry")) == "threefry"


# --- the fused counter-hash generator (ops/randoms.py, the default) -------


def test_fast_marginals_and_determinism():
    from automix_tpu.ops import randoms

    u, z = randoms.fast_sweep_randoms(3, 17, 0, 4096, 25, 4)
    u, z = np.asarray(u), np.asarray(z)
    assert u.shape == (4096, 25) and z.shape == (4096, 4)
    assert u.min() > 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.002
    assert abs(z.mean()) < 0.03 and abs(z.var() - 1.0) < 0.03
    # normal tails: kurtosis near 3
    kurt = (z.ravel() ** 4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.3
    u2, z2 = randoms.fast_sweep_randoms(3, 17, 0, 4096, 25, 4)
    np.testing.assert_array_equal(u, np.asarray(u2))
    u3, _ = randoms.fast_sweep_randoms(3, 18, 0, 4096, 25, 4)
    assert not np.array_equal(u, np.asarray(u3))


def test_fast_chain_offset_is_global_indexing():
    from automix_tpu.ops import randoms

    u, z = randoms.fast_sweep_randoms(9, 5, 0, 64, 7, 2)
    uh, zh = randoms.fast_sweep_randoms(9, 5, 32, 32, 7, 2)
    np.testing.assert_array_equal(np.asarray(u)[32:], np.asarray(uh))
    np.testing.assert_array_equal(np.asarray(z)[32:], np.asarray(zh))


def test_fast_no_cross_sweep_or_cross_chain_correlation():
    """Chi-square uniformity over 256 bins, pooled across sweeps, plus
    lag-1 serial correlation along chains and across sweeps."""
    from automix_tpu.ops import randoms

    us = []
    for sweep in range(4):
        u, _ = randoms.fast_sweep_randoms(1, sweep, 0, 8192, 8, 2)
        us.append(np.asarray(u, np.float64))
    x = np.stack(us)                      # [4, 8192, 8]
    counts, _ = np.histogram(x, bins=256, range=(0.0, 1.0))
    expected = x.size / 256
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # dof=255: mean 255, sd ~22.6; 5 sigma
    assert abs(chi2 - 255) < 5 * 22.6, chi2
    flat = x.reshape(4, -1)
    serial = np.corrcoef(flat[0][:-1], flat[0][1:])[0, 1]
    cross = np.corrcoef(flat[0], flat[1])[0, 1]
    assert abs(serial) < 0.02 and abs(cross) < 0.02


@pytest.mark.parametrize("use_mesh", [False, True])
def test_engine_runs_with_pallas_rng(use_mesh, eight_devices):
    """End-to-end sanity: the sweep kernel consumes pallas randomness
    (interpret mode) and produces a correct posterior mean on the
    single-model Normal target (reference tests/test_automix.c:53-56)."""
    from automix_tpu.models import builtin
    from automix_tpu.parallel import mesh as mesh_lib
    from automix_tpu.sampler import AMSampler

    cfg = EngineConfig(n_chains=64, n_chains_stage1=64, stage1_sweeps=200,
                       sweep_chunk=50, max_em_iters=40, max_mix_comps=4,
                       seed=0, rng="pallas", trace_chain0=False)
    mesh = mesh_lib.make_mesh(8) if use_mesh else None
    am = AMSampler(builtin.normal_sampler_set(), cfg, mesh=mesh)
    am.burn_samples(50)
    stats = am.rjmcmc_samples(300)
    assert abs(stats.theta_mean()[0, 0] - 0.5) < 0.2
    assert abs(stats.theta_std()[0, 0] - 1.0) < 0.3
