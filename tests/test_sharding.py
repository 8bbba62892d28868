"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The engine's parallelism contract (SURVEY.md section 2.3): chains are
sharded over the mesh, proposals replicated, and chunk statistics reduced
across shards by XLA collectives inserted under jit.  These tests check the
sharded run executes, statistics account for every chain, and — with the
same per-chain keys — sharded and unsharded runs produce bitwise-identical
trajectories (sharding must be a pure layout change).
"""

import jax
import numpy as np
import pytest

from automix_tpu.config import EngineConfig
from automix_tpu.kernels import rjmcmc
from automix_tpu.models import builtin
from automix_tpu.parallel import mesh as mesh_lib
from automix_tpu.sampler import AMSampler
from automix_tpu.state import Proposal


def _setup(n_chains, seed=0):
    ms = builtin.normal_beta_set()
    cfg = EngineConfig(n_chains=n_chains, n_chains_stage1=64,
                       stage1_sweeps=200, sweep_chunk=64,
                       max_em_iters=60, max_mix_comps=6, seed=seed)
    am = AMSampler(ms, cfg)
    am.estimate_conditional_probs()
    return ms, cfg, am.proposal


def test_sharded_run_counts_all_chains(eight_devices):
    ms, cfg, prop = _setup(64)
    mesh = mesh_lib.make_mesh(8)
    chains = rjmcmc.init_chains(ms, cfg, jax.random.PRNGKey(1))
    chains = mesh_lib.shard_chains(chains, mesh)
    prop_r = mesh_lib.replicate(prop, mesh)
    runner = rjmcmc.build_chunk_runner(ms, cfg, burning=False, collect=False)
    chains, chunk = runner(chains, prop_r, 10)
    ks = np.asarray(chunk["ksummary"])
    assert ks.sum() == 64 * 10
    assert np.all(np.isfinite(np.asarray(chains.logp)))


def test_sharded_equals_unsharded(eight_devices):
    """Same keys, same proposal: sharding may not change trajectories."""
    ms, cfg, prop = _setup(64)
    runner = rjmcmc.build_chunk_runner(ms, cfg, burning=False, collect=False)

    chains0 = rjmcmc.init_chains(ms, cfg, jax.random.PRNGKey(2))
    out_plain, chunk_plain = runner(chains0, prop, 20)

    mesh = mesh_lib.make_mesh(8)
    chains_s = mesh_lib.shard_chains(
        rjmcmc.init_chains(ms, cfg, jax.random.PRNGKey(2)), mesh)
    out_shard, chunk_shard = runner(chains_s, mesh_lib.replicate(prop, mesh), 20)

    np.testing.assert_array_equal(np.asarray(out_plain.k),
                                  np.asarray(out_shard.k))
    np.testing.assert_allclose(np.asarray(out_plain.theta),
                               np.asarray(out_shard.theta), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(chunk_plain["ksummary"]),
                                  np.asarray(chunk_shard["ksummary"]))


def test_sampler_with_mesh_end_to_end(eight_devices):
    ms = builtin.normal_sampler_set()
    cfg = EngineConfig(n_chains=128, n_chains_stage1=64, stage1_sweeps=300,
                       sweep_chunk=100, max_em_iters=60, max_mix_comps=6,
                       seed=3)
    am = AMSampler(ms, cfg, mesh=mesh_lib.make_mesh(8))
    am.burn_samples(100)
    stats = am.rjmcmc_samples(400)
    assert abs(stats.theta_mean()[0, 0] - 0.5) < 0.15


def test_dryrun_multichip_entry(eight_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_stage1_sharded_equals_unsharded(eight_devices):
    """Stage-1 adaptation pools acceptance counts as integer psums, so the
    sharded run is BITWISE identical to the unsharded one (kernels/rwm.py):
    sharding stage 1 is a pure layout change."""
    from automix_tpu.kernels import rwm

    ms = builtin.normal_beta_set()
    cfg = EngineConfig(n_chains_stage1=64, seed=0)
    key = jax.random.PRNGKey(5)
    sig_u, samp_u, tele_u = rwm.run_stage1(ms, cfg, key, 300)
    mesh = mesh_lib.make_mesh(8)
    sig_s, samp_s, tele_s = rwm.run_stage1(ms, cfg, key, 300, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(sig_u), np.asarray(sig_s))
    np.testing.assert_array_equal(np.asarray(samp_u), np.asarray(samp_s))
    np.testing.assert_array_equal(np.asarray(tele_u["accept_trace"]),
                                  np.asarray(tele_s["accept_trace"]))


def test_stage2_sharded_matches_unsharded(eight_devices):
    """EM under shard_map (sample axis sharded, psum'd sufficient
    statistics) fits the same mixture as the single-device path: identical
    component counts, parameters equal up to reduction-order rounding."""
    from automix_tpu.kernels import em, rwm

    ms = builtin.normal_beta_set()
    cfg = EngineConfig(n_chains_stage1=64, max_em_iters=60, max_mix_comps=6,
                       seed=0)
    key = jax.random.PRNGKey(5)
    sig, samples, _ = rwm.run_stage1(ms, cfg, key, 300)
    mesh = mesh_lib.make_mesh(8)
    k2 = jax.random.PRNGKey(9)
    prop_u, _ = em.fit_proposal(ms, cfg, samples, sig, k2)
    sig_s, samples_s, _ = rwm.run_stage1(ms, cfg, key, 300, mesh=mesh)
    prop_s, _ = em.fit_proposal(ms, cfg, samples_s, sig_s, k2, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(prop_u.nmix),
                                  np.asarray(prop_s.nmix))
    # psum reduction-order differences compound across up to 60 EM
    # iterations; 1e-4 bounds the observed drift with margin while still
    # catching any real sufficient-statistics bug (those are O(1) errors).
    np.testing.assert_allclose(np.asarray(prop_u.lam),
                               np.asarray(prop_s.lam), atol=1e-4)
    np.testing.assert_allclose(np.asarray(prop_u.mu),
                               np.asarray(prop_s.mu), atol=2e-4)
    np.testing.assert_allclose(np.asarray(prop_u.B),
                               np.asarray(prop_s.B), atol=2e-4)


def test_full_pipeline_with_mesh(eight_devices):
    """AMSampler with a mesh runs all three stages sharded end-to-end."""
    ms = builtin.normal_beta_set()
    cfg = EngineConfig(n_chains=128, n_chains_stage1=64, stage1_sweeps=300,
                       sweep_chunk=100, max_em_iters=60, max_mix_comps=6,
                       seed=4)
    am = AMSampler(ms, cfg, mesh=mesh_lib.make_mesh(8))
    am.estimate_conditional_probs()
    am.burn_samples(100)
    stats = am.rjmcmc_samples(400)
    assert stats.ksummary.sum() == 128 * 400
    assert np.all(np.isfinite(stats.theta_mean()))


def test_sharded_collect_traces_match_unsharded(eight_devices):
    """The collect path now runs under shard_map too: per-sweep traces of
    the global chain prefix are psum-broadcast from shard 0, so sharded
    and unsharded runs return identical trace arrays."""
    ms, cfg, prop = _setup(64)
    chains_u = rjmcmc.init_chains(ms, cfg, jax.random.PRNGKey(7))
    runner_u = rjmcmc.build_chunk_runner(ms, cfg, burning=False, collect=True)
    out_u, chunk_u = runner_u(chains_u, prop, 15)

    mesh = mesh_lib.make_mesh(8)
    chains_s = mesh_lib.shard_chains(
        rjmcmc.init_chains(ms, cfg, jax.random.PRNGKey(7)), mesh)
    runner_s = rjmcmc.build_chunk_runner(ms, cfg, burning=False,
                                         collect=True, mesh=mesh)
    out_s, chunk_s = runner_s(chains_s, mesh_lib.replicate(prop, mesh), 15)

    np.testing.assert_array_equal(np.asarray(chunk_u["k_trace"]),
                                  np.asarray(chunk_s["k_trace"]))
    np.testing.assert_array_equal(np.asarray(chunk_u["k0_trace"]),
                                  np.asarray(chunk_s["k0_trace"]))
    np.testing.assert_allclose(np.asarray(chunk_u["logp0_trace"]),
                               np.asarray(chunk_s["logp0_trace"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(chunk_u["theta0_trace"]),
                               np.asarray(chunk_s["theta0_trace"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(chunk_u["ksummary"]),
                                  np.asarray(chunk_s["ksummary"]))
