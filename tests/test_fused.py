"""Tests for the fused Pallas sweep engine (kernels/fused.py).

Run on CPU in Mosaic interpret mode (cfg.fused="on" forces the kernel off
TPU) with the counter-hash RNG, which is bitwise identical between
interpret and compiled TPU execution — so what these tests pin down holds
for the production path up to Mosaic's instruction scheduling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import gammaln

from automix_tpu.config import EngineConfig
from automix_tpu.kernels import fused
from automix_tpu.models import builtin, toy
from automix_tpu.models.tutorial import tutorial_set
from automix_tpu.ops.plmath import pal_gammaln
from automix_tpu.sampler import AMSampler

ALL_COL_SETS = [
    ("tutorial", tutorial_set),
    ("toy1", toy.toy1_set),
    ("toy2", toy.toy2_set),
    ("gamma_beta", builtin.gamma_beta_set),
    ("normal_beta", builtin.normal_beta_set),
    ("normal_gamma", builtin.normal_gamma_set),
    ("normal_sampler", builtin.normal_sampler_set),
    ("truncnormal_sampler", builtin.truncnormal_sampler_set),
    ("beta_sampler", builtin.beta_sampler_set),
    ("normal_params", builtin.normal_params_set),
    ("beta_params", builtin.beta_params_set),
    ("gamma_params", builtin.gamma_params_set),
]


def test_pal_gammaln_accuracy():
    """Shifted-Stirling log-gamma vs jax.scipy gammaln over the argument
    range the targets produce."""
    x = jnp.concatenate([jnp.linspace(0.01, 2.0, 500),
                         jnp.linspace(2.0, 200.0, 500)])
    ref = gammaln(x)
    got = pal_gammaln(x)
    rel = jnp.abs(got - ref) / jnp.maximum(jnp.abs(ref), 1.0)
    assert float(rel.max()) < 5e-6


@pytest.mark.parametrize("name,make", ALL_COL_SETS)
def test_logp_cols_equivalence(name, make):
    """Column forms match the scalar densities on random points, including
    off-support (both must agree on the finite NEG_INF sentinel)."""
    ms = make()
    key = jax.random.PRNGKey(42)
    for mi, m in enumerate(ms.models):
        assert m.logp_cols is not None
        th = jax.random.uniform(jax.random.fold_in(key, mi),
                                (512, m.dim), minval=-3.0, maxval=10.0)
        ref = np.asarray(jax.vmap(m.logp)(th), np.float64)
        ref = np.where(np.isfinite(ref), ref, -1e30)
        got = np.asarray(m.logp_cols(tuple(th[:, i] for i in range(m.dim))),
                         np.float64)
        scale = np.maximum(np.abs(ref), 1.0)
        # float32 + pal_gammaln noise; an MH ratio perturbation of this
        # size is far below the MC error of any run
        assert np.max(np.abs(ref - got) / scale) < 5e-4, (name, m.name)


def _mk_sampler(make_set, **over):
    base = dict(n_chains=1024, n_chains_stage1=128, stage1_sweeps=200,
                sweep_chunk=50, seed=3, trace_chain0=False, fused="on")
    base.update(over)
    return AMSampler(make_set(), EngineConfig(**base))


def test_fused_smoke_and_stat_contract():
    am = _mk_sampler(tutorial_set)
    am.estimate_conditional_probs()
    am.burn_samples(60)
    stats = am.rjmcmc_samples(200, collect=False)
    assert stats.ksummary.sum() == 1024 * 200
    assert stats.ntrytd == 1024 * 200
    # 1-in-10 block schedule: ntryrwmb + ntryrwms-coordinate tries
    assert stats.ntryrwmb > 0 and stats.ntryrwms > 0
    assert 0 < stats.nacctd <= stats.ntrytd
    # visit fractions should be in the right ballpark already
    probs = stats.model_probs
    assert probs[0] > 0.5 and probs[1] < 0.3


def test_fused_deterministic_and_chunk_invariant():
    """Counter-hash streams are (seed, sweep, chain, slot)-indexed, so a
    run is bitwise reproducible AND invariant to how sweeps are chunked."""
    res = []
    for chunk in (20, 40):
        am = _mk_sampler(tutorial_set, sweep_chunk=chunk, fused_rng="hash")
        am.estimate_conditional_probs()
        am.burn_samples(20)
        stats = am.rjmcmc_samples(80, collect=False)
        res.append((np.asarray(am.chains.theta), np.asarray(am.chains.k),
                    stats.ksummary.copy()))
    np.testing.assert_array_equal(res[0][1], res[1][1])
    np.testing.assert_array_equal(res[0][0], res[1][0])
    np.testing.assert_array_equal(res[0][2], res[1][2])


def test_fused_matches_xla_statistically():
    """Fused and XLA runners sample the same posterior: toy1's exact model
    posteriors (0.3 / 0.7) from both paths."""
    out = {}
    for mode in ("on", "off"):
        am = _mk_sampler(toy.toy1_set, fused=mode, seed=11)
        am.estimate_conditional_probs()
        am.burn_samples(60)
        stats = am.rjmcmc_samples(240, collect=False)
        out[mode] = stats.model_probs
    for mode, probs in out.items():
        assert abs(probs[0] - toy.TOY1_MODEL_PROBS[0]) < 0.08, (mode, probs)
    assert abs(out["on"][0] - out["off"][0]) < 0.08


def test_fused_sharded_equals_unsharded(eight_devices):
    """The fused kernel under shard_map (per-shard pallas_call, psum'd
    chunk stats, globally-indexed hash RNG streams) produces bitwise the
    same trajectories as the single-device kernel for a fixed proposal."""
    from automix_tpu.parallel import mesh as mesh_lib

    fit = _mk_sampler(tutorial_set, n_chains=8192, fused_rng="hash")
    fit.estimate_conditional_probs()
    prop = fit.proposal

    res = {}
    for nm, mesh in (("sharded", mesh_lib.make_mesh(8)), ("single", None)):
        am = _mk_sampler(tutorial_set, n_chains=8192, fused_rng="hash")
        am.mesh = mesh
        am.set_proposal(prop)
        am.burn_samples(16)
        stats = am.rjmcmc_samples(64, collect=False)
        res[nm] = (stats.ksummary.copy(), np.asarray(am.chains.theta),
                   np.asarray(am.chains.k))
    np.testing.assert_array_equal(res["sharded"][0], res["single"][0])
    np.testing.assert_array_equal(res["sharded"][2], res["single"][2])
    np.testing.assert_array_equal(res["sharded"][1], res["single"][1])


def test_fused_checkpoint_resume(tmp_path):
    """save/load mid-run through the fused engine continues the exact
    trajectories (hash RNG streams are sweep-indexed, so the resumed run
    is bitwise equal to the uninterrupted one regardless of chunking)."""
    path = str(tmp_path / "ckpt.npz")

    am_a = _mk_sampler(tutorial_set, fused_rng="hash")
    am_a.estimate_conditional_probs()
    am_a.burn_samples(30)
    am_a.rjmcmc_samples(120, collect=False)

    am_b = _mk_sampler(tutorial_set, fused_rng="hash")
    am_b.estimate_conditional_probs()
    am_b.burn_samples(30)
    am_b.rjmcmc_samples(50, collect=False)
    am_b.save(path)

    am_c = _mk_sampler(tutorial_set, fused_rng="hash")
    am_c.load(path)
    am_c.rjmcmc_samples(70, collect=False)

    np.testing.assert_array_equal(np.asarray(am_a.chains.k),
                                  np.asarray(am_c.chains.k))
    np.testing.assert_array_equal(np.asarray(am_a.chains.theta),
                                  np.asarray(am_c.chains.theta))


def test_fused_eligibility_gates():
    ms = tutorial_set()
    cfg = EngineConfig(n_chains=1024, fused="on")
    assert fused.fused_eligible(ms, cfg, collect=False, mesh=None, lmax=5)
    # traces force the XLA path
    assert not fused.fused_eligible(ms, cfg, collect=True, mesh=None, lmax=5)
    # off switch
    cfg_off = EngineConfig(n_chains=1024, fused="off")
    assert not fused.fused_eligible(ms, cfg_off, False, None, 5)
    # chain count must tile into 8x128 lanes
    cfg_odd = EngineConfig(n_chains=1000, fused="on")
    assert not fused.fused_eligible(ms, cfg_odd, False, None, 5)
    # student-t IS supported (Bailey polar draws + t latent density)
    cfg_t = EngineConfig(n_chains=1024, fused="on", student_t_dof=3,
                         rng="threefry")
    assert fused.fused_supported(ms, cfg_t)
    # hmc is unsupported
    cfg_h = EngineConfig(n_chains=1024, fused="on", within_move="hmc")
    assert not fused.fused_supported(ms, cfg_h)
    # models without column forms are unsupported
    from automix_tpu.model import Model, ModelSet
    ms_nc = ModelSet([Model("m", 1, lambda th: -0.5 * th[0] ** 2)])
    assert not fused.fused_supported(ms_nc, cfg)


def test_rb9_batched_cols_parity():
    """The rb9 family column kernel (sufficient-stat + distinct-value
    compressed NB likelihood) matches the hand-batched XLA kernel."""
    from automix_tpu.models import rb9

    ms = rb9.rb9_set()
    key = jax.random.PRNGKey(0)
    S = 2048
    k = jax.random.randint(key, (S,), 0, 10)
    th = jax.random.uniform(jax.random.fold_in(key, 1), (S, 5),
                            minval=-0.5, maxval=60.0)
    ref = np.asarray(ms.logpost_batch(k, th), np.float64)
    mks = [(k == m).astype(jnp.float32) for m in range(10)]
    got = np.asarray(ms.batched_logpost_cols(
        mks, tuple(th[:, i] for i in range(5))), np.float64)
    ref = np.where(ref < -9e5, -1e6, ref)
    got = np.where(got < -9e5, -1e6, got)
    assert np.max(np.abs(ref - got) / np.maximum(np.abs(ref), 1.0)) < 1e-4


@pytest.mark.slow
def test_fused_rb9_family_kernel():
    """Fused sweep through ModelSet.batched_logpost_cols (one density
    evaluation for all ten rb9 models): pipeline runs and mixes.
    Slow: ~4 min of interpret-mode K=10/L=6/D=5 unrolled sweeps."""
    from automix_tpu.models import rb9

    cfg = EngineConfig(n_chains=1024, n_chains_stage1=256,
                       stage1_sweeps=300, sweep_chunk=40, seed=9,
                       trace_chain0=False, fused="on", max_mix_comps=6)
    am = AMSampler(rb9.rb9_set(), cfg)
    am.estimate_conditional_probs()
    lmax = int(am.proposal.lam.shape[1])
    assert fused.fused_eligible(am.modelset, cfg, False, None, lmax)
    am.burn_samples(40)
    stats = am.rjmcmc_samples(120, collect=False)
    assert stats.ksummary.sum() == 1024 * 120
    assert np.isfinite(np.asarray(am.chains.logp)).all()
    assert stats.nacctd > 0          # trans-dimensional moves accept


def test_fused_perm_mode():
    """doPerm (automix.c:1184-1194) inside the kernel — the bubble-network
    latent permutation preserves the stationary distribution: toy1's exact
    model posteriors still come out."""
    am = _mk_sampler(toy.toy1_set, seed=21, perm=True)
    am.estimate_conditional_probs()
    am.burn_samples(60)
    stats = am.rjmcmc_samples(240, collect=False)
    assert stats.ksummary.sum() == 1024 * 240
    assert abs(stats.model_probs[0] - toy.TOY1_MODEL_PROBS[0]) < 0.08


def test_fused_single_model():
    """K == 1 degenerate RJ (kn = k, logratio starts at 0) still mixes the
    within-model chain correctly: Beta(2,2) moments."""
    am = _mk_sampler(builtin.beta_sampler_set, seed=5)
    am.estimate_conditional_probs()
    am.burn_samples(100)
    stats = am.rjmcmc_samples(300, collect=False)
    mean = stats.theta_mean()[0, 0]
    std = stats.theta_std()[0, 0]
    assert abs(mean - 0.5) < 0.05
    assert abs(std - float(np.sqrt(0.05))) < 0.05


def test_fused_pooled_pk_matches_xla():
    """pk_mode='pooled' through the fused kernel (single lane block, the
    global-histogram update in-kernel) samples the same posterior as the
    XLA pooled path — the configuration the heavy-model parity tests use
    (VERDICT r3: the proven config and the fast config must be the same
    config)."""
    out = {}
    for mode in ("on", "off"):
        am = _mk_sampler(toy.toy1_set, fused=mode, seed=7,
                         pk_mode="pooled")
        am.estimate_conditional_probs()
        am.burn_samples(60)
        stats = am.rjmcmc_samples(240, collect=False)
        out[mode] = stats.model_probs
    for mode, probs in out.items():
        assert abs(probs[0] - toy.TOY1_MODEL_PROBS[0]) < 0.08, (mode, probs)
    assert abs(out["on"][0] - out["off"][0]) < 0.08


def test_fused_pooled_pk_eligibility():
    ms = tutorial_set()
    # single lane block: eligible, fully-fused (in-kernel histogram)
    cfg = EngineConfig(n_chains=1024, fused="on", pk_mode="pooled")
    assert fused.fused_eligible(ms, cfg, collect=False, mesh=None, lmax=5)
    assert fused.pooled_single_block(ms, cfg, None, 5)
    # more chains than one block can hold: still eligible — routed to the
    # semi-fused per-sweep runner (cross-block histogram between sweeps)
    cfg_big = EngineConfig(n_chains=32768, fused="on", pk_mode="pooled")
    assert fused.fused_eligible(ms, cfg_big, False, None, 5)
    assert not fused.pooled_single_block(ms, cfg_big, None, 5)


def test_fused_pooled_scan_bitwise_equals_inkernel():
    """The semi-fused pooled runner (per-sweep kernel + external shared-pk
    update) applies the exact in-kernel update formulas, so a single-block
    run is bitwise identical through either path (hash RNG streams are
    sweep-indexed and identical in both)."""
    res = {}
    for force in (False, True):
        fused._FORCE_POOLED_SCAN = force
        try:
            am = _mk_sampler(toy.toy1_set, seed=13, pk_mode="pooled",
                             fused_rng="hash")
            am.estimate_conditional_probs()
            am.burn_samples(20)
            stats = am.rjmcmc_samples(60, collect=False)
        finally:
            fused._FORCE_POOLED_SCAN = False
        res[force] = (np.asarray(am.chains.k), np.asarray(am.chains.theta),
                      np.asarray(am.chains.pk), stats.ksummary.copy(),
                      stats.nacctd)
    for a, b in zip(res[False], res[True]):
        np.testing.assert_array_equal(a, b)


def test_fused_pooled_multiblock_and_sharded(eight_devices):
    """Pooled pk beyond one lane block: the semi-fused runner at S=8192
    (two 4096-lane blocks) produces the same posterior as the XLA pooled
    path, and its sharded run is bitwise equal to the unsharded one
    (integer-psum histogram, replicated pk update)."""
    from automix_tpu.parallel import mesh as mesh_lib

    fit = _mk_sampler(toy.toy1_set, n_chains=8192, pk_mode="pooled",
                      fused_rng="hash")
    fit.estimate_conditional_probs()
    prop = fit.proposal

    res = {}
    for nm, mesh, mode in (("sharded", mesh_lib.make_mesh(8), "on"),
                           ("single", None, "on"),
                           ("xla", None, "off")):
        am = _mk_sampler(toy.toy1_set, n_chains=8192, pk_mode="pooled",
                         fused=mode, fused_rng="hash", seed=3)
        am.mesh = mesh
        am.set_proposal(prop)
        am.burn_samples(10)
        stats = am.rjmcmc_samples(50, collect=False)
        res[nm] = (stats.ksummary.copy(), np.asarray(am.chains.k),
                   np.asarray(am.chains.theta), np.asarray(am.chains.pk),
                   stats.model_probs)
    # bitwise: sharded == unsharded semi-fused
    for a, b in zip(res["sharded"][:4], res["single"][:4]):
        np.testing.assert_array_equal(a, b)
    # statistical: fused pooled == XLA pooled posterior
    assert abs(res["single"][4][0] - res["xla"][4][0]) < 0.1
    assert abs(res["single"][4][0] - toy.TOY1_MODEL_PROBS[0]) < 0.12


def test_fused_decimated_traces():
    """collect=True with trace_every > 1 runs the fused engine and records
    boundary-snapshot traces: ceil(n / stride) entries, stride recorded on
    the stats for Sokal scaling, aggregate statistics still exact."""
    am = _mk_sampler(tutorial_set, trace_chain0=True, trace_every=5,
                     n_trace_chains=4)
    am.estimate_conditional_probs()
    am.burn_samples(60)
    stats = am.rjmcmc_samples(200, collect=True)
    assert stats.trace_stride == 5
    assert stats.ksummary.sum() == 1024 * 200       # aggregates: every sweep
    k_tr = stats.k_trace
    assert k_tr.shape == (40, 4), k_tr.shape        # traces: every 5th
    assert stats.pk_trace.shape == (40, 3)
    assert stats.logp_trace.shape == (40,)
    assert np.all(np.isfinite(stats.logp_trace))


def test_fused_student_t():
    """student_T_dof > 0 through the fused kernel: Bailey polar t draws +
    t latent Jacobian (automix.c:1663-1680, 1717-1725) preserve toy1's
    exact model posteriors, and match the XLA threefry-t path."""
    out = {}
    for mode in ("on", "off"):
        am = _mk_sampler(toy.toy1_set, fused=mode, seed=29,
                         student_t_dof=5, rng="threefry")
        am.estimate_conditional_probs()
        am.burn_samples(60)
        stats = am.rjmcmc_samples(240, collect=False)
        out[mode] = stats.model_probs
    for mode, probs in out.items():
        assert abs(probs[0] - toy.TOY1_MODEL_PROBS[0]) < 0.08, (mode, probs)
    assert abs(out["on"][0] - out["off"][0]) < 0.08


def test_bailey_t_marginals():
    """The in-kernel Bailey polar transform produces exact t(dof)
    variates: check variance and tail quantiles against scipy-free
    closed forms on the host (same formula, host numpy)."""
    rng = np.random.default_rng(0)
    n = 400_000
    for dof, var in ((5, 5.0 / 3.0), (7, 7.0 / 5.0)):
        u1 = rng.random(n).astype(np.float32) * (1 - 2e-7) + 1e-7
        u2 = rng.random(n).astype(np.float32)
        t = np.sqrt(dof * (u1 ** (-2.0 / dof) - 1.0)) \
            * np.cos(2.0 * np.pi * u2)
        assert abs(t.mean()) < 0.02
        assert abs(t.var() - var) < 0.05
        # symmetry of the tails
        assert abs((t > 2).mean() - (t < -2).mean()) < 2e-3


def test_fused_pooled_checkpoint_resume(tmp_path):
    """save/load mid-run through the semi-fused pooled runner continues
    the exact trajectories (shared pk, pkllim, and nreinit ride the
    checkpoint; hash streams are sweep-indexed)."""
    path = str(tmp_path / "pooled_ckpt.npz")

    def mk():
        am = _mk_sampler(toy.toy1_set, seed=19, pk_mode="pooled",
                         fused_rng="hash")
        fused._FORCE_POOLED_SCAN = True
        return am

    try:
        am_a = mk()
        am_a.estimate_conditional_probs()
        am_a.burn_samples(20)
        am_a.rjmcmc_samples(100, collect=False)

        am_b = mk()
        am_b.estimate_conditional_probs()
        am_b.burn_samples(20)
        am_b.rjmcmc_samples(50, collect=False)
        am_b.save(path)

        am_c = mk()
        am_c.load(path)
        am_c.rjmcmc_samples(50, collect=False)
    finally:
        fused._FORCE_POOLED_SCAN = False

    np.testing.assert_array_equal(np.asarray(am_a.chains.k),
                                  np.asarray(am_c.chains.k))
    np.testing.assert_array_equal(np.asarray(am_a.chains.theta),
                                  np.asarray(am_c.chains.theta))
    np.testing.assert_array_equal(np.asarray(am_a.chains.pk),
                                  np.asarray(am_c.chains.pk))
