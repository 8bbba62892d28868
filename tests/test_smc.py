"""SMC evidence estimator: exact-answer and tutorial parity checks."""

import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.models.toy import TOY1_MODEL_PROBS, toy1_set
from automix_tpu.models.tutorial import TUTORIAL_MODEL_PROBS, tutorial_set
from automix_tpu.sampler import AMSampler


def _cfg(**kw):
    base = dict(n_chains=64, n_chains_stage1=256, stage1_sweeps=500,
                sweep_chunk=100, max_em_iters=150, max_mix_comps=10, seed=41)
    base.update(kw)
    return EngineConfig(**base)


def test_smc_toy1_exact_evidences():
    """toy1 densities are normalized with explicit weights: evidences must
    equal (0.3, 0.7) and their logs (log 0.3, log 0.7)."""
    am = AMSampler(toy1_set(), _cfg())
    out = am.smc_evidence(n_particles=1024, n_temps=10, n_moves=2)
    np.testing.assert_allclose(out["model_probs"], TOY1_MODEL_PROBS,
                               atol=0.04)
    np.testing.assert_allclose(out["log_evidence"],
                               np.log(TOY1_MODEL_PROBS), atol=0.1)


def test_smc_tutorial_matches_published():
    am = AMSampler(tutorial_set(), _cfg(seed=42))
    out = am.smc_evidence(n_particles=1024, n_temps=12, n_moves=2)
    np.testing.assert_allclose(out["model_probs"], TUTORIAL_MODEL_PROBS,
                               atol=0.05)
    # ESS should stay healthy along the short bridge from the fitted q
    assert np.min(out["ess"]) > 0.2 * 1024


def test_smc_sharded_shard_count_invariant(eight_devices):
    """mesh-sharded SMC (particle axis under shard_map): evidences match
    the single-device estimator — the resampling indices and weight
    reductions are computed from the same gathered global weights, so any
    difference is only the independent per-shard mutation streams."""
    import jax

    from automix_tpu.kernels import smc
    from automix_tpu.parallel import mesh as mesh_lib

    am = AMSampler(toy1_set(), _cfg())
    am.estimate_conditional_probs()
    out = {}
    for nm, mesh in (("m8", mesh_lib.make_mesh(8)), ("m1", None)):
        out[nm] = smc.run_smc(am.modelset, am.cfg, am.proposal,
                              jax.random.PRNGKey(9), n_particles=1024,
                              n_temps=10, n_moves=2, mesh=mesh)
    np.testing.assert_allclose(out["m8"]["model_probs"], TOY1_MODEL_PROBS,
                               atol=0.05)
    # exact evidences: both layouts must agree with log(0.3), log(0.7)
    np.testing.assert_allclose(out["m8"]["log_evidence"],
                               np.log(TOY1_MODEL_PROBS), atol=0.1)
    np.testing.assert_allclose(out["m8"]["log_evidence"],
                               out["m1"]["log_evidence"], atol=0.1)
    assert out["m8"]["theta"].shape == out["m1"]["theta"].shape


def test_hmc_autotune_sharded(eight_devices):
    """tune_step_scale under the mesh: psum-pooled acceptance gives the
    same tuned multipliers (statistically) as the single-device tuner."""
    import jax
    import jax.numpy as jnp

    from automix_tpu.kernels.hmc import tune_step_scale
    from automix_tpu.parallel import mesh as mesh_lib

    ms = toy1_set()
    cfg = _cfg(within_move="hmc")
    sig = jnp.ones((ms.nmodels, ms.dmax), cfg.dtype)
    key = jax.random.PRNGKey(17)
    s_sharded = tune_step_scale(ms, cfg, sig, key, n_rounds=80,
                                n_chains_per_model=256,
                                mesh=mesh_lib.make_mesh(8))
    s_single = tune_step_scale(ms, cfg, sig, key, n_rounds=80,
                               n_chains_per_model=256, mesh=None)
    assert np.all(np.isfinite(s_sharded)) and np.all(s_sharded > 0)
    np.testing.assert_allclose(np.log(s_sharded), np.log(s_single),
                               atol=0.35)


def test_smc_adaptive_tempering_matches_linear():
    """ESS-targeted tempering (the default) reaches the same evidences as
    the fixed linspace ladder on toy1, with per-model adaptive ladders
    that actually terminate before the step cap."""
    from automix_tpu.models.toy import toy1_set, TOY1_MODEL_PROBS

    cfg = EngineConfig(n_chains_stage1=256, stage1_sweeps=400, seed=3,
                       max_mix_comps=8, max_em_iters=100)
    am = AMSampler(toy1_set(), cfg)
    am.estimate_conditional_probs()
    out_a = am.smc_evidence(n_particles=1024, n_temps=40, n_moves=2,
                            tempering="adaptive")
    out_l = am.smc_evidence(n_particles=1024, n_temps=20, n_moves=2,
                            tempering="linear")
    for out in (out_a, out_l):
        np.testing.assert_allclose(out["model_probs"], TOY1_MODEL_PROBS,
                                   atol=0.06)
    np.testing.assert_allclose(out_a["log_evidence"], out_l["log_evidence"],
                               atol=0.15)
    # the adaptive ladder is monotone, ends at exactly 1, and (with a
    # fitted proposal as the bridge start) is far shorter than the cap
    bu = np.asarray(out_a["betas_used"])
    assert np.all(np.diff(np.vstack([np.zeros((1, 2)), bu]), axis=0) >= 0)
    assert np.all(bu[-1] == 1.0)
    n_steps = int((bu < 1.0).sum(axis=0).max()) + 1
    assert n_steps < 40, n_steps
