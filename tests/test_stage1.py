"""Stage-1 adaptive RWM: adapted scales and sample quality."""

import jax
import numpy as np

from automix_tpu.config import EngineConfig
from automix_tpu.kernels import rwm
from automix_tpu.models import builtin


def test_stage1_normal_sampler_moments():
    ms = builtin.normal_sampler_set()
    cfg = EngineConfig(n_chains_stage1=256, stage1_sweeps=600)
    key = jax.random.PRNGKey(0)
    sig, samples, tele = rwm.run_stage1(ms, cfg, key, 600)
    assert sig.shape == (1, 1)
    # 256 chains x ceil(1000*dmax / 256) = 4 thinned tail snapshots each
    assert samples.shape == (1, 1024, 1)
    x = np.asarray(samples[0, :, 0])
    # target N(0.5, 1): loose MC tolerances on 256 draws
    assert abs(x.mean() - 0.5) < 0.25
    assert abs(x.std() - 1.0) < 0.25
    # sig adapted away from its 10.0 init toward a sane RW scale
    assert 0.5 < float(sig[0, 0]) < 8.0


def test_stage1_multi_model_masks_padding():
    ms = builtin.gamma_beta_set()
    cfg = EngineConfig(n_chains_stage1=128, stage1_sweeps=400)
    sig, samples, tele = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(1), 400)
    assert sig.shape == (2, 2)
    # 128 chains x ceil(1000*dmax / 128) = 16 tail snapshots each
    assert samples.shape == (2, 2048, 2)
    s = np.asarray(samples)
    assert np.all(np.isfinite(s))
    # Gamma model: alpha,beta positive posterior mass
    assert s[0, :, 0].mean() > 0
    # acceptance telemetry in [0, 1]
    acc = np.asarray(tele["accept_trace"])
    assert np.all((acc >= 0) & (acc <= 1))


def test_stage1_respects_different_dims():
    import jax.numpy as jnp
    from automix_tpu.model import Model, ModelSet
    ms = ModelSet([
        Model("d1", 1, lambda th: -0.5 * th[0] ** 2, init=np.array([0.0])),
        Model("d3", 3, lambda th: -0.5 * jnp.sum(th ** 2),
              init=np.zeros(3)),
    ])
    cfg = EngineConfig(n_chains_stage1=64, stage1_sweeps=300)
    sig, samples, _ = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(2), 300)
    # model 0 is 1-D: padded coords must remain exactly 0
    assert np.all(np.asarray(samples[0, :, 1:]) == 0.0)
    # padded sig coords never updated from their 10.0 init
    assert np.all(np.asarray(sig[0, 1:]) == 10.0)


def test_stage1_log_adaptation_resolves_tiny_scales():
    """stage1_adapt='log': the multiplicative Robbins-Monro rule reaches
    proposal scales far below the additive AAP gain in a few hundred pooled
    sweeps (config.py stage1_adapt).  Target posterior scale 1e-3: the AAP
    rule's additive steps (gain 10) cannot get near it this fast, while the
    log rule lands within an order of magnitude and keeps acceptance near
    the 0.25 target."""
    import jax.numpy as jnp
    from automix_tpu.model import Model, ModelSet
    scale = 1e-3
    ms = ModelSet([Model(
        "tiny", 1, lambda th: -0.5 * (th[0] / scale) ** 2,
        init=np.array([0.0]))])
    cfg = EngineConfig(n_chains_stage1=256, stage1_adapt="log")
    sig, samples, tele = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(3), 600)
    s = float(sig[0, 0])
    assert 1e-4 < s < 2e-2, s
    acc = np.asarray(tele["accept_trace"])[-1, 0]
    assert 0.1 < acc < 0.45, acc
    # and the collected samples actually live at the target's scale
    x = np.asarray(samples[0, :, 0])
    assert abs(x.std() - scale) < scale, x.std()


def test_stage1_log_adaptation_matches_aap_posterior():
    """Both adaptation rules must yield stage-1 samples from the same
    target (N(0.5, 1)) — the rule only changes how fast sig converges."""
    ms = builtin.normal_sampler_set()
    for rule in ("aap", "log"):
        cfg = EngineConfig(n_chains_stage1=256, stage1_adapt=rule)
        sig, samples, _ = rwm.run_stage1(
            ms, cfg, jax.random.PRNGKey(4), 600)
        x = np.asarray(samples[0, :, 0])
        assert abs(x.mean() - 0.5) < 0.25, (rule, x.mean())
        assert abs(x.std() - 1.0) < 0.3, (rule, x.std())


def test_fused_stage1_interpret_matches_xla_path():
    """kernels/fused_stage1.py under the Mosaic interpreter
    (fused_stage1='on' off-TPU) must reproduce the XLA stage-1 scan's
    *statistics*: same adapted scales and the same stage-2 sample
    distribution per model (streams differ — threefry vs counter hash —
    so parity is statistical, fused_stage1.py module docstring).
    """
    from automix_tpu.models.tutorial import tutorial_set
    sig_by_path, mom_by_path = {}, {}
    for mode in ("on", "off"):
        ms = tutorial_set()
        cfg = EngineConfig(n_chains_stage1=1024, stage1_sweeps=500,
                           seed=3, fused_stage1=mode)
        sig, smp, tele = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(0), 500)
        assert smp.shape[0] == 3
        sig_by_path[mode] = np.asarray(sig)
        mom_by_path[mode] = (np.asarray(smp).mean(axis=1),
                             np.asarray(smp).std(axis=1))
    np.testing.assert_allclose(
        sig_by_path["on"], sig_by_path["off"], rtol=0.25, atol=0.05)
    for which in (0, 1):
        np.testing.assert_allclose(
            mom_by_path["on"][which], mom_by_path["off"][which],
            rtol=0.25, atol=0.15)

def test_fused_stage1_segment_invariance(monkeypatch):
    """The fused stage-1 splits the schedule into ~100-sweep pallas_call
    segments; every random word is a pure function of the *global* sweep
    index, so the segmentation must be bitwise invisible.  Run the same
    schedule with two different segment lengths and require identical
    final scales, log-posteriors, and telemetry-independent state."""
    from automix_tpu.kernels import fused_stage1
    from automix_tpu.models.tutorial import tutorial_set

    outs = {}
    for seg in (100, 37):
        monkeypatch.setattr(fused_stage1, "_SEG_DEFAULT", seg)
        fused_stage1._KERNEL_CACHE.clear()
        ms = tutorial_set()
        cfg = EngineConfig(n_chains_stage1=256, stage1_sweeps=300,
                           seed=11, fused_stage1="on")
        sig, smp, tele = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(0), 300)
        outs[seg] = (np.asarray(sig), np.asarray(tele["final_logp"]))
    np.testing.assert_array_equal(outs[100][0], outs[37][0])
    np.testing.assert_array_equal(outs[100][1], outs[37][1])


def test_fused_stage1_padded_coords_stay_zero():
    """Mixed-dimension family through the fused kernel: padded sample
    coords exactly 0, padded sig coords at their 10.0 init, real coords
    adapted (the masking path that the per-model coord_active extraction
    must get right)."""
    from automix_tpu.models.toy import toy1_set
    ms = toy1_set()
    cfg = EngineConfig(n_chains_stage1=256, stage1_sweeps=400, seed=5,
                       fused_stage1="on")
    sig, samples, _ = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(0), 400)
    assert np.all(np.asarray(samples[0, :, 1:]) == 0.0)
    assert np.all(np.asarray(sig[0, 1:]) == 10.0)
    # both real coords of the 2-D model must have moved off the 10.0 init
    assert float(sig[1, 1]) != 10.0


def test_fused_stage1_student_t_matches_xla_path():
    """Student-t stage-1 proposals through the fused kernel (Bailey polar
    draws, automix.c:607,625 rt semantics): adapted scales and stage-2
    sample moments must match the XLA t path statistically."""
    from automix_tpu.models.tutorial import tutorial_set
    sig_by_path, mom_by_path = {}, {}
    for mode in ("on", "off"):
        ms = tutorial_set()
        cfg = EngineConfig(n_chains_stage1=1024, stage1_sweeps=500,
                           seed=9, fused_stage1=mode, student_t_dof=5,
                           rng="threefry")
        sig, smp, tele = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(2), 500)
        sig_by_path[mode] = np.asarray(sig)
        mom_by_path[mode] = (np.asarray(smp).mean(axis=1),
                             np.asarray(smp).std(axis=1))
    np.testing.assert_allclose(
        sig_by_path["on"], sig_by_path["off"], rtol=0.25, atol=0.05)
    for which in (0, 1):
        np.testing.assert_allclose(
            mom_by_path["on"][which], mom_by_path["off"][which],
            rtol=0.25, atol=0.15)


def test_fused_stage1_sharded_bitwise(eight_devices):
    """Sharded fused stage-1 (per-shard lane blocks, per-sweep psum'd
    pooled adaptation, globally-indexed hash streams) is bitwise equal
    to the unsharded fused kernel: same sig trajectory, same stage-2
    samples, same telemetry — the rwm.py sharding contract."""
    from automix_tpu.parallel import mesh as mesh_lib
    from automix_tpu.models.tutorial import tutorial_set

    outs = {}
    for nm, mesh in (("single", None), ("sharded", mesh_lib.make_mesh(8))):
        ms = tutorial_set()
        cfg = EngineConfig(n_chains_stage1=256, stage1_sweeps=300,
                           seed=17, fused_stage1="on")
        sig, smp, tele = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(4),
                                        300, mesh=mesh)
        outs[nm] = (np.asarray(sig), np.asarray(smp),
                    np.asarray(tele["sig_trace"]),
                    np.asarray(tele["accept_trace"]))
    for a, b in zip(outs["single"], outs["sharded"]):
        np.testing.assert_array_equal(a, b)


def test_fused_stage1_sharded_mixed_dims(eight_devices):
    """Sharded fused stage-1 on a mixed-dimension family (toy1, dims
    1/2): padding discipline holds and matches unsharded bitwise."""
    from automix_tpu.parallel import mesh as mesh_lib
    from automix_tpu.models.toy import toy1_set

    outs = {}
    for nm, mesh in (("single", None), ("sharded", mesh_lib.make_mesh(8))):
        ms = toy1_set()
        cfg = EngineConfig(n_chains_stage1=128, stage1_sweeps=200,
                           seed=23, fused_stage1="on")
        sig, smp, _ = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(6),
                                     200, mesh=mesh)
        outs[nm] = (np.asarray(sig), np.asarray(smp))
    np.testing.assert_array_equal(outs["single"][0], outs["sharded"][0])
    np.testing.assert_array_equal(outs["single"][1], outs["sharded"][1])
    assert np.all(outs["sharded"][1][0, :, 1:] == 0.0)


def test_fused_stage1_sharded_student_t_bitwise(eight_devices):
    """Student-t stage-1 proposals (Bailey polar draws) through the
    sharded per-sweep kernel: bitwise equal to the unsharded fused
    kernel, like the Gaussian case."""
    from automix_tpu.parallel import mesh as mesh_lib
    from automix_tpu.models.tutorial import tutorial_set

    outs = {}
    for nm, mesh in (("single", None), ("sharded", mesh_lib.make_mesh(8))):
        ms = tutorial_set()
        cfg = EngineConfig(n_chains_stage1=128, stage1_sweeps=200,
                           seed=29, fused_stage1="on", student_t_dof=5,
                           rng="threefry")
        sig, smp, _ = rwm.run_stage1(ms, cfg, jax.random.PRNGKey(8),
                                     200, mesh=mesh)
        outs[nm] = (np.asarray(sig), np.asarray(smp))
    np.testing.assert_array_equal(outs["single"][0], outs["sharded"][0])
    np.testing.assert_array_equal(outs["single"][1], outs["sharded"][1])
