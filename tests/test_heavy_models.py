"""End-to-end pipeline runs of the heavyweight model families.

These are the models the whole adaptive machinery exists for (dims up to
16, structured likelihoods); everything below runs the full stage 1 -> 2
-> 3 pipeline, not just pointwise log-density parity.

Oracle: ``tests/data/heavy_oracle.json`` holds posterior model
probabilities captured from the reference C binaries (``amrb9``,
``amddi``; see the fixture's ``_comment`` for exact invocations).  The
change-point binaries (``amcpt``/``amcptrs``) segfault inside their own
stage-2 fit on this image, so the change-point families are checked by
the invariance the reference built ``usercptrs.c`` to probe: rescaling
time by 1459x must leave posterior model probabilities unchanged
(usercptrs.c is usercpt.c with beta 200 -> 0.137).

All marked slow: minutes each on the CPU test mesh.  Run with
``pytest -m slow tests/test_heavy_models.py``.
"""

import json
import os

import numpy as np
import pytest

from automix_tpu.config import EngineConfig
from automix_tpu.sampler import AMSampler

pytestmark = pytest.mark.slow

_ORACLE = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "data", "heavy_oracle.json")))


def test_rb9_posterior_parity():
    """10-model tumour-count selection (userrb9.c): visit fractions must
    match the C oracle mean (8 replicates, spread ~±0.003) within MC +
    adaptation error."""
    from automix_tpu.models.rb9 import rb9_set

    cfg = EngineConfig(n_chains=2048, n_chains_stage1=1024,
                       stage1_sweeps=3000, sweep_chunk=500, seed=7,
                       trace_chain0=False, pk_mode="pooled")
    am = AMSampler(rb9_set(), cfg)
    am.burn_samples(1500)
    stats = am.rjmcmc_samples(6000)
    probs = stats.model_probs
    oracle = np.asarray(_ORACLE["rb9"]["mean"])
    np.testing.assert_allclose(probs, oracle, atol=0.04)
    # every model must actually be visited (the C runs all are)
    assert (probs > 0).all()


def test_ddi_posterior_parity():
    """2-model DDI longitudinal selection (userddi.c, dims 16 vs 10):
    p(M1) ~= 0.0126 per the C oracle.  The hardest end-to-end target:
    stage-1 adaptation at dim 16, EM on a 16-d posterior, RJ 16<->10."""
    from automix_tpu.models.ddi import ddi_set

    cfg = EngineConfig(n_chains=768, n_chains_stage1=512,
                       stage1_sweeps=2500, sweep_chunk=250, seed=3,
                       trace_chain0=False, pk_mode="pooled")
    am = AMSampler(ddi_set(), cfg)
    am.burn_samples(1000)
    stats = am.rjmcmc_samples(3000)
    probs = stats.model_probs
    oracle = np.asarray(_ORACLE["ddi"]["mean"])
    np.testing.assert_allclose(probs, oracle, atol=0.03)


def _run_changepoint(set_fn, seed):
    cfg = EngineConfig(n_chains=1024, n_chains_stage1=1024,
                       stage1_sweeps=2500, sweep_chunk=500, seed=seed,
                       trace_chain0=False, pk_mode="pooled",
                       stage1_adapt="log")
    am = AMSampler(set_fn(), cfg)
    am.burn_samples(1500)
    stats = am.rjmcmc_samples(6000)
    return np.asarray(stats.model_probs)


def test_changepoint_scaling_invariance():
    """cpt vs cptrs: the rescaled-time model (usercptrs.c) is the same
    posterior, so model probabilities must agree; the additive AAP rule is
    scale-sensitive (the reason usercptrs exists) while the engine's
    log-space rule adapts both parameterizations equally well."""
    p_cpt = _run_changepoint(
        __import__("automix_tpu.models.changepoint",
                   fromlist=["cpt_set"]).cpt_set, seed=5)
    p_rs = _run_changepoint(
        __import__("automix_tpu.models.changepoint",
                   fromlist=["cptrs_set"]).cptrs_set, seed=6)
    assert np.isfinite(p_cpt).all() and np.isfinite(p_rs).all()
    # trans-dimensional moves must actually mix across the 6 models
    assert (p_cpt > 1e-4).sum() >= 3, p_cpt
    np.testing.assert_allclose(p_cpt, p_rs, atol=0.08)
    # Green (1995) / thesis section 5.5.2: posterior mass concentrates on
    # 1-3 change points; the 0-change-point model is strongly rejected.
    assert p_cpt[0] < 0.15, p_cpt
    assert p_cpt[1:4].sum() > 0.5, p_cpt
