#!/usr/bin/env python
"""Hardware validation suite for the fused engines (run on a real TPU).

Complements the CPU test suite, which exercises the kernels in Mosaic
interpret mode: here the COMPILED kernels run on hardware against the
C-oracle posteriors, the incremental-cache drift bound is measured, and
the pooled semi-fused runner is timed against the fully-fused mode.
This is the script behind the numbers quoted in README.md / PERF.json
prose (round-5 run: DDI fused 76M chain-sweeps/s = 14x XLA, parity
2e-4; drift < 4e-3 over 6000 sweeps; pooled 1.50B = 87% of per-chain).

Usage: python bench/validate_tpu.py [ddi|smoke|drift|pooled|all]
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
_ORACLE = os.path.join(_ROOT, "tests", "data", "heavy_oracle.json")


def validate_ddi():
    """DDI through the fused engine vs the XLA engine vs the C oracle."""
    from automix_tpu.config import EngineConfig
    from automix_tpu.models.ddi import ddi_set
    from automix_tpu.sampler import AMSampler

    n_chains = 16384
    res = {}
    for mode in ("on", "off"):
        cfg = EngineConfig(n_chains=n_chains, n_chains_stage1=512,
                           stage1_sweeps=1500, sweep_chunk=500, seed=0,
                           trace_chain0=False, fused=mode)
        am = AMSampler(ddi_set(), cfg)
        am.estimate_conditional_probs()
        am.burn_samples(1000)
        am.rjmcmc_samples(500, collect=False)      # compile + warm
        nsweeps = 10000 if mode == "on" else 2000
        t0 = time.time()
        stats = am.rjmcmc_samples(nsweeps, collect=False)
        thr = n_chains * nsweeps / (time.time() - t0)
        res[mode] = (thr, stats.model_probs)
        print(f"[ddi {mode}] {thr:,.0f} chain-sweeps/s, "
              f"p(M)={np.round(stats.model_probs, 4)}", flush=True)
    with open(_ORACLE) as f:
        ref = np.asarray(json.load(f)["ddi"]["mean"])
    for mode, (thr, probs) in res.items():
        err = np.abs(probs - ref).max()
        print(f"[ddi {mode}] parity vs C oracle: max err {err:.4f}")
        assert err < 0.01, (mode, probs, ref)
    print(f"[ddi] fused/xla speedup: {res['on'][0] / res['off'][0]:.1f}x")


def validate_smoke():
    """Compiled-kernel smoke with a synthetic broad proposal: runs,
    mixes, keeps state finite and the dim-10 model's padded tail zero."""
    import jax.numpy as jnp

    from automix_tpu.config import EngineConfig
    from automix_tpu.models.ddi import C0, C1, ddi_set
    from automix_tpu.sampler import AMSampler
    from automix_tpu.state import Proposal

    cfg = EngineConfig(n_chains=1024, sweep_chunk=50, seed=3,
                       trace_chain0=False, fused="on")
    K, D, L = 2, 16, 2
    mu = np.zeros((K, L, D), np.float32)
    mu[0, :, :] = np.concatenate([C0, [1, 0, 1, 0, 0, 1], [100.0]])
    mu[1, :, :10] = np.concatenate([C1, [1, 0, 1], [100.0]])
    B = np.broadcast_to(np.eye(D, dtype=np.float32), (K, L, D, D)).copy()
    B *= 0.3
    B[0, :, 15, 15] = 20.0
    B[1, :, 9, 9] = 20.0
    lam = np.zeros((K, L), np.float32)
    lam[:, 0] = 1.0
    logdet = np.zeros((K, L), np.float32)
    for k, d in enumerate((16, 10)):
        for li in range(L):
            logdet[k, li] = np.log(np.abs(np.diag(B[k, li])[:d])).sum()
    prop = Proposal(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
                    B=jnp.asarray(B), logdetB=jnp.asarray(logdet),
                    nmix=jnp.ones((K,), jnp.int32),
                    sig=jnp.full((K, D), 0.1, jnp.float32))
    am = AMSampler(ddi_set(), cfg)
    am.set_proposal(prop)
    stats = am.rjmcmc_samples(200, collect=False)
    assert stats.ksummary.sum() == 1024 * 200
    assert stats.nacctd > 0
    lp = np.asarray(am.chains.logp)
    th = np.asarray(am.chains.theta)
    k = np.asarray(am.chains.k)
    assert np.isfinite(lp).all() and np.isfinite(th).all()
    assert lp.min() > -1e6
    m1 = k == 1
    if m1.any():
        assert np.abs(th[m1][:, 10:]).max() == 0.0
    print("[smoke] 200 compiled DDI sweeps: state finite, padding clean")


def validate_drift():
    """Carried-logp drift of the DDI incremental cache over 6000 sweeps."""
    from automix_tpu.config import EngineConfig
    from automix_tpu.models.ddi import ddi_set
    from automix_tpu.sampler import AMSampler

    cfg = EngineConfig(n_chains=8192, n_chains_stage1=512,
                       stage1_sweeps=1500, sweep_chunk=500, seed=0,
                       trace_chain0=False, fused="on")
    ms = ddi_set()
    am = AMSampler(ms, cfg)
    am.estimate_conditional_probs()
    am.burn_samples(1000)
    am.rjmcmc_samples(5000, collect=False)
    lp_carried = np.asarray(am.chains.logp, np.float64)
    lp_fresh = np.asarray(
        ms.logpost_batch(am.chains.k, am.chains.theta), np.float64)
    d = np.abs(lp_carried - lp_fresh)
    print(f"[drift] after 6000 fused sweeps: max {d.max():.4f}, "
          f"p99 {np.percentile(d, 99):.4f} "
          f"(logp scale ~{np.abs(lp_fresh).mean():.0f})")
    assert d.max() < 0.5, d.max()


def validate_pooled():
    """Semi-fused pooled runner vs fully-fused per-chain mode (tutorial)."""
    from automix_tpu.config import EngineConfig
    from automix_tpu.models.tutorial import (TUTORIAL_MODEL_PROBS,
                                             tutorial_set)
    from automix_tpu.sampler import AMSampler

    out = {}
    for pk_mode in ("pooled", "per_chain"):
        cfg = EngineConfig(n_chains=131_072, n_chains_stage1=1024,
                           stage1_sweeps=2000, sweep_chunk=1000, seed=0,
                           trace_chain0=False, pk_mode=pk_mode)
        am = AMSampler(tutorial_set(), cfg)
        am.burn_samples(1000)
        am.rjmcmc_samples(1000, collect=False)
        t0 = time.time()
        stats = am.rjmcmc_samples(20000, collect=False)
        thr = 131_072 * 20000 / (time.time() - t0)
        out[pk_mode] = thr
        err = np.abs(stats.model_probs - TUTORIAL_MODEL_PROBS).max()
        print(f"[pooled:{pk_mode}] {thr / 1e9:.2f}B chain-sweeps/s, "
              f"parity max err {err:.4f}", flush=True)
        assert err < 0.01
    print(f"[pooled] pooled/per_chain ratio: "
          f"{out['pooled'] / out['per_chain']:.2f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ddi", "all"):
        validate_ddi()
    if which in ("smoke", "all"):
        validate_smoke()
    if which in ("drift", "all"):
        validate_drift()
    if which in ("pooled", "all"):
        validate_pooled()
    print("validate_tpu OK")
