#!/usr/bin/env python
"""Multi-target performance suite: throughput, roofline, scaling curve.

``bench.py`` stays the driver's single-line headline metric (tutorial
target).  This suite adds the perf depth the headline cannot carry:

* throughput on three targets spanning the cost spectrum — ``tutorial``
  (K=3, d<=2, trivial likelihood), ``rb9`` (K=10, d<=6, Poisson/NB over 4
  groups), ``ddi`` (K=2, d<=16, 467-patient longitudinal MVN likelihood —
  the reference's heavyweight, userddi.c:1-796);
* a roofline placement for each: XLA's compiled ``cost_analysis`` gives
  flops and HBM bytes per chunk; dividing by measured chunk time yields
  achieved FLOP/s and GB/s against the chip's peaks (the sweep kernel is
  VPU/HBM-bound at these tiny dims — the MXU ceiling is not the binding
  one, so the HBM fraction is the honest utilization number);
* a chains -> throughput scaling curve on the tutorial target (the chain
  axis is the engine's throughput axis; the curve shows where the chip
  saturates and latency amortizes);
* optional ``--profile``: captures a ``jax.profiler`` device trace of one
  production chunk per target and writes a top-op summary.

Writes ``PERF.json`` and prints a human-readable table.  Run on the TPU
(falls back to CPU with the same methodology, flagged in the output).
"""

import argparse
import glob
import gzip
import json
import os
import time

import numpy as np

# Chip peaks for roofline placement.
CHIP_PEAKS = {
    # device_kind prefix: (peak FLOP/s dense fp32-accumulated, HBM B/s,
    #                      VPU vector-op/s)
    # TPU v5e (v5 lite): 197 TFLOP/s bf16 MXU, 16 GB HBM at 819 GB/s.
    # VPU: (8 sublanes x 128 lanes) x 4 ALUs x ~0.94 GHz ~= 3.9e12
    # vector-op/s per core (the scaling-book TPU chapter's VPU shape); the
    # sweep kernels never touch the MXU (tiny dims, no matmuls), so the
    # VPU number is the binding compute ceiling for the fused engine.
    "TPU v5 lite": (197e12, 819e9, 3.9e12),
    "TPU v5": (459e12, 1228e9, 7.4e12),       # v5p (2 cores/chip)
    "TPU v4": (275e12, 1228e9, 7.4e12),
    "cpu": (5e11, 5e10, 5e11),    # order-of-magnitude host numbers
}

_ORACLE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tests", "data", "heavy_oracle.json")


def parity_reference(target):
    """Posterior model probabilities the bench run must reproduce:
    published tutorial posteriors (docs/tutorial.rst:255-259) or the C
    oracle means captured from the reference binaries (amrb9/amddi,
    tests/data/heavy_oracle.json)."""
    if target == "tutorial":
        return np.array([0.7928, 0.0239, 0.1834])
    with open(_ORACLE_PATH) as f:
        oracle = json.load(f)
    return np.asarray(oracle[target]["mean"])


def chip_peaks(dev):
    kind = getattr(dev, "device_kind", "cpu")
    for prefix, peaks in CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return kind, peaks
    return kind, CHIP_PEAKS["cpu"]


def build_sampler(target, n_chains, seed=0):
    from automix_tpu.config import EngineConfig
    from automix_tpu.sampler import AMSampler

    if target == "tutorial":
        from automix_tpu.models.tutorial import tutorial_set
        ms = tutorial_set()
        cfg = EngineConfig(n_chains=n_chains, n_chains_stage1=1024,
                           stage1_sweeps=2000, sweep_chunk=1000, seed=seed,
                           trace_chain0=False, n_trace_chains=1)
    elif target == "rb9":
        from automix_tpu.models.rb9 import rb9_set
        ms = rb9_set()
        cfg = EngineConfig(n_chains=n_chains, n_chains_stage1=1024,
                           stage1_sweeps=2000, sweep_chunk=500, seed=seed,
                           trace_chain0=False, n_trace_chains=1)
    elif target == "ddi":
        from automix_tpu.models.ddi import ddi_set
        ms = ddi_set()
        cfg = EngineConfig(n_chains=n_chains, n_chains_stage1=512,
                           stage1_sweeps=1500, sweep_chunk=500, seed=seed,
                           trace_chain0=False, n_trace_chains=1)
    else:
        raise SystemExit(f"unknown target {target}")
    return AMSampler(ms, cfg)


def count_density_eqns(modelset):
    """Vector-op estimates of the fused density's evaluation modes, via
    jaxpr equation counts at scalar shapes (inside the kernel each
    equation lowers to ~one VPU op per lane).

    Returns ``(full_eqns, coord_eqns [D])`` — a full evaluation (incl.
    computing any incremental cache) and the per-coordinate update cost.
    For stateless densities ``coord_eqns[j] == full_eqns`` for every j;
    for incremental ones (DDI, models/ddi_cols.py) the coordinate
    updates are the whole point of the design and are far cheaper."""
    import jax
    import jax.numpy as jnp

    from automix_tpu.kernels.fused import make_density

    K, D = modelset.nmodels, modelset.dmax
    density = make_density(modelset)
    z = jnp.float32(0.0)
    mks, rows = (z,) * K, (z,) * D

    def n_eqns(fn, *args):
        return len(jax.make_jaxpr(fn)(*args).jaxpr.eqns)

    full = n_eqns(lambda m, r: density.full(list(m), list(r)),
                  mks, rows)
    cache = (z,) * density.n_cache
    coord = [n_eqns(lambda m, r, o, c, j=j: density.coord(
                 j, list(m), list(r), o, list(c)),
                 mks, rows, z, cache)
             for j in range(D)]
    return full, coord


def fused_cost_model(am, L):
    """Analytic roofline model of the fused sweep kernel (kernels/fused.py).

    XLA's ``cost_analysis`` cannot see inside a ``pallas_call``, so flops
    and HBM bytes come from the kernel's own static structure:

    * vector ops / (chain x sweep): the Python-unrolled triangular matvecs
      of forward allocation, de-standardization and reverse allocation
      (the K*L*D^2 core), the within-model move, latent/Jacobian math, pk
      adaptation, chunk statistics, random-word hashing, plus the family
      log-density evaluations counted by jaxpr size.  Transcendentals
      count as one op, so the achieved-VPU number is a floor.
    * HBM bytes / chunk: one chain-state read + write per *chunk*, the
      per-lane statistics outputs, and the proposal tables once per grid
      block — by design none of it scales with n_sweeps (the reason the
      fused engine exists; kernels/fused.py module docstring).

    Returns ``(vector_ops_per_chain_sweep, hbm_bytes_per_chunk)``.
    """
    ms = am.modelset
    cfg = am.cfg
    K, D = ms.nmodels, ms.dmax
    dims = [int(d) for d in ms.dims]
    S = cfg.n_chains
    tri = sum(L * (d * (d + 1) // 2) for d in dims)  # masked triangles
    lin = sum(L * d for d in dims)
    nw = ((4 if cfg.student_t_dof > 0 else 2) * D   # perturbation pairs
          + D + 1 + 2 * L + K + (D if cfg.perm else 0))
    full_eqns, coord_eqns = count_density_eqns(ms)
    n_cache = getattr(getattr(ms, "fused_density", None), "n_cache", 0)
    # density calls/sweep: componentwise move = one coord() per
    # coordinate on 9/10 sweeps, block move = full() on the rest,
    # full() for the RJ destination, and (incremental caches only) the
    # 1-in-_REFRESH drift refresh + per-move cache accept-blends.
    from automix_tpu.kernels import fused as fz
    density_ops = (0.9 * sum(coord_eqns) + 0.1 * full_eqns + full_eqns
                   + (full_eqns / fz._REFRESH + 4 * n_cache
                      if n_cache else 0.0))
    ops = (
        2 * (2 * tri + lin)        # fwd + reverse allocation (FMA + quad)
        + 2 * (tri + lin)          # de-standardize matvec
        + 2 * lin                  # latent selection masks
        + 8 * K * L                # logit assembly / component selects
        + 6 * (2 * L + K)          # gumbel argmaxes + lse
        + 14 * D                   # RWM proposal, Box-Muller, Jacobians
        + 10 * nw                  # counter-hash random words (int ops)
        + 4 * K + 6 * K * D + 25   # pk adapt, chunk stats, MH accepts
        + density_ops
    )
    blk = fz.choose_block(S, fz._est_tiles(ms, max(L, 1)))
    n_blocks = S // blk
    state_rw = S * (D + K + 4) * 4 * 2        # k,theta,logp,pk,pkllim,nreinit
    stats_out = S * (K + 2 * K * D + 6) * 4   # ksummary, th sums, counters
    tables = (K * D + 3 * K * L + K * L * D + 2 * K * L * D * D) * 4
    return ops, state_rw + stats_out + n_blocks * tables


def chunk_cost_analysis(am, n_sweeps):
    """flops and HBM bytes of one compiled production chunk (XLA path).

    For the fused Pallas engine XLA's cost model cannot see inside the
    kernel; fused targets use :func:`fused_cost_model` instead."""
    from automix_tpu.kernels import rjmcmc

    runner = rjmcmc.build_chunk_runner(am.modelset, am.cfg, burning=False,
                                       collect=False, mesh=None)
    try:
        lowered = runner.lower(am.chains, am.proposal, n_sweeps)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):       # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        nbytes = float(cost.get("bytes accessed", 0.0))
        return flops, nbytes
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
        print(f"# cost_analysis unavailable: {e}")
        return 0.0, 0.0


def engine_used(am):
    """Which stage-3 engine the sampler auto-selected."""
    from automix_tpu.kernels import fused

    lmax = (int(am.proposal.lam.shape[1]) if am.proposal is not None else 0)
    return "fused" if fused.fused_eligible(
        am.modelset, am.cfg, False, am.mesh, lmax) else "xla"


def bench_target(target, n_chains, n_sweeps, warmup, profile_dir=None):
    import jax

    am = build_sampler(target, n_chains)
    t0 = time.perf_counter()
    am.estimate_conditional_probs()
    t_adapt = time.perf_counter() - t0
    # burn long enough that the recorded parity_max_err is a meaningful
    # posterior check, not a transient (heavy-model tests burn ~1000-1500)
    am.burn_samples(max(warmup, 1000))
    am.rjmcmc_samples(warmup, collect=False)   # compile + warm

    t0 = time.perf_counter()
    stats = am.rjmcmc_samples(n_sweeps, collect=False)
    elapsed = time.perf_counter() - t0
    sweeps_s = n_chains * n_sweeps / elapsed

    # every PERF refresh re-validates posteriors at scale against the
    # published tutorial values / the C-binary oracle (VERDICT r3 item 5)
    ref_probs = parity_reference(target)
    parity_err = float(np.abs(stats.model_probs - ref_probs).max())

    # warm adaptation: a fresh sampler re-runs the IDENTICAL stages 1+2
    # (same seed, same config) with all kernels already compiled — the
    # steady-state adaptation cost, vs adapt_seconds which pays one-time
    # compiles.  Same seed matters: the EM while_loop's iteration count is
    # data-dependent, so a different seed measures a different fit (the
    # round-4 metric used seed=1 and sometimes came out *larger* than
    # cold — it was measuring seed variance, not warmth).
    am2 = build_sampler(target, n_chains, seed=0)
    t0 = time.perf_counter()
    am2.estimate_conditional_probs()
    t_adapt_warm = time.perf_counter() - t0
    warm_stage1 = am2.cpstats.timesecs_stage1
    warm_stage2 = am2.cpstats.timesecs_stage2
    del am2

    engine = engine_used(am)
    chunk_t = elapsed * am.cfg.sweep_chunk / n_sweeps
    kind, (peak_flops, peak_bw, peak_vpu) = chip_peaks(jax.devices()[0])
    if engine == "fused":
        lmax = int(am.proposal.lam.shape[1])
        ops_per_cs, bytes_per_chunk = fused_cost_model(am, lmax)
        flops = ops_per_cs * am.cfg.sweep_chunk * n_chains
        nbytes = bytes_per_chunk
    else:
        flops, nbytes = chunk_cost_analysis(am, am.cfg.sweep_chunk)
    achieved_flops = flops / chunk_t if flops else 0.0
    achieved_bw = nbytes / chunk_t if nbytes else 0.0

    result = {
        "target": target,
        "engine": engine,
        "n_chains": n_chains,
        "n_sweeps": n_sweeps,
        "seconds": round(elapsed, 4),
        "adapt_seconds": round(t_adapt, 2),
        "adapt_seconds_warm": round(t_adapt_warm, 2),
        # stage breakdown of the COLD run (sampler-side timers) and of the
        # warm re-run: stage1 = adaptive RWM, stage2 = EM fit; the
        # difference cold - (stage1 + stage2) is host assembly.
        "adapt_stage1_seconds": round(am.cpstats.timesecs_stage1, 2),
        "adapt_stage2_seconds": round(am.cpstats.timesecs_stage2, 2),
        "adapt_stage1_seconds_warm": round(warm_stage1, 2),
        "adapt_stage2_seconds_warm": round(warm_stage2, 2),
        "chain_sweeps_per_s": round(sweeps_s, 1),
        "parity_max_err": round(parity_err, 4),
        "flops_per_chain_sweep": round(flops / (am.cfg.sweep_chunk * n_chains), 1) if flops else None,
        "hbm_bytes_per_chain_sweep": round(nbytes / (am.cfg.sweep_chunk * n_chains), 1) if nbytes else None,
        "achieved_tflops": round(achieved_flops / 1e12, 3),
        "achieved_hbm_gbs": round(achieved_bw / 1e9, 1),
        "pct_peak_flops": round(100 * achieved_flops / peak_flops, 2),
        "pct_peak_vpu": round(100 * achieved_flops / peak_vpu, 2),
        "pct_peak_hbm": round(100 * achieved_bw / peak_bw, 2),
        "cost_model": ("analytic kernel-structure model (fused_cost_model)"
                       if engine == "fused" else "XLA cost_analysis"),
        "device": kind,
    }

    if profile_dir:
        import jax.profiler
        tdir = os.path.join(profile_dir, target)
        jax.profiler.start_trace(tdir)
        am.rjmcmc_samples(am.cfg.sweep_chunk, collect=False)
        jax.profiler.stop_trace()
        result["trace_top_ops"] = summarize_trace(tdir)
    return result


def summarize_trace(tdir, top=12):
    """Top device ops by total self-time from a jax.profiler trace."""
    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes are the pids whose process_name mentions TPU/device
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if any(s in name for s in ("TPU", "/device:", "Device")):
                device_pids.add(e.get("pid"))
    totals = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            totals[e["name"]] = totals.get(e["name"], 0.0) + e.get("dur", 0.0)
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    total = sum(totals.values()) or 1.0
    return [{"op": k, "us": round(v, 1), "pct": round(100 * v / total, 1)}
            for k, v in ranked]


def scaling_curve(chain_counts, n_sweeps=20_000):
    out = []
    for n in chain_counts:
        am = build_sampler("tutorial", n)
        am.burn_samples(500)
        am.rjmcmc_samples(1000, collect=False)
        t0 = time.perf_counter()
        am.rjmcmc_samples(n_sweeps, collect=False)
        dt = time.perf_counter() - t0
        out.append({"n_chains": n, "chain_sweeps_per_s":
                    round(n * n_sweeps / dt, 1),
                    "sweep_latency_us": round(1e6 * dt / n_sweeps, 2)})
        print(f"# scaling: {n:>7} chains -> "
              f"{out[-1]['chain_sweeps_per_s']:.3e} sweeps/s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default="tutorial,rb9,ddi")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--out", default="PERF.json")
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", flush=True)

    spec = {
        "tutorial": (131_072, 50_000, 1000),
        "rb9": (16_384, 10_000, 500),
        "ddi": (16_384, 10_000, 500),
    }
    results = {"device": dev.device_kind, "platform": dev.platform,
               "targets": [], "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    profile_dir = "/tmp/automix_traces" if args.profile else None
    for t in args.targets.split(","):
        n_chains, n_sweeps, warm = spec[t]
        r = bench_target(t, n_chains, n_sweeps, warm, profile_dir)
        results["targets"].append(r)
        print(json.dumps(r), flush=True)

    if args.scaling:
        results["scaling"] = scaling_curve(
            [4096, 8192, 16_384, 32_768, 65_536, 131_072, 262_144,
             524_288])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
