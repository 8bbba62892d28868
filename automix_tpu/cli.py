"""Command-line driver: the engine's equivalent of the reference CLI.

Mirrors ``main.c``'s flags one-to-one (-m/-N/-n/-a/-p/-s/-t/-b/-f,
main.c:114-143 and parse loop main.c:145-202) and adds the TPU-native
knobs (--chains, --platform).  The reference builds one executable per
user model file (``am<NAME>``); here a built-in problem registry selects
the model set by name, and any importable ``module:function`` returning a
ModelSet works too.

Modes (-m, main.c:28-30): 0 = full pipeline with mixture fitting,
1 = resume stage 3 from a ``<f>_mix.data`` proposal file (main.c:81-92),
2 = AutoRJ single-Normal fit.
"""

from __future__ import annotations

import argparse
import importlib
import sys
import time


def _problem_registry():
    from automix_tpu.models import builtin, changepoint, rb9, toy, tutorial

    return {
        "tutorial": tutorial.tutorial_set,
        "toy1": toy.toy1_set,
        "toy2": toy.toy2_set,
        "cpt": changepoint.cpt_set,
        "cptrs": changepoint.cptrs_set,
        "rb9": rb9.rb9_set,
        "ddi": _ddi_factory,
        "normal": builtin.normal_sampler_set,
        "truncnormal": builtin.truncnormal_sampler_set,
        "beta": builtin.beta_sampler_set,
        "normal_params": builtin.normal_params_set,
        "beta_params": builtin.beta_params_set,
        "gamma_params": builtin.gamma_params_set,
        "gamma_beta": builtin.gamma_beta_set,
        "normal_beta": builtin.normal_beta_set,
        "normal_gamma": builtin.normal_gamma_set,
    }


def _ddi_factory(**kw):
    from automix_tpu.models import ddi
    return ddi.ddi_set(**kw)


def _resolve_problem(name: str):
    reg = _problem_registry()
    if name in reg:
        return reg[name]
    if ":" in name:
        mod, fn = name.split(":", 1)
        return getattr(importlib.import_module(mod), fn)
    raise SystemExit(
        f"unknown problem {name!r}; built-ins: {', '.join(sorted(reg))} "
        f"(or use module:function)")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="automix-tpu",
        description="TPU-native automatic RJMCMC sampler")
    p.add_argument("problem", help="built-in problem name or module:function")
    p.add_argument("-m", "--mode", type=int, default=0, choices=(0, 1, 2),
                   help="0 mixture fitting, 1 load mixture params from "
                        "<f>_mix.data, 2 AutoRJ (main.c:28-30)")
    p.add_argument("-N", "--nsweep", type=int, default=100_000,
                   help="reversible-jump sweeps in stage 3")
    p.add_argument("-n", "--nsweep2", type=int, default=None,
                   help="stage-1 adaptation sweeps (engine default pools "
                        "chains so far fewer are needed than the C 100000)")
    p.add_argument("-a", "--adapt", type=int, default=1,
                   help="1 to adapt pk in stage 3 (automix.h:222)")
    p.add_argument("-p", "--perm", type=int, default=1,
                   help="1 to permute the RJ latent (CLI default 1, "
                        "main.c:39)")
    p.add_argument("-s", "--seed", type=int, default=0,
                   help="random seed; 0 seeds from the clock (main.c:40-41)")
    p.add_argument("-t", "--dof", type=int, default=0,
                   help="Student-t dof for RWM/RJ perturbations; 0 = Normal")
    p.add_argument("-b", "--nburn", type=int, default=-1,
                   help="burn-in sweeps; default max(N/10, 10000) "
                        "(main.c:55-60)")
    p.add_argument("-f", "--fname", default="output", help="output filestem")
    p.add_argument("--chains", type=int, default=4096,
                   help="parallel chains (the TPU throughput axis)")
    p.add_argument("--chains-stage1", type=int, default=2048)
    p.add_argument("--fused", default="auto", choices=("auto", "on", "off"),
                   help="fused Pallas sweep engine (kernels/fused.py): "
                        "auto selects it on TPU when eligible")
    p.add_argument("--fused-stage1", default="auto",
                   choices=("auto", "on", "off"),
                   help="fused Pallas stage-1 kernel "
                        "(kernels/fused_stage1.py): auto selects it on TPU "
                        "when eligible")
    p.add_argument("--trace-every", type=int, default=None,
                   help="record per-sweep traces every Nth sweep; with "
                        "N > 1 traced runs stay on the fused engine "
                        "(boundary snapshots, config.py trace_every). "
                        "Default: 16 when the problem can run the fused "
                        "Pallas engine (stride-1 traces would force the "
                        "~1000x slower XLA path), else 1 (exact "
                        "reference-format traces; pass 1 to force)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (cpu/tpu)")
    p.add_argument("--no-reports", action="store_true",
                   help="skip writing the output files")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="write a full-state checkpoint to <f>_ckpt.npz "
                        "after burn-in and then every N production sweeps "
                        "(0 disables; the elastic-restart path SURVEY.md "
                        "section 5 plans against the reference's "
                        "proposal-only _mix.data restart)")
    p.add_argument("--resume", action="store_true",
                   help="resume a killed run from <f>_ckpt.npz: stages 1-2 "
                        "and completed sweeps are skipped and trajectories "
                        "continue exactly (sweeps depend only on (key, "
                        "sweep counter))")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from automix_tpu.config import AUTORJ_MIX_FIT, EngineConfig, FIGUEIREDO_MIX_FIT
    from automix_tpu.io import mixfile, reports
    from automix_tpu.sampler import AMSampler

    t0 = time.perf_counter()
    seed = args.seed if args.seed != 0 else int(time.time()) & 0x7FFFFFFF
    nburn = args.nburn
    if nburn < 0:
        nburn = max(args.nsweep // 10, 10_000)

    cfg = EngineConfig(
        seed=seed,
        adapt=bool(args.adapt),
        perm=bool(args.perm),
        student_t_dof=args.dof,
        mix_fit=AUTORJ_MIX_FIT if args.mode == 2 else FIGUEIREDO_MIX_FIT,
        n_chains=args.chains,
        n_chains_stage1=args.chains_stage1,
        fused=args.fused,
        fused_stage1=args.fused_stage1,
        trace_every=args.trace_every or 1,
    )
    modelset = _resolve_problem(args.problem)()
    if args.trace_every is None:
        # Default-performance guard: stride-1 traces disqualify the fused
        # Pallas engine (fused.py requires collect=False), costing ~3
        # orders of magnitude out of the box.  When this run could go
        # fused, default to decimated traces; explicit --trace-every 1
        # restores exact reference-format per-sweep traces.
        from automix_tpu.kernels import fused
        # lmax is unknown before the stage-2 fit; 4 is a typical
        # post-trim component count and keeps the budget checks honest
        could_fuse = fused.fused_eligible(modelset, cfg, collect=False,
                                          mesh=None, lmax=4)
        if could_fuse:
            import dataclasses
            cfg = dataclasses.replace(cfg, trace_every=16)
            print("Tracing every 16th sweep to keep the fused engine "
                  "(pass --trace-every 1 for exact per-sweep traces).")
    am = AMSampler(modelset, cfg)

    ckpt_path = f"{args.fname}_ckpt.npz"
    resumed = False
    if args.resume:
        import os
        if os.path.exists(ckpt_path):
            am.load(ckpt_path)
            resumed = am.chains is not None
            done = am.stats.nsweeps if am.stats is not None else 0
            print(f"Resumed from {ckpt_path}: "
                  f"{done}/{args.nsweep} production sweeps done.")
        else:
            print(f"No checkpoint at {ckpt_path}; starting fresh.")

    if resumed:
        pass        # proposal + chains + stats restored above
    elif args.mode == 1:
        print("Reading parameters from mix file.")
        prop = mixfile.read_mix_file(
            f"{args.fname}_mix.data", modelset.dims,
            lmax=cfg.max_mix_comps, dmax=modelset.dmax, dtype=cfg.dtype)
        am.set_proposal(prop)
    else:
        nsweep2 = args.nsweep2
        print(f"Adapting proposals "
              f"({nsweep2 or cfg.stage1_sweeps} sweeps x "
              f"{cfg.n_chains_stage1} chains/model).")
        am.estimate_conditional_probs(nsweep2)
        if not args.no_reports:
            reports.report_cond_prob_estimation(args.fname, am)

    every = args.checkpoint_every
    if not resumed or am.stats is None:
        print(f"Burning in {nburn} sweeps.")
        am.burn_samples(nburn)
        if every:
            am.save(ckpt_path)
    print(f"Sampling {args.nsweep} sweeps x {args.chains} chains.")
    # Run stage 3 in checkpoint-aligned blocks: each block's statistics are
    # absorbed into am.stats before the snapshot, so a SIGKILL at any point
    # loses at most the current block and --resume continues the exact
    # trajectories (sweeps are pure functions of (chain key, sweep counter)).
    done = am.stats.nsweeps if (resumed and am.stats is not None) else 0
    while done < args.nsweep:
        n = min(every, args.nsweep - done) if every else args.nsweep - done
        stats = am.rjmcmc_samples(n)
        done = stats.nsweeps
        if every:
            am.save(ckpt_path)
    stats = am.stats

    probs = stats.model_probs
    for k in range(modelset.nmodels):
        print(f"p(M={k + 1}|E) = {probs[k]:.6f}")
    if not args.no_reports:
        reports.report_rjmcmc_run(args.fname, am, mode=args.mode,
                                  nsweep2=args.nsweep2 or cfg.stage1_sweeps,
                                  nsweep=args.nsweep)
    agg = stats.n_chains * stats.nsweeps / max(stats.timesecs_rjmcmc, 1e-9)
    print(f"Stage-3 throughput: {agg:,.0f} chain-sweeps/s")
    # Per-stage wall-clock, the reference's main.c:107-109 / logwrite.c:340-342
    # report (timesecs_condprobs/burn/rjmcmc, automix.h:169,204-205).
    print(f"Time: conditional-probability estimation "
          f"{am.cpstats.timesecs_condprobs:.3f} sec, "
          f"burn-in {stats.timesecs_burn:.3f} sec, "
          f"rjmcmc {stats.timesecs_rjmcmc:.3f} sec.")
    print(f"Total time elapsed: {time.perf_counter() - t0:.3f} sec.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
