"""Engine configuration.

The reference library configures the sampler through plain struct fields set
after ``initAMSampler`` (reference ``automix.h:222-228``, defaults at
``automix.c:234-238``) plus hard caps ``NMODELS_MAX=15``,
``NUM_MIX_COMPS_MAX=30``, ``NUM_FITMIX_MAX=5000`` (``automix.c:204-206``).

This engine keeps the same knobs (``adapt``/``perm``/``student_t_dof``/
``mix_fit``/``seed``) and caps, and adds the TPU-native axes the reference
does not have: the number of parallel chains, the compute dtype, and the
chunking of the scan-compiled hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

# Mixture-fit modes, mirroring `automix_mix_fit` (automix.h:56).
FIGUEIREDO_MIX_FIT = "figueiredo"
AUTORJ_MIX_FIT = "autorj"

# Value used in place of the reference's -DBL_MAX for out-of-support states
# (e.g. tests/test_automix.c:247,267).  Large enough to always reject, small
# enough that float32 arithmetic on it stays finite.
NEG_INF = -1e30

# MH acceptance clamp: accept with prob exp(max(-30, min(0, logratio)))
# (automix.c:612,628,1063,1077,1247).
LOG_ACCEPT_CLAMP = -30.0

# Stage-1 target acceptance rate alphastar (automix.c:581).
RWM_TARGET_ACCEPT = 0.25

# Figueiredo-Jain component annihilation threshold (automix.c:794).
EM_ANNIHILATION_THRESHOLD = 0.005

# Degenerate E-step guard: the reference detects "no component explains this
# point" when exp() underflows to exactly 0 in double precision
# (automix.c:855-866); we detect it on the log scale instead.
EM_DEGENERATE_LOGSUM = -700.0
EM_DEGENERATE_PENALTY = -500.0


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static configuration of the TPU RJMCMC engine.

    Attributes mirror the reference knobs where one exists; TPU-native knobs
    are documented inline.
    """

    # --- reference-equivalent knobs -------------------------------------
    seed: int = 0
    adapt: bool = True            # doAdapt (automix.c:235)
    perm: bool = False            # doPerm (automix.c:236)
    student_t_dof: int = 0        # student_T_dof (automix.c:237); 0 => Normal
    mix_fit: str = FIGUEIREDO_MIX_FIT   # am_mixfit (automix.c:238)
    max_mix_comps: int = 30       # NUM_MIX_COMPS_MAX (automix.c:205)
    max_em_iters: int = 5000      # NUM_FITMIX_MAX (automix.c:206)

    # --- engine-native extensions ---------------------------------------
    # Within-model move kind for stage 3: "rwm" reproduces the reference's
    # block/componentwise Metropolis (automix.c:1054-1085); "hmc" replaces
    # it with gradient-based Hamiltonian moves (possible because models are
    # pure JAX functions — jax.grad comes free; SURVEY.md section 7 step 7).
    within_move: str = "rwm"
    # Model-probability adaptation scope for stage 3 (automix.c:1258-1281).
    # "per_chain": every chain adapts its own pk from its own visit history
    # (diminishing adaptation per chain — each chain is a valid sampler on
    # its own).  "pooled": one shared pk updated from the cross-chain visit
    # histogram with the same gamma schedule — the expected drift of the
    # reference's single-chain update with a chains-times lower-variance
    # gradient, and the closer match to the reference's shared-pk semantics.
    pk_mode: str = "per_chain"
    hmc_steps: int = 5          # (max) leapfrog steps per HMC move
    # Draw each chain's trajectory length uniformly from {1..hmc_steps}
    # per move (randomized trajectories, the vectorizable alternative to
    # NUTS's adaptive lengths; see kernels/hmc.py).
    hmc_jitter: bool = True
    # Leapfrog step size per coordinate = hmc_step_scale * sig[k, j], i.e.
    # preconditioned by the stage-1 adapted RWM scales.  A scalar applies to
    # all models; a length-K tuple gives per-model multipliers (what
    # kernels/hmc.py:tune_step_scale produces).
    hmc_step_scale: Any = 0.2
    # Dual-average hmc_step_scale per model during burn-in toward
    # hmc_target_accept (skipped when hmc_step_scale is already a tuple).
    hmc_autotune: bool = True
    hmc_target_accept: float = 0.65

    # --- TPU-native knobs ------------------------------------------------
    # Number of parallel RJMCMC chains in stage 3.  The reference runs
    # exactly one chain (automix.c:90-125); the chain axis is this engine's
    # primary throughput axis.
    n_chains: int = 4096
    # Stage-1 chains per model.  Each contributes one final-state sample to
    # the EM fit, replacing the reference's 1000*mdim thinned single-chain
    # draws (automix.c:642-647) with independent parallel draws.
    n_chains_stage1: int = 2048
    # Total stage-2 fit samples per model (spread as thinned tail snapshots
    # across the stage-1 chains).  0 = auto: 1000 * dmax, the reference's
    # per-model budget (automix.c:642-647) — at high dim the MML reweight
    # needs this scale of samples or components annihilate spuriously.
    stage1_target_samples: int = 0
    # Stage-1 sweep count (before the +10% burn-in that the reference also
    # adds, automix.c:579-582).  The reference needs >=100k sequential
    # sweeps for one chain; pooled adaptation across n_chains_stage1 chains
    # converges in far fewer.
    stage1_sweeps: int = 10000
    # Stage-1 scale-adaptation rule.  "aap": the reference's additive AAP
    # update sig += 10*(1/t)^(2/3) * (accept - 0.25), clipped at 0
    # (automix.c:619,634,638) — exact parity, but *additive*: it cannot
    # resolve proposal scales far below its gain, which is why the C code
    # needs 10000*mdim sweeps when coordinates live at scale 1e-3 (e.g. the
    # change-point rates, usercpt.c).  "log": multiplicative Robbins-Monro
    # on the same pooled acceptance signal,
    #     sig *= exp(gain * t^(-2/3) * (accept - 0.25)),
    # which is scale-free (equally fast at sig=1e-4 and 1e+4) and converges
    # in O(100) pooled sweeps from the same sig=10 start.
    stage1_adapt: str = "aap"
    # Log-space Robbins-Monro gain for stage1_adapt="log".
    stage1_log_gain: float = 3.0
    # Number of sweeps compiled into one lax.scan chunk of the stage-3 hot
    # loop.  Host-side int64/float64 accumulation between chunks avoids
    # int32 overflow of visit counters without enabling jax_enable_x64.
    sweep_chunk: int = 1000
    # How many chains have their model-index trace recorded per sweep (for
    # Sokal autocorrelation diagnostics and _k.data-style output).  The
    # reference records its single chain (automix.c:101,122-124).
    n_trace_chains: int = 8
    # Device->host flush interval of the chunk-statistics pipeline, in
    # chunks.  Bounds device memory held by per-sweep traces (each chunk of
    # a collect=True run keeps [sweep_chunk, ...] trace arrays alive until
    # flushed) while still letting several dispatches pipeline.
    chunk_flush_every: int = 8
    # Record chain 0's pk / logp / theta trace every sweep (parity with
    # _pk.data/_lp.data/_theta<k>.data writers, logwrite.c:162-220).
    trace_chain0: bool = True
    # Trace decimation stride: record the per-sweep traces every Nth sweep
    # instead of every sweep.  With stride 1 (exact reference parity)
    # trace collection runs on the XLA engine; with stride > 1 the fused
    # Pallas engine runs in stride-length chunks and traces are boundary
    # snapshots — the same thinning idea the reference applies to its
    # Sokal series (nsokal, automix.c:122-124), extended to all traces.
    trace_every: int = 1
    # Per-sweep randomness source for stage 3: "fast" (fused avalanche
    # counter hash, ops/randoms.py — bitwise sharding-invariant, ~3x
    # cheaper than threefry on the hot path), "threefry" (counter-based
    # jax.random), "pallas" (TPU hardware-PRNG kernel, kernels/sweep_rng.py
    # — opt-in; see resolve_rng for why it is not the default), or "auto"
    # ("fast" for float32 Gaussian runs, "threefry" otherwise).
    rng: str = "auto"
    # Fused Pallas sweep engine (kernels/fused.py): run whole stage-3
    # chunks in one kernel with chain state resident in VMEM.  "auto" uses
    # it on real TPU whenever the run is eligible (float32 rwm — Gaussian
    # or Student-t — per-chain OR pooled pk at any scale, column-form or
    # FusedColsDensity densities available, dims <= 16, traces only at
    # trace_every > 1); "on" forces it (interpret mode off-TPU — for
    # tests); "off" always uses the XLA chunk runner.
    fused: str = "auto"
    # Randomness source inside the fused kernel: "hw" = the TPU hardware
    # PRNG (chunk-granular streams, fastest), "hash" = the triple32^
    # lowbias32 counter hash (sweep-granular (seed, sweep, chain, slot)
    # streams, bitwise identical compiled vs interpreted), "auto" = hw on
    # TPU / hash under the interpreter.
    fused_rng: str = "auto"
    # Fused Pallas *stage-1* kernel (kernels/fused_stage1.py): the whole
    # model family's adaptive-RWM schedule as a sequence of short
    # VMEM-resident pallas_call segments; under a mesh, per-shard lane
    # blocks with per-sweep psum'd pooled adaptation (bitwise equal to
    # unsharded).  "auto" (default) uses it on real TPU whenever eligible
    # (float32, Gaussian or Student-t, column densities); "on" forces it
    # (interpret mode off-TPU — the test path);
    # "off" always uses the XLA stage-1 scan (kernels/rwm.py).  An
    # earlier monolithic revision of this kernel wedged a v5e on first
    # hardware contact; the chunked redesign passed its hardware
    # shakedown (tutorial/toy1/rb9 probes, rb9 8x faster than the XLA
    # scan) and is production-default.
    fused_stage1: str = "auto"
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.mix_fit not in (FIGUEIREDO_MIX_FIT, AUTORJ_MIX_FIT):
            raise ValueError(f"unknown mix_fit {self.mix_fit!r}")
        if self.rng not in ("auto", "threefry", "fast", "pallas"):
            raise ValueError(f"unknown rng {self.rng!r}")
        if self.fused not in ("auto", "on", "off"):
            raise ValueError(f"unknown fused {self.fused!r}")
        if self.fused_rng not in ("auto", "hw", "hash"):
            raise ValueError(f"unknown fused_rng {self.fused_rng!r}")
        if self.fused_stage1 not in ("auto", "on", "off"):
            raise ValueError(f"unknown fused_stage1 {self.fused_stage1!r}")
        if self.within_move not in ("rwm", "hmc"):
            raise ValueError(f"unknown within_move {self.within_move!r}")
        if self.pk_mode not in ("per_chain", "pooled"):
            raise ValueError(f"unknown pk_mode {self.pk_mode!r}")
        if self.stage1_adapt not in ("aap", "log"):
            raise ValueError(f"unknown stage1_adapt {self.stage1_adapt!r}")
        if self.rng in ("fast", "pallas") and self.student_t_dof > 0:
            # The fast counter-hash and pallas hardware-PRNG paths emit
            # N(0,1) perturbations only, while the RJ acceptance ratio
            # accounts for the latent with a t(dof) density
            # (rjmcmc.py latent_log_pdf) — combining them would silently
            # break detailed balance.  rng="auto" routes t runs to threefry.
            raise ValueError(
                f"rng={self.rng!r} draws Gaussian perturbations and cannot "
                "be combined with student_t_dof > 0; use rng='auto' or "
                "'threefry' for Student-t runs")
        if self.within_move == "hmc" and self.student_t_dof > 0:
            raise ValueError(
                "within_move='hmc' uses Gaussian momenta; combine it with "
                "student_t_dof=0")
        if self.n_chains < 1:
            raise ValueError("n_chains must be >= 1")
        if self.trace_every < 1:
            raise ValueError("trace_every must be >= 1")
        if self.student_t_dof < 0:
            raise ValueError("student_t_dof must be >= 0")
