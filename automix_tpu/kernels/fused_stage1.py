"""Fused Pallas stage-1 kernel: a model's whole adaptive-RWM run in VMEM.

The XLA stage-1 path (kernels/rwm.py) is a scan of ~2200 sweeps over tiny
[K*C, D] arrays; at production sizes it costs ~2.5s — most of it per-op
latency, since the live state is a few hundred KB.  This kernel runs one
*model's* entire stage-1 schedule inside a single ``pallas_call``: all C
chains of the model are one (8, W) lane block, the adapted ``sig`` is a
scalar per coordinate, and the pooled acceptance counts — the reference's
cross-chain adaptation signal (rwm.py pools what automix.c:619,634,638
accumulates along one chain) — are single lane-reductions per sweep.
Models are compiled and dispatched separately (stage 1 is embarrassingly
parallel over models, automix.c:163), which also specializes each kernel
to its model's exact dimension and density branch: no padding, no masks,
one branch per evaluation.

Semantics mirror ``rwm._build_stage1_core`` sweep for sweep: the
``nsweeps + 10%`` burn schedule, the per-sweep 10% post-burn block move
coin, sweep-start-sig componentwise proposals with one pooled [dim]
update per sweep (AAP or log rule), telemetry every 100 sweeps, and the
thinned-tail snapshot schedule feeding stage 2.  Randomness is the
triple32^lowbias32 counter hash (seeded per model), so runs are bitwise
reproducible and identical between compiled TPU and interpret mode; the
streams differ from the XLA path's threefry, so stage-1 parity with it is
statistical (same pooled-adaptation dynamics), which is what the
exact-posterior suite checks end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from automix_tpu.config import (EngineConfig, LOG_ACCEPT_CLAMP, NEG_INF,
                                RWM_TARGET_ACCEPT)
from automix_tpu.kernels.fused import _MAX_D, _lowbias32, _triple32, _u01

_U = jnp.uint32
_TWO_PI = 6.283185307179586
TELEMETRY_EVERY = 100

# Compiled per-model stage-1 kernels, keyed on the full static schedule +
# the density function's identity (module-level for the builtin sets, so
# repeated samplers in one process reuse the compilation).
_KERNEL_CACHE: dict = {}


def stage1_eligible(modelset, cfg: EngineConfig, mesh, C: int) -> bool:
    """The fused stage-1 covers: float32 Gaussian runs, no mesh (stage-1
    pooling is per model inside ONE lane block), all chains of a model in
    one block, column-form densities available.

    Gated on ``cfg.fused_stage1`` (default "off"), NOT on ``cfg.fused``:
    the stage-3 fused engine is hardware-proven while this kernel wedged
    a v5e on first contact (see config.py) — the two must not share an
    enable switch."""
    if cfg.fused_stage1 == "off" or mesh is not None:
        return False
    has_cols = (getattr(modelset, "batched_logpost_cols", None) is not None
                or all(m.logp_cols is not None for m in modelset.models))
    if not (has_cols and cfg.dtype == jnp.float32
            and cfg.student_t_dof == 0 and modelset.dmax <= _MAX_D):
        return False
    if C % 1024 != 0 or C > 4096:
        return False
    # one Mosaic compile per model: past a handful of models the compile
    # bill exceeds what the fused run saves over the (already cheap) XLA
    # stage-1 scan, so large families stay on the XLA path
    if modelset.nmodels > 6:
        return False
    if cfg.fused_stage1 == "auto":
        return jax.devices()[0].platform == "tpu"
    return True  # "on": forced (interpret off-TPU)


def _branch_for(modelset, k: int):
    """Column-form density of model k — the per-model logp_cols, or the
    family kernel specialized with constant one-hot masks — sanitized to
    a finite range (an unguarded density can overflow to +-inf near the
    support boundary; 0 * inf in the blended accept update would poison
    the carried logp even on rejection)."""
    m = modelset.models[k]
    if m.logp_cols is not None:
        dim = m.dim
        raw = lambda rows: m.logp_cols(rows[:dim])  # noqa: E731
        key = m.logp_cols
    else:
        batched = modelset.batched_logpost_cols
        K = modelset.nmodels
        D = modelset.dmax
        mks = [1.0 if i == k else 0.0 for i in range(K)]

        def raw(rows):
            # the family kernel indexes all dmax coordinate rows; pad the
            # per-model tuple with zeros (its in_dim masks ignore them)
            rows = tuple(rows) + (jnp.zeros_like(rows[0]),) * (D - len(rows))
            return batched(mks, rows)

        key = batched

    def branch(rows):
        lp = raw(rows)
        lp = jnp.minimum(jnp.maximum(lp, NEG_INF), -NEG_INF)
        return jnp.where(lp == lp, lp, NEG_INF)     # NaN -> reject

    return branch, key


def run_fused_stage1(modelset, cfg: EngineConfig, nsweeps: int, C: int,
                     init_theta):
    """Fused replacement for ``rwm.run_stage1``'s core: returns
    ``(sig [K, D], samples [K, C*n_tail, D], tele_sig [n_tele, K, D],
    tele_acc [n_tele, K, D], lp [K, C])`` with the rwm.py layouts
    (padded to dmax, chain-major samples)."""
    K, D = modelset.nmodels, modelset.dmax
    interpret = jax.devices()[0].platform != "tpu"
    W = C // 8

    # schedule constants — mirror rwm._build_stage1_core exactly
    nburn = nsweeps // 10
    total = nsweeps + nburn
    target = cfg.stage1_target_samples or 1000 * D
    n_tail = -(-target // C)
    n_tail = max(1, min(n_tail, max(1, (total - nburn) // 2)))
    stride = max(1, (total - max(nburn, total // 2)) // n_tail)
    smp_start = total - n_tail * stride
    n_tele = max(1, total // TELEMETRY_EVERY)

    init_np = np.asarray(init_theta, np.float32)      # [K, D]

    sig_out = np.zeros((K, D), np.float32)
    tele_sig_out = np.zeros((n_tele, K, D), np.float32)
    tele_acc_out = np.zeros((n_tele, K, D), np.float32)
    samples_out = np.zeros((K, C * n_tail, D), np.float32)
    lp_out = np.zeros((K, C), np.float32)

    for k in range(K):
        dim = modelset.models[k].dim
        branch, branch_key = _branch_for(modelset, k)
        init_vals = tuple(float(x) for x in init_np[k, :dim])
        cache_key = (id(branch_key), k, dim, C, W, total, nburn, n_tail,
                     stride, smp_start, n_tele, interpret, init_vals,
                     int(cfg.seed), cfg.stage1_adapt,
                     float(cfg.stage1_log_gain))
        fn = _KERNEL_CACHE.get(cache_key)
        if fn is None:
            fn = jax.jit(lambda branch=branch, a=(
                modelset, cfg, k, dim, C, W, total, nburn, n_tail, stride,
                smp_start, n_tele, interpret, branch, init_vals):
                _model_kernel(*a))
            _KERNEL_CACHE[cache_key] = fn
        outs = fn()
        sig_k, tele_s, tele_a, smp, lp = jax.tree.map(np.asarray, outs)
        sig_out[k, :dim] = sig_k[:dim, 0, 0]
        tele_sig_out[:, k, :dim] = tele_s[:, :dim, 0, 0]
        tele_acc_out[:, k, :dim] = tele_a[:, :dim, 0, 0]
        # [n_tail, dim, 8, W] -> chain-major [C, n_tail, dim] -> flat
        smp_cm = smp.transpose(2, 3, 0, 1).reshape(C, n_tail, dim)
        samples_out[k, :, :dim] = smp_cm.reshape(C * n_tail, dim)
        lp_out[k] = lp.reshape(C)

    return (jnp.asarray(sig_out), jnp.asarray(samples_out),
            jnp.asarray(tele_sig_out), jnp.asarray(tele_acc_out),
            jnp.asarray(lp_out))


def _model_kernel(modelset, cfg, k, dim, C, W, total, nburn, n_tail,
                  stride, smp_start, n_tele, interpret, branch, init_vals):
    """One model's full stage-1 run as a single pallas_call.  Every
    argument is static — the kernel is a closed program of the schedule.
    The engine seed is deliberately baked in as a constant: passing it as
    a dynamic SMEM scalar was measured to blow the Mosaic compile from
    ~7s to ~180s (the salt computation stops constant-folding), while a
    per-seed recompile costs only those ~7s once."""
    seed_eff = (int(cfg.seed) * 1000003 + 777 + k * 7919) & 0x7FFFFFFF
    # per-sweep word slots: dim accept-uniforms, 2*dim Box-Muller words
    NW = 3 * dim
    log_rule = cfg.stage1_adapt == "log"
    log_gain = float(cfg.stage1_log_gain)

    def kernel(sig_o, tele_sig_o, tele_acc_o, smp_o, lp_o):
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
        cbase = (sub * W + lane).astype(_U) * _U(NW)
        seed_u = _U(seed_eff)

        def words(t):
            sweep_u = t.astype(_U)
            salt1 = _triple32(sweep_u ^ (seed_u * _U(0x9E3779B9)))
            salt2 = _lowbias32(sweep_u + _U(0x85EBCA6B)
                               + seed_u * _U(0xC2B2AE35))
            woff = jax.lax.broadcasted_iota(
                jnp.int32, (NW, 8, W), 0).astype(_U)
            c = cbase[None] + woff
            return _triple32(c ^ salt1) ^ _lowbias32(c + salt2)

        def block_coin(t):
            """u < 0.1 as a pure integer compare (Mosaic has no scalar
            uint->float path): one coin per sweep for the whole block
            (the single-chain per-sweep coin, automix.c:605-606)."""
            h = _triple32((t.astype(_U) * _U(2654435761) + seed_u)
                          ^ _U(0xB5297A4D))
            return (h >> 8) < _U(int(0.1 * 2 ** 24))

        th0 = tuple(jnp.full((8, W), v, jnp.float32) for v in init_vals)
        lp0 = branch(th0)
        sig0 = (jnp.float32(10.0),) * dim           # automix.c:595
        zi32 = jnp.int32(0)
        nacc0 = (zi32,) * dim
        ntry0 = (zi32,) * dim

        def body(t_rel, carry):
            th, lp, sig, nacc, ntry = carry
            t = t_rel + 1                            # 1-based sweep index
            w = words(t)
            u = [_u01(w[j]) for j in range(dim)]
            z = []
            for j in range(dim):
                u1 = _u01(w[dim + j])
                u2 = _u01(w[2 * dim + j])
                r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
                z.append(r * jnp.cos(_TWO_PI * u2))

            do_block = (t > nburn) & block_coin(t)

            def block_move(args):
                th, lp, sig, nacc, ntry = args
                prop = tuple(th[j] + sig[j] * z[j] for j in range(dim))
                lpn = branch(prop)
                # select, never blend (0 * inf on rejected non-finite
                # proposals would poison the carry)
                acc = u[0] < jnp.exp(jnp.clip(lpn - lp, LOG_ACCEPT_CLAMP,
                                              0.0))
                th = tuple(jnp.where(acc, prop[j], th[j])
                           for j in range(dim))
                lp = jnp.where(acc, lpn, lp)
                return th, lp, sig, nacc, ntry

            def comp_move(args):
                th, lp, sig, nacc, ntry = args
                gamma = jnp.exp((-2.0 / 3.0)
                                * jnp.log(t.astype(jnp.float32) + 1.0))
                cnt = []
                for j in range(dim):
                    prop = tuple(th[d] + (sig[j] * z[j] if d == j else 0.0)
                                 for d in range(dim))
                    lpn = branch(prop)
                    acc = u[j] < jnp.exp(
                        jnp.clip(lpn - lp, LOG_ACCEPT_CLAMP, 0.0))
                    th = tuple(jnp.where(acc, prop[d], th[d])
                               for d in range(dim))
                    lp = jnp.where(acc, lpn, lp)
                    cnt.append(jnp.sum(acc.astype(jnp.int32)))
                # one pooled [dim] update per sweep from sweep-start sig
                # (rwm.py componentwise; automix.c:619,634,638 pooled)
                new_sig = []
                for j in range(dim):
                    err = cnt[j].astype(jnp.float32) / C - RWM_TARGET_ACCEPT
                    if log_rule:
                        new_sig.append(sig[j] * jnp.exp(
                            log_gain * gamma * err))
                    else:
                        new_sig.append(jnp.maximum(
                            sig[j] + 10.0 * gamma * err, 0.0))
                nacc = tuple(nacc[j] + cnt[j] for j in range(dim))
                ntry = tuple(ntry[j] + jnp.int32(C) for j in range(dim))
                return th, lp, tuple(new_sig), nacc, ntry

            th, lp, sig, nacc, ntry = jax.lax.cond(
                do_block, block_move, comp_move, (th, lp, sig, nacc, ntry))

            # telemetry every 100 sweeps (automix.c:648-655)
            t_idx = jnp.minimum(t // TELEMETRY_EVERY, n_tele - 1)

            @pl.when(t % TELEMETRY_EVERY == 0)
            def _():
                for j in range(dim):
                    ratio = (nacc[j].astype(jnp.float32)
                             / jnp.maximum(ntry[j].astype(jnp.float32),
                                           1.0))
                    tele_sig_o[t_idx, j] = jnp.full((8, W), sig[j])
                    tele_acc_o[t_idx, j] = jnp.full((8, W), ratio)

            # thinned-tail snapshot (automix.c:642-647; rwm.py schedule)
            do_smp = (t > smp_start) & (((t - smp_start) % stride) == 0)
            s_idx = jnp.clip((t - smp_start) // stride - 1, 0, n_tail - 1)

            @pl.when(do_smp)
            def _():
                for j in range(dim):
                    smp_o[s_idx, j] = th[j]

            return th, lp, sig, nacc, ntry

        th, lp, sig, nacc, ntry = jax.lax.fori_loop(
            0, total, body, (th0, lp0, sig0, nacc0, ntry0))
        for j in range(dim):
            sig_o[j] = jnp.full((8, W), sig[j])
        lp_o[:] = lp

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((dim, 8, W), f32),            # sig
            jax.ShapeDtypeStruct((n_tele, dim, 8, W), f32),    # tele_sig
            jax.ShapeDtypeStruct((n_tele, dim, 8, W), f32),    # tele_acc
            jax.ShapeDtypeStruct((n_tail, dim, 8, W), f32),    # samples
            jax.ShapeDtypeStruct((8, W), f32),                 # final lp
        ],
        out_specs=[vm, vm, vm, vm, vm],
        interpret=interpret,
    )()
