"""Stage 1: adaptive within-model random-walk Metropolis.

The reference runs, for each model k in turn, a single chain for
``nsweepr = max(nsweep2, 10000*mdim)`` (+10% burn) sweeps of componentwise
RWM with AAP diminishing adaptation, then thins the tail into 1000*mdim
samples for the stage-2 mixture fit (``rwm_within_model``,
automix.c:575-662, driven by the per-model loop at automix.c:163-192).
The per-coordinate Metropolis chain is inherently sequential, so the C
implementation's wall-clock scales with sweeps x mdim.

TPU-native inversion: run ``C`` chains *per model*, for *all models at
once*, in one scan over sweeps — a [K*C] chain batch on padded [K*C, dmax]
state.  The Robbins-Monro scale adaptation pools the acceptance indicator
across each model's C chains: the reference's per-event update

    accept: sig -= gamma*(alphastar - 1);  reject: sig -= gamma*alphastar
    (automix.c:634,638)

has expected drift ``gamma*(P(accept) - alphastar)`` per event, so the
pooled update ``sig += gamma*(mean_accept - alphastar)`` follows the same
ODE with a C-times lower-variance gradient — allowing far fewer sweeps for
the same adapted scales.  Samples for stage 2 are the C chains' final
states: independent draws instead of a thinned autocorrelated chain.

Multi-chip: with ``mesh`` the chain axis runs under ``shard_map`` and the
pooled acceptance statistics cross the mesh as **integer** ``psum``s (the
acceptance indicator is 0/1), so the global per-(model, coordinate) counts
— and therefore the shared ``sig`` trajectory — are *bitwise identical* to
the unsharded run: sharding stage 1 is a pure layout change, the same
contract the stage-3 kernel keeps (tests/test_sharding.py).  The C
equivalents of these reductions are the plain sums at automix.c:634-655.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from automix_tpu.config import (
    EngineConfig,
    LOG_ACCEPT_CLAMP,
    RWM_TARGET_ACCEPT,
)
from automix_tpu.model import ModelSet
from automix_tpu.ops import randoms
from automix_tpu.parallel.mesh import pvary

TELEMETRY_EVERY = 100  # reference logs sig/acceptance every 100 sweeps (automix.c:648-655)


def _accept_prob(delta):
    """exp(max(-30, min(0, delta))) — the clamped MH rule (automix.c:628)."""
    return jnp.exp(jnp.clip(delta, LOG_ACCEPT_CLAMP, 0.0))




def _build_stage1_core(modelset: ModelSet, cfg: EngineConfig, nsweeps: int,
                       c_total: int, init_theta, block_key,
                       axis_name=None, n_tail: int = 1):
    """Build the jittable stage-1 body over a (possibly local) chain block.

    ``core(chain_keys [K, C_local]) ->
        (sig [K, D], samples [K, C_local * n_tail, D], tele_sig, tele_acc,
         lp [K, C_local])``

    ``c_total`` is the *global* chain count per model; acceptance counts are
    pooled across it (``psum`` over ``axis_name`` when sharded).  All
    cross-chain statistics are integer counts, so the pooled mean — and the
    adapted ``sig`` trajectory — is independent of the sharding layout.

    ``n_tail`` > 1 collects that many thinned snapshots of every chain from
    the back half of the run (the engine's version of the reference's
    every-10th-sweep tail thinning, automix.c:642-647): the stage-2 EM fit
    needs ~1000*mdim samples at high dim — far more than one final state
    per chain — or the MML reweight ``max(0, sumw - nparams/2)``
    (automix.c:779) annihilates every component.  Snapshots are laid out
    chain-major ([K, C, T, D] flattened over (C, T)) so the sharded run's
    per-shard blocks concatenate to exactly the unsharded order.
    """
    K, D = modelset.nmodels, modelset.dmax
    dtype = cfg.dtype
    dof = cfg.student_t_dof

    nburn = nsweeps // 10
    total = nsweeps + nburn
    # Thinned-tail snapshot schedule: n_tail writes, evenly strided across
    # the back half of the (post-burn) run.
    n_tail = max(1, min(n_tail, max(1, (total - nburn) // 2)))
    stride = max(1, (total - max(nburn, total // 2)) // n_tail)
    smp_start = total - n_tail * stride
    n_tele = max(1, total // TELEMETRY_EVERY)
    dims = modelset.dims_device                     # [K]
    coords = jnp.arange(D)
    # [K, D] 0/1 mask of real (non-padded) coordinates
    coord_active = (coords[None, :] < dims[:, None])

    def psum(x):
        if axis_name is None:
            return x
        return jax.lax.psum(x, axis_name)

    def core(keys_kc):
        C = keys_kc.shape[1]                        # local chains per model
        M = K * C
        chain_keys = keys_kc.reshape(M, *keys_kc.shape[2:])
        # varying-typed like stage 3's chains.k: lax.switch dispatch inside
        # logpost_batch mixes varying operands with invariant branch
        # constants, which the VMA checker only unifies from a varying k.
        k_assign = pvary(
            jnp.repeat(jnp.arange(K, dtype=jnp.int32), C), axis_name)  # [M]
        dims_assign = dims[k_assign]
        onehot_k = jax.nn.one_hot(k_assign, K, dtype=dtype)        # [M, K]

        theta0 = pvary(init_theta[k_assign], axis_name)     # [M, D]
        lp0 = modelset.logpost_batch(k_assign, theta0)
        sig0 = jnp.full((K, D), 10.0, dtype)        # automix.c:595
        nacc0 = jnp.zeros((K, D), jnp.int32)
        ntry0 = jnp.zeros((K, D), jnp.int32)
        tele_sig0 = jnp.zeros((n_tele, K, D), dtype)
        tele_acc0 = jnp.zeros((n_tele, K, D), dtype)

        def componentwise(sweep, theta, lp, sig, nacc, ntry, u, z):
            """One adaptive componentwise sweep (automix.c:618-640).

            Within a sweep each coordinate's proposal uses the sweep-start
            ``sig`` (the C updates sig[i] only after proposing with it), so
            the per-coordinate acceptance counts can be pooled into ONE
            [K, D] update — and one psum — per sweep.
            """
            gamma_t = (1.0 / (sweep + 1.0)) ** (2.0 / 3.0)
            sig_sel = onehot_k @ sig                               # [M, D]

            def coord_body(j, carry):
                theta, lp, acc_cols = carry
                active = j < dims_assign                           # [M]
                prop_j = theta[:, j] + sig_sel[:, j] * z[:, j]
                theta_prop = theta.at[:, j].set(prop_j)
                lpn = modelset.logpost_batch(k_assign, theta_prop)
                acc = (u[:, j] < _accept_prob(lpn - lp)) & active
                theta = jnp.where(acc[:, None], theta_prop, theta)
                lp = jnp.where(acc, lpn, lp)
                col = acc.astype(jnp.int32).reshape(K, C).sum(axis=1)
                acc_cols = acc_cols.at[:, j].set(col)
                return theta, lp, acc_cols

            acc_cols0 = pvary(jnp.zeros((K, D), jnp.int32), axis_name)
            theta, lp, acc_cols = jax.lax.fori_loop(
                0, D, coord_body, (theta, lp, acc_cols0))
            acc_cols = psum(acc_cols)                # exact global counts
            mean_acc = acc_cols.astype(dtype) / c_total
            err = (mean_acc - RWM_TARGET_ACCEPT) * coord_active.astype(dtype)
            if cfg.stage1_adapt == "log":
                # scale-free multiplicative update (config.py stage1_adapt)
                sig = sig * jnp.exp(cfg.stage1_log_gain * gamma_t * err)
            else:
                # reference AAP rule, gain 10 (automix.c:619,634,638)
                sig = jnp.maximum(sig + 10.0 * gamma_t * err, 0.0)
            nacc = nacc + acc_cols
            ntry = ntry + coord_active.astype(jnp.int32) * c_total
            return theta, lp, sig, nacc, ntry

        def block(theta, lp, sig, u, z):
            """One full-vector non-adapting sweep (automix.c:606-617)."""
            mask = coord_active.astype(dtype)[k_assign]
            theta_prop = theta + (onehot_k @ sig) * z * mask
            lpn = modelset.logpost_batch(k_assign, theta_prop)
            acc = u[:, 0] < _accept_prob(lpn - lp)
            theta = jnp.where(acc[:, None], theta_prop, theta)
            lp = jnp.where(acc, lpn, lp)
            return theta, lp

        def sweep_body(carry, sweep):
            theta, lp, sig, nacc, ntry, tele_sig, tele_acc, smp = carry
            # two batched draws per sweep (see rjmcmc.draw_sweep_randoms)
            skeys = jax.vmap(lambda ck: jax.random.fold_in(ck, sweep))(chain_keys)
            ku = jax.vmap(lambda ck: jax.random.fold_in(ck, 0))(skeys)
            kz = jax.vmap(lambda ck: jax.random.fold_in(ck, 1))(skeys)
            u = jax.vmap(lambda kk: jax.random.uniform(kk, (D,), dtype))(ku)
            z = jax.vmap(lambda kk: randoms.rand_t(kk, (D,), dof, dtype))(kz)
            gkey = jax.random.fold_in(block_key, sweep)
            u_block = jax.random.uniform(gkey, (), dtype)
            # One coin per sweep for the whole batch, mirroring the single
            # chain's per-sweep coin (automix.c:605-606): after burn-in, 10%
            # of sweeps are non-adapting full-vector moves.
            do_block = (sweep > nburn) & (u_block < 0.1)

            def do_block_fn(args):
                theta, lp, sig, nacc, ntry = args
                theta, lp = block(theta, lp, sig, u, z)
                return theta, lp, sig, nacc, ntry

            def do_cw_fn(args):
                theta, lp, sig, nacc, ntry = args
                return componentwise(sweep.astype(dtype), theta, lp, sig,
                                     nacc, ntry, u, z)

            theta, lp, sig, nacc, ntry = jax.lax.cond(
                do_block, do_block_fn, do_cw_fn, (theta, lp, sig, nacc, ntry))

            # telemetry every TELEMETRY_EVERY sweeps (automix.c:648-655)
            t_idx = jnp.minimum(sweep // TELEMETRY_EVERY, n_tele - 1)
            write = (sweep % TELEMETRY_EVERY) == 0
            ratio = nacc.astype(dtype) / jnp.maximum(
                ntry.astype(dtype), 1.0)
            tele_sig = jax.lax.cond(
                write, lambda ts: ts.at[t_idx].set(sig), lambda ts: ts, tele_sig)
            tele_acc = jax.lax.cond(
                write, lambda ta: ta.at[t_idx].set(ratio), lambda ta: ta, tele_acc)

            # thinned-tail snapshot for the stage-2 fit (automix.c:642-647)
            do_smp = (sweep > smp_start) & (((sweep - smp_start) % stride) == 0)
            s_idx = jnp.clip((sweep - smp_start) // stride - 1, 0, n_tail - 1)
            smp = jax.lax.cond(
                do_smp, lambda b: b.at[s_idx].set(theta), lambda b: b, smp)
            return (theta, lp, sig, nacc, ntry, tele_sig, tele_acc, smp), None

        sweeps = jnp.arange(1, total + 1)
        smp0 = pvary(jnp.zeros((n_tail, M, D), dtype), axis_name)
        carry0 = (theta0, lp0, sig0, nacc0, ntry0, tele_sig0, tele_acc0, smp0)
        (theta, lp, sig, nacc, ntry, tele_sig, tele_acc, smp), _ = \
            jax.lax.scan(sweep_body, carry0, sweeps)
        # [T, K*C, D] -> [K, C, T, D] -> [K, C*T, D]: chain-major, so the
        # sharded run's per-shard sample blocks concatenate to exactly the
        # unsharded layout.
        samples = smp.reshape(n_tail, K, C, D).transpose(1, 2, 0, 3) \
            .reshape(K, C * n_tail, D)
        return sig, samples, tele_sig, tele_acc, lp.reshape(K, C)

    return core, total


def run_stage1(modelset: ModelSet, cfg: EngineConfig, key, nsweeps: int,
               n_chains_per_model: int | None = None, mesh=None):
    """Run adaptive RWM for every model simultaneously.

    Returns ``(sig [K, D], samples [K, C, D], telemetry dict)`` where
    ``samples`` feed the stage-2 mixture fit.  Telemetry holds ``sig`` and
    pooled acceptance-ratio snapshots every 100 sweeps (the engine's
    ``sig_k_rwm_summary`` / ``nacc_ntry_rwm``, automix.h:162-163).

    With ``mesh`` the per-model chain axis is sharded over the mesh
    (``samples`` comes back as a sharded jax.Array) and the pooled
    adaptation statistics cross shards as integer psums — trajectories are
    bitwise identical to the unsharded run with the same key.
    """
    K, D = modelset.nmodels, modelset.dmax
    C = n_chains_per_model or cfg.n_chains_stage1

    # Stage-2 sample budget: the reference fits 1000*mdim thinned draws per
    # model (automix.c:642-647); with C parallel chains each contributing
    # n_tail thinned tail snapshots, n_tail = ceil(target / C).
    target = cfg.stage1_target_samples or 1000 * D
    n_tail = -(-target // C)

    key, k_init, k_chains = jax.random.split(key, 3)
    init_theta = modelset.init_points(k_init)       # [K, D]

    from automix_tpu.kernels import fused_stage1
    if fused_stage1.stage1_eligible(modelset, cfg, mesh, C):
        if mesh is not None:
            sig, samples, tele_sig, tele_acc, lp = \
                fused_stage1.run_fused_stage1_sharded(
                    modelset, cfg, nsweeps, C, init_theta, mesh)
        else:
            sig, samples, tele_sig, tele_acc, lp = \
                fused_stage1.run_fused_stage1(modelset, cfg, nsweeps, C,
                                              init_theta)
        return sig, samples, {
            "sig_trace": tele_sig,
            "accept_trace": tele_acc,
            "final_logp": lp,
            "nsweeps": nsweeps + nsweeps // 10,
        }

    block_key = jax.random.fold_in(key, 7)
    # Global per-chain keys, laid out [K, C] so sharding splits the chain
    # axis without crossing model boundaries.  (Keys are raw uint32 [, 2]
    # vectors, hence the trailing key-data axis.)
    keys = jax.random.split(k_chains, K * C)
    keys_kc = keys.reshape(K, C, *keys.shape[1:])

    core, total = _build_stage1_core(
        modelset, cfg, nsweeps, C, init_theta, block_key,
        axis_name=None if mesh is None else _mesh_axis(mesh),
        n_tail=n_tail)

    if mesh is None:
        fn = jax.jit(core)
    else:
        from jax.sharding import PartitionSpec as P
        axis = _mesh_axis(mesh)
        keys_p = P(None, axis) if keys_kc.ndim == 2 else P(None, axis, None)
        rep = P()
        fn = jax.jit(jax.shard_map(
            core, mesh=mesh,
            in_specs=(keys_p,),
            out_specs=(rep, P(None, axis, None), rep, rep, P(None, axis))))
        keys_kc = jax.device_put(
            keys_kc, jax.sharding.NamedSharding(mesh, keys_p))

    sig, samples, tele_sig, tele_acc, lp = fn(keys_kc)
    telemetry = {
        "sig_trace": tele_sig,
        "accept_trace": tele_acc,
        "final_logp": lp,
        "nsweeps": total,
    }
    return sig, samples, telemetry


def _mesh_axis(mesh) -> str:
    return mesh.axis_names[0]
