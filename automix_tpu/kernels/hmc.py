"""Hamiltonian within-model move — an engine-native extension.

The reference's within-model exploration is random-walk Metropolis only
(automix.c:1054-1085).  Because this engine's targets are pure JAX
functions, their gradients come free via ``jax.grad``, enabling
gradient-based moves the C architecture cannot express (the north-star
extension of SURVEY.md section 7 step 7).

One move = leapfrog HMC with a diagonal mass preconditioner taken from the
stage-1 adapted RWM scales: step size eps_j = scale_k * sig[k, j], where
``scale_k`` is a per-model multiplier tuned by dual averaging
(:func:`tune_step_scale`) toward ``cfg.hmc_target_accept`` — the engine's
replacement for hand-picking ``hmc_step_scale``.  The leapfrog carries the
gradient between steps, so a trajectory of ``n`` steps costs ``n + 1``
gradient evaluations (not ``2n``).

With ``cfg.hmc_jitter`` (default on) the trajectory length is drawn
uniformly from {1..hmc_steps} per move — randomized trajectory lengths
break the periodicity pathologies NUTS exists to avoid, while keeping
the mask-free control flow a vectorized TPU kernel needs (a per-chain
tree-doubling NUTS would diverge control flow across the batch).  The
draw is *shared across the chain batch* for each move: every chain's
length is still marginally uniform{1..hmc_steps} (any state-independent
length distribution preserves detailed balance), but the batch pays
exactly the drawn number of gradient evaluations instead of always
paying ``hmc_steps`` with the surplus masked off — an expected ~2x
saving on the dominant cost.  The shared draw does correlate chains
*within* one sweep (they take equal-length trajectories); per-chain
estimates remain unbiased, but cross-chain variance estimates at a
fixed sweep are mildly optimistic.  The length comes from a replicated
sweep-indexed stream (rjmcmc.py), so sharded and unsharded runs take
identical trajectories.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from automix_tpu.config import EngineConfig, LOG_ACCEPT_CLAMP
from automix_tpu.model import ModelSet


def sample_n_steps(cfg: EngineConfig, u):
    """Shared trajectory length for one move from a state-independent
    uniform ``u``: uniform{1..hmc_steps} under jitter, else hmc_steps."""
    if not cfg.hmc_jitter:
        return jnp.asarray(cfg.hmc_steps, jnp.int32)
    steps = 1 + jnp.floor(u * cfg.hmc_steps).astype(jnp.int32)
    return jnp.minimum(steps, cfg.hmc_steps)


def build_hmc_move(modelset: ModelSet, cfg: EngineConfig):
    """Single-chain HMC move ``(u_acc, n_steps, z, k, theta, logp, eps,
    mask_k) -> (theta, logp, accepted)`` (to be vmapped by the sweep
    kernel with ``n_steps`` shared across the batch).

    ``u_acc`` is this chain's accept uniform, ``n_steps`` the move's
    trajectory length (an int32 scalar from :func:`sample_n_steps` —
    shared so the batch's leapfrog loop runs exactly that many gradient
    steps), ``z`` [D] its momentum draw (sliced from the sweep's batched
    random block, rjmcmc.draw_sweep_randoms), and ``eps`` [D] its fully
    resolved leapfrog step sizes (per-model tuned scale x stage-1 sig,
    computed by the caller as one one-hot contraction)."""
    grad_logp = jax.grad(modelset.logpost_padded, argnums=1)

    def move(u_acc, n_steps, z, k, theta, logp, eps, mask_k):
        eps = eps * mask_k
        p0 = z * mask_k

        g0 = grad_logp(k, theta) * mask_k

        def leapfrog(i, carry):
            q, p, g = carry
            p_half = p + 0.5 * eps * g
            q = (q + eps * p_half) * mask_k
            g = grad_logp(k, q) * mask_k
            p = p_half + 0.5 * eps * g
            return (q, p, g)

        q, p, _ = jax.lax.fori_loop(0, n_steps, leapfrog,
                                    (theta, p0, g0))
        lp_new = modelset.logpost_padded(k, q)
        # guard non-finite trajectories (diverged leapfrog)
        bad = ~(jnp.all(jnp.isfinite(q)) & jnp.isfinite(lp_new))
        h0 = -logp + 0.5 * jnp.sum(p0 * p0)
        h1 = -lp_new + 0.5 * jnp.sum(p * p)
        log_accept = jnp.where(bad, -jnp.inf, h0 - h1)
        acc = u_acc < jnp.exp(jnp.clip(log_accept, LOG_ACCEPT_CLAMP, 0.0))
        theta = jnp.where(acc, q, theta)
        logp = jnp.where(acc, lp_new, logp)
        return theta, logp, acc

    return move


def tune_step_scale(modelset: ModelSet, cfg: EngineConfig, sig, key,
                    n_rounds: int = 100, n_chains_per_model: int = 256,
                    mesh=None):
    """Dual-averaging tuning of the per-model HMC step-size multiplier.

    Runs ``n_rounds`` HMC moves on ``n_chains_per_model`` chains pinned to
    each model (the stage-1 chain layout), pooling the acceptance rate per
    model each round, and adapts ``log scale_k`` by Nesterov dual averaging
    (Hoffman & Gelman 2014, Algorithm 5) toward ``cfg.hmc_target_accept``:

        Hbar_t   = (1 - w_t) Hbar_{t-1} + w_t (delta - a_t),  w_t = 1/(t+t0)
        log s_t  = mu - sqrt(t)/gamma * Hbar_t
        log sbar = t^-kappa log s_t + (1 - t^-kappa) log sbar_{t-1}

    Returns the tuned multipliers as a [K] numpy array (install them via
    ``EngineConfig.hmc_step_scale=tuple(...)``).  The pooled acceptance is
    a cross-chain mean, so the gradient of each update has ~C times lower
    variance than single-chain dual averaging — the same pooling argument
    as stage 1's Robbins-Monro scale adaptation (kernels/rwm.py).

    With ``mesh`` the tuning chains shard over the chain axis: gradient
    sweeps run shard-local and the per-model acceptance counts reduce
    with one ``psum`` per round — the dual-averaging state stays
    replicated, so every shard applies the identical update.
    """
    import numpy as np

    from automix_tpu.parallel.mesh import CHAIN_AXIS

    K, D = modelset.nmodels, modelset.dmax
    dtype = cfg.dtype
    C = n_chains_per_model
    M = K * C
    axis = CHAIN_AXIS if mesh is not None else None
    n_shards = int(mesh.devices.size) if mesh is not None else 1
    if M % n_shards:
        raise ValueError(f"K*n_chains_per_model={M} not divisible by "
                         f"mesh size {n_shards}")
    delta = cfg.hmc_target_accept
    t0, gamma, kappa = 10.0, 0.05, 0.75
    mu0 = float(jnp.log(10.0 * cfg.hmc_step_scale)) \
        if jnp.ndim(cfg.hmc_step_scale) == 0 else float(jnp.log(2.0))

    move = jax.vmap(build_hmc_move(modelset, cfg),
                    in_axes=(0, None, 0, 0, 0, 0, 0, 0))
    dims = modelset.dims_device
    coords = jnp.arange(D)
    k_assign = jnp.repeat(jnp.arange(K, dtype=jnp.int32), C)
    mask = (coords[None, :] < dims[k_assign][:, None]).astype(dtype)
    onehot_k = jax.nn.one_hot(k_assign, K, dtype=dtype)        # [M, K]
    sig_k = onehot_k @ sig                                      # [M, D]

    key, k_init = jax.random.split(key)
    theta0 = modelset.init_points(k_init)[k_assign]
    lp0 = modelset.logpost_batch(k_assign, theta0)

    def tune(theta0, lp0, k_assign, sig_k, mask, onehot_k, key):
        mloc = theta0.shape[0]
        if axis is None:
            shard = None
        else:
            shard = jax.lax.axis_index(axis).astype(jnp.int32)

        def round_body(carry, t):
            theta, lp, log_s, log_sbar, hbar, rkey = carry
            rkey, rk = jax.random.split(rkey)
            # trajectory length: replicated draw (same on every shard)
            nst = sample_n_steps(cfg, jax.random.uniform(
                jax.random.fold_in(rk, 0x5EED), (), dtype))
            rk = rk if shard is None else jax.random.fold_in(rk, shard)
            ku, kz = jax.random.split(rk, 2)
            u = jax.random.uniform(ku, (mloc,), dtype)
            z = jax.random.normal(kz, (mloc, D), dtype)
            eps = (onehot_k @ jnp.exp(log_s))[:, None] * sig_k
            theta, lp, acc = move(u, nst, z, k_assign, theta, lp, eps, mask)
            sums = onehot_k.T @ acc.astype(dtype)               # [K] local
            if axis is not None:
                sums = jax.lax.psum(sums, axis)
            a_k = sums / C
            tt = t.astype(dtype)
            w = 1.0 / (tt + t0)
            hbar = (1.0 - w) * hbar + w * (delta - a_k)
            log_s = mu0 - jnp.sqrt(tt) / gamma * hbar
            eta = tt ** (-kappa)
            log_sbar = eta * log_s + (1.0 - eta) * log_sbar
            return (theta, lp, log_s, log_sbar, hbar, rkey), a_k

        init = (theta0, lp0,
                jnp.full((K,), mu0 - jnp.log(10.0), dtype),
                jnp.full((K,), mu0 - jnp.log(10.0), dtype),
                jnp.zeros((K,), dtype), key)
        carry, _accepts = jax.lax.scan(round_body, init,
                                       jnp.arange(1, n_rounds + 1))
        return carry[3]

    if mesh is None:
        log_sbar = jax.jit(tune)(theta0, lp0, k_assign, sig_k, mask,
                                 onehot_k, key)
    else:
        from jax.sharding import PartitionSpec as P
        sh = P(CHAIN_AXIS)
        fn = jax.jit(jax.shard_map(
            tune, mesh=mesh,
            in_specs=(sh, sh, sh, sh, sh, sh, P()),
            out_specs=P(), check_vma=False))
        log_sbar = fn(theta0, lp0, k_assign, sig_k, mask, onehot_k, key)
    return np.asarray(jnp.exp(log_sbar), np.float64)
