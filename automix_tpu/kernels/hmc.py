"""Hamiltonian within-model move — an engine-native extension.

The reference's within-model exploration is random-walk Metropolis only
(automix.c:1054-1085).  Because this engine's targets are pure JAX
functions, their gradients come free via ``jax.grad``, enabling
gradient-based moves the C architecture cannot express (the north-star
extension of SURVEY.md section 7 step 7).

One move = standard leapfrog HMC with a diagonal mass preconditioner taken
from the stage-1 adapted RWM scales: step size eps_j = scale * sig[k, j].
Padded coordinates carry zero momentum and zero gradient, so chains in
different models stay fully vectorized exactly as in the RWM path.

With ``cfg.hmc_jitter`` (default on) each chain's trajectory length is
drawn uniformly from {1..hmc_steps} per move — randomized trajectory
lengths break the periodicity pathologies NUTS exists to avoid, while
keeping the fixed-bound, mask-based control flow a vectorized TPU kernel
needs (a per-chain tree-doubling NUTS would diverge control flow across
the batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from automix_tpu.config import EngineConfig, LOG_ACCEPT_CLAMP
from automix_tpu.model import ModelSet


def build_hmc_move(modelset: ModelSet, cfg: EngineConfig):
    """Single-chain HMC move ``(u_acc, z, k, theta, logp, sig_k, mask_k) ->
    (theta, logp, accepted)`` (to be vmapped by the sweep kernel).

    ``u_acc`` is this chain's accept uniform and ``z`` [D] its momentum
    draw, both sliced from the sweep's batched random block (see
    rjmcmc.draw_sweep_randoms)."""
    D = modelset.dmax
    dtype = cfg.dtype
    n_steps = cfg.hmc_steps

    grad_logp = jax.grad(modelset.logpost_padded, argnums=1)

    def move(u_acc, u_jit, z, k, theta, logp, sig_k, mask_k):
        eps = cfg.hmc_step_scale * sig_k * mask_k
        p0 = z * mask_k
        if cfg.hmc_jitter:
            my_steps = 1 + jnp.floor(u_jit * n_steps).astype(jnp.int32)
            my_steps = jnp.minimum(my_steps, n_steps)
        else:
            my_steps = jnp.asarray(n_steps, jnp.int32)

        def leapfrog(carry, i):
            q, p = carry
            live = i < my_steps
            g = grad_logp(k, q) * mask_k
            p_half = p + 0.5 * eps * g
            q_new = (q + eps * p_half) * mask_k
            g_new = grad_logp(k, q_new) * mask_k
            p_new = p_half + 0.5 * eps * g_new
            q = jnp.where(live, q_new, q)
            p = jnp.where(live, p_new, p)
            return (q, p), None

        (q, p), _ = jax.lax.scan(leapfrog, (theta, p0),
                                 jnp.arange(n_steps))
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
