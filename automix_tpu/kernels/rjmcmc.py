"""Stage 3: the reversible-jump sweep — the production hot loop.

One sweep of the reference (``reversible_jump_move``, automix.c:1035-1288):
(a) a within-model RWM move (block every 10th sweep, else componentwise),
(b) the trans-dimensional jump (allocate -> standardize -> pick destination
-> dimension-match the latent -> de-standardize -> reverse-allocate ->
MH accept), and (c) diminishing adaptation of the model-proposal
probabilities pk with the re-init safeguard.

TPU-native design (SURVEY.md section 7, step 4): the whole move is dense
linear algebra at padded shapes, written for ONE chain and ``vmap``-ed over
thousands.  The padded coordinates of the standardized latent ``work`` are
exactly the "extra latent draws" of the dimension-matching step — the
padding *is* the dimension matching.  Sweeps are compiled into a
``lax.scan`` chunk; visit counts / moment sums / acceptance counters are
reduced on device per chunk and accumulated on host in 64-bit (state.py).

The categorical draws use Gumbel-max on the logit scale, which makes the
reference's "sum underflowed -> pretend uniform" guards (automix.c:1102-1110,
1224-1232) unnecessary: softmax probabilities are computed with logsumexp
and never collapse to zero for live components.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from automix_tpu.config import EngineConfig, LOG_ACCEPT_CLAMP
from automix_tpu.model import ModelSet
from automix_tpu.ops import linalg, randoms
from automix_tpu.state import Chains, Proposal

_NEG = -jnp.inf


def _accept_prob(delta):
    return jnp.exp(jnp.clip(delta, LOG_ACCEPT_CLAMP, 0.0))


def _loglam(lam):
    """Log mixture weights with dead slots masked to -inf."""
    return jnp.where(lam > 0, jnp.log(jnp.maximum(lam, 1e-38)), _NEG)


def build_chain_sweep(modelset: ModelSet, cfg: EngineConfig, burning: bool):
    """Build the single-chain sweep function (to be vmapped).

    Returns ``f(key, k, theta, logp, pk, pkllim, nreinit, sweep, prop)
    -> (k, theta, logp, pk, pkllim, nreinit, stats)`` where ``stats`` is a
    dict of int32 event flags for this chain.
    """
    K, D = modelset.nmodels, modelset.dmax
    dims = modelset.dims_device
    dof = cfg.student_t_dof
    dtype = cfg.dtype
    adapt = cfg.adapt and not burning
    if cfg.within_move == "hmc":
        from automix_tpu.kernels.hmc import build_hmc_move
        hmc_move = build_hmc_move(modelset, cfg)
    else:
        hmc_move = None

    def sweep_chain(key, k, theta, logp, pk, pkllim, nreinit, sweep, prop: Proposal):
        L = prop.lam.shape[1]
        base = jax.random.fold_in(key, sweep)
        dim_k = dims[k]
        mask_k = (jnp.arange(D) < dim_k).astype(dtype)
        sig_k = prop.sig[k]

        stats = {}

        # ---- (a) within-model RWM (automix.c:1054-1085) -----------------
        do_block = (sweep % 10) == 0     # automix.c:95,148

        def block_move(args):
            theta, logp = args
            z = randoms.rand_t(jax.random.fold_in(base, 1), (D,), dof, dtype)
            u = jax.random.uniform(jax.random.fold_in(base, 2), (), dtype)
            theta_prop = theta + sig_k * z * mask_k
            lpn = modelset.logpost_padded(k, theta_prop)
            acc = u < _accept_prob(lpn - logp)
            theta = jnp.where(acc, theta_prop, theta)
            logp = jnp.where(acc, lpn, logp)
            nacc = acc.astype(jnp.int32)
            return theta, logp, nacc, jnp.int32(1), jnp.int32(0), jnp.int32(0)

        def componentwise_move(args):
            theta, logp = args

            def coord_body(j, carry):
                theta, logp, nacc, ntry = carry
                cb = jax.random.fold_in(base, 100 + j)
                z = randoms.rand_t(jax.random.fold_in(cb, 1), (), dof, dtype)
                u = jax.random.uniform(jax.random.fold_in(cb, 2), (), dtype)
                active = j < dim_k
                theta_prop = theta.at[j].set(theta[j] + sig_k[j] * z)
                lpn = modelset.logpost_padded(k, theta_prop)
                acc = (u < _accept_prob(lpn - logp)) & active
                theta = jnp.where(acc, theta_prop, theta)
                logp = jnp.where(acc, lpn, logp)
                return (theta, logp, nacc + acc.astype(jnp.int32),
                        ntry + active.astype(jnp.int32))

            theta, logp, nacc, ntry = jax.lax.fori_loop(
                0, D, coord_body, (theta, logp, jnp.int32(0), jnp.int32(0)))
            return theta, logp, jnp.int32(0), jnp.int32(0), nacc, ntry

        if hmc_move is not None:
            theta, logp, acc = hmc_move(base, k, theta, logp, sig_k, mask_k)
            naccb, ntryb = acc.astype(jnp.int32), jnp.int32(1)
            naccs = ntrys = jnp.int32(0)
        else:
            theta, logp, naccb, ntryb, naccs, ntrys = jax.lax.cond(
                do_block, block_move, componentwise_move, (theta, logp))
        stats["naccrwmb"], stats["ntryrwmb"] = naccb, ntryb
        stats["naccrwms"], stats["ntryrwms"] = naccs, ntrys

        # ---- (b) reversible jump (automix.c:1087-1256) ------------------
        # 9.1: allocate current state to a mixture component of model k
        loglam_k = _loglam(prop.lam[k])
        lp_alloc = linalg.lnormprob(theta, prop.mu[k], prop.B[k], dim_k)  # [L]
        logits = loglam_k + lp_alloc
        l = randoms.categorical_from_logits(jax.random.fold_in(base, 20), logits)
        log_palloc = logits[l] - logsumexp(logits)

        # 9.2: standardize (forward substitution, automix.c:1125-1135)
        work = linalg.forward_substitute(prop.B[k, l], (theta - prop.mu[k, l]) * mask_k)
        work = work * mask_k

        # 9.3: choose destination model kn ~ pk and component ln ~ lam[kn]
        if K == 1:
            kn = k
            logratio = jnp.asarray(0.0, dtype)
            gamma = jnp.asarray(0.0, dtype)
        else:
            gamma = (1.0 / (sweep.astype(dtype) + 1.0)) ** (2.0 / 3.0)  # automix.c:1145
            kn = randoms.categorical_from_logits(
                jax.random.fold_in(base, 21),
                jnp.log(jnp.maximum(pk, 1e-38))).astype(jnp.int32)
            logratio = (jnp.log(jnp.maximum(pk[k], 1e-38))
                        - jnp.log(jnp.maximum(pk[kn], 1e-38)))
        dim_kn = dims[kn]
        mask_kn = (jnp.arange(D) < dim_kn).astype(dtype)
        loglam_kn = _loglam(prop.lam[kn])
        ln = randoms.categorical_from_logits(
            jax.random.fold_in(base, 22), loglam_kn)

        # 9.4: dimension-match the latent.  Coordinates beyond the current
        # dim are filled with fresh t/Normal draws (automix.c:1171-1204).
        z = randoms.rand_t(jax.random.fold_in(base, 23), (D,), dof, dtype)
        coords = jnp.arange(D)
        work_full = jnp.where(coords < dim_k, work, z)
        up = (coords >= dim_k) & (coords < dim_kn)       # growing coords
        lpdf_up = randoms.latent_log_pdf(work_full, dof)
        logratio = logratio - jnp.sum(jnp.where(up, lpdf_up, 0.0))
        if cfg.perm:
            n_active = jnp.maximum(dim_k, dim_kn)
            idx = randoms.masked_permutation(
                jax.random.fold_in(base, 24), n_active, D)
            work_full = work_full[idx]
        down = (coords >= dim_kn) & (coords < dim_k)     # dropped coords
        lpdf_down = randoms.latent_log_pdf(work_full, dof)
        logratio = logratio + jnp.sum(jnp.where(down, lpdf_down, 0.0))

        # de-standardize into the destination model (automix.c:1206-1211)
        thetan = (prop.mu[kn, ln]
                  + linalg.lower_matvec(prop.B[kn, ln], work_full * mask_kn))
        thetan = thetan * mask_kn

        # 9.5: reverse-move allocation probability (automix.c:1213-1235)
        lp_alloc_n = linalg.lnormprob(thetan, prop.mu[kn], prop.B[kn], dim_kn)
        logits_n = loglam_kn + lp_alloc_n
        log_pallocn = logits_n[ln] - logsumexp(logits_n)

        # 9.6: accept (automix.c:1237-1256)
        lpn = modelset.logpost_padded(kn, thetan)
        logratio = (logratio + (lpn - logp)
                    + (log_pallocn - log_palloc)
                    + (loglam_k[l] - loglam_kn[ln])
                    + (prop.logdetB[kn, ln] - prop.logdetB[k, l]))
        u = jax.random.uniform(jax.random.fold_in(base, 25), (), dtype)
        acc = u < _accept_prob(logratio)
        k = jnp.where(acc, kn, k)
        theta = jnp.where(acc, thetan, theta)
        logp = jnp.where(acc, lpn, logp)
        stats["nacctd"] = acc.astype(jnp.int32)
        stats["ntrytd"] = jnp.int32(1)

        # ---- (c) pk diminishing adaptation + re-init safeguard ----------
        # (automix.c:1258-1281); skipped while burning and for K == 1.
        if adapt and K > 1:
            onehot = (jnp.arange(K) == k).astype(dtype)
            pk = pk + gamma * (onehot - pk)
            reinit = jnp.any(pk < pkllim)
            nreinit = nreinit + reinit.astype(jnp.int32)
            pkllim = jnp.where(reinit, 1.0 / (10.0 * nreinit.astype(dtype)), pkllim)
            pk = jnp.where(reinit, jnp.full((K,), 1.0 / K, dtype), pk)

        return k, theta, logp, pk, pkllim, nreinit, stats

    return sweep_chain


def build_chunk_runner(modelset: ModelSet, cfg: EngineConfig, burning: bool,
                       collect: bool):
    """Build a jitted function running ``n`` sweeps over all chains.

    ``runner(chains, prop, n_sweeps)`` -> (chains', chunk_stats dict).
    ``n_sweeps`` is static (compiled into the scan length).
    """
    K, D = modelset.nmodels, modelset.dmax
    dtype = cfg.dtype
    sweep_chain = build_chain_sweep(modelset, cfg, burning)
    vmapped = jax.vmap(sweep_chain,
                       in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    n_trace = cfg.n_trace_chains

    @functools.partial(jax.jit, static_argnums=(2,))
    def runner(chains: Chains, prop: Proposal, n_sweeps: int):
        def body(carry, _):
            ch, acc = carry
            k, theta, logp, pk, pkllim, nreinit, stats = vmapped(
                ch.key, ch.k, ch.theta, ch.logp, ch.pk, ch.pkllim,
                ch.nreinit, ch.sweep, prop)
            ch = ch.replace(k=k, theta=theta, logp=logp, pk=pk,
                            pkllim=pkllim, nreinit=nreinit,
                            sweep=ch.sweep + 1)
            onehot = jax.nn.one_hot(k, K, dtype=dtype)         # [S, K]
            acc = {
                "ksummary": acc["ksummary"] + onehot.sum(axis=0).astype(jnp.int32),
                "theta_sum": acc["theta_sum"] + onehot.T @ theta,
                "theta_sqsum": acc["theta_sqsum"] + onehot.T @ (theta * theta),
                "naccrwmb": acc["naccrwmb"] + stats["naccrwmb"].sum(),
                "ntryrwmb": acc["ntryrwmb"] + stats["ntryrwmb"].sum(),
                "naccrwms": acc["naccrwms"] + stats["naccrwms"].sum(),
                "ntryrwms": acc["ntryrwms"] + stats["ntryrwms"].sum(),
                "nacctd": acc["nacctd"] + stats["nacctd"].sum(),
                "ntrytd": acc["ntrytd"] + stats["ntrytd"].sum(),
            }
            if collect:
                trace = {
                    "k_trace": k[:n_trace].astype(jnp.int8),
                    "k0_trace": k[0].astype(jnp.int8),
                    "pk0_trace": pk[0],
                    "logp0_trace": logp[0],
                    "theta0_trace": theta[0],
                }
            else:
                trace = None
            return (ch, acc), trace

        acc0 = {
            "ksummary": jnp.zeros((K,), jnp.int32),
            "theta_sum": jnp.zeros((K, D), dtype),
            "theta_sqsum": jnp.zeros((K, D), dtype),
            "naccrwmb": jnp.int32(0), "ntryrwmb": jnp.int32(0),
            "naccrwms": jnp.int32(0), "ntryrwms": jnp.int32(0),
            "nacctd": jnp.int32(0), "ntrytd": jnp.int32(0),
        }
        (chains_out, acc), traces = jax.lax.scan(
            body, (chains, acc0), None, length=n_sweeps)
        chunk = dict(acc)
        if collect and traces is not None:
            chunk.update(traces)
        return chains_out, chunk

    return runner


def build_single_sweep(modelset: ModelSet, cfg: EngineConfig,
                       burning: bool = False):
    """Unjitted one-sweep step ``step(chains, prop) -> chains`` over the
    full chain batch — the engine's compile-checkable "forward step"."""
    sweep_chain = build_chain_sweep(modelset, cfg, burning)
    vmapped = jax.vmap(sweep_chain,
                       in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))

    def step(chains: Chains, prop: Proposal) -> Chains:
        k, theta, logp, pk, pkllim, nreinit, _ = vmapped(
            chains.key, chains.k, chains.theta, chains.logp, chains.pk,
            chains.pkllim, chains.nreinit, chains.sweep, prop)
        return chains.replace(k=k, theta=theta, logp=logp, pk=pk,
                              pkllim=pkllim, nreinit=nreinit,
                              sweep=chains.sweep + 1)

    return step


def init_chains(modelset: ModelSet, cfg: EngineConfig, key,
                n_chains: Optional[int] = None) -> Chains:
    """Initialize the chain batch — ``initChain`` (automix.c:423-449) with a
    chain axis: model index uniform, theta at the stage-1 init point of the
    chosen model, pk uniform, sweep counter starting at 1."""
    S = n_chains or cfg.n_chains
    K, D = modelset.nmodels, modelset.dmax
    dtype = cfg.dtype
    key, k_keys, k_init, k_chain = jax.random.split(key, 4)
    chain_keys = jax.random.split(k_keys, S)
    k0 = jax.random.randint(k_chain, (S,), 0, K).astype(jnp.int32)
    init_theta = modelset.init_points(k_init)       # [K, D]
    theta0 = init_theta[k0]
    logp0 = modelset.logpost_batch(k0, theta0)
    return Chains(
        key=chain_keys,
        k=k0,
        theta=theta0,
        logp=logp0,
        pk=jnp.full((S, K), 1.0 / K, dtype),
        pkllim=jnp.full((S,), 0.1, dtype),          # automix.c:446
        nreinit=jnp.ones((S,), jnp.int32),          # automix.c:444
        sweep=jnp.asarray(1, jnp.int32),            # automix.c:447
    )
