"""Stage 3: the reversible-jump sweep — the production hot loop.

One sweep of the reference (``reversible_jump_move``, automix.c:1035-1288):
(a) a within-model RWM move (block every 10th sweep, else componentwise),
(b) the trans-dimensional jump (allocate -> standardize -> pick destination
-> dimension-match the latent -> de-standardize -> reverse-allocate ->
MH accept), and (c) diminishing adaptation of the model-proposal
probabilities pk with the re-init safeguard.

TPU-native design (SURVEY.md section 7, step 4): the whole move is dense
linear algebra at padded shapes over the full chain batch [S, ...].  The
padded coordinates of the standardized latent ``work`` are exactly the
"extra latent draws" of the dimension-matching step — the padding *is*
the dimension matching.  Sweeps are compiled into a ``lax.scan`` chunk;
visit counts / moment sums / acceptance counters are reduced on device per
chunk and accumulated on host in 64-bit (state.py).

Three TPU-specific choices drive the kernel's shape:

* **No per-chain gathers.**  Selecting chain s's model parameters as
  ``mu[k[s]]`` lowers to an XLA gather, which on TPU serializes and ends
  up dominating the sweep (measured: ~linear-in-S cost).  All per-chain
  parameter selection is instead one-hot contraction against the small
  [K, ...] proposal tables — MXU matmuls.  Dead-component log-weights use
  a finite -1e30 sentinel instead of -inf so the contractions stay NaN-free.
* **Quadratic forms by table matmul, not per-chain solves.**  The mixture
  allocation steps need N(theta; mu_l, B_l B_l^T) log-densities across
  components (automix.c:1093-1101, 1216-1235).  Evaluating them with
  per-chain triangular solves materializes an [S, L, D, D] factor tensor
  and unrolls D^2 dependent FMA steps; instead all per-(model, component)
  quantities are folded once per chunk into Gram tables (precompute_tables)
  so each sweep's quadratic forms become two [S, D^2] x [D^2, K*L] MXU
  matmuls on *centered* coordinates (centering bounds the float32
  cancellation error of the expanded quadratic; the padded tail contributes
  exactly zero by the linalg.py padding convention).  Only the single
  selected component's standardize/de-standardize runs as a batched matvec.
* **Two random draws per sweep.**  The sweep is op-count heavy, so all its
  uniforms [S, MU] and t/Normal perturbations [S, MZ] come from two batched
  threefry draws sliced at static offsets (one key per chain folded with
  the global sweep counter — resumable and sharding-invariant).

Categorical draws are Gumbel-argmax over masked logits, which also removes
the reference's "sum underflowed -> pretend uniform" guards
(automix.c:1102-1110, 1224-1232).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from automix_tpu.config import EngineConfig, LOG_ACCEPT_CLAMP, NEG_INF
from automix_tpu.model import ModelSet
from automix_tpu.ops import randoms
from automix_tpu.state import Chains, Proposal


def _accept_prob(delta):
    return jnp.exp(jnp.clip(delta, LOG_ACCEPT_CLAMP, 0.0))


def _loglam(lam):
    """Log mixture weights, dead slots at the finite NEG_INF sentinel (so
    one-hot contractions against the table cannot produce 0 * -inf NaNs)."""
    return jnp.where(lam > 0, jnp.log(jnp.maximum(lam, 1e-38)),
                     jnp.asarray(NEG_INF, lam.dtype))


def _gumbel(u):
    """Gumbel noise from uniforms in [0, 1)."""
    return -jnp.log(-jnp.log1p(-u) + 1e-38)


_LOG_2PI = 1.8378770664093453


def precompute_tables(prop: Proposal, dims, dtype):
    """Fold the proposal into per-(model, component) tables for the sweep.

    Computed once per chunk (a pure function of the proposal, which is
    frozen during stage 3).  Everything is laid out flat over the K*L
    component axis so per-sweep work is matmuls against small tables:

    * ``binv_flat`` [K*L, D*D]: inverse lower Cholesky factors (identity
      tail preserved, so padded coordinates pass through untouched);
    * ``p_flat`` [K*L, D*D]: Gram matrices B^-T B^-1 of the quadratic form;
    * ``q_flat`` [K*L, D] / ``c0_flat`` [K*L]: linear/constant terms of the
      expanded quadratic |B^-1 (x - mu)|^2 around *centered* coordinates;
    * ``center`` [K, D]: per-model mixture mean, subtracted from theta
      before any quadratic so the expansion never cancels large magnitudes
      (the change-point positions reach ~4e4, automix's usercpt.c);
    * ``abase`` [K, L]: log lam_l - log det B_l - (dim_k/2) log 2pi — the
      non-quadratic part of the allocation logits (automix.c:1093-1101).
    """
    K, L, D = prop.mu.shape
    B = jnp.tril(prop.B.astype(dtype))
    eye = jnp.broadcast_to(jnp.eye(D, dtype=dtype), B.shape)
    binv = jax.lax.linalg.triangular_solve(
        B, eye, left_side=True, lower=True)
    lam = prop.lam.astype(dtype)
    mu = prop.mu.astype(dtype)
    center = jnp.einsum("kl,kld->kd", lam, mu)              # [K, D]
    mu_c = mu - center[:, None, :]                          # [K, L, D]
    p = jnp.einsum("kled,klef->kldf", binv, binv)           # B^-T B^-1
    q = jnp.einsum("kldf,klf->kld", p, mu_c)
    c0 = jnp.einsum("kld,kld->kl", q, mu_c)
    loglam = _loglam(lam)
    dims_f = dims.astype(dtype)
    abase = loglam - prop.logdetB.astype(dtype) \
        - 0.5 * dims_f[:, None] * _LOG_2PI
    return {
        "binv_flat": binv.reshape(K * L, D * D),
        "b_flat": B.reshape(K * L, D * D),
        "p_flat": p.reshape(K * L, D * D),
        "q_flat": q.reshape(K * L, D),
        "c0_flat": c0.reshape(K * L),
        "muc_flat": mu_c.reshape(K * L, D),
        "logdet_flat": prop.logdetB.astype(dtype).reshape(K * L),
        "center": center,
        "abase": abase,
        "loglam": loglam,
    }


def _alloc_logits(x_c, onehot_k, tab, K: int, L: int):
    """Allocation logits [S, L] of centered states against their model's
    mixture: abase - 0.5 |B^-1 (x - mu)|^2 via two table matmuls."""
    S, D = x_c.shape
    x2 = (x_c[:, :, None] * x_c[:, None, :]).reshape(S, D * D)
    quad = (x2 @ tab["p_flat"].T - 2.0 * (x_c @ tab["q_flat"].T)
            + tab["c0_flat"][None, :])                       # [S, K*L]
    logits_full = (tab["abase"].reshape(-1)[None, :]
                   - 0.5 * quad).reshape(S, K, L)
    return jnp.einsum("sk,skl->sl", onehot_k, logits_full)


def rand_slots(dmax: int, lmax: int, nmodels: int):
    """Static slot layout of the per-sweep uniform/perturbation draws."""
    D, L, K = dmax, lmax, nmodels
    u = {
        "rwm": (0, D),                 # componentwise accepts / block accept
        "alloc": (D, D + L),           # forward allocation Gumbels
        "model": (D + L, D + L + K),   # destination-model Gumbels
        "comp": (D + L + K, D + L + K + L),   # destination-component Gumbels
        "perm": (D + L + K + L, D + L + K + L + D),
        "acc": (D + L + K + L + D, D + L + K + L + D + 1),
        "extra": (D + L + K + L + D + 1, D + L + K + L + D + 2),
    }
    mu = D + 2 * L + K + D + 2
    mz = 2 * D                         # [0:D) RWM perturbation, [D:2D) latent
    return u, mu, mz


def draw_sweep_randoms(keys, sweep, mu_count: int, mz_count: int, dof: int,
                      dtype):
    """Two batched draws for one sweep: uniforms [S, MU] and t/Normal
    perturbations [S, MZ], derived from the per-chain keys and the global
    sweep counter (resumable: depends only on (key, sweep))."""
    skeys = jax.vmap(lambda ck: jax.random.fold_in(ck, sweep))(keys)
    ku = jax.vmap(lambda ck: jax.random.fold_in(ck, 0))(skeys)
    kz = jax.vmap(lambda ck: jax.random.fold_in(ck, 1))(skeys)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (mu_count,), dtype))(ku)
    z = jax.vmap(lambda kk: randoms.rand_t(kk, (mz_count,), dof, dtype))(kz)
    return u, z


def build_sweep_all(modelset: ModelSet, cfg: EngineConfig, burning: bool,
                    rng_mode: str = "threefry",
                    axis_name: Optional[str] = None):
    """Batched one-sweep step over all chains (unjitted):
    ``sweep_all(chains, prop, tables=None) -> (chains', stats)`` with stats
    int32 [S]/scalars per event kind.  ``tables`` is the output of
    :func:`precompute_tables`; pass it when running many sweeps against a
    frozen proposal (the chunk runner computes it once per chunk).

    ``rng_mode``: "threefry" derives the per-sweep draws from the per-chain
    keys; "pallas" uses the TPU hardware-PRNG kernel (kernels/sweep_rng.py),
    seeded by (cfg.seed, sweep, global chain block).  ``axis_name`` names
    the shard_map chain axis when running sharded, so the pallas path can
    offset its block indices to global positions."""
    K, D = modelset.nmodels, modelset.dmax
    dims = modelset.dims_device
    dtype = cfg.dtype
    dof = cfg.student_t_dof
    adapt = cfg.adapt and not burning
    coords = jnp.arange(D)
    if rng_mode == "pallas":
        from automix_tpu.kernels import sweep_rng
        rng_interpret = jax.devices()[0].platform != "tpu"
    if cfg.within_move == "hmc":
        from automix_tpu.kernels.hmc import build_hmc_move
        hmc_move = jax.vmap(build_hmc_move(modelset, cfg),
                            in_axes=(0, None, 0, 0, 0, 0, 0, 0))
    else:
        hmc_move = None

    def sweep_all(chains: Chains, prop: Proposal, tables=None):
        S = chains.k.shape[0]
        L = prop.lam.shape[1]
        tab = tables if tables is not None else precompute_tables(
            prop, dims, dtype)
        slots, mu_count, mz_count = rand_slots(D, L, K)

        def us(name):
            a, b = slots[name]
            return u[:, a:b]

        if rng_mode in ("pallas", "fast"):
            chain0 = jnp.int32(0)
            if axis_name is not None:
                chain0 = (jax.lax.axis_index(axis_name) * S).astype(jnp.int32)
        if rng_mode == "fast":
            u, z = randoms.fast_sweep_randoms(
                cfg.seed, chains.sweep, chain0, S, mu_count, mz_count, dtype)
        elif rng_mode == "pallas":
            from automix_tpu.kernels import sweep_rng
            cb = sweep_rng.choose_block(S)
            scal = jnp.stack([jnp.int32(cfg.seed),
                              chains.sweep.astype(jnp.int32), chain0 // cb])
            u, z = sweep_rng.draw(scal, S, mu_count, mz_count,
                                  interpret=rng_interpret)
        else:
            u, z = draw_sweep_randoms(chains.key, chains.sweep, mu_count,
                                      mz_count, dof, dtype)
        k, theta, logp = chains.k, chains.theta, chains.logp
        pk, pkllim, nreinit = chains.pk, chains.pkllim, chains.nreinit
        sweep = chains.sweep

        onehot_k = jax.nn.one_hot(k, K, dtype=dtype)           # [S, K]
        dim_k = dims[k]                                        # [S] (K-entry table)
        mask_k = (coords[None, :] < dim_k[:, None]).astype(dtype)
        sig_k = onehot_k @ prop.sig                            # [S, D]

        stats = {}

        # ---- (a) within-model move (automix.c:1054-1085) ----------------
        do_block = (sweep % 10) == 0     # automix.c:95,148

        def block_move(args):
            theta, logp = args
            theta_prop = theta + sig_k * z[:, :D] * mask_k
            lpn = modelset.logpost_batch(k, theta_prop)
            acc = us("rwm")[:, 0] < _accept_prob(lpn - logp)
            theta = jnp.where(acc[:, None], theta_prop, theta)
            logp = jnp.where(acc, lpn, logp)
            # k * 0 (not jnp.zeros) so the counters carry the chain axis's
            # varying type under shard_map.
            zero = k * 0
            return (theta, logp, acc.astype(jnp.int32), zero + 1, zero, zero)

        def componentwise_move(args):
            theta, logp = args
            u_rwm = us("rwm")

            def coord_body(j, carry):
                theta, logp, nacc, ntry = carry
                active = j < dim_k                             # [S]
                col = theta[:, j] + sig_k[:, j] * z[:, j]
                theta_prop = theta.at[:, j].set(col)
                lpn = modelset.logpost_batch(k, theta_prop)
                acc = (u_rwm[:, j] < _accept_prob(lpn - logp)) & active
                theta = jnp.where(acc[:, None], theta_prop, theta)
                logp = jnp.where(acc, lpn, logp)
                return (theta, logp, nacc + acc.astype(jnp.int32),
                        ntry + active.astype(jnp.int32))

            zero = k * 0
            theta, logp, nacc, ntry = jax.lax.fori_loop(
                0, D, coord_body, (theta, logp, zero, zero))
            return theta, logp, zero, zero, nacc, ntry

        if hmc_move is not None:
            scale = jnp.asarray(cfg.hmc_step_scale, dtype)
            if scale.ndim == 0:
                eps_k = scale * sig_k
            else:       # per-model tuned multipliers (kernels/hmc.py)
                eps_k = (onehot_k @ scale)[:, None] * sig_k
            # Shared trajectory length from a *replicated* sweep-indexed
            # stream (see kernels/hmc.py module doc).  Deliberately NOT a
            # chain's random slot: under shard_map each shard's row 0 is a
            # different global chain, so a chain-indexed draw would give
            # every shard a different length and sharded runs would
            # diverge from unsharded ones.  fold_in(key(seed), sweep) is
            # identical on every shard and independent of the chain draws.
            from automix_tpu.kernels.hmc import sample_n_steps
            len_key = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed ^ 0x177A7EC7),
                chains.sweep.astype(jnp.uint32))
            nst = sample_n_steps(
                cfg, jax.random.uniform(len_key, (), dtype))
            theta, logp, acc = hmc_move(us("rwm")[:, 0], nst,
                                        z[:, :D], k, theta, logp, eps_k,
                                        mask_k)
            naccb = acc.astype(jnp.int32)
            ntryb = k * 0 + 1
            naccs = ntrys = k * 0
        else:
            theta, logp, naccb, ntryb, naccs, ntrys = jax.lax.cond(
                do_block, block_move, componentwise_move, (theta, logp))
        stats["naccrwmb"], stats["ntryrwmb"] = naccb, ntryb
        stats["naccrwms"], stats["ntryrwms"] = naccs, ntrys

        # ---- (b) reversible jump (automix.c:1087-1256) ------------------
        loglam_all = tab["loglam"]                             # [K, L]
        loglam_k = onehot_k @ loglam_all                       # [S, L]

        # 9.1: allocate current state to a component of model k
        # (automix.c:1093-1123) — logits for all (k, l) via Gram-table
        # matmuls on centered coordinates, then one-hot select model k.
        theta_c = theta - onehot_k @ tab["center"]             # [S, D]
        logits = _alloc_logits(theta_c, onehot_k, tab, K, L)   # [S, L]
        onehot_l = jax.nn.one_hot(
            jnp.argmax(logits + _gumbel(us("alloc")), axis=1), L, dtype=dtype)
        log_palloc = jnp.sum(onehot_l * logits, axis=1) - logsumexp(logits, axis=1)

        # 9.2: standardize (automix.c:1125-1135): only the selected
        # component's factor is applied, as a batched matvec with the
        # precomputed inverse (B^-1 (theta - mu) == B^-1 (theta_c - mu_c)).
        onehot_kl = (onehot_k[:, :, None]
                     * onehot_l[:, None, :]).reshape(S, K * L)
        binv_kl = (onehot_kl @ tab["binv_flat"]).reshape(S, D, D)
        muc_kl = onehot_kl @ tab["muc_flat"]                   # [S, D]
        work = jnp.einsum("sde,se->sd", binv_kl, theta_c - muc_kl)
        work = work * mask_k

        # 9.3: choose destination model kn ~ pk and component ln ~ lam[kn]
        if K == 1:
            kn = k
            onehot_kn = onehot_k
            logratio = jnp.zeros((S,), dtype)
            gamma = jnp.asarray(0.0, dtype)
        else:
            gamma = (1.0 / (sweep.astype(dtype) + 1.0)) ** (2.0 / 3.0)  # automix.c:1145
            logpk = jnp.log(jnp.maximum(pk, 1e-38))            # [S, K]
            kn = jnp.argmax(logpk + _gumbel(us("model")), axis=1).astype(jnp.int32)
            onehot_kn = jax.nn.one_hot(kn, K, dtype=dtype)
            logratio = (jnp.sum(onehot_k * logpk, axis=1)
                        - jnp.sum(onehot_kn * logpk, axis=1))
        dim_kn = dims[kn]
        mask_kn = (coords[None, :] < dim_kn[:, None]).astype(dtype)
        loglam_kn = onehot_kn @ loglam_all                     # [S, L]
        onehot_ln = jax.nn.one_hot(
            jnp.argmax(loglam_kn + _gumbel(us("comp")), axis=1), L, dtype=dtype)

        # 9.4: dimension-match the latent (automix.c:1171-1204)
        work_full = jnp.where(coords[None, :] < dim_k[:, None], work,
                              z[:, D:2 * D])
        up = (coords[None, :] >= dim_k[:, None]) \
            & (coords[None, :] < dim_kn[:, None])
        lpdf_up = randoms.latent_log_pdf(work_full, dof)
        logratio = logratio - jnp.sum(jnp.where(up, lpdf_up, 0.0), axis=1)
        if cfg.perm:
            n_active = jnp.maximum(dim_k, dim_kn)[:, None]
            sort_key = jnp.where(coords[None, :] < n_active, us("perm"),
                                 1.0 + coords[None, :].astype(dtype))
            work_full = jnp.take_along_axis(
                work_full, jnp.argsort(sort_key, axis=1), axis=1)
        down = (coords[None, :] >= dim_kn[:, None]) \
            & (coords[None, :] < dim_k[:, None])
        lpdf_down = randoms.latent_log_pdf(work_full, dof)
        logratio = logratio + jnp.sum(jnp.where(down, lpdf_down, 0.0), axis=1)

        # de-standardize into the destination model (automix.c:1206-1211)
        onehot_kln = (onehot_kn[:, :, None]
                      * onehot_ln[:, None, :]).reshape(S, K * L)
        b_kln = (onehot_kln @ tab["b_flat"]).reshape(S, D, D)
        muc_kln = onehot_kln @ tab["muc_flat"]                 # [S, D]
        center_kn = onehot_kn @ tab["center"]                  # [S, D]
        thetan = (center_kn + muc_kln
                  + jnp.einsum("sde,se->sd", b_kln, work_full * mask_kn))
        thetan = thetan * mask_kn

        # 9.5: reverse-move allocation probability (automix.c:1213-1235)
        thetan_c = thetan - center_kn
        logits_n = _alloc_logits(thetan_c, onehot_kn, tab, K, L)
        log_pallocn = (jnp.sum(onehot_ln * logits_n, axis=1)
                       - logsumexp(logits_n, axis=1))

        # 9.6: accept (automix.c:1237-1256)
        lpn = modelset.logpost_batch(kn, thetan)
        logratio = (logratio + (lpn - logp)
                    + (log_pallocn - log_palloc)
                    + (jnp.sum(onehot_l * loglam_k, axis=1)
                       - jnp.sum(onehot_ln * loglam_kn, axis=1))
                    + (onehot_kln @ tab["logdet_flat"]
                       - onehot_kl @ tab["logdet_flat"]))
        acc = us("acc")[:, 0] < _accept_prob(logratio)
        k = jnp.where(acc, kn, k)
        theta = jnp.where(acc[:, None], thetan, theta)
        logp = jnp.where(acc, lpn, logp)
        stats["nacctd"] = acc.astype(jnp.int32)
        stats["ntrytd"] = k * 0 + 1

        # ---- (c) pk diminishing adaptation + re-init safeguard ----------
        # (automix.c:1258-1281); skipped while burning and for K == 1.
        if adapt and K > 1:
            onehot_new = jax.nn.one_hot(k, K, dtype=dtype)
            if cfg.pk_mode == "pooled":
                # Shared pk from the global visit histogram: same gamma
                # schedule, same expected drift as the single-chain update,
                # with a chains-times lower-variance gradient.  All rows of
                # pk stay identical (they start identical), so the re-init
                # safeguard below acts coherently on the shared vector.
                hist = onehot_new.sum(axis=0)
                n_total = jnp.asarray(S, dtype)
                if axis_name is not None:
                    hist = jax.lax.psum(hist, axis_name)
                    n_total = jax.lax.psum(n_total, axis_name)
                onehot_new = jnp.broadcast_to(
                    (hist / n_total)[None, :], pk.shape)
                if axis_name is not None:
                    from automix_tpu.parallel.mesh import pvary
                    onehot_new = pvary(onehot_new, axis_name)
            pk = pk + gamma * (onehot_new - pk)
            reinit = jnp.any(pk < pkllim[:, None], axis=1)
            nreinit = nreinit + reinit.astype(jnp.int32)
            pkllim = jnp.where(reinit,
                               1.0 / (10.0 * nreinit.astype(dtype)), pkllim)
            pk = jnp.where(reinit[:, None],
                           jnp.full((S, K), 1.0 / K, dtype), pk)

        chains = chains.replace(k=k, theta=theta, logp=logp, pk=pk,
                                pkllim=pkllim, nreinit=nreinit,
                                sweep=chains.sweep + 1)
        return chains, stats

    return sweep_all


def build_single_sweep(modelset: ModelSet, cfg: EngineConfig,
                       burning: bool = False):
    """Unjitted one-sweep step ``step(chains, prop) -> chains`` — the
    engine's compile-checkable "forward step"."""
    sweep_all = build_sweep_all(modelset, cfg, burning)

    def step(chains: Chains, prop: Proposal) -> Chains:
        chains, _ = sweep_all(chains, prop)
        return chains

    return step


def _chunk_scan(sweep_all, modelset, cfg, collect, chains, prop, n_sweeps,
                axis_name=None):
    """Scan ``n_sweeps`` sweeps, accumulating chunk statistics on device.

    ``axis_name``: the shard_map chain axis, when running sharded — the
    zero-initialized accumulators must be marked varying over it so the
    scan carry types match, and the per-sweep traces (which live on shard
    0's chains, the global chain prefix) are psum-broadcast so every shard
    returns the same replicated trace arrays (a host on a pod slice never
    sees other hosts' shards except through collectives)."""
    K, D = modelset.nmodels, modelset.dmax
    dtype = cfg.dtype
    n_trace = cfg.n_trace_chains
    tables = precompute_tables(prop, modelset.dims_device, dtype)

    def kahan(s, c, x):
        """Compensated add: the scan accumulates S-chain partial sums over
        up to thousands of sweeps sequentially; Kahan compensation keeps the
        float32 carry's error at one rounding per *chunk* instead of one per
        sweep (32k chains x 50k sweeps of plain float32 adds visibly biases
        the change-point position moments, whose squares reach ~1.6e9)."""
        y = x - c
        t = s + y
        return t, (t - s) - y

    def body(carry, _):
        ch, acc = carry
        ch, stats = sweep_all(ch, prop, tables)
        k, theta = ch.k, ch.theta
        onehot = jax.nn.one_hot(k, K, dtype=dtype)         # [S, K]
        tsum, tsum_c = kahan(acc["theta_sum"], acc["theta_sum_c"],
                             onehot.T @ theta)
        tsq, tsq_c = kahan(acc["theta_sqsum"], acc["theta_sqsum_c"],
                           onehot.T @ (theta * theta))
        acc = {
            "ksummary": acc["ksummary"] + onehot.sum(axis=0).astype(jnp.int32),
            "theta_sum": tsum, "theta_sum_c": tsum_c,
            "theta_sqsum": tsq, "theta_sqsum_c": tsq_c,
            "naccrwmb": acc["naccrwmb"] + stats["naccrwmb"].sum(),
            "ntryrwmb": acc["ntryrwmb"] + stats["ntryrwmb"].sum(),
            "naccrwms": acc["naccrwms"] + stats["naccrwms"].sum(),
            "ntryrwms": acc["ntryrwms"] + stats["ntryrwms"].sum(),
            "nacctd": acc["nacctd"] + stats["nacctd"].sum(),
            "ntrytd": acc["ntrytd"] + stats["ntrytd"].sum(),
        }
        if collect:
            nt = min(n_trace, k.shape[0])
            trace = {
                "k_trace": k[:nt].astype(jnp.int32),
                "k0_trace": k[0],
                "pk0_trace": ch.pk[0],
                "logp0_trace": ch.logp[0],
                "theta0_trace": theta[0],
            }
            if axis_name is not None:
                first = jax.lax.axis_index(axis_name) == 0
                trace = jax.tree.map(
                    lambda v: jax.lax.psum(
                        jnp.where(first, v, jnp.zeros_like(v)), axis_name),
                    trace)
            trace["k_trace"] = trace["k_trace"].astype(jnp.int8)
            trace["k0_trace"] = trace["k0_trace"].astype(jnp.int8)
        else:
            trace = None
        return (ch, acc), trace

    acc0 = {
        "ksummary": jnp.zeros((K,), jnp.int32),
        "theta_sum": jnp.zeros((K, D), dtype),
        "theta_sum_c": jnp.zeros((K, D), dtype),
        "theta_sqsum": jnp.zeros((K, D), dtype),
        "theta_sqsum_c": jnp.zeros((K, D), dtype),
        "naccrwmb": jnp.int32(0), "ntryrwmb": jnp.int32(0),
        "naccrwms": jnp.int32(0), "ntryrwms": jnp.int32(0),
        "nacctd": jnp.int32(0), "ntrytd": jnp.int32(0),
    }
    if axis_name is not None:
        from automix_tpu.parallel.mesh import pvary
        acc0 = jax.tree.map(lambda x: pvary(x, axis_name), acc0)
    (chains_out, acc), traces = jax.lax.scan(
        body, (chains, acc0), None, length=n_sweeps)
    chunk = dict(acc)
    # Fold the Kahan compensation into the sums before they leave the chunk
    # (the compensation term holds the negated residual of the last add).
    chunk["theta_sum"] = chunk["theta_sum"] - chunk.pop("theta_sum_c")
    chunk["theta_sqsum"] = chunk["theta_sqsum"] - chunk.pop("theta_sqsum_c")
    if collect and traces is not None:
        chunk.update(traces)
    return chains_out, chunk


def build_chunk_runner(modelset: ModelSet, cfg: EngineConfig, burning: bool,
                       collect: bool, mesh=None):
    """Build a jitted function running ``n`` sweeps over all chains.

    ``runner(chains, prop, n_sweeps)`` -> (chains', chunk_stats dict).
    ``n_sweeps`` is static (compiled into the scan length).

    With ``mesh`` the chunk runs under ``shard_map`` over the chain axis —
    the production multi-chip/multi-host path (SURVEY.md section 7 step
    6): every array op stays local to its shard, the chunk statistics are
    reduced once per chunk with a single ``psum``, and per-sweep traces
    (from the global chain prefix, which lives on shard 0) come back
    replicated via a tiny per-sweep psum-broadcast — valid on a pod slice
    where no host can address another host's shard.  This also enables the
    pallas hardware-PRNG kernel, which is opaque to the jit
    auto-partitioner but trivially shardable by hand.
    """
    from automix_tpu.kernels import sweep_rng

    rng_mode = sweep_rng.resolve_rng(cfg)

    if mesh is not None:
        from automix_tpu.parallel import mesh as mesh_lib

        axis = mesh_lib.CHAIN_AXIS
        sweep_all = build_sweep_all(modelset, cfg, burning,
                                    rng_mode=rng_mode, axis_name=axis)
        chain_p = jax.sharding.PartitionSpec(axis)
        rep_p = jax.sharding.PartitionSpec()
        chains_spec = Chains(key=chain_p, k=chain_p, theta=chain_p,
                             logp=chain_p, pk=chain_p, pkllim=chain_p,
                             nreinit=chain_p, sweep=rep_p)
        prop_spec = jax.tree.map(lambda _: rep_p, Proposal(
            lam=0, mu=0, B=0, logdetB=0, nmix=0, sig=0))
        acc_keys = frozenset([
            "ksummary", "theta_sum", "theta_sqsum", "naccrwmb", "ntryrwmb",
            "naccrwms", "ntryrwms", "nacctd", "ntrytd"])

        @functools.lru_cache(maxsize=None)
        def _compiled(n_sweeps: int):
            def local_run(chains, prop):
                chains, chunk = _chunk_scan(
                    sweep_all, modelset, cfg, collect, chains, prop,
                    n_sweeps, axis_name=axis)
                # accumulators are per-shard partials -> psum; traces are
                # already replicated inside the scan
                chunk = {k: (jax.lax.psum(v, axis) if k in acc_keys else v)
                         for k, v in chunk.items()}
                return chains, chunk

            return jax.jit(jax.shard_map(
                local_run, mesh=mesh,
                in_specs=(chains_spec, prop_spec),
                out_specs=(chains_spec, rep_p)))

        def runner(chains: Chains, prop: Proposal, n_sweeps: int):
            return _compiled(n_sweeps)(chains, prop)

        return runner

    # Single-device / auto-sharded path.  The pallas RNG kernel cannot be
    # auto-partitioned, so it is only used when no mesh is involved.
    mode = rng_mode if mesh is None else "threefry"
    sweep_all = build_sweep_all(modelset, cfg, burning, rng_mode=mode)

    @functools.partial(jax.jit, static_argnums=(2,))
    def runner(chains: Chains, prop: Proposal, n_sweeps: int):
        return _chunk_scan(sweep_all, modelset, cfg, collect, chains, prop,
                           n_sweeps)

    return runner


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
