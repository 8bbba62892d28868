"""Stage 2: fitting the Normal-mixture proposal to stage-1 samples.

Figueiredo-Jain component-annihilating EM (``fit_mixture_from_samples``,
automix.c:664-1006) and the AutoRJ single-Normal shortcut (``fit_autorj``,
automix.c:1008-1033), re-designed for fixed shapes:

* the C code *compacts* arrays when a component dies
  (automix.c:821-845, 908-921); here a component is a *slot* with an alive
  mask — dead slots keep ``lam == 0`` and are excluded from every reduction,
  which is exactly equivalent and keeps all shapes static;
* responsibilities are computed in log space with logsumexp instead of the
  C's raw ``exp`` + underflow guard (automix.c:855-866); the degenerate
  "no component explains this point" case is detected as
  ``logsumexp < EM_DEGENERATE_LOGSUM`` and handled identically (uniform
  responsibilities, lpn penalty);
* the whole fit is one ``lax.while_loop`` whose body is masked to a no-op
  once a model has converged, so it vmaps over all K models at once;
* all sufficient statistics are sample-axis matmul reductions
  (automix.c:773-811), which makes them `psum`-able when the sample axis is
  sharded: with ``mesh``, ``fit_proposal`` runs the fit under ``shard_map``
  with the stage-1 sample axis sharded, every sample-axis reduction
  (responsibility sums, weighted means, weighted Gram matrices, mixture
  log-likelihood) crossed with one ``psum``, and only the tiny component
  *seeding* step gathering the samples — the multi-chip/multi-host path
  where stage-1 output never leaves its shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from automix_tpu.config import (
    EM_ANNIHILATION_THRESHOLD,
    EM_DEGENERATE_LOGSUM,
    EM_DEGENERATE_PENALTY,
    EngineConfig,
)
from automix_tpu.model import ModelSet
from automix_tpu.ops import linalg
from automix_tpu.state import Proposal

_NEG = -jnp.inf


def _identity(x):
    return x


def _gather_invariant(x, axis_name, axis_size):
    """All-gather the shard-local sample block into a *replicated-typed*
    array: psum of shard-offset scatters.  ``jax.lax.all_gather`` types its
    output as varying under the shard_map VMA checker even though every
    shard holds identical values; psum yields the invariant type the
    downstream (replicated) EM decisions need."""
    i = jax.lax.axis_index(axis_name)
    buf = jnp.zeros((axis_size,) + x.shape, x.dtype).at[i].set(x)
    buf = jax.lax.psum(buf, axis_name)
    return buf.reshape((axis_size * x.shape[0],) + x.shape[1:])


def _e_step(lam, alive, lpdata, psum=_identity):
    """Responsibilities + mixture log-likelihood (automix.c:846-867).

    Returns (w [N, L], lpn scalar).  Dead slots get zero responsibility.
    ``psum`` reduces the (possibly sharded) sample axis.
    """
    alive_f = alive.astype(lpdata.dtype)
    n_alive = jnp.maximum(alive_f.sum(), 1.0)
    loglam = jnp.where(alive, jnp.log(jnp.maximum(lam, 1e-38)), _NEG)
    logw = loglam[None, :] + lpdata                       # [N, L]
    logsum = logsumexp(logw, axis=1)                      # [N]
    degenerate = logsum < EM_DEGENERATE_LOGSUM
    softmax = jnp.exp(logw - jnp.where(degenerate, 0.0, logsum)[:, None])
    softmax = softmax * alive_f[None, :]
    uniform = alive_f[None, :] / n_alive
    w = jnp.where(degenerate[:, None], uniform, softmax)
    lpn = psum(jnp.sum(jnp.where(degenerate, EM_DEGENERATE_PENALTY, logsum)))
    return w, lpn


def _mml_cost(lam, alive, Lkk, lpn, nparams, n):
    """The MML cost function (automix.c:870-876)."""
    dtype = lam.dtype
    nf = jnp.asarray(n, dtype)
    s = jnp.sum(jnp.where(alive, jnp.log(jnp.maximum(nf * lam / 12.0, 1e-38)), 0.0))
    Lf = Lkk.astype(dtype)
    return (nparams / 2.0) * s + (Lf / 2.0) * jnp.log(nf / 12.0) \
        + Lf * (nparams + 1.0) / 2.0 - lpn


def _renormalize(lam, alive):
    lam = lam * alive.astype(lam.dtype)
    return lam / jnp.maximum(lam.sum(), 1e-38)


def fit_figueiredo(samples, dim, key, lmax: int, max_iters: int,
                   axis_name=None, axis_size=1):
    """Fit one model's mixture.  ``samples`` [N, D] padded, ``dim`` scalar.

    Returns dict with lam/mu/B [lmax,...], alive mask, nmix, iteration
    count, and per-iteration telemetry (Lkk / lpn / cost / annihilations —
    the engine's ``fitmix_*`` cpstats, automix.h:164-168).

    **Phased slot compaction.**  The C implementation compacts its arrays
    whenever a component dies (automix.c:821-845), so its per-iteration
    cost tracks the *live* count Lkk; a fixed-shape alive-mask port pays
    the full lmax x [N, lmax] E-step forever.  Measured on rb9, ~80% of
    iterations run with <= 10 live components — so the fit runs as a
    sequence of while_loops at shrinking static widths (lmax -> 10 -> 4),
    compacting live slots to a prefix between phases (a permutation of
    slots; the mixture is slot-permutation invariant).  A model whose
    live count still exceeds the next width keeps iterating in the wide
    phase; models below it freeze (the vmap no-op mechanism) and resume
    in the narrower loop.  Best-configuration buffers stay at full lmax
    width across phases.

    With ``axis_name`` (running under ``shard_map`` with the sample axis
    sharded), every sample-axis reduction crosses the mesh with a ``psum``;
    only component seeding gathers the samples.  All while_loop decisions
    depend on globally-reduced scalars, so the loop stays in lockstep
    across shards.
    """
    if axis_name is None:
        psum = _identity
        samples_g = samples
    else:
        def psum(x):
            return jax.lax.psum(x, axis_name)
        samples_g = _gather_invariant(samples, axis_name, axis_size)
    N, D = samples_g.shape
    dtype = samples.dtype
    dimf = dim.astype(dtype)
    nparams = dimf + dimf * (dimf + 1.0) / 2.0        # automix.c:751
    coord_mask = (jnp.arange(D) < dim).astype(dtype)

    # --- init: components seeded at distinct random samples with a common
    # spherical covariance trace(cov)/(10*mdim) (automix.c:682-723).  The
    # reference always fits >= 1000*mdim samples against <= 30 components;
    # when the engine is configured with fewer stage-1 samples, seeding the
    # full lmax would overfit into degenerate components, so the initial
    # live count is capped at ~N/20 (and never exceeds N).  Seeding uses
    # the *gathered* samples so the sharded fit starts identically to the
    # unsharded one.
    l_init = max(1, min(lmax, N // 20 if N >= 20 else 1))
    idx = jax.random.choice(key, N, (min(lmax, N),), replace=False)
    idx = jnp.resize(idx, (lmax,))
    mu0 = samples_g[idx]                               # [L, D]
    var = samples_g.var(axis=0) * coord_mask           # biased var, /n as in C
    sigma = var.sum() / (10.0 * dimf)
    diag0 = jnp.where(jnp.arange(D) < dim, jnp.sqrt(sigma), 1.0)
    B0 = jnp.broadcast_to(jnp.diag(diag0), (lmax, D, D))
    alive0 = jnp.arange(lmax) < l_init
    lam0 = jnp.where(alive0, 1.0 / l_init, 0.0).astype(dtype)

    lpdata0 = jax.vmap(
        lambda m, b: linalg.lnormprob(samples, m, b, dim), out_axes=1)(mu0, B0)
    w0, lpn0 = _e_step(lam0, alive0, lpdata0, psum)

    tele0 = {
        "Lkk": jnp.zeros((max_iters,), jnp.int32),
        "lpn": jnp.zeros((max_iters,), dtype),
        "cost": jnp.zeros((max_iters,), dtype),
        "ann": jnp.zeros((max_iters,), jnp.int32),
    }
    state0 = {
        "lam": lam0, "mu": mu0, "B": B0, "lpdata": lpdata0, "w": w0,
        "alive": alive0, "Lkk": jnp.asarray(l_init, jnp.int32),
        "lpn": lpn0, "costfn": jnp.asarray(0.0, dtype),
        "costmin": jnp.asarray(jnp.inf, dtype),
        "best_lam": lam0, "best_mu": mu0, "best_B": B0,
        "best_alive": alive0, "best_Lkk": jnp.asarray(l_init, jnp.int32),
        "count": jnp.asarray(0, jnp.int32),
        "stop": jnp.asarray(False),
        "tele": tele0,
    }

    def slot_body(l1, st):
        """Component-wise M-step + E-step for slot l1 (automix.c:772-868)."""
        lam, mu, B, lpdata, w, alive = (
            st["lam"], st["mu"], st["B"], st["lpdata"], st["w"], st["alive"])
        process = alive[l1]
        natann = st["natann"]

        sumw = psum(w.sum(axis=0))                               # [L]
        wnew = jnp.maximum(sumw - nparams / 2.0, 0.0) * alive.astype(lam.dtype)
        lam_upd = lam.at[l1].set(wnew[l1] / jnp.maximum(wnew.sum(), 1e-38))
        lam_upd = _renormalize(lam_upd, alive)
        keep = lam_upd[l1] > EM_ANNIHILATION_THRESHOLD           # automix.c:794

        # branch A: refit component l1 (automix.c:796-818)
        wl = w[:, l1]
        sw = jnp.maximum(sumw[l1], 1e-38)
        mean = psum(wl @ samples) / sw * coord_mask
        xc = (samples - mean) * coord_mask
        cov = psum(jnp.einsum("n,ni,nj->ij", wl, xc, xc)) / sw
        cov = jnp.where(jnp.isfinite(cov), cov, jnp.eye(D, dtype=dtype))
        B_l1 = linalg.chol(cov, dim=dim, jitter=1e-6)
        B_l1 = jnp.where(jnp.isfinite(B_l1), B_l1, jnp.eye(D, dtype=dtype))
        lp_l1 = linalg.lnormprob(samples, mean, B_l1, dim)       # [N]

        # branch B: natural annihilation (automix.c:821-845) — no array
        # compaction, just kill the slot and renormalize.
        lam_ann = _renormalize(lam_upd.at[l1].set(0.0), alive.at[l1].set(False))

        upd_keep = process & keep
        upd_ann = process & ~keep
        lam = jnp.where(upd_ann, lam_ann, jnp.where(process, lam_upd, lam))
        alive = alive.at[l1].set(alive[l1] & ~upd_ann)
        # single-column updates (a conditional .set of the whole array
        # would force a second full copy of lpdata — the dominant HBM
        # traffic of the slot step at [N, L])
        mu = mu.at[l1].set(jnp.where(upd_keep, mean, mu[l1]))
        B = B.at[l1].set(jnp.where(upd_keep, B_l1, B[l1]))
        lpdata = lpdata.at[:, l1].set(
            jnp.where(upd_keep, lp_l1, lpdata[:, l1]))
        Lkk = st["Lkk"] - upd_ann.astype(jnp.int32)
        natann = natann | upd_ann

        w, lpn = _e_step(lam, alive, lpdata, psum)
        st = dict(st, lam=lam, mu=mu, B=B, lpdata=lpdata, w=w, alive=alive,
                  Lkk=Lkk, lpn=lpn, natann=natann)
        return st

    def pad_L(x, fill, Lw):
        """Pad an active-width [Lw, ...] array back to full lmax width
        (best-configuration buffers keep the full width in every phase)."""
        if Lw == lmax:
            return x
        return jnp.pad(x, [(0, lmax - Lw)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    def make_body(Lw, next_w):
      def body(st0):
        # Exit state decided from the PRE-iteration state: under vmap the
        # body also runs for models that already left this phase (stopped,
        # or annihilated to the next width), and their slot-loop results
        # must be discarded wholesale — st0 is what they keep.
        prev_exit = st0["stop"] | (st0["Lkk"] <= next_w)
        count = st0["count"] + 1
        st = dict(st0, count=count, natann=jnp.asarray(False))
        st = jax.lax.fori_loop(0, Lw, slot_body, st)

        cost_new = _mml_cost(st["lam"], st["alive"], st["Lkk"], st["lpn"],
                             nparams, N)
        first = count == 1
        costfn = jnp.where(first, cost_new, st["costfn"])

        # keep the globally best configuration (automix.c:881-893) —
        # always at full lmax width, whatever the active phase width
        better = first | (cost_new < st["costmin"])
        best = {
            "best_lam": jnp.where(better, pad_L(st["lam"], 0, Lw),
                                  st["best_lam"]),
            "best_mu": jnp.where(better, pad_L(st["mu"], 0, Lw),
                                 st["best_mu"]),
            "best_B": jnp.where(better, pad_L(st["B"], 0, Lw),
                                st["best_B"]),
            "best_alive": jnp.where(better, pad_L(st["alive"], False, Lw),
                                    st["best_alive"]),
            "best_Lkk": jnp.where(better, st["Lkk"], st["best_Lkk"]),
        }
        costmin = jnp.where(better, cost_new, st["costmin"])

        converged = (jnp.abs(costfn - cost_new)
                     < jnp.minimum(1e-5 * jnp.abs(costfn), 0.01)) & (count > 1)
        stop = converged & (st["Lkk"] == 1)

        # forced annihilation of the min-weight component on convergence
        # with Lkk > 1 (automix.c:896-959)
        force = converged & (st["Lkk"] > 1)
        lam_masked = jnp.where(st["alive"], st["lam"], jnp.inf)
        ldel = jnp.argmin(lam_masked)
        alive_f = st["alive"].at[ldel].set(st["alive"][ldel] & ~force)
        lam_f = jnp.where(force, _renormalize(st["lam"].at[ldel].set(0.0), alive_f),
                          st["lam"])
        Lkk_f = st["Lkk"] - force.astype(jnp.int32)
        w_f, lpn_f = _e_step(lam_f, alive_f, st["lpdata"], psum)
        cost_f = _mml_cost(lam_f, alive_f, Lkk_f, lpn_f, nparams, N)
        lam = jnp.where(force, lam_f, st["lam"])
        alive = jnp.where(force, alive_f, st["alive"])
        Lkk = jnp.where(force, Lkk_f, st["Lkk"])
        w = jnp.where(force, w_f, st["w"])
        lpn = jnp.where(force, lpn_f, st["lpn"])
        cost_new = jnp.where(force, cost_f, cost_new)

        stop = stop | (count > max_iters)

        # telemetry (automix.c:964-970): annulations code natann + 2*force
        t = jnp.minimum(count - 1, max_iters - 1)
        tele = st["tele"]
        tele = {
            "Lkk": tele["Lkk"].at[t].set(Lkk),
            "lpn": tele["lpn"].at[t].set(lpn),
            "cost": tele["cost"].at[t].set(cost_new),
            "ann": tele["ann"].at[t].set(
                st["natann"].astype(jnp.int32) + 2 * force.astype(jnp.int32)),
        }
        new = dict(st, lam=lam, alive=alive, Lkk=Lkk, w=w, lpn=lpn,
                   costfn=cost_new, costmin=costmin, stop=stop, tele=tele,
                   **best)
        del new["natann"]
        merged = jax.tree.map(lambda old, nw: jnp.where(prev_exit, old, nw),
                              st0, new)
        return merged

      def cond(st):
        return ~(st["stop"] | (st["Lkk"] <= next_w))

      return cond, body

    def compact(st, next_w):
        """Permute live slots to the front and truncate to ``next_w``
        (the C array compaction, automix.c:821-845, done between phases;
        the mixture is invariant to slot order).  Only the *active* state
        narrows — best_* buffers stay full width."""
        order = jnp.argsort(~st["alive"], stable=True)     # live first
        take = order[:next_w]
        return dict(
            st,
            lam=jnp.take(st["lam"], take, axis=0),
            mu=jnp.take(st["mu"], take, axis=0),
            B=jnp.take(st["B"], take, axis=0),
            alive=jnp.take(st["alive"], take, axis=0),
            lpdata=jnp.take(st["lpdata"], take, axis=1),
            w=jnp.take(st["w"], take, axis=1),
        )

    widths = [lmax] + [wdt for wdt in (10, 4) if wdt < lmax]
    st = state0
    for pi, Lw in enumerate(widths):
        next_w = widths[pi + 1] if pi + 1 < len(widths) else 0
        cond, body = make_body(Lw, next_w)
        st = jax.lax.while_loop(cond, body, st)
        if next_w:
            st = compact(st, next_w)
    final = st

    best_alive = final["best_alive"]
    af = best_alive.astype(dtype)
    lam = _renormalize(final["best_lam"], best_alive)
    mu = final["best_mu"] * af[:, None]
    eye = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (lmax, D, D))
    B = jnp.where(best_alive[:, None, None], final["best_B"], eye)
    return {
        "lam": lam, "mu": mu, "B": B, "alive": best_alive,
        "nmix": final["best_Lkk"], "iters": final["count"],
        "tele": final["tele"],
    }


def fit_autorj(samples, dim):
    """AutoRJ mode: a single Normal fit (automix.c:1008-1033)."""
    N, D = samples.shape
    dtype = samples.dtype
    coord_mask = (jnp.arange(D) < dim).astype(dtype)
    mean = samples.mean(axis=0) * coord_mask
    xc = (samples - mean) * coord_mask
    cov = jnp.einsum("ni,nj->ij", xc, xc) / (N - 1)   # automix.c:1029
    B0 = linalg.chol(cov, dim=dim, jitter=1e-6)
    return mean, B0


def fit_proposal(modelset: ModelSet, cfg: EngineConfig, samples, sig, key,
                 mesh=None):
    """Fit every model's proposal mixture and assemble a Proposal pytree.

    ``samples``: [K, C, D] stage-1 output; ``sig``: [K, D] adapted scales.
    Returns (Proposal, telemetry dict).

    With ``mesh`` the per-model sample axis stays sharded over the mesh
    (the layout stage 1 produces) and the fit runs under ``shard_map`` with
    psum'd sufficient statistics (automix.c:773-811 are pure reductions).
    """
    K, C, D = samples.shape
    lmax = cfg.max_mix_comps
    dims = modelset.dims_device
    dtype = cfg.dtype

    if cfg.mix_fit == "autorj":
        if mesh is not None:
            # tiny input: gather and fit replicated
            from automix_tpu.parallel import mesh as mesh_lib
            samples = jax.jit(
                lambda x: x, out_shardings=mesh_lib.replicated(mesh))(samples)
        means, Bs = jax.vmap(fit_autorj)(samples, dims)
        lam = jnp.zeros((K, lmax), dtype).at[:, 0].set(1.0)
        mu = jnp.zeros((K, lmax, D), dtype).at[:, 0].set(means)
        eye = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (K, lmax, D, D))
        B = eye.at[:, 0].set(Bs)
        nmix = jnp.ones((K,), jnp.int32)
        telemetry = {}
    else:
        keys = jax.random.split(key, K)
        if mesh is None:
            fit = jax.jit(jax.vmap(
                lambda s, d, k: fit_figueiredo(s, d, k, lmax,
                                               cfg.max_em_iters)))
        else:
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            n_shards = int(mesh.devices.size)

            def local_fit(s, d, k):
                return jax.vmap(
                    lambda sk, dk, kk: fit_figueiredo(
                        sk, dk, kk, lmax, cfg.max_em_iters,
                        axis_name=axis, axis_size=n_shards))(s, d, k)

            fit = jax.jit(jax.shard_map(
                local_fit, mesh=mesh,
                in_specs=(P(None, axis, None), P(), P()),
                out_specs=P()))
        out = fit(samples, dims, keys)
        lam, mu, B = out["lam"], out["mu"], out["B"]
        nmix = out["nmix"]
        telemetry = {"em_iters": out["iters"], "em_trace": out["tele"]}

    logdetB = jax.vmap(
        lambda Bk, d: jax.vmap(lambda b: linalg.log_det_tri(b, d))(Bk))(B, dims)
    proposal = Proposal(lam=lam, mu=mu, B=B, logdetB=logdetB, nmix=nmix,
                        sig=sig)
    return trim_proposal(proposal), telemetry


def trim_proposal(proposal: Proposal) -> Proposal:
    """Slice the component axis down to the largest fitted mixture size.

    Annihilation typically leaves far fewer than NUM_MIX_COMPS_MAX live
    components; the hot loop's one-hot table contractions scale with the
    padded L, so trimming the dead tail is a direct throughput win.  Live
    components do not occupy a slot prefix — annihilation leaves holes —
    so each model's live slots are compacted to the front first via a
    stable sort on the dead mask (device-side: only the trimmed length
    itself syncs to host, as it must — it is a shape).
    """
    import numpy as np

    K, L = proposal.lam.shape
    D = proposal.mu.shape[2]
    l_active = max(1, min(L, int(np.asarray(proposal.nmix).max())))

    dead = proposal.lam <= 0                            # [K, L]
    order = jnp.argsort(dead, axis=1, stable=True)      # live slots first
    take = order[:, :l_active]

    def compact(x, fill):
        kept = jnp.take_along_axis(
            x, take.reshape(K, l_active, *([1] * (x.ndim - 2))), axis=1)
        alive = jnp.take_along_axis(~dead, take, axis=1)
        alive = alive.reshape(K, l_active, *([1] * (x.ndim - 2)))
        return jnp.where(alive, kept, fill)

    eye = jnp.broadcast_to(jnp.eye(D, dtype=proposal.B.dtype),
                           (K, l_active, D, D))
    return Proposal(lam=compact(proposal.lam, 0.0),
                    mu=compact(proposal.mu, 0.0),
                    B=compact(proposal.B, eye),
                    logdetB=compact(proposal.logdetB, 0.0),
                    nmix=proposal.nmix, sig=proposal.sig)
